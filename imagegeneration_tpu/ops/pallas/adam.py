"""Fused Keras-form Adam apply as a Pallas TPU kernel.

Motivation (VERDICT r4 #5 / round-3 proposal): the SNDCGAN headline step's
non-conv tail is optimizer traffic — the round-2 trace put the Adam applies
at 7.5 ms/step, dominated by the 37.7M-param stem Dense (p/m/v/g are
151 MB each in f32). The math is purely elementwise:

    m' = b1*m + (1-b1)*g
    v' = b2*v + (1-b2)*g*g
    p' = p - alpha * m' / (sqrt(v') + eps)     [Keras form: eps OUTSIDE the
                                                sqrt, alpha carries the bias
                                                correction; train/common.py]

so its speed-of-light is pure HBM bandwidth: read {p, g, m, v}, write
{p', m', v'} = 7 passes.

**Chip verdict (2026-08-20, benchmarks/ab_fused_adam.py): SLOWER — 49.17
vs 42.02 ms/step at the headline config, so it ships default-OFF.** The
hypothesis that XLA pays extra passes was wrong: XLA fuses each Adam
apply into the PRODUCING dW fusion (the gradient never round-trips HBM as
a separate array; round-2's stem divide_add_fusion measured 1.35 ms ~=
the 7-pass bound for its 151 MB operands). A custom call is a fusion
barrier, so this kernel forces the dW fusion to materialize g to HBM and
re-read it — strictly more traffic than the fusion it replaced. Kept as
an exactness-tested experiment knob (`fused_adam` in the train configs)
because the measurement is the valuable artifact: optimizer traffic on
this step is ALREADY at bandwidth speed-of-light inside XLA.

Trajectory preservation: the kernel evaluates the exact expressions of
`common.adam`'s update in the same dtype (f32) and per-element order. The
one freedom the compilers keep is FMA contraction (a*b+c fused vs rounded
separately), so interpret-vs-XLA comparisons agree to <=2 ulp per element
rather than bitwise (measured 2.4e-7 max on N(0,1) data,
tests/test_pallas_adam.py) — the same contraction freedom XLA itself
exercises between its own versions/fusion choices. The Keras-exact Adam
FORM (eps outside the sqrt, bias correction in alpha) is preserved
exactly, which is what the executed-reference parity gates pin (their
criteria are chaos-robust to ulp-level noise by design — see
tests/test_reference_parity.py).

Scope: leaves with size % 1024 == 0 (reshaped to (rows, 1024) lanes — no
padding pass, which would defeat the purpose) and >= `MIN_FUSED_SIZE`
elements, f32 params/moments. Everything else stays on the XLA path.
Reference being accelerated: the two tf.keras Adam optimizers of
sndcgan/SNDCGAN.py:165,168 (and cyclegan/CycleGAN.py:229-233 via the same
helper).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # TPU memory spaces; absent in pure-interpret environments
    from jax.experimental.pallas import tpu as pltpu

    _VMEM, _SMEM = pltpu.VMEM, pltpu.SMEM
except Exception:  # pragma: no cover
    _VMEM = _SMEM = None

# Leaves below this ride XLA (kernel launch overhead + they fuse fine).
MIN_FUSED_SIZE = 1 << 20  # 1M elements
_LANES = 1024  # 8 sublanes x 128 lanes per row-block unit


def _kernel(alpha_ref, p_ref, g_ref, m_ref, v_ref,
            p_out, m_out, v_out, *, b1: float, b2: float, eps: float):
    g = g_ref[...]
    m = b1 * m_ref[...] + (1.0 - b1) * g
    v = b2 * v_ref[...] + (1.0 - b2) * jnp.square(g)
    m_out[...] = m
    v_out[...] = v
    p_out[...] = p_ref[...] - alpha_ref[0] * m / (jnp.sqrt(v) + eps)


def _block_rows(rows: int) -> int:
    # 7 live buffers (4 in + 3 out) x br x 1024 x 4 B, double-buffered by
    # the pipeline: br=128 is 7.3 MB of the 16 MB kernel vmem stack (br=512
    # measured OOM at 28 MB on v5e). Bandwidth-bound elementwise work is
    # insensitive to block size well below that.
    for cand in (128, 64, 32, 16, 8, 4, 2):
        if rows % cand == 0:
            return cand
    return 1


@functools.partial(
    jax.jit, static_argnames=("b1", "b2", "eps", "interpret")
)
def fused_adam_leaf(
    p: jax.Array,
    g: jax.Array,
    m: jax.Array,
    v: jax.Array,
    alpha: jax.Array,
    *,
    b1: float,
    b2: float,
    eps: float,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """One leaf's fused apply: returns (p', m', v'). Caller guarantees
    eligibility (f32, size % 1024 == 0)."""
    shape = p.shape
    rows = p.size // _LANES
    br = _block_rows(rows)
    flat = lambda x: x.reshape(rows, _LANES)  # noqa: E731
    spec = pl.BlockSpec((br, _LANES), lambda i: (i, 0), memory_space=_VMEM)
    alpha_spec = pl.BlockSpec(memory_space=_SMEM)
    out = pl.pallas_call(
        functools.partial(_kernel, b1=b1, b2=b2, eps=eps),
        grid=(rows // br,),
        in_specs=[alpha_spec, spec, spec, spec, spec],
        out_specs=[spec, spec, spec],
        out_shape=[jax.ShapeDtypeStruct((rows, _LANES), jnp.float32)] * 3,
        interpret=interpret,
    )(alpha.reshape(1).astype(jnp.float32), flat(p), flat(g), flat(m), flat(v))
    return tuple(o.reshape(shape) for o in out)


def leaf_eligible(p: jax.Array, m: jax.Array) -> bool:
    return (
        p.dtype == jnp.float32
        and m.dtype == jnp.float32
        and p.size >= MIN_FUSED_SIZE
        and p.size % _LANES == 0
    )
