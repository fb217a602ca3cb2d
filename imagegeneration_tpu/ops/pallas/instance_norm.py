"""Fused InstanceNorm (+ optional ReLU) as a Pallas TPU kernel.

Instance normalization is the most frequent op in the CycleGAN generator
(23 IN layers per forward, cyclegan/CycleGAN.py:60-183) and is memory-bound:
the XLA lowering reads the activation for the statistics reduction and again
for normalization. This kernel keeps one (H, W, C-block) tile resident in
VMEM and does stats + normalize + affine + activation in a single HBM
read/write pass.

Grid: (B, C // C_BLOCK); each program owns one sample's channel block —
statistics are per (sample, channel) over (H, W), i.e. the *corrected* IN
semantics (the reference's axis=1 quirk path stays on the XLA fallback).

The backward pass has the same single-pass structure (`_in_bwd_kernel`): one
program per (sample, channel-block) keeps the x and dy tiles resident in
VMEM and computes dx plus per-sample dgamma/dbeta partials in one HBM
read/read/write pass — vs the XLA lowering's separate reduction + elementwise
passes over the activation. xhat is recomputed from the saved (mean, rstd)
and the ReLU mask from (xhat, gamma, beta), so the forward OUTPUT y is not a
residual at all (less live memory between fwd and bwd than the standard
rule). The (B, 1, C) dgamma/dbeta partials are summed over B in XLA (tiny).
A plain-XLA `_in_bwd_xla` remains as the fallback/reference; both paths are
tested against each other (interpret mode on CPU).

Use `instance_norm(x, gamma, beta, eps=..., relu=..., backend=...)`:
backend "pallas" requires C % C_BLOCK_CANDIDATES alignment and TPU;
"xla" is the reference implementation; "auto" picks pallas on TPU when
shapes allow. Both paths are tested against each other (interpret mode on
CPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# VMEM budget per program ~= H*W*CB*4B for x + the same for y (+ double
# buffering) — keep the x block <= ~2 MB so the whole working set fits.
_VMEM_TARGET_BYTES = 2 * 1024 * 1024


def _pick_c_block(h: int, w: int, c: int) -> int | None:
    """Largest channel block satisfying the Mosaic tiling rules.

    The (1, H, W, CB) input block's last two dims must be (div-8, div-128) or
    equal to the full array dims: W is always full here, so CB must be a
    multiple of 128 or equal to C itself. The VMEM fit check uses the
    *hardware-padded* block — Mosaic tiles pad the lane dim up to 128 (a C=3
    block really occupies 128 lanes), which is also why small-C layers fall
    back to XLA rather than burn a 42x-padded kernel. Returns None when
    nothing fits (e.g. CycleGAN's 128px stem/to_rgb layers; the 18 res-block
    INs at 32x32 and the 64x64 down/up layers all hit the kernel)."""
    candidates = [c] + [cb for cb in (512, 384, 256, 128) if cb < c and c % cb == 0]
    for cb in sorted(set(candidates), reverse=True):
        padded_cb = -(-cb // 128) * 128  # lane padding
        padded_w = -(-w // 8) * 8  # sublane padding
        if h * padded_w * padded_cb * 4 <= _VMEM_TARGET_BYTES:
            return cb
    return None


def _in_fwd_kernel(x_ref, gamma_ref, beta_ref, y_ref, mean_ref, rstd_ref,
                   *, eps: float, relu: bool):
    x = x_ref[0].astype(jnp.float32)  # (H, W, CB)
    hw = x.shape[0] * x.shape[1]
    mean = jnp.sum(x, axis=(0, 1)) / hw  # (CB,)
    var = jnp.sum(x * x, axis=(0, 1)) / hw - mean * mean
    rstd = jax.lax.rsqrt(var + eps)
    xhat = (x - mean[None, None, :]) * rstd[None, None, :]
    y = xhat * gamma_ref[0][None, :] + beta_ref[0][None, :]
    if relu:
        y = jnp.maximum(y, 0.0)
    y_ref[0] = y.astype(y_ref.dtype)
    mean_ref[0, 0] = mean
    rstd_ref[0, 0] = rstd


def _in_fwd_pallas(x, gamma, beta, eps: float, relu: bool, interpret: bool):
    b, h, w, c = x.shape
    cb = _pick_c_block(h, w, c)
    assert cb is not None
    grid = (b, c // cb)
    y, mean, rstd = pl.pallas_call(
        functools.partial(_in_fwd_kernel, eps=eps, relu=relu),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, h, w, cb), lambda i, j: (i, 0, 0, j),
                         memory_space=pltpu.VMEM),
            # params as (1, C) 2D operands (Mosaic 1D operand layouts clash
            # with XLA's for C not a multiple of 256)
            pl.BlockSpec((1, cb), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cb), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, h, w, cb), lambda i, j: (i, 0, 0, j),
                         memory_space=pltpu.VMEM),
            # stats as (B, 1, C): block (1, 1, CB) keeps the last-two-dims
            # tiling rule satisfied (1 == full middle dim; CB div 128 or == C)
            pl.BlockSpec((1, 1, cb), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, cb), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(x.shape, x.dtype),
            jax.ShapeDtypeStruct((b, 1, c), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, c), jnp.float32),
        ],
        interpret=interpret,
    )(
        x,
        gamma.astype(jnp.float32).reshape(1, -1),
        beta.astype(jnp.float32).reshape(1, -1),
    )
    return y, mean[:, 0, :], rstd[:, 0, :]


def _in_fwd_xla(x, gamma, beta, eps: float, relu: bool):
    # bf16 upcasts to f32 for the statistics; f64 stays f64 (the f64 mesh-
    # equivalence tests depend on full-precision reductions).
    ct = jnp.promote_types(x.dtype, jnp.float32)
    x32 = x.astype(ct)
    mean = jnp.mean(x32, axis=(1, 2))  # (B, C)
    var = jnp.var(x32, axis=(1, 2))
    rstd = jax.lax.rsqrt(var + eps)
    xhat = (x32 - mean[:, None, None, :]) * rstd[:, None, None, :]
    y = xhat * gamma.astype(ct) + beta.astype(ct)
    if relu:
        y = jnp.maximum(y, 0.0)
    return y.astype(x.dtype), mean, rstd


def _in_bwd_kernel(x_ref, dy_ref, gamma_ref, beta_ref, mean_ref, rstd_ref,
                   dx_ref, dgamma_ref, dbeta_ref, *, relu: bool):
    x = x_ref[0].astype(jnp.float32)      # (H, W, CB)
    dy = dy_ref[0].astype(jnp.float32)
    gamma = gamma_ref[0]                   # (CB,)
    mean = mean_ref[0, 0]
    rstd = rstd_ref[0, 0]
    hw = x.shape[0] * x.shape[1]
    xhat = (x - mean[None, None, :]) * rstd[None, None, :]
    if relu:
        # mask recomputed from the pre-activation (identical f32 ops as fwd)
        pre = xhat * gamma[None, None, :] + beta_ref[0][None, None, :]
        dy = dy * (pre > 0)
    dbeta_ref[0, 0] = jnp.sum(dy, axis=(0, 1))
    dgamma_ref[0, 0] = jnp.sum(dy * xhat, axis=(0, 1))
    g = dy * gamma[None, None, :]
    mean_g = jnp.sum(g, axis=(0, 1)) / hw
    mean_gx = jnp.sum(g * xhat, axis=(0, 1)) / hw
    dx = rstd[None, None, :] * (
        g - mean_g[None, None, :] - xhat * mean_gx[None, None, :]
    )
    dx_ref[0] = dx.astype(dx_ref.dtype)


def _in_bwd_pallas(x, dy, gamma, beta, mean, rstd, relu: bool,
                   interpret: bool):
    b, h, w, c = x.shape
    cb = _pick_c_block(h, w, c)
    assert cb is not None
    grid = (b, c // cb)
    act_spec = pl.BlockSpec((1, h, w, cb), lambda i, j: (i, 0, 0, j),
                            memory_space=pltpu.VMEM)
    par_spec = pl.BlockSpec((1, cb), lambda i, j: (0, j),
                            memory_space=pltpu.VMEM)
    stat_spec = pl.BlockSpec((1, 1, cb), lambda i, j: (i, 0, j),
                             memory_space=pltpu.VMEM)
    dx, dgamma_p, dbeta_p = pl.pallas_call(
        functools.partial(_in_bwd_kernel, relu=relu),
        grid=grid,
        in_specs=[act_spec, act_spec, par_spec, par_spec, stat_spec,
                  stat_spec],
        out_specs=[act_spec, stat_spec, stat_spec],
        out_shape=[
            jax.ShapeDtypeStruct(x.shape, x.dtype),
            jax.ShapeDtypeStruct((b, 1, c), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, c), jnp.float32),
        ],
        interpret=interpret,
    )(
        x,
        dy,
        gamma.astype(jnp.float32).reshape(1, -1),
        beta.astype(jnp.float32).reshape(1, -1),
        mean.reshape(b, 1, c),
        rstd.reshape(b, 1, c),
    )
    return dx, jnp.sum(dgamma_p[:, 0, :], 0), jnp.sum(dbeta_p[:, 0, :], 0)


def _in_bwd_xla(x, dy, gamma, beta, mean, rstd, relu: bool):
    ct = jnp.promote_types(x.dtype, jnp.float32)
    x32 = x.astype(ct)
    dy = dy.astype(ct)
    xhat = (x32 - mean[:, None, None, :]) * rstd[:, None, None, :]
    if relu:
        pre = xhat * gamma.astype(ct) + beta.astype(ct)
        dy = dy * (pre > 0)
    dbeta = jnp.sum(dy, axis=(0, 1, 2))
    dgamma = jnp.sum(dy * xhat, axis=(0, 1, 2))
    g = dy * gamma.astype(jnp.float32)  # (B,H,W,C)
    mean_g = jnp.mean(g, axis=(1, 2), keepdims=True)
    mean_gx = jnp.mean(g * xhat, axis=(1, 2), keepdims=True)
    dx = rstd[:, None, None, :] * (g - mean_g - xhat * mean_gx)
    return dx, dgamma, dbeta


def _in_bwd(eps, relu, backend, res, dy):
    x, gamma, beta, mean, rstd = res
    resolved = _resolve_backend(x, backend)
    # A/B escape hatch: IMAGEGEN_IN_BWD=xla keeps the fused Pallas forward
    # but routes the backward through the plain XLA rule (the pre-round-4
    # shipped configuration) — used for the end-to-end CycleGAN step A/B
    # recorded in benchmarks/README.md.
    import os

    if os.environ.get("IMAGEGEN_IN_BWD", "") == "xla":
        resolved = "xla"
    if resolved == "pallas":
        dx, dgamma, dbeta = _in_bwd_pallas(
            x, dy, gamma, beta, mean, rstd, relu, interpret=False
        )
    elif resolved == "pallas_interpret":
        dx, dgamma, dbeta = _in_bwd_pallas(
            x, dy, gamma, beta, mean, rstd, relu, interpret=True
        )
    else:
        dx, dgamma, dbeta = _in_bwd_xla(x, dy, gamma, beta, mean, rstd, relu)
    return (
        dx.astype(x.dtype),
        dgamma.astype(gamma.dtype),
        dbeta.astype(gamma.dtype),
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def instance_norm(
    x: jax.Array,
    gamma: jax.Array,
    beta: jax.Array,
    eps: float = 1e-3,
    relu: bool = False,
    backend: str = "auto",
) -> jax.Array:
    """Per-(sample, channel) instance norm over (H, W) with affine (+ReLU)."""
    y, _, _ = _in_fwd(x, gamma, beta, eps, relu, backend)
    return y


def _resolve_backend(x, backend: str) -> str:
    if backend == "auto":
        on_tpu = any(
            d.platform == "tpu" for d in jax.devices()
        ) or jax.default_backend() in ("tpu", "axon")
        b, h, w, c = x.shape
        if on_tpu and _pick_c_block(h, w, c) is not None:
            return "pallas"
        return "xla"
    return backend


def _in_fwd(x, gamma, beta, eps, relu, backend):
    resolved = _resolve_backend(x, backend)
    if resolved == "pallas":
        return _in_fwd_pallas(x, gamma, beta, eps, relu, interpret=False)
    if resolved == "pallas_interpret":  # CPU testing path
        return _in_fwd_pallas(x, gamma, beta, eps, relu, interpret=True)
    return _in_fwd_xla(x, gamma, beta, eps, relu)


def _fwd_rule(x, gamma, beta, eps, relu, backend):
    y, mean, rstd = _in_fwd(x, gamma, beta, eps, relu, backend)
    # y is NOT a residual: the bwd recomputes the ReLU mask from
    # (xhat, gamma, beta), so the fwd output can be consumed/freed.
    return y, (x, gamma, beta, mean, rstd)


instance_norm.defvjp(_fwd_rule, _in_bwd)
