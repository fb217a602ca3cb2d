"""Flax building blocks matching the TF/Keras layer semantics of the reference.

The reference builds every model out of stock Keras layers (e.g.
/root/reference/sndcgan/SNDCGAN.py:25-128, /root/reference/wasserstein_gan/WGAN.py:53-134,
/root/reference/cyclegan/CycleGAN.py:29-183). This module provides the same
vocabulary as idiomatic Flax Linen modules, pinning down every default that
affects numerics:

- kernel init: Keras `glorot_uniform` (Flax defaults to lecun_normal), bias zeros;
- BatchNorm: momentum 0.99, epsilon 1e-3 (Keras) vs Flax's 1e-5;
- SAME padding: `lax` string padding has TF semantics (extra pad on bottom/right
  for even kernels), which is what Keras produces;
- InstanceNorm: the reference uses `tfa.layers.InstanceNormalization(axis=1)`
  on NHWC tensors (cyclegan/CycleGAN.py:65-66), i.e. it normalizes treating the
  *height* axis as channels — an upstream quirk. The corrected per-channel norm
  is the default here; `quirk_axis1=True` reproduces the reference behavior.

All modules are NHWC, accept a compute `dtype` (bfloat16 on the TPU hot path)
and keep parameters in `param_dtype` (float32).
"""

from __future__ import annotations

from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
from flax import linen as fnn

Dtype = Any

# Keras initializer equivalents.
KERAS_GLOROT_UNIFORM = jax.nn.initializers.glorot_uniform()
KERAS_RANDOM_NORMAL_002 = jax.nn.initializers.normal(stddev=0.02)
def _keras_random_uniform(key, shape, dtype=jnp.float32):
    """Keras 'random_uniform' initializer string default: U(-0.05, 0.05)."""
    return jax.random.uniform(key, shape, dtype, minval=-0.05, maxval=0.05)


KERAS_RANDOM_UNIFORM = _keras_random_uniform


def leaky_relu(x: jax.Array, alpha: float = 0.3) -> jax.Array:
    """Keras LeakyReLU (default alpha 0.3; the reference uses 0.1/0.2)."""
    return jax.nn.leaky_relu(x, negative_slope=alpha)


def reflection_pad_2d(x: jax.Array, padding: tuple[int, int] = (1, 1)) -> jax.Array:
    """REFLECT-pad H and W of an NHWC tensor.

    Mirrors the reference's ReflectionPadding2D (cyclegan/CycleGAN.py:37-57),
    which pads [[0,0],[h,h],[w,w],[0,0]] with mode REFLECT.
    """
    w_pad, h_pad = padding
    return jnp.pad(
        x, [(0, 0), (h_pad, h_pad), (w_pad, w_pad), (0, 0)], mode="reflect"
    )


class Dense(fnn.Module):
    """Dense layer with Keras defaults (glorot_uniform kernel, zeros bias)."""

    features: int
    use_bias: bool = True
    kernel_init: Callable = KERAS_GLOROT_UNIFORM
    dtype: Dtype | None = None
    param_dtype: Dtype = jnp.float32

    @fnn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        return fnn.Dense(
            features=self.features,
            use_bias=self.use_bias,
            kernel_init=self.kernel_init,
            bias_init=jax.nn.initializers.zeros,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )(x)


class Conv(fnn.Module):
    """2D convolution, NHWC, TF-SAME/VALID padding, Keras init defaults."""

    features: int
    kernel_size: tuple[int, int]
    strides: tuple[int, int] = (1, 1)
    padding: str | Sequence[tuple[int, int]] = "SAME"
    use_bias: bool = True
    kernel_init: Callable = KERAS_GLOROT_UNIFORM
    dtype: Dtype | None = None
    param_dtype: Dtype = jnp.float32

    @fnn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        return fnn.Conv(
            features=self.features,
            kernel_size=self.kernel_size,
            strides=self.strides,
            padding=self.padding,
            use_bias=self.use_bias,
            kernel_init=self.kernel_init,
            bias_init=jax.nn.initializers.zeros,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )(x)


def _conv_transpose_same_pad(k: int, s: int) -> int:
    """Left pad lax.conv_transpose uses for SAME (out = in * stride).

    Same arithmetic as jax's _conv_transpose_padding: pad_len = k + s - 2,
    left = k - 1 if s > k - 1 else ceil(pad_len / 2)."""
    if s > k - 1:
        return k - 1
    return -((k + s - 2) // -2)


def _phase_dim(k: int, pl: int, d: int) -> tuple[int, int, int]:
    """(a0, left_pad, taps) for output phase d of a stride-2 ConvT dim.

    y[2u+d] = sum_j W[a0+2j] * x[u + off + j], off = (d+a0-pl)//2;
    as a stride-1 conv: left pad = -off, right pad = taps-1+off."""
    a0 = (pl - d) % 2
    taps = len(range(a0, k, 2))
    off = (d + a0 - pl) // 2
    return a0, -off, taps


def _conv_transpose2_hybrid(x: jax.Array, kernel: jax.Array) -> jax.Array:
    """Stride-2 SAME ConvTranspose with a reverse-free dW.

    Forward and dx use XLA's own lowerings (lax.conv_transpose's base-dilated
    conv — efficient on TPU; the full 2x2-phase decomposition was measured
    7 ms/step SLOWER end-to-end, see _PhaseConvTranspose2). Only dW is
    overridden: XLA canonicalizes the dW conv of a base-dilated conv into a
    backward-filter conv with window reversal, materializing a spatially
    reversed copy of the incoming cotangent (trace: %reverse.2, 0.92 ms/step
    for the 151 MB bf16[32,144,256,64] dy at the SNDCGAN up2 block). Per
    output phase d, the layer is a stride-1 conv with tap subset
    W[a0::2] over a shifted x window, so dW[a0h::2, a0w::2] is the plain
    (undilated, reverse-free) backward-filter conv of x against the strided
    slice dy[:, dh::2, dw::2, :]; the four phase dWs scatter into disjoint
    kernel taps. Same products per dW element as the builtin rule (fp
    reassociation deltas only); forward/dx bit-identical to lax.
    Exactness pinned in tests/test_layers_convt.py.
    """
    kh, kw = kernel.shape[0], kernel.shape[1]
    pl_h = _conv_transpose_same_pad(kh, 2)
    pl_w = _conv_transpose_same_pad(kw, 2)
    dn = ("NHWC", "HWIO", "NHWC")

    def _fwd(x, w):
        return jax.lax.conv_transpose(
            x, w, strides=(2, 2), padding="SAME", dimension_numbers=dn,
            transpose_kernel=False,
        )

    @jax.custom_vjp
    def f(x, w):
        return _fwd(x, w)

    def f_fwd(x, w):
        return _fwd(x, w), (x, w)

    def f_bwd(res, dy):
        x, w = res
        _, vjp_x = jax.vjp(lambda t: _fwd(t, w), x)
        (dx,) = vjp_x(dy)
        dw = jnp.zeros(w.shape, dy.dtype)
        for dh in (0, 1):
            a0h, plh, th = _phase_dim(kh, pl_h, dh)
            for dv in (0, 1):
                a0w, plw, tw = _phase_dim(kw, pl_w, dv)
                pad = ((plh, th - 1 - plh), (plw, tw - 1 - plw))
                _, vjp_w = jax.vjp(
                    lambda wp: jax.lax.conv_general_dilated(
                        x, wp, window_strides=(1, 1), padding=pad,
                        dimension_numbers=dn,
                    ),
                    w[a0h::2, a0w::2],
                )
                (dwp,) = vjp_w(dy[:, dh::2, dv::2, :])
                dw = dw.at[a0h::2, a0w::2].set(dwp)
        return dx, dw.astype(w.dtype)

    f.defvjp(f_fwd, f_bwd)
    return f(x, kernel)


def _conv_transpose2_swapdw(x: jax.Array, kernel: jax.Array) -> jax.Array:
    """Stride-2 SAME ConvTranspose whose dW is ONE reverse-free conv.

    Forward and dx keep XLA's own lowerings (identical numerics to
    lax.conv_transpose). Only dW is re-derived: XLA's backward-filter
    canonicalization of the lhs-dilated (transposed) conv materializes a
    spatially REVERSED copy of the incoming cotangent per layer — 3 reverse
    ops totalling ~1.5 ms/step at the SNDCGAN headline config (the up2
    bf16[32,144,256,64] dy alone is 151 MB and 0.92 ms; trace ids
    %reverse/.1/.2, benchmarks/README.md). The earlier "hybrid" fix removed
    the reverses but split dW into FOUR per-phase convs, paying the win
    back. This lowering keeps dW a single conv via a transpose identity:

    A SAME stride-s ConvT with left pad `pl` satisfies
        y[n, t, o] = sum_{u,a: su = t+a-pl} x[n, u, i] W[a, i, o]
    so  dW[a, i, o] = sum_{n,u} x[n, u, i] dy[n, su + pl - a, o],
    which is EXACTLY the weight gradient of the plain FORWARD strided conv
        z = conv(dy, V, window_strides=s, padding=(k-1-pl, pl+1-s))
    taken at cotangent x, with the roles swapped (dy is the conv INPUT, x
    the COTANGENT) and dW[a, i, o] = dV[k-1-a, o, i] (spatial flip +
    in/out-channel swap of a (k, k, cout, cin) tensor — a few KB). A plain
    strided conv's backward-filter uses rhs_dilation, never an activation
    reverse (none of the discriminator's strided convs produce one). Same
    products as the builtin rule — fp reassociation deltas only; forward
    and dx are bit-identical to lax. Exactness + the no-reverse property
    are pinned in tests/test_layers_convt.py.
    """
    kh, kw = kernel.shape[0], kernel.shape[1]
    pl_h = _conv_transpose_same_pad(kh, 2)
    pl_w = _conv_transpose_same_pad(kw, 2)
    dn = ("NHWC", "HWIO", "NHWC")

    def _fwd(x, w):
        return jax.lax.conv_transpose(
            x, w, strides=(2, 2), padding="SAME", dimension_numbers=dn,
            transpose_kernel=False,
        )

    @jax.custom_vjp
    def f(x, w):
        return _fwd(x, w)

    def f_fwd(x, w):
        return _fwd(x, w), (x, w)

    def f_bwd(res, dy):
        x, w = res
        _, vjp_x = jax.vjp(lambda t: _fwd(t, w), x)
        (dx,) = vjp_x(dy)
        pad_h = (kh - 1 - pl_h, pl_h + 1 - 2)
        pad_w = (kw - 1 - pl_w, pl_w + 1 - 2)
        v0 = jnp.zeros((kh, kw, w.shape[3], w.shape[2]), dy.dtype)
        _, vjp_v = jax.vjp(
            lambda v: jax.lax.conv_general_dilated(
                dy, v, window_strides=(2, 2), padding=(pad_h, pad_w),
                dimension_numbers=dn,
            ),
            v0,
        )
        (dv,) = vjp_v(x.astype(dy.dtype))
        dw = jnp.flip(dv, (0, 1)).transpose(0, 1, 3, 2)
        return dx, dw.astype(w.dtype)

    f.defvjp(f_fwd, f_bwd)
    return f(x, kernel)


class _SwapDWConvTranspose2(fnn.Module):
    """Flax wrapper for _conv_transpose2_swapdw with the fnn.ConvTranspose
    parameter path/shape ((kh, kw, cin, cout), unflipped)."""

    features: int
    kernel_size: tuple[int, int]
    use_bias: bool = True
    kernel_init: Callable = KERAS_GLOROT_UNIFORM
    dtype: Dtype | None = None
    param_dtype: Dtype = jnp.float32

    @fnn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        kh, kw = self.kernel_size
        kernel = self.param(
            "kernel", self.kernel_init, (kh, kw, x.shape[-1], self.features),
            self.param_dtype,
        )
        bias = (
            self.param(
                "bias", jax.nn.initializers.zeros, (self.features,),
                self.param_dtype,
            )
            if self.use_bias
            else None
        )
        x, kernel, bias = fnn.dtypes.promote_dtype(
            x, kernel, bias, dtype=self.dtype
        )
        y = _conv_transpose2_swapdw(x, kernel)
        if bias is not None:
            y = y + bias
        return y


class _HybridConvTranspose2(fnn.Module):
    """Flax wrapper for _conv_transpose2_hybrid with the fnn.ConvTranspose
    parameter path/shape ((kh, kw, cin, cout), unflipped)."""

    features: int
    kernel_size: tuple[int, int]
    use_bias: bool = True
    kernel_init: Callable = KERAS_GLOROT_UNIFORM
    dtype: Dtype | None = None
    param_dtype: Dtype = jnp.float32

    @fnn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        kh, kw = self.kernel_size
        kernel = self.param(
            "kernel", self.kernel_init, (kh, kw, x.shape[-1], self.features),
            self.param_dtype,
        )
        bias = (
            self.param(
                "bias", jax.nn.initializers.zeros, (self.features,),
                self.param_dtype,
            )
            if self.use_bias
            else None
        )
        x, kernel, bias = fnn.dtypes.promote_dtype(
            x, kernel, bias, dtype=self.dtype
        )
        y = _conv_transpose2_hybrid(x, kernel)
        if bias is not None:
            y = y + bias
        return y


class _PackedConvTranspose2(fnn.Module):
    """Stride-2 SAME ConvTranspose as ONE stride-1 3x3 conv + depth-to-space.

    Third lowering experiment (opt-in, IMAGEGEN_CONVT_IMPL=packed). The
    full phase decomposition (_PhaseConvTranspose2) loses on four
    small-tap convs; this variant embeds all four phases' tap subsets into
    a single (3, 3, cin, 4*cout) kernel (each phase's taps W[a0::2, b0::2]
    scattered at its alignment offset, zeros elsewhere), so the whole layer
    is one MXU-friendly stride-1 SAME conv producing the 4 phases as
    channel groups, interleaved to (2H, 2W) by a single reshape/transpose.
    Works for the repo's kernels (3x3 and 4x4 at stride 2, where every
    phase's taps fit a 3-wide support at left pad 1); the conv does 9/8 of
    the minimal MACs (zero taps) in exchange for one large contraction and
    plain reverse-free conv gradients. Exactness pinned in
    tests/test_layers_convt.py."""

    features: int
    kernel_size: tuple[int, int]
    use_bias: bool = True
    kernel_init: Callable = KERAS_GLOROT_UNIFORM
    dtype: Dtype | None = None
    param_dtype: Dtype = jnp.float32

    @fnn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        kh, kw = self.kernel_size
        assert kh <= 4 and kw <= 4, "packed lowering supports k <= 4 at s=2"
        cin, cout = x.shape[-1], self.features
        kernel = self.param(
            "kernel", self.kernel_init, (kh, kw, cin, cout), self.param_dtype
        )
        bias = (
            self.param(
                "bias", jax.nn.initializers.zeros, (cout,), self.param_dtype
            )
            if self.use_bias
            else None
        )
        x, kernel, bias = fnn.dtypes.promote_dtype(
            x, kernel, bias, dtype=self.dtype
        )
        pl_h = _conv_transpose_same_pad(kh, 2)
        pl_w = _conv_transpose_same_pad(kw, 2)
        n, ih, iw, _ = x.shape

        # scatter each phase's taps into the shared 3x3 support: phase d
        # reads x[u + off + j], the packed conv reads x[u - 1 + a], so tap j
        # lands at a = off + j + 1 (0 <= a <= 2 for k in {3, 4} at s=2).
        w3 = jnp.zeros((3, 3, cin, 4 * cout), kernel.dtype)
        for dh in (0, 1):
            a0h, plh, th = _phase_dim(kh, pl_h, dh)
            for dv in (0, 1):
                a0w, plw, tw = _phase_dim(kw, pl_w, dv)
                p = 2 * dh + dv
                taps = kernel[a0h::2, a0w::2]  # (th, tw, cin, cout)
                ah, aw = 1 - plh, 1 - plw  # off + 1
                w3 = w3.at[
                    ah : ah + th, aw : aw + tw, :, p * cout : (p + 1) * cout
                ].set(taps)

        y = jax.lax.conv_general_dilated(
            x, w3, window_strides=(1, 1), padding=((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )  # (n, ih, iw, 4*cout): channel block p = phase (dh, dw)
        y = y.reshape(n, ih, iw, 2, 2, cout)
        y = y.transpose(0, 1, 3, 2, 4, 5).reshape(n, 2 * ih, 2 * iw, cout)
        if bias is not None:
            y = y + bias
        return y


class _PhaseConvTranspose2(fnn.Module):
    """Stride-2 SAME ConvTranspose as a 2x2-phase (subpixel) decomposition.

    lax.conv_transpose lowers to a conv with lhs_dilation=2; on TPU, XLA's
    backward-filter canonicalization of that base-dilated conv materializes a
    spatially-REVERSED copy of the incoming cotangent (trace: 0.92 ms/step
    for the 151 MB bf16[32,144,256,64] dy at the SNDCGAN up2 block alone,
    benchmarks/README.md). Decomposing by output phase removes lhs_dilation
    from the program entirely: output pixel (2u+dh, 2v+dw) touches only the
    kernel taps with matching parity, so the layer is exactly four stride-1
    convs with the tap subsets W[a0h::2, a0w::2] followed by a
    depth-to-space interleave — same products per output element (tiny fp
    reassociation deltas only), plain reverse-free conv gradients, and
    MXU-friendly contractions. Exactness vs the lax lowering is pinned in
    tests/test_layers_convt.py.

    Parameter path/shape is identical to fnn.ConvTranspose ((kh, kw, cin,
    cout), unflipped) so checkpoints and the Keras weights importer are
    unaffected.
    """

    features: int
    kernel_size: tuple[int, int]
    use_bias: bool = True
    kernel_init: Callable = KERAS_GLOROT_UNIFORM
    dtype: Dtype | None = None
    param_dtype: Dtype = jnp.float32

    @fnn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        kh, kw = self.kernel_size
        cin = x.shape[-1]
        kernel = self.param(
            "kernel", self.kernel_init, (kh, kw, cin, self.features),
            self.param_dtype,
        )
        bias = (
            self.param(
                "bias", jax.nn.initializers.zeros, (self.features,),
                self.param_dtype,
            )
            if self.use_bias
            else None
        )
        x, kernel, bias = fnn.dtypes.promote_dtype(
            x, kernel, bias, dtype=self.dtype
        )
        pl_h = _conv_transpose_same_pad(kh, 2)
        pl_w = _conv_transpose_same_pad(kw, 2)
        n, ih, iw, _ = x.shape

        phases = []
        for dh in (0, 1):
            a0h, plh, th = _phase_dim(kh, pl_h, dh)
            for dw in (0, 1):
                a0w, plw, tw = _phase_dim(kw, pl_w, dw)
                wp = kernel[a0h::2, a0w::2]
                yp = jax.lax.conv_general_dilated(
                    x, wp, window_strides=(1, 1),
                    padding=((plh, th - 1 - plh), (plw, tw - 1 - plw)),
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                )
                phases.append(yp)
        # interleave: y[n, 2u+dh, 2v+dw, o] = phases[2*dh+dw][n, u, v, o]
        y = jnp.stack(phases, axis=3)  # (n, ih, iw, 4, o)
        y = y.reshape(n, ih, iw, 2, 2, self.features)
        y = y.transpose(0, 1, 3, 2, 4, 5).reshape(
            n, 2 * ih, 2 * iw, self.features
        )
        if bias is not None:
            y = y + bias
        return y


class ConvTranspose(fnn.Module):
    """2D transposed convolution, NHWC, SAME padding => out = in * stride.

    Fills the role of Keras Conv2DTranspose in the reference generators
    (sndcgan/SNDCGAN.py:36-61, wasserstein_gan/WGAN.py:116-127,
    cyclegan/CycleGAN.py:152). Implemented via `lax.conv_transpose`
    (fractionally-strided conv) — architecturally equivalent to Keras's
    gradient-of-conv formulation (same output shape and parameter count;
    kernels are learned so the orientation difference is immaterial).
    The stride-1 SAME odd-kernel case lowers to a plain `fnn.Conv` BY
    DEFAULT (set IMAGEGEN_CONVT_IMPL=lax to force the generic lowering for
    A/B): a stride-1 unflipped-kernel conv_transpose is mathematically a
    plain conv, and on this jax version the two produce IDENTICAL StableHLO
    (pinned structurally in tests/test_layers_convt.py), so the lowering is
    exact by construction and guards against any future transpose-rule
    regression (an earlier XLA trace attributed a 151 MB activation reverse
    to conv_transpose's dW at the to_rgb shape). The stride-2 SAME case
    defaults to the "swapdw" lowering (lax fwd/dx, bit-identical, plus a
    role-swapped single-conv dW that avoids XLA's 151 MB activation reverses
    — measured 44.40 -> 42.57 ms/step at the headline config; set
    IMAGEGEN_CONVT_IMPL=lax for the generic lowering). Older opt-in
    experiments (phase/hybrid/packed) measured slower-or-wash — inline notes.
    """

    features: int
    kernel_size: tuple[int, int]
    strides: tuple[int, int] = (1, 1)
    padding: str = "SAME"
    use_bias: bool = True
    kernel_init: Callable = KERAS_GLOROT_UNIFORM
    dtype: Dtype | None = None
    param_dtype: Dtype = jnp.float32

    @fnn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        import os

        impl = os.environ.get("IMAGEGEN_CONVT_IMPL", "")
        impl_s2 = impl or "swapdw"  # default-on; "lax" = generic escape hatch
        if (
            self.strides == (2, 2)
            and self.padding == "SAME"
            and impl_s2 in ("phase", "hybrid", "packed", "swapdw")
        ):
            # "swapdw" is the measured DEFAULT (44.40 -> 42.57 ms/step at the
            # headline config, chip A/B 2026-08-18): lax fwd/dx (bit-identical)
            # + the role-swapped single-conv dW that never materializes the
            # three 151 MB activation reverses XLA's backward-filter
            # canonicalization emits for lhs-dilated convs. The remaining
            # reverses in the compiled step are <=4 MB kernel flips on the dx
            # path. Exactness pinned in tests/test_layers_convt.py.
            # Two older A/B levers stay opt-in, both measured LOSING or tying
            # XLA's dilated-conv lowering:
            # - "hybrid": lax fwd/dx + reverse-free per-PHASE dW. Removes the
            #   reverses but the four per-phase backward-filter convs cost the
            #   same back: 46.77 vs 46.84 ms/step resident — a wash.
            # - "phase": full 2x2 phase decomposition (four 2-tap-per-dim
            #   stride-1 convs + depth-to-space). 7 ms/step SLOWER (53.9 vs
            #   46.8): the small-tap convs + interleave lose more MXU
            #   efficiency than the reverses cost.
            mod = {
                "phase": _PhaseConvTranspose2,
                "hybrid": _HybridConvTranspose2,
                "packed": _PackedConvTranspose2,
                "swapdw": _SwapDWConvTranspose2,
            }[impl_s2]
            return mod(
                features=self.features,
                kernel_size=self.kernel_size,
                use_bias=self.use_bias,
                kernel_init=self.kernel_init,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name="ConvTranspose_0",
            )(x)
        if (
            impl != "lax"  # default-on; "lax" is the generic escape hatch
            and self.strides == (1, 1)
            and self.padding == "SAME"
            and self.kernel_size[0] % 2 == 1
            and self.kernel_size[1] % 2 == 1
        ):
            # A stride-1 SAME odd-kernel ConvTranspose (transpose_kernel=False,
            # flax's default: lax.conv_transpose == conv_general_dilated with
            # lhs_dilation=1, unflipped kernel) is EXACTLY a plain conv with
            # the same (kh, kw, cin, cout) kernel. On the current jax the two
            # lowerings emit IDENTICAL StableHLO for fwd AND grad (pinned in
            # tests/test_layers_convt.py::test_s1_fast_path_hlo_identical), so
            # this path is exact by construction; it exists to keep the
            # standard reverse-free conv gradient pinned structurally (an
            # earlier XLA trace attributed a 151 MB bf16[32,144,256,64]
            # activation reverse costing 0.92 ms/step to conv_transpose's dW
            # at the to_rgb shape — benchmarks/README.md). Identical parameter
            # path via the explicit name below.
            return fnn.Conv(
                features=self.features,
                kernel_size=self.kernel_size,
                strides=(1, 1),
                padding="SAME",
                use_bias=self.use_bias,
                kernel_init=self.kernel_init,
                bias_init=jax.nn.initializers.zeros,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name="ConvTranspose_0",
            )(x)
        return fnn.ConvTranspose(
            features=self.features,
            kernel_size=self.kernel_size,
            strides=self.strides,
            padding=self.padding,
            use_bias=self.use_bias,
            kernel_init=self.kernel_init,
            bias_init=jax.nn.initializers.zeros,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )(x)


class BatchNorm(fnn.Module):
    """BatchNorm with Keras defaults: momentum 0.99, epsilon 1e-3.

    `use_running_average=True` reproduces Keras `training=False` inference
    behavior; batch statistics live in the `batch_stats` collection.
    """

    use_running_average: bool
    momentum: float = 0.99
    epsilon: float = 1e-3
    dtype: Dtype | None = None
    param_dtype: Dtype = jnp.float32

    @fnn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        return fnn.BatchNorm(
            use_running_average=self.use_running_average,
            momentum=self.momentum,
            epsilon=self.epsilon,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )(x)


class InstanceNorm(fnn.Module):
    """Instance normalization over spatial dims of an NHWC tensor.

    Default: per-(sample, channel) statistics over (H, W) — the textbook
    CycleGAN norm. `quirk_axis1=True` reproduces the reference's
    `tfa.InstanceNormalization(axis=1)` on NHWC (cyclegan/CycleGAN.py:65-66),
    which treats the H axis as "channels" and normalizes each H-slice over
    (W, C) with per-H-position scale/offset.

    beta/gamma use the Keras "random_uniform" (U(-0.05,0.05)) initializer to
    match the reference.
    """

    epsilon: float = 1e-3  # tfa InstanceNormalization default epsilon=1e-3
    quirk_axis1: bool = False
    use_scale: bool = True
    use_bias: bool = True
    # "xla" | "pallas" | "auto": route the corrected per-channel path through
    # the fused single-HBM-pass Pallas kernel (ops/pallas/instance_norm).
    backend: str = "xla"
    dtype: Dtype | None = None
    param_dtype: Dtype = jnp.float32

    @fnn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        if (
            not self.quirk_axis1
            and self.backend != "xla"
            and self.use_scale
            and self.use_bias
        ):
            from imagegeneration_tpu.ops.pallas.instance_norm import instance_norm

            gamma = self.param(
                "scale", KERAS_RANDOM_UNIFORM, (x.shape[-1],), self.param_dtype
            )
            beta = self.param(
                "bias", KERAS_RANDOM_UNIFORM, (x.shape[-1],), self.param_dtype
            )
            y = instance_norm(
                x, gamma, beta, self.epsilon, False, self.backend
            )
            return y.astype(self.dtype or x.dtype)
        if self.quirk_axis1:
            # Per-H-position parameters, normalized over (W, C).
            reduction_axes = (2, 3)
            param_shape = (x.shape[1], 1, 1)  # broadcasts over (H, W, C)
        else:
            # Per-channel parameters, normalized over (H, W).
            reduction_axes = (1, 2)
            param_shape = (x.shape[-1],)
        orig_dtype = x.dtype
        # bf16 upcasts to f32 for the statistics; f64 stays f64 (the f64
        # mesh-equivalence tests depend on full-precision reductions).
        ct = jnp.promote_types(x.dtype, jnp.float32)
        x32 = x.astype(ct)
        mean = jnp.mean(x32, axis=reduction_axes, keepdims=True)
        var = jnp.var(x32, axis=reduction_axes, keepdims=True)
        y = (x32 - mean) * jax.lax.rsqrt(var + self.epsilon)
        if self.use_scale:
            gamma = self.param(
                "scale", KERAS_RANDOM_UNIFORM, param_shape, self.param_dtype
            )
            y = y * gamma.astype(ct)
        if self.use_bias:
            beta = self.param(
                "bias", KERAS_RANDOM_UNIFORM, param_shape, self.param_dtype
            )
            y = y + beta.astype(ct)
        return y.astype(self.dtype or orig_dtype)


class Dropout(fnn.Module):
    """Inverted dropout (Keras semantics: scale kept units by 1/(1-rate))."""

    rate: float

    @fnn.compact
    def __call__(self, x: jax.Array, deterministic: bool) -> jax.Array:
        return fnn.Dropout(rate=self.rate, deterministic=deterministic)(x)


class ResBlock(fnn.Module):
    """CycleGAN residual block with the reference's exact (quirky) op order.

    conv3x3 -> IN -> ReLU -> conv3x3 -> add(residual) -> ReLU -> IN
    (cyclegan/CycleGAN.py:84-92 — note the *post-add* normalization and the
    missing pre-add norm on the second conv, faithfully reproduced).
    """

    features: int
    quirk_axis1: bool = False
    in_backend: str = "xla"
    dtype: Dtype | None = None
    param_dtype: Dtype = jnp.float32

    @fnn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        fx = Conv(
            self.features, (3, 3), (1, 1), "SAME",
            dtype=self.dtype, param_dtype=self.param_dtype, name="conv1",
        )(x)
        fx = InstanceNorm(
            quirk_axis1=self.quirk_axis1, backend=self.in_backend,
            dtype=self.dtype, param_dtype=self.param_dtype, name="in1",
        )(fx)
        fx = jax.nn.relu(fx)
        fx = Conv(
            self.features, (3, 3), (1, 1), "SAME",
            dtype=self.dtype, param_dtype=self.param_dtype, name="conv2",
        )(fx)
        out = jax.nn.relu(x + fx)
        out = InstanceNorm(
            quirk_axis1=self.quirk_axis1, backend=self.in_backend,
            dtype=self.dtype, param_dtype=self.param_dtype, name="in2",
        )(out)
        return out
