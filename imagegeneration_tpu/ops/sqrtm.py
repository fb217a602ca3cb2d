"""Matrix square root for FID: device Newton–Schulz + host scipy fallback.

The reference computes `scipy.linalg.sqrtm(cov_fake @ cov_real)` on host
(sndcgan/generator_evaluation.py:49). XLA has no sqrtm primitive, so the
TPU-native path is the Newton–Schulz iteration — pure matmuls that ride the
MXU, O(k·n^3) with k≈25, vastly faster than host sqrtm for the 4096^2
covariance the discriminator-feature FID produces. scipy remains available
for exactness checks (`method="scipy"`).

Note sqrtm(cov_f @ cov_r) of a *product* of PSD matrices: the product is
similar to a PSD matrix, with non-negative spectrum — Newton–Schulz converges
for any matrix with no real-negative eigenvalues once normalized.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def sqrtm_newton_schulz(a: jax.Array, num_iters: int = 30) -> jax.Array:
    """Square root of a (near-)PSD matrix via the Denman–Beavers/Newton–Schulz
    coupled iteration, in float32 on device."""
    a = a.astype(jnp.float32)
    n = a.shape[0]
    norm = jnp.sqrt(jnp.sum(a * a))
    norm = jnp.maximum(norm, 1e-30)
    y0 = a / norm
    z0 = jnp.eye(n, dtype=jnp.float32)
    eye3 = 3.0 * jnp.eye(n, dtype=jnp.float32)

    def body(_, yz):
        y, z = yz
        t = 0.5 * (eye3 - z @ y)
        return (y @ t, t @ z)

    y, _ = jax.lax.fori_loop(0, num_iters, body, (y0, z0))
    return y * jnp.sqrt(norm)


def trace_sqrtm_product(
    cov_a: np.ndarray, cov_b: np.ndarray, method: str = "newton_schulz"
) -> float:
    """tr(sqrtm(cov_a @ cov_b)) — the FID cross term.

    newton_schulz: device matmuls (TPU fast path). For the FID use case the
    product's spectrum is non-negative; tiny negative noise is clipped by
    taking the real part, matching the reference's `covmean.real`
    (generator_evaluation.py:51-52).
    """
    if method == "scipy":
        from scipy.linalg import sqrtm

        covmean = sqrtm(np.dot(cov_a, cov_b))
        if np.iscomplexobj(covmean):
            covmean = covmean.real
        return float(np.trace(covmean))
    prod = jnp.asarray(cov_a, jnp.float32) @ jnp.asarray(cov_b, jnp.float32)
    s = sqrtm_newton_schulz(prod)
    return float(jnp.trace(s))
