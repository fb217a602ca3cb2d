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
    """tr(sqrtm(cov_a @ cov_b)) — the FID cross term from full covariances.

    newton_schulz: device matmuls; only stable for reasonably-conditioned
    full-rank inputs — for the realistic FID regime (samples << dims, so the
    covariances are strongly rank-deficient) use
    `trace_sqrtm_product_lowrank`, which is exact and avoids forming the big
    matrices at all. scipy: the reference's host path with `covmean.real`
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


def trace_sqrtm_product_lowrank(
    feats_a: np.ndarray, feats_b: np.ndarray
) -> float:
    """Exact tr(sqrtm(cov_a @ cov_b)) directly from feature matrices.

    With X = centered(feats_a)/sqrt(n-1) (n x d) and Y = centered(feats_b)/
    sqrt(m-1) (m x d): cov_a @ cov_b = X^T X Y^T Y, whose nonzero spectrum
    equals that of (X Y^T)(Y X^T) = M M^T for the tiny M = X Y^T (n x m).
    Hence tr sqrtm(cov_a cov_b) = sum of singular values of M — the nuclear
    norm of an n x m matrix, computed by one small SVD. Exact for any rank
    (the 4096-dim discriminator-feature FID with <=512 samples never needs a
    4096^2 sqrtm), numerically stable, and O(n m d) instead of O(d^3).
    """
    a = np.asarray(feats_a, np.float64)
    b = np.asarray(feats_b, np.float64)
    x = (a - a.mean(axis=0)) / np.sqrt(max(a.shape[0] - 1, 1))
    y = (b - b.mean(axis=0)) / np.sqrt(max(b.shape[0] - 1, 1))
    m = x @ y.T
    return float(np.linalg.svd(m, compute_uv=False).sum())
