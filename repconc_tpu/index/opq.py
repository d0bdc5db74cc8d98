"""OPQ (Optimized Product Quantization) training in pure XLA.

Replaces the faiss `OPQMatrix` / `index_factory("OPQ{M},PQ{M}x8")` chain the
reference trains in C++ (run_warmup.py:98-122). Algorithm (OPQ-NP, Ge et al.):

repeat:
  1. rotate:        y = x R
  2. fit PQ:        few Lloyd iterations per subspace (warm-started)
  3. reconstruct:   y_hat = decode(encode(y))
  4. Procrustes:    R <- U V^T where U S V^T = svd(x^T y_hat)

Everything is jitted; the M subspace k-means run as one vmapped program and
the Procrustes solve is an XLA SVD. Convention: the returned `rotation` is
applied as `embeds @ rotation.T` — identical to the reference's use of the
faiss LinearTransform matrix A (modeling_repconc.py:98, run_warmup.py:119-122).
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from repconc_tpu.index.kmeans import assign, pq_fit

_HIGH = jax.lax.Precision.HIGHEST


def random_rotation(d: int, key: jax.Array) -> jnp.ndarray:
    """Random orthogonal matrix via QR of a Gaussian."""
    g = jax.random.normal(key, (d, d), dtype=jnp.float32)
    q, r = jnp.linalg.qr(g)
    # fix signs for determinism
    q = q * jnp.sign(jnp.diagonal(r))[None, :]
    return q


def _pq_reconstruct(y: jnp.ndarray, centroids: jnp.ndarray) -> jnp.ndarray:
    """encode+decode y (N, D) against (M, K, dsub) centroids."""
    N, D = y.shape
    M = centroids.shape[0]
    ys = y.reshape(N, M, -1).transpose(1, 0, 2)  # (M, N, dsub)
    codes = jax.vmap(assign)(ys, centroids)  # (M, N)
    rec = jax.vmap(lambda c, code: jnp.take(c, code, axis=0))(centroids, codes)
    return rec.transpose(1, 0, 2).reshape(N, D)


@partial(jax.jit, static_argnames=("M", "K", "outer_iters", "pq_iters", "final_pq_iters"))
def opq_fit(
    x: jnp.ndarray,
    M: int,
    K: int = 256,
    outer_iters: int = 20,
    pq_iters: int = 4,
    final_pq_iters: int = 25,
    key: Optional[jax.Array] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Train OPQ on x (N, D). Returns (rotation (D, D), centroids (M, K, dsub), mse).

    `rotation` follows the reference convention: rotated = x @ rotation.T.
    """
    if key is None:
        key = jax.random.key(2022)
    N, D = x.shape
    k_rot, k_pq = jax.random.split(key)
    R = random_rotation(D, k_rot)  # applied as x @ R

    # initial PQ fit on rotated data (HIGHEST like every other rotation
    # here: the default bf16 matmul would seed the codebook from rounded
    # data and make CPU-vs-TPU warmups diverge from iteration 0)
    centroids, _ = pq_fit(jnp.dot(x, R, precision=_HIGH), M, K,
                          iters=pq_iters, key=k_pq)

    def body(carry, _):
        R, centroids = carry
        y = jnp.dot(x, R, precision=_HIGH)
        centroids, _ = pq_fit(y, M, K, iters=pq_iters, init_centroids=centroids)
        y_hat = _pq_reconstruct(jnp.dot(x, R, precision=_HIGH), centroids)
        # orthogonal Procrustes: min_R ||x R - y_hat||_F
        cov = jnp.dot(x.T, y_hat, precision=_HIGH)
        u, _, vt = jnp.linalg.svd(cov, full_matrices=False)
        R = jnp.dot(u, vt, precision=_HIGH)
        return (R, centroids), None

    (R, centroids), _ = jax.lax.scan(body, (R, centroids), None, length=outer_iters)

    # final, longer PQ fit at the converged rotation
    centroids, mse = pq_fit(jnp.dot(x, R, precision=_HIGH), M, K,
                            iters=final_pq_iters, init_centroids=centroids)
    return R.T, centroids, mse


def subsample_for_training(
    x, max_points: int = 65536, seed: int = 2022
):
    """Random training subsample (faiss trains PQ on <= 256 points/centroid).

    Host-side numpy; keeps warmup memory bounded for 8.8M-doc corpora.
    """
    import numpy as np

    n = x.shape[0]
    if n <= max_points:
        return x
    rng = np.random.default_rng(seed)
    idx = rng.choice(n, size=max_points, replace=False)
    idx.sort()
    return x[idx]
