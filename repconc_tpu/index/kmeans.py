"""k-means in pure XLA — the TPU replacement for faiss's C++/CUDA k-means.

The reference delegates PQ codebook training to faiss `ProductQuantizer`
(per-subspace k-means with GPU-assisted assignment, run_warmup.py:92-113).
Here Lloyd's algorithm is a jitted mesh program:

* assignment: ||x||^2 - 2 x.C^T + ||C||^2 argmin — one MXU matmul per chunk;
* update: one-hot-matmul segment sums (counts = 1.onehot, sums = onehot^T x)
  — scatter-add expressed as a matmul, which is how the MXU likes it;
* data parallel: shard N over the mesh axis, `psum` the (sums, counts);
* empty clusters are re-seeded by splitting the most populated cluster with
  a +/- epsilon perturbation (faiss's split policy).

Product-quantizer training is `vmap` of this over the M subspaces: all M
k-means problems run as one batched program instead of faiss's sequential
per-subspace loop.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_HIGH = jax.lax.Precision.HIGHEST


def assign(x: jnp.ndarray, centroids: jnp.ndarray) -> jnp.ndarray:
    """Nearest-centroid assignment. x: (N, d); centroids: (K, d) -> (N,) int32."""
    x_sq = jnp.sum(x * x, axis=-1, keepdims=True)  # (N, 1)
    c_sq = jnp.sum(centroids * centroids, axis=-1)  # (K,)
    xc = jnp.dot(x, centroids.T, preferred_element_type=jnp.float32,
                 precision=_HIGH)
    dist = x_sq - 2.0 * xc + c_sq[None, :]
    return jnp.argmin(dist, axis=-1).astype(jnp.int32)


def _accumulate(x: jnp.ndarray, codes: jnp.ndarray, K: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Cluster sums and counts via one-hot matmul (MXU scatter-add)."""
    onehot = jax.nn.one_hot(codes, K, dtype=x.dtype)  # (N, K)
    sums = jnp.einsum("nk,nd->kd", onehot, x,
                      preferred_element_type=jnp.float32, precision=_HIGH)
    counts = jnp.sum(onehot, axis=0)
    return sums, counts


# Auto-chunk threshold for the (N, K) buffers inside lloyd_step (elements).
# The IVF coarse build at MS MARCO scale is 262,144 train points x 5,000
# cells: the assignment matmul AND the one-hot segment-sum each materialize
# a 5.2 GB (N, K) fp32 buffer — two of those transiently alongside the data
# is an HBM-OOM risk on a 16 GB chip (which surfaces only as "worker
# crashed" through this environment's tunnel). Above the threshold the
# row dimension is lax.map-chunked (same convention as quant/codebook.py);
# results are EXACT either way (sums/counts/err are plain sums over rows).
_CHUNK_ELEMS = 2 ** 27  # 512 MB fp32 per (rows, K) buffer


def _assign_accumulate(x, centroids):
    """(codes-free) fused assignment + cluster stats for one Lloyd step:
    returns (sums (K, d), counts (K,), err scalar), chunking rows when the
    (N, K) intermediates would exceed _CHUNK_ELEMS."""
    K = centroids.shape[0]
    N, d = x.shape
    if N * K <= _CHUNK_ELEMS or N <= 1:
        codes = assign(x, centroids)
        sums, counts = _accumulate(x, codes, K)
        rec = jnp.take(centroids, codes, axis=0)
        err = jnp.sum((x - rec) ** 2)
        return sums, counts, err

    rows = max(1, _CHUNK_ELEMS // K)
    c = -(-N // rows)
    rows_p = -(-N // c)
    pad = c * rows_p - N
    xp = jnp.pad(x, ((0, pad), (0, 0)))
    mask = jnp.pad(jnp.ones((N,), x.dtype), (0, pad))

    def chunk_fn(args):
        xc, mc = args
        codes = assign(xc, centroids)
        onehot = jax.nn.one_hot(codes, K, dtype=xc.dtype) * mc[:, None]
        sums = jnp.einsum("nk,nd->kd", onehot, xc,
                          preferred_element_type=jnp.float32, precision=_HIGH)
        counts = jnp.sum(onehot, axis=0)
        rec = jnp.take(centroids, codes, axis=0)
        err = jnp.sum(mc * jnp.sum((xc - rec) ** 2, axis=-1))
        return sums, counts, err

    sums, counts, err = jax.lax.map(
        chunk_fn, (xp.reshape(c, rows_p, d), mask.reshape(c, rows_p)))
    return sums.sum(0), counts.sum(0), err.sum()


def lloyd_step(
    x: jnp.ndarray,
    centroids: jnp.ndarray,
    axis_name: Optional[str] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One Lloyd iteration. Returns (new_centroids, mean squared error).
    The empty-cluster split is deterministic (distinct sin-based jitter per
    empty slot) — no RNG, so the step stays scan/jit-friendly."""
    K = centroids.shape[0]
    sums, counts, err = _assign_accumulate(x, centroids)
    n = jnp.asarray(x.shape[0], dtype=jnp.float32)
    if axis_name is not None:
        sums = jax.lax.psum(sums, axis_name)
        counts = jax.lax.psum(counts, axis_name)
        err = jax.lax.psum(err, axis_name)
        n = jax.lax.psum(n, axis_name)

    new_centroids = sums / jnp.maximum(counts, 1.0)[:, None]
    # empty clusters: split the largest cluster (faiss policy). Each empty
    # slot gets a DISTINCT deterministic perturbation of the donor so
    # simultaneous empties don't collapse into duplicates.
    empty = counts < 0.5
    biggest = jnp.argmax(counts)
    donor = new_centroids[biggest]
    slot = jnp.arange(K, dtype=new_centroids.dtype)[:, None]
    dim = jnp.arange(new_centroids.shape[1], dtype=new_centroids.dtype)[None, :]
    jitter = 1e-3 * jnp.sin(slot * 12.9898 + dim * 78.233)
    new_centroids = jnp.where(empty[:, None],
                              donor[None, :] * (1.0 + jitter) + jitter,
                              new_centroids)
    return new_centroids, err / jnp.maximum(n, 1.0)


def kmeans_plusplus_init(x: jnp.ndarray, K: int, key: jax.Array) -> jnp.ndarray:
    """k-means++ seeding as a lax.scan: sample each next seed with probability
    proportional to its squared distance from the chosen set. Vmappable, so
    all M PQ subspaces seed in one batched program."""
    n = x.shape[0]
    k0, kseq = jax.random.split(key)
    first = jnp.take(x, jax.random.randint(k0, (), 0, n), axis=0)
    d2 = jnp.sum((x - first[None, :]) ** 2, axis=-1)

    def body(carry, step_key):
        d2, = carry
        logits = jnp.log(jnp.maximum(d2, 1e-30))
        idx = jax.random.categorical(step_key, logits)
        nxt = jnp.take(x, idx, axis=0)
        d2 = jnp.minimum(d2, jnp.sum((x - nxt[None, :]) ** 2, axis=-1))
        return (d2,), nxt

    _, rest = jax.lax.scan(body, (d2,), jax.random.split(kseq, K - 1))
    return jnp.concatenate([first[None, :], rest], axis=0)


def kmeans_fit(
    x: jnp.ndarray,
    K: int,
    iters: int = 25,
    key: Optional[jax.Array] = None,
    axis_name: Optional[str] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fit K centroids to x (N, d). Returns (centroids (K, d), final mse).

    Init: k-means++ seeding. With axis_name, x is the per-device shard and
    init must be passed in via `kmeans_fit_from` instead (global seeding is
    the caller's job).
    """
    if axis_name is not None:
        raise ValueError(
            "kmeans_fit under an axis_name would run k-means++ seeding on "
            "each device's LOCAL shard (same key, different x -> divergent "
            "per-device centroids, silently wrong psum'd Lloyd steps); seed "
            "globally and call kmeans_fit_from instead")
    if key is None:
        key = jax.random.key(2022)
    init = kmeans_plusplus_init(x, K, key)
    return kmeans_fit_from(x, init, iters)


def kmeans_fit_from(
    x: jnp.ndarray,
    init_centroids: jnp.ndarray,
    iters: int = 25,
    axis_name: Optional[str] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    def body(carry, _):
        cent, _ = carry
        cent, mse = lloyd_step(x, cent, axis_name)
        return (cent, mse), mse

    (centroids, mse), _ = jax.lax.scan(
        body, (init_centroids, jnp.asarray(0.0, dtype=jnp.float32)),
        None, length=iters)
    return centroids, mse


def balanced_kmeans_fit(
    x: jnp.ndarray,
    K: int,
    iters: int = 25,
    key: Optional[jax.Array] = None,
    sk_epsilon: float = 0.05,
    sk_iters: int = 30,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Balanced k-means: Lloyd updates under a Sinkhorn uniform-assignment
    constraint — the same constrained-clustering idea RepCONC applies to PQ
    codebooks, reused for the IVF coarse quantizer. Near-uniform cluster
    sizes mean tight static posting-list padding on TPU (small Lpad, little
    waste, no spill blowup). Returns (centroids (K, d), balanced mse).

    Memory note: unlike the plain lloyd_step (row-chunked above
    _CHUNK_ELEMS), the Sinkhorn constraint couples ALL rows through its
    column marginals, so the full (N, K) cost matrix is materialized here —
    at the MS MARCO-scale coarse build (262k x 5000, ~5 GB fp32) prefer the
    default unbalanced build or shrink max_train_points."""
    from repconc_tpu.quant.sinkhorn import sinkhorn_assign

    if key is None:
        key = jax.random.key(2022)
    centroids = kmeans_plusplus_init(x, K, key)

    def body(carry, _):
        cent, _ = carry
        x_sq = jnp.sum(x * x, axis=-1, keepdims=True)
        c_sq = jnp.sum(cent * cent, axis=-1)
        xc = jnp.dot(x, cent.T, preferred_element_type=jnp.float32,
                     precision=_HIGH)
        dist = x_sq - 2.0 * xc + c_sq[None, :]          # (N, K)
        codes = sinkhorn_assign(dist[None], sk_epsilon, sk_iters)[:, 0]  # (N,)
        sums, counts = _accumulate(x, codes, K)
        cent = sums / jnp.maximum(counts, 1.0)[:, None]
        rec = jnp.take(cent, codes, axis=0)
        mse = jnp.mean(jnp.sum((x - rec) ** 2, axis=-1))
        return (cent, mse), None

    (centroids, mse), _ = jax.lax.scan(
        body, (centroids, jnp.asarray(0.0, jnp.float32)), None, length=iters)
    return centroids, mse


def pq_fit(
    x: jnp.ndarray,
    M: int,
    K: int = 256,
    iters: int = 25,
    key: Optional[jax.Array] = None,
    init_centroids: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Train a product quantizer: M independent k-means over subspaces.

    x: (N, D) with D % M == 0. Returns (centroids (M, K, dsub), mse (M,)).
    All M subproblems run as ONE batched XLA program via vmap — the TPU-native
    counterpart of faiss's per-subspace loop (run_warmup.py:101-113).
    """
    N, D = x.shape
    dsub = D // M
    xs = x.reshape(N, M, dsub).transpose(1, 0, 2)  # (M, N, dsub)
    if init_centroids is None:
        if key is None:
            key = jax.random.key(2022)
        keys = jax.random.split(key, M)
        centroids, mse = jax.vmap(
            lambda xi, ki: kmeans_fit(xi, K, iters, ki))(xs, keys)
    else:
        centroids, mse = jax.vmap(
            lambda xi, ci: kmeans_fit_from(xi, ci, iters))(xs, init_centroids)
    return centroids, mse


def pq_encode_chunked(
    x: jnp.ndarray, centroids: jnp.ndarray, chunk: int = 65536
) -> np.ndarray:
    """Assign PQ codes for a large (host) array in device-sized chunks.

    Returns (N, M) uint8 on host. Index-build path (not jitted end-to-end;
    streams host->device per chunk).
    """
    N = x.shape[0]
    M = centroids.shape[0]
    cent_dev = jnp.asarray(centroids)
    out = np.empty((N, M), dtype=np.uint8)
    for start in range(0, N, chunk):
        stop = min(start + chunk, N)
        out[start:stop] = np.asarray(
            _pq_assign(jnp.asarray(x[start:stop]), cent_dev)).astype(np.uint8)
    return out


@jax.jit
def _pq_assign(xc, centroids):
    """(n, D) x (M, K, dsub) -> (n, M) int32 codes. Module-level jit so
    repeated pq_encode_chunked calls (warmup loops over corpus slices) hit
    one compilation cache instead of building a fresh wrapper per call;
    centroids are an argument, never a captured compile-payload constant."""
    M = centroids.shape[0]
    xs = xc.reshape(xc.shape[0], M, -1).transpose(1, 0, 2)
    return jax.vmap(assign)(xs, centroids).T
