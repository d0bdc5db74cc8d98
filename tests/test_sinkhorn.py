"""Sinkhorn properties: marginals, reference-algorithm parity, distributed equivalence."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from repconc_tpu.quant.sinkhorn import sinkhorn_log, sinkhorn_assign, center_distances


def reference_sinkhorn_np(out, epsilon, iterations):
    """Float64 multiplicative Sinkhorn, the reference's numerical recipe
    (modeling_repconc.py:137-165) re-expressed in numpy with (M, B, K) layout."""
    Q = np.exp(out.astype(np.float64) / epsilon)  # (M, B, K)
    M, B, K = Q.shape
    sum_Q = Q.sum(axis=(1, 2), keepdims=True)
    Q /= sum_Q
    for _ in range(iterations):
        row = Q.sum(axis=1, keepdims=True)  # per-centroid mass
        Q /= row
        Q /= K
        col = Q.sum(axis=2, keepdims=True)  # per-sample mass
        Q /= col
        Q /= B
    Q *= B
    return Q


def make_distances(rng, M=4, B=64, K=16):
    x = rng.normal(size=(B, M, 8))
    c = rng.normal(size=(M, K, 8))
    d = ((x[:, :, None, :] - c[None, :, :, :]) ** 2).sum(-1)  # (B, M, K)
    return np.transpose(d, (1, 0, 2)).astype(np.float32)  # (M, B, K)


def test_marginals(rng):
    d = make_distances(rng)
    centered = center_distances(jnp.asarray(d))
    logq = sinkhorn_log(-centered, epsilon=0.05, iterations=100)
    Q = np.asarray(jnp.exp(logq))
    M, B, K = Q.shape
    # columns (per sample) sum to 1
    np.testing.assert_allclose(Q.sum(-1), np.ones((M, B)), rtol=1e-4)
    # rows (per centroid) sum to B/K after the B rescale
    np.testing.assert_allclose(Q.sum(1), np.full((M, K), B / K), rtol=1e-2)


def test_matches_reference_multiplicative(rng):
    d = make_distances(rng)
    centered = np.asarray(center_distances(jnp.asarray(d)))
    Q_ref = reference_sinkhorn_np(-centered, 0.05, 100)
    logq = sinkhorn_log(jnp.asarray(-centered), 0.05, 100)
    Q = np.asarray(jnp.exp(logq))
    np.testing.assert_allclose(Q, Q_ref, rtol=1e-3, atol=1e-5)
    # identical hard assignments
    np.testing.assert_array_equal(Q.argmax(-1), Q_ref.argmax(-1))


def test_small_epsilon_stable(rng):
    """The production setting eps=0.003 must not overflow at fp32 in log space
    (the reference needed float64 here)."""
    d = make_distances(rng)
    codes = sinkhorn_assign(jnp.asarray(d), epsilon=0.003, iterations=100)
    assert np.isfinite(np.asarray(codes)).all()
    # balanced-ish: each centroid used at least once when B >> K
    d2 = make_distances(rng, M=2, B=256, K=16)
    codes2 = np.asarray(sinkhorn_assign(jnp.asarray(d2), 0.003, 100))
    counts = np.bincount(codes2[:, 0], minlength=16)
    assert counts.min() > 0, counts


def test_distributed_equivalence(rng):
    """Sharded sinkhorn over an 8-device mesh == single-device on the full batch."""
    M, B, K = 2, 64, 16
    d = make_distances(rng, M=M, B=B, K=K)  # (M, B, K)

    single = np.asarray(sinkhorn_assign(jnp.asarray(d), 0.05, 50))

    mesh = Mesh(np.array(jax.devices()[:8]), ("dp",))

    def sharded_fn(dist_bmk):
        # per-device shard: (B/8, M, K) in batch-major layout
        d_mbk = dist_bmk.transpose(1, 0, 2)
        return sinkhorn_assign(d_mbk, 0.05, 50, axis_name="dp")

    d_bmk = jnp.asarray(d.transpose(1, 0, 2))  # (B, M, K) batch-major for sharding
    fn = shard_map(sharded_fn, mesh=mesh,
                   in_specs=P("dp"), out_specs=P("dp"))
    sharded = np.asarray(fn(d_bmk))
    np.testing.assert_array_equal(sharded, single)


def test_center_distances_range(rng):
    d = make_distances(rng)
    c = np.asarray(center_distances(jnp.asarray(d)))
    assert c.max() <= 1.0 + 1e-5
    assert c.min() >= -1.0 - 1e-5
