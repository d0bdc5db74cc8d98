"""k-means / PQ / OPQ training tests."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from repconc_tpu.index.kmeans import assign, kmeans_fit, kmeans_fit_from, pq_fit
from repconc_tpu.index.opq import opq_fit, random_rotation, subsample_for_training


def clustered_data(rng, K=8, per=64, d=16, spread=0.05):
    centers = rng.normal(size=(K, d)).astype(np.float32) * 3
    pts = centers[np.repeat(np.arange(K), per)] + \
        rng.normal(size=(K * per, d)).astype(np.float32) * spread
    perm = rng.permutation(len(pts))
    return pts[perm].astype(np.float32), centers


def test_assign_bruteforce(rng):
    x = rng.normal(size=(32, 8)).astype(np.float32)
    c = rng.normal(size=(5, 8)).astype(np.float32)
    codes = np.asarray(assign(jnp.asarray(x), jnp.asarray(c)))
    d = ((x[:, None, :] - c[None]) ** 2).sum(-1)
    np.testing.assert_array_equal(codes, d.argmin(-1))


def test_kmeans_recovers_separated_clusters(rng):
    x, centers = clustered_data(rng)
    cent, mse = kmeans_fit(jnp.asarray(x), K=8, iters=30)
    cent = np.asarray(cent)
    # every true center has a learned centroid within the cluster spread
    d = np.sqrt(((centers[:, None] - cent[None]) ** 2).sum(-1)).min(1)
    assert d.max() < 0.15, d
    assert float(mse) < 0.1


def test_kmeans_monotone_improvement(rng):
    x, _ = clustered_data(rng, spread=0.5)
    xj = jnp.asarray(x)
    _, mse5 = kmeans_fit(xj, K=8, iters=5)
    _, mse30 = kmeans_fit(xj, K=8, iters=30)
    assert float(mse30) <= float(mse5) + 1e-6


def test_kmeans_empty_cluster_reseed(rng):
    # K > number of distinct points forces empty clusters: must stay finite
    x = np.repeat(rng.normal(size=(3, 4)).astype(np.float32), 10, axis=0)
    cent, mse = kmeans_fit(jnp.asarray(x), K=8, iters=10)
    assert np.isfinite(np.asarray(cent)).all()


def test_distributed_kmeans_matches_single(rng):
    x, _ = clustered_data(rng, K=4, per=64, d=8)
    init = jnp.asarray(x[:16])  # same init both paths
    mesh = Mesh(np.array(jax.devices()[:8]), ("dp",))

    # one Lloyd step: assignments identical, sums differ only by reduce order
    single1, _ = kmeans_fit_from(jnp.asarray(x), init, iters=1)
    fn1 = shard_map(
        lambda xs, ci: kmeans_fit_from(xs, ci, iters=1, axis_name="dp"),
        mesh=mesh, in_specs=(P("dp"), P()), out_specs=(P(), P()))
    dist1, _ = fn1(jnp.asarray(x), init)
    np.testing.assert_allclose(np.asarray(single1), np.asarray(dist1),
                               rtol=1e-4, atol=1e-5)

    # many steps: trajectories may diverge at borderline points (fp reduce
    # order), but final quantization quality must agree closely
    _, mse_s = kmeans_fit_from(jnp.asarray(x), init, iters=10)
    fn = shard_map(
        lambda xs, ci: kmeans_fit_from(xs, ci, iters=10, axis_name="dp"),
        mesh=mesh, in_specs=(P("dp"), P()), out_specs=(P(), P()))
    _, mse_d = fn(jnp.asarray(x), init)
    np.testing.assert_allclose(float(mse_s), float(mse_d), rtol=0.05)


def test_pq_fit_reduces_error(rng):
    x = rng.normal(size=(2048, 32)).astype(np.float32)
    cent, mse = pq_fit(jnp.asarray(x), M=4, K=16, iters=20)
    assert cent.shape == (4, 16, 8)
    # reconstruction error below variance-of-data baseline
    baseline = x.var() * 32
    assert float(mse.sum()) < baseline


def test_random_rotation_orthogonal():
    R = np.asarray(random_rotation(32, jax.random.key(0)))
    np.testing.assert_allclose(R @ R.T, np.eye(32), atol=1e-4)


def test_opq_beats_pq_on_correlated_data(rng):
    # strongly correlated dims: a rotation should help PQ a lot
    n, d = 4096, 32
    z = rng.normal(size=(n, d)).astype(np.float32)
    mix = rng.normal(size=(d, d)).astype(np.float32)
    mix = mix / np.linalg.norm(mix, axis=0)
    scales = np.linspace(3, 0.1, d).astype(np.float32)
    x = (z * scales) @ mix  # anisotropic + rotated

    xj = jnp.asarray(x)
    _, pq_mse = pq_fit(xj, M=4, K=16, iters=15)
    rot, cent, opq_mse = opq_fit(xj, M=4, K=16, outer_iters=10, pq_iters=3,
                                 final_pq_iters=15)
    rot = np.asarray(rot)
    # rotation orthogonal
    np.testing.assert_allclose(rot @ rot.T, np.eye(d), atol=1e-3)
    assert float(opq_mse.sum()) < float(pq_mse.sum()) * 0.95, \
        (float(opq_mse.sum()), float(pq_mse.sum()))


def test_opq_rotation_convention(rng):
    """rotated = x @ rotation.T must equal the internal training projection."""
    x = rng.normal(size=(512, 16)).astype(np.float32)
    rot, cent, _ = opq_fit(jnp.asarray(x), M=2, K=8, outer_iters=3,
                           pq_iters=2, final_pq_iters=4)
    y = x @ np.asarray(rot).T
    # norms preserved by orthogonality
    np.testing.assert_allclose(np.linalg.norm(y, axis=1),
                               np.linalg.norm(x, axis=1), rtol=1e-3)


def test_subsample(rng):
    x = rng.normal(size=(1000, 4)).astype(np.float32)
    s = subsample_for_training(x, max_points=100)
    assert s.shape == (100, 4)
    assert subsample_for_training(x, max_points=2000) is x


def test_balanced_kmeans_uniform_clusters(rng):
    from repconc_tpu.index.kmeans import balanced_kmeans_fit, assign
    import jax

    # clumpy data: standard k-means gives very uneven clusters
    x, _ = clustered_data(rng, K=4, per=200, d=8, spread=0.3)
    xj = jnp.asarray(x)
    K = 16
    std_cent, _ = kmeans_fit(xj, K, iters=15)
    bal_cent, _ = balanced_kmeans_fit(xj, K, iters=15)

    std_sizes = np.bincount(np.asarray(assign(xj, std_cent)), minlength=K)
    bal_sizes = np.bincount(np.asarray(assign(xj, bal_cent)), minlength=K)
    # balanced training tightens the max/mean ratio
    assert bal_sizes.max() / bal_sizes.mean() < std_sizes.max() / std_sizes.mean(), \
        (std_sizes.tolist(), bal_sizes.tolist())
    assert np.isfinite(np.asarray(bal_cent)).all()


def test_lloyd_chunked_matches_unchunked(rng, monkeypatch):
    """The auto-chunked (N, K) path inside lloyd_step (HBM protection for
    the MS MARCO-scale coarse build) must match the unchunked step to fp32
    summation-order tolerance, including a row count that does NOT divide
    the chunk size (the padded-row mask)."""
    from repconc_tpu.index import kmeans as km

    x = jnp.asarray(rng.normal(size=(1001, 16)).astype(np.float32))
    init = jnp.asarray(rng.normal(size=(13, 16)).astype(np.float32))
    want_c, want_mse = kmeans_fit_from(x, init, iters=4)
    # rows = _CHUNK_ELEMS // K = 77 -> 13 uneven chunks with a padded tail
    monkeypatch.setattr(km, "_CHUNK_ELEMS", 1000)
    got_c, got_mse = kmeans_fit_from(x, init, iters=4)
    np.testing.assert_allclose(np.asarray(got_c), np.asarray(want_c),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(float(got_mse), float(want_mse), rtol=1e-5)
