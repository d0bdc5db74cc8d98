"""IVF-PQ index tests: build invariants, probe, recall vs brute force."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from repconc_tpu.index.adc import adc_search
from repconc_tpu.index.ivf import IVFIndex, build_ivf, probe_cells, search_xla
from repconc_tpu.index.kmeans import pq_fit, pq_encode_chunked


@pytest.fixture(scope="module")
def built():
    rng = np.random.default_rng(3)
    N, D, M, K = 5000, 32, 4, 16
    # clustered corpus so IVF pruning is meaningful
    centers = rng.normal(size=(32, D)).astype(np.float32) * 2
    embeds = (centers[rng.integers(0, 32, N)] +
              rng.normal(size=(N, D)).astype(np.float32) * 0.3)
    cent, _ = pq_fit(jnp.asarray(embeds[:2000]), M=M, K=K, iters=10)
    cent = np.asarray(cent)
    codes = pq_encode_chunked(embeds, jnp.asarray(cent), chunk=2048)
    index = build_ivf(embeds, codes, cent, nlist=64, kmeans_iters=10)
    queries = (embeds[rng.integers(0, N, 32)] +
               rng.normal(size=(32, D)).astype(np.float32) * 0.1)
    return index, embeds, codes, cent, queries


def test_build_invariants(built):
    index, embeds, codes, cent, _ = built
    N = len(embeds)
    assert index.ntotal == N
    # every doc id appears exactly once across cells + spill
    ids = np.concatenate([index.cell_ids[index.cell_ids >= 0].ravel(),
                          index.spill_ids])
    assert sorted(ids.tolist()) == list(range(N))
    # codes stored faithfully
    c, pos = 0, None
    for c in range(index.nlist):
        n = index.cell_sizes[c]
        if n:
            docs = index.cell_ids[c, :n]
            np.testing.assert_array_equal(index.cell_codes[c, :n], codes[docs])
            break
    # padded slots marked -1
    for c in range(index.nlist):
        n = index.cell_sizes[c]
        assert (index.cell_ids[c, n:] == -1).all()


def test_probe_is_nearest_cells(built):
    index, _, _, _, queries = built
    cells = np.asarray(probe_cells(jnp.asarray(queries),
                                   jnp.asarray(index.coarse_centroids), 4))
    c = index.coarse_centroids
    score = queries @ c.T - 0.5 * (c ** 2).sum(-1)[None, :]
    expected = np.argsort(-score, axis=1)[:, :4]
    # sets equal (order may differ on ties)
    for q in range(len(queries)):
        assert set(cells[q]) == set(expected[q])


def test_full_probe_equals_bruteforce(built):
    """nprobe = nlist must reproduce the flat ADC ranking exactly."""
    index, embeds, codes, cent, queries = built
    s_ivf, i_ivf = search_xla(index, queries, topk=10, nprobe=index.nlist)
    s_flat, i_flat = adc_search(queries, codes, cent, topk=10)
    # identical rank-wise scores
    np.testing.assert_allclose(s_ivf, s_flat, rtol=1e-4, atol=1e-4)
    # returned ids must actually have the reported scores (ids may permute
    # within tie groups — clustered toy data quantizes many docs identically)
    from repconc_tpu.quant.codebook import decode_gather

    rec = np.asarray(decode_gather(jnp.asarray(codes.astype(np.int32)),
                                   jnp.asarray(cent)))
    for q in range(0, len(queries), 7):
        direct = rec[i_ivf[q]] @ queries[q]
        np.testing.assert_allclose(direct, s_ivf[q], rtol=1e-3, atol=1e-3)


def test_partial_probe_recall(built):
    """Modest nprobe on clustered data recovers most of the true top-10."""
    index, embeds, codes, cent, queries = built
    s_ivf, i_ivf = search_xla(index, queries, topk=10, nprobe=8)
    s_flat, _ = adc_search(queries, codes, cent, topk=10)
    # tie-tolerant recall: an IVF hit counts if its score clears the exact
    # 10th-best score (clustered toy data has massive score ties)
    hits = (s_ivf >= s_flat[:, 9:10] - 1e-4).mean()
    assert hits > 0.85, hits


def test_spill_docs_searchable(built):
    """Docs in the spill segment must be findable."""
    index, embeds, codes, cent, queries = built
    if len(index.spill_ids) == 0:
        pytest.skip("no spill in this build")
    # query exactly at a spilled doc's embedding: decode its own code region
    target = index.spill_ids[0]
    q = embeds[target:target + 1]
    s, i = search_xla(index, q, topk=50, nprobe=4)
    assert target in i[0]


def test_save_load_roundtrip(built, tmp_path):
    index, _, _, _, queries = built
    index.save(str(tmp_path))
    index2 = IVFIndex.load(str(tmp_path))
    s1, i1 = search_xla(index, queries[:4], topk=5, nprobe=4)
    s2, i2 = search_xla(index2, queries[:4], topk=5, nprobe=4)
    np.testing.assert_array_equal(i1, i2)


def test_set_centroids_changes_ranking(built):
    index, embeds, codes, cent, queries = built
    rng = np.random.default_rng(0)
    index2 = IVFIndex(
        **{name: getattr(index, name).copy()
           for name in index.__dataclass_fields__})
    index2.set_centroids(rng.normal(size=cent.shape).astype(np.float32))
    s1, _ = search_xla(index, queries[:4], topk=5, nprobe=4)
    s2, _ = search_xla(index2, queries[:4], topk=5, nprobe=4)
    assert not np.allclose(s1, s2)


def test_serve_search_pallas_matches_xla():
    """serve_search (the eval CLI's serving path) must return the same results
    through the Pallas kernel (interpret mode on CPU) as through the XLA scan,
    including the padded final query batch (search_batch does not divide Q).

    Separate index from the module fixture: the kernel needs (gm*K) % 128 == 0
    (K=32 here; the fixture's K=16 is below the lane minimum)."""
    from repconc_tpu.index.ivf import serve_search

    rng = np.random.default_rng(7)
    N, D, M, K = 3000, 32, 4, 32
    centers = rng.normal(size=(24, D)).astype(np.float32) * 2
    embeds = (centers[rng.integers(0, 24, N)] +
              rng.normal(size=(N, D)).astype(np.float32) * 0.3)
    cent, _ = pq_fit(jnp.asarray(embeds[:1500]), M=M, K=K, iters=10)
    cent = np.asarray(cent)
    codes = pq_encode_chunked(embeds, jnp.asarray(cent), chunk=1024)
    index = build_ivf(embeds, codes, cent, nlist=32, kmeans_iters=8)
    queries = (embeds[rng.integers(0, N, 32)] +
               rng.normal(size=(32, D)).astype(np.float32) * 0.1)

    s_x, i_x = serve_search(index, queries, topk=10, nprobe=32, mode="xla")
    s_p, i_p = serve_search(index, queries, topk=10, nprobe=32, mode="pallas",
                            search_batch=20)  # 32 queries -> 20 + padded 12
    # the kernel serves with bf16 LUTs: scores agree to bf16 precision
    np.testing.assert_allclose(s_p, s_x, rtol=5e-3, atol=5e-3)
    # ids may permute within bf16-indistinguishable tie groups (clustered toy
    # data quantizes many docs identically): every Pallas hit's TRUE fp32 ADC
    # score must clear the XLA 10th-best score
    from repconc_tpu.quant.codebook import decode_gather

    rec = np.asarray(decode_gather(jnp.asarray(codes.astype(np.int32)),
                                   jnp.asarray(cent)))
    for q in range(queries.shape[0]):
        true_s = rec[i_p[q]] @ queries[q]
        assert (true_s >= s_x[q, -1] - 5e-3 * abs(s_x[q, -1])).all(), q


def test_serve_search_auto_on_cpu_is_xla(built):
    from repconc_tpu.index.ivf import serve_search

    index, _, _, _, queries = built
    s_a, i_a = serve_search(index, queries, topk=5, nprobe=8, mode="auto")
    s_x, i_x = serve_search(index, queries, topk=5, nprobe=8, mode="xla")
    np.testing.assert_array_equal(i_a, i_x)
    np.testing.assert_allclose(s_a, s_x)


def test_serve_search_sharded_matches_single():
    """serve_search(mesh=...) — the eval CLI's --data_parallel IVF path —
    must match the single-device Pallas serve on the 8-device mesh."""
    from repconc_tpu.core.mesh import create_mesh
    from repconc_tpu.index.ivf import serve_search

    rng = np.random.default_rng(11)
    N, D, M, K = 1500, 32, 4, 32
    centers = rng.normal(size=(16, D)).astype(np.float32) * 2
    embeds = (centers[rng.integers(0, 16, N)] +
              rng.normal(size=(N, D)).astype(np.float32) * 0.3)
    cent, _ = pq_fit(jnp.asarray(embeds[:800]), M=M, K=K, iters=8)
    cent = np.asarray(cent)
    codes = pq_encode_chunked(embeds, jnp.asarray(cent), chunk=1024)
    index = build_ivf(embeds, codes, cent, nlist=16, kmeans_iters=6)
    queries = embeds[:16]

    mesh = create_mesh()
    s1, i1 = serve_search(index, queries, topk=10, nprobe=16, mode="pallas")
    # mode="pallas" explicitly: off-TPU, auto/xla with a mesh falls back to
    # the single-device XLA scan (there is no mesh-sharded XLA IVF variant)
    s2, i2 = serve_search(index, queries, topk=10, nprobe=16, mesh=mesh,
                          mode="pallas")
    np.testing.assert_allclose(s2, s1, rtol=5e-3, atol=5e-3)
    for q in range(len(queries)):
        assert set(i2[q].tolist()) == set(i1[q].tolist()), q
    # the fallback itself: honors the XLA request; >=9/10 id overlap with
    # the Pallas serve (bf16-vs-fp32 scoring can flip a rank-10 near-tie)
    s3, i3 = serve_search(index, queries, topk=10, nprobe=16, mesh=mesh,
                          mode="xla")
    for q in range(len(queries)):
        assert len(set(i3[q].tolist()) & set(i1[q].tolist())) >= 9, q


def test_build_ivf_from_codes_full_probe_exact(built):
    """build_ivf_from_codes (coarse quantizer trained on PQ reconstructions,
    the MS MARCO-scale path where the 27GB dense matrix isn't on disk) must
    still be EXACT at full probe: the partition differs, the result set
    doesn't."""
    from repconc_tpu.index.ivf import build_ivf_from_codes

    index0, embeds, codes, cent, queries = built
    index = build_ivf_from_codes(codes, cent, nlist=32, kmeans_iters=6)
    assert index.ntotal == len(embeds)
    s_ivf, i_ivf = search_xla(index, queries, topk=10, nprobe=index.nlist)
    s_flat, _ = adc_search(queries, codes, cent, topk=10)
    np.testing.assert_allclose(s_ivf, s_flat, rtol=1e-4, atol=1e-4)


def test_serve_search_int8_lut():
    """serve_search(lut_dtype="int8") — the eval CLI's --lut_dtype int8 —
    must serve through the quantized-LUT kernel path: scores close to (but
    not identical with) the bf16 serve, high top-k agreement, and the XLA
    arm must ignore the flag (exact scores, with a warning)."""
    from repconc_tpu.index.ivf import serve_search

    rng = np.random.default_rng(13)
    N, D, M, K = 2000, 32, 4, 32
    centers = rng.normal(size=(16, D)).astype(np.float32) * 2
    embeds = (centers[rng.integers(0, 16, N)] +
              rng.normal(size=(N, D)).astype(np.float32) * 0.3)
    cent, _ = pq_fit(jnp.asarray(embeds[:800]), M=M, K=K, iters=8)
    cent = np.asarray(cent)
    codes = pq_encode_chunked(embeds, jnp.asarray(cent), chunk=1024)
    index = build_ivf(embeds, codes, cent, nlist=16, kmeans_iters=6)
    queries = (embeds[rng.integers(0, N, 8)] +
               rng.normal(size=(8, D)).astype(np.float32) * 0.1)

    s_bf, i_bf = serve_search(index, queries, topk=10, nprobe=8,
                              mode="pallas")
    s_i8, i_i8 = serve_search(index, queries, topk=10, nprobe=8,
                              mode="pallas", lut_dtype="int8")
    assert not np.array_equal(s_bf, s_i8)  # quantization engaged
    np.testing.assert_allclose(s_i8, s_bf, rtol=0.05, atol=0.05)
    overlap = np.mean([len(set(i_bf[r]) & set(i_i8[r])) / 10
                       for r in range(8)])
    assert overlap > 0.8, overlap
    # XLA arm: flag ignored, exact results
    s_x, i_x = serve_search(index, queries, topk=10, nprobe=8, mode="xla",
                            lut_dtype="int8")
    s_x2, i_x2 = serve_search(index, queries, topk=10, nprobe=8, mode="xla")
    np.testing.assert_array_equal(i_x, i_x2)
    np.testing.assert_allclose(s_x, s_x2)


def test_serve_search_decoded_matches_xla():
    """serving="decoded" (decoded-residency: bf16 reconstructions scored as
    fat matmuls, no one-hot/LUT) must reproduce the exact XLA ADC scan to
    bf16 precision — ADC's LUT sum IS dot(query, reconstruction)."""
    from repconc_tpu.index.ivf import serve_search

    rng = np.random.default_rng(21)
    N, D, M, K = 3000, 32, 4, 32
    centers = rng.normal(size=(24, D)).astype(np.float32) * 2
    embeds = (centers[rng.integers(0, 24, N)] +
              rng.normal(size=(N, D)).astype(np.float32) * 0.3)
    cent, _ = pq_fit(jnp.asarray(embeds[:1500]), M=M, K=K, iters=10)
    cent = np.asarray(cent)
    codes = pq_encode_chunked(embeds, jnp.asarray(cent), chunk=1024)
    index = build_ivf(embeds, codes, cent, nlist=32, kmeans_iters=8)
    queries = (embeds[rng.integers(0, N, 32)] +
               rng.normal(size=(32, D)).astype(np.float32) * 0.1)

    s_x, i_x = serve_search(index, queries, topk=10, nprobe=32, mode="xla")
    s_d, i_d = serve_search(index, queries, topk=10, nprobe=32,
                            mode="pallas", serving="decoded",
                            search_batch=20)
    np.testing.assert_allclose(s_d, s_x, rtol=5e-3, atol=5e-3)
    # ids may permute within bf16-indistinguishable tie groups: every
    # decoded hit's TRUE fp32 ADC score must clear the XLA 10th-best
    from repconc_tpu.quant.codebook import decode_gather

    rec = np.asarray(decode_gather(jnp.asarray(codes.astype(np.int32)),
                                   jnp.asarray(cent)))
    for q in range(queries.shape[0]):
        true_s = rec[i_d[q]] @ queries[q]
        assert (true_s >= s_x[q, -1] - 5e-3 * abs(s_x[q, -1])).all(), q


def test_decoded_index_modes(built):
    """PallasIVFIndex decoded mode: lazy enable, per-call override, and
    codebook swap rebuilding the reconstructions."""
    from repconc_tpu.index.pallas_ivf import PallasIVFIndex

    index, _, _, cent, queries = built
    pidx = PallasIVFIndex(index)            # default: adc
    assert pidx.cell_vecs is None
    # per-call override enables lazily
    s1, i1, ov1 = pidx.search_device(queries[:8], topk=5, nprobe=index.nlist,
                                     serving="decoded")
    assert pidx.cell_vecs is not None
    assert pidx.decoded_bytes() == np.prod(pidx.cell_vecs.shape) * 2
    assert int(ov1) == 0
    # same search through the constructor default
    pidx2 = PallasIVFIndex(index, serving="decoded")
    s2, i2, _ = pidx2.search_device(queries[:8], topk=5, nprobe=index.nlist)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2))
    # codebook swap must rebuild reconstructions (ranking changes)
    rng = np.random.default_rng(5)
    pidx2.set_centroids(cent + rng.normal(size=cent.shape).astype(np.float32))
    s3, _, _ = pidx2.search_device(queries[:8], topk=5, nprobe=index.nlist)
    assert not np.allclose(np.asarray(s2), np.asarray(s3))


def test_decoded_override_leaves_default_mode():
    """ADVICE r4 #2 regression: a per-call serving= override materializes
    the decoded store but must NOT flip the index's default serving mode,
    and a codebook swap on an adc-default index must not force-enable
    decoded serving either."""
    from repconc_tpu.index.pallas_ivf import PallasIVFIndex

    # K=32 so the ADC kernel's group geometry (gm*K % 128 == 0) is valid
    # (the module fixture's K=16 is decoded/XLA-only)
    rng = np.random.default_rng(11)
    N, D, M, K = 3000, 32, 4, 32
    embeds = rng.normal(size=(N, D)).astype(np.float32)
    cent, _ = pq_fit(jnp.asarray(embeds[:1500]), M=M, K=K, iters=8)
    cent = np.asarray(cent)
    codes = pq_encode_chunked(embeds, jnp.asarray(cent), chunk=1024)
    index = build_ivf(embeds, codes, cent, nlist=32, kmeans_iters=8)
    queries = embeds[rng.integers(0, N, 32)]
    pidx = PallasIVFIndex(index)            # default: adc
    s_adc, i_adc, _ = pidx.search_device(queries[:8], topk=5,
                                         nprobe=index.nlist)
    pidx.search_device(queries[:8], topk=5, nprobe=index.nlist,
                       serving="decoded")
    assert pidx.serving == "adc"            # default untouched
    assert pidx.cell_vecs is not None       # store materialized, though
    # default-mode search still serves ADC (bit-identical to before)
    s_after, i_after, _ = pidx.search_device(queries[:8], topk=5,
                                             nprobe=index.nlist)
    np.testing.assert_array_equal(np.asarray(i_adc), np.asarray(i_after))
    np.testing.assert_allclose(np.asarray(s_adc), np.asarray(s_after))
    # centroid swap with adc default: stale store dropped, not re-enabled
    pidx.set_centroids(cent * 1.01)
    assert pidx.serving == "adc" and pidx.cell_vecs is None
    # explicit enable still flips the default
    pidx.enable_decoded_serving("int8")
    assert pidx.serving == "decoded_int8"
    assert pidx.cell_vecs.dtype == jnp.int8 and pidx.doc_scale is not None


def test_serve_search_decoded_int8():
    """decoded_int8 (scale-folded int8 residency, MXU s8 path): close to the
    bf16 decoded scores, high top-k agreement, per-dim scale folding exact."""
    from repconc_tpu.index.ivf import serve_search
    from repconc_tpu.index.pallas_ivf import PallasIVFIndex

    rng = np.random.default_rng(29)
    N, D, M, K = 2000, 32, 4, 32
    centers = rng.normal(size=(16, D)).astype(np.float32) * 2
    embeds = (centers[rng.integers(0, 16, N)] +
              rng.normal(size=(N, D)).astype(np.float32) * 0.3)
    cent, _ = pq_fit(jnp.asarray(embeds[:800]), M=M, K=K, iters=8)
    cent = np.asarray(cent)
    codes = pq_encode_chunked(embeds, jnp.asarray(cent), chunk=1024)
    index = build_ivf(embeds, codes, cent, nlist=16, kmeans_iters=6)
    queries = (embeds[rng.integers(0, N, 8)] +
               rng.normal(size=(8, D)).astype(np.float32) * 0.1)

    s_bf, i_bf = serve_search(index, queries, topk=10, nprobe=16,
                              mode="pallas", serving="decoded")
    s_i8, i_i8 = serve_search(index, queries, topk=10, nprobe=16,
                              mode="pallas", serving="decoded_int8")
    assert not np.array_equal(s_bf, s_i8)   # quantization engaged
    np.testing.assert_allclose(s_i8, s_bf, rtol=0.05, atol=0.05)
    overlap = np.mean([len(set(i_bf[r]) & set(i_i8[r])) / 10
                       for r in range(8)])
    assert overlap > 0.8, overlap

    # residency accounting: int8 store is half the bf16 store
    pidx = PallasIVFIndex(index, serving="decoded_int8")
    assert pidx.cell_vecs.dtype == jnp.int8
    assert pidx.doc_scale.shape == (D,)
    assert pidx.decoded_bytes("int8") * 2 == pidx.decoded_bytes("bf16")


def test_serve_search_sharded_decoded_matches_single():
    """Mesh-sharded decoded residency (each device decodes only ITS cells)
    must match single-device decoded serving on the 8-device mesh, for both
    bf16 and the scale-folded int8 store."""
    from repconc_tpu.core.mesh import create_mesh
    from repconc_tpu.index.ivf import serve_search

    rng = np.random.default_rng(17)
    N, D, M, K = 1500, 32, 4, 32
    centers = rng.normal(size=(16, D)).astype(np.float32) * 2
    embeds = (centers[rng.integers(0, 16, N)] +
              rng.normal(size=(N, D)).astype(np.float32) * 0.3)
    cent, _ = pq_fit(jnp.asarray(embeds[:800]), M=M, K=K, iters=8)
    cent = np.asarray(cent)
    codes = pq_encode_chunked(embeds, jnp.asarray(cent), chunk=1024)
    index = build_ivf(embeds, codes, cent, nlist=16, kmeans_iters=6)
    queries = embeds[:16]

    mesh = create_mesh()
    for serving, tol in (("decoded", 5e-3), ("decoded_int8", 5e-2)):
        s1, i1 = serve_search(index, queries, topk=10, nprobe=16,
                              mode="pallas", serving=serving)
        s2, i2 = serve_search(index, queries, topk=10, nprobe=16, mesh=mesh,
                              mode="pallas", serving=serving)
        np.testing.assert_allclose(s2, s1, rtol=tol, atol=tol)
        for q in range(len(queries)):
            assert set(i2[q].tolist()) == set(i1[q].tolist()), (serving, q)
