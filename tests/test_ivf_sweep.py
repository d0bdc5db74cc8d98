"""run_ivf_sweep CLI: reconstruction-built coarse quantizer (no embeds file).

Reference analog: the QPS-vs-effectiveness sweep published only as a figure
(figures/psg_vs_cplx_qps.png); here it is tooling, and the coarse build must
obey the same served-space consistency contract as run_repconc_eval.
"""
import json

import numpy as np
import pytest


@pytest.fixture()
def sweep_inputs(tmp_path):
    import jax.numpy as jnp

    from repconc_tpu.core.config import RepConcConfig
    from repconc_tpu.index.kmeans import pq_fit
    from repconc_tpu.models.repconc_model import save_pretrained
    from repconc_tpu.models.transformer import EncoderConfig
    from repconc_tpu.quant import encode

    rng = np.random.default_rng(0)
    D, M, K, N, Q = 64, 4, 16, 2000, 32
    emb = rng.normal(size=(N, D)).astype(np.float32)
    cent = np.asarray(pq_fit(jnp.asarray(emb[:1000]), M=M, K=K, iters=4)[0])
    codes = np.asarray(
        encode(jnp.asarray(emb), jnp.asarray(cent), use_constraint=False)
    ).astype(np.uint8)
    np.save(tmp_path / "codes.npy", codes)
    np.save(tmp_path / "q.npy", rng.normal(size=(Q, D)).astype(np.float32))
    cfg = RepConcConfig(encoder=EncoderConfig(hidden_size=D), MCQ_M=M, MCQ_K=K)
    save_pretrained(str(tmp_path / "model"), cfg,
                    {"centroids": cent, "rotation": np.eye(D, dtype=np.float32)})
    return tmp_path


def test_sweep_without_corpus_embeds(sweep_inputs):
    """No --corpus_embed_path: coarse trains on PQ reconstructions, and the
    full-probe point must recover the exact flat ranking (recall 1.0)."""
    from repconc_tpu.cli import run_ivf_sweep

    out = sweep_inputs / "sweep.json"
    run_ivf_sweep.main([
        "--codes_path", str(sweep_inputs / "codes.npy"),
        "--query_embed_path", str(sweep_inputs / "q.npy"),
        "--model_name_or_path", str(sweep_inputs / "model"),
        "--nlist", "8", "--nprobes", "2,8", "--topk", "10",
        "--out", str(out)])
    by_nprobe = {p["nprobe"]: p for p in json.load(open(out))["results"]}
    assert by_nprobe[8]["recall_vs_exact@10"] == 1.0
    assert 0.0 < by_nprobe[2]["recall_vs_exact@10"] <= 1.0


def test_sweep_pallas_int8(tmp_path):
    """--use_pallas --lut_dtype int8: the sweep serves through the quantized
    kernel (interpret mode here) and reports the REAL-index recall churn —
    near-full-probe recall must stay high but the flag must reach the kernel
    (sweep.json records the serving arm + LUT dtype)."""
    import jax.numpy as jnp

    from repconc_tpu.cli import run_ivf_sweep
    from repconc_tpu.core.config import RepConcConfig
    from repconc_tpu.index.kmeans import pq_fit
    from repconc_tpu.models.repconc_model import save_pretrained
    from repconc_tpu.models.transformer import EncoderConfig
    from repconc_tpu.quant import encode

    rng = np.random.default_rng(3)
    D, M, K, N, Q = 64, 4, 32, 1500, 16   # gm*K = 128 (kernel lane minimum)
    emb = rng.normal(size=(N, D)).astype(np.float32)
    cent = np.asarray(pq_fit(jnp.asarray(emb[:800]), M=M, K=K, iters=4)[0])
    codes = np.asarray(
        encode(jnp.asarray(emb), jnp.asarray(cent), use_constraint=False)
    ).astype(np.uint8)
    np.save(tmp_path / "codes.npy", codes)
    np.save(tmp_path / "q.npy", rng.normal(size=(Q, D)).astype(np.float32))
    cfg = RepConcConfig(encoder=EncoderConfig(hidden_size=D), MCQ_M=M, MCQ_K=K)
    save_pretrained(str(tmp_path / "model"), cfg,
                    {"centroids": cent, "rotation": np.eye(D, dtype=np.float32)})

    out = tmp_path / "sweep.json"
    run_ivf_sweep.main([
        "--codes_path", str(tmp_path / "codes.npy"),
        "--query_embed_path", str(tmp_path / "q.npy"),
        "--model_name_or_path", str(tmp_path / "model"),
        "--nlist", "8", "--nprobes", "8", "--topk", "10",
        "--use_pallas", "--lut_dtype", "int8",
        "--out", str(out)])
    data = json.load(open(out))
    assert data["serving"] == "pallas" and data["lut_dtype"] == "int8"
    # full probe with int8 LUTs: small churn only (random-data baseline ~1%)
    assert data["results"][0]["recall_vs_exact@10"] > 0.9
