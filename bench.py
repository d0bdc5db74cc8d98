"""Benchmark: ADC (PQ) retrieval throughput on one TPU chip.

Measures the serving hot path — batched top-k ADC search over a
device-resident PQ code index via the Pallas one-hot MXU kernel (reference
hot path: faiss GPU IVFPQ scan, evaluate_repconc.py:180-206; the reference's
defaults search_batch=1200, topk=1000 are used).

Timing is device-side: completion is forced by a scalar readback, because
this environment's device->host tunnel moves bulk results at ~9 MB/s (an
infrastructure artifact unrelated to retrieval compute).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

vs_baseline normalizes against BASELINE_QPS, an estimate of the reference's
faiss-GPU brute-force PQ scan throughput at the same (N=1M, M=48, topk=1000)
on its published hardware (V100). The reference repo publishes no raw QPS
table (SURVEY.md §6), so this constant is a documented assumption.
"""
import json
import time

import numpy as np

N_DOCS = 1_000_000
M = 48
K = 256
DSUB = 16  # hidden 768
N_QUERIES = 1200   # reference search_batch default
TOPK = 1000        # reference topk default
BASELINE_QPS = 1500.0  # assumed faiss-GPU PQ48 brute-force scan @1M docs


def main():
    import jax
    import jax.numpy as jnp

    from repconc_tpu.index.pallas_adc import PallasADCIndex

    rng = np.random.default_rng(0)
    codes = rng.integers(0, K, size=(N_DOCS, M), dtype=np.uint8)
    centroids = rng.normal(size=(M, K, DSUB)).astype(np.float32)
    queries = rng.normal(size=(N_QUERIES, M * DSUB)).astype(np.float32)

    index = PallasADCIndex(codes, centroids)

    def run():
        s, i = index.search_device(queries, topk=TOPK, exact=True)
        # scalar readback = completion barrier (block_until_ready is
        # unreliable on the tunneled platform)
        return float(jnp.sum(s)) + int(i[0, 0])

    run()  # compile
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        run()
        times.append(time.perf_counter() - t0)
    qps = N_QUERIES / min(times)

    print(json.dumps({
        "metric": f"adc_pq{M}_exact_qps_1M_top{TOPK}",
        "value": round(qps, 2),
        "unit": "queries/s/chip",
        "vs_baseline": round(qps / BASELINE_QPS, 3),
    }))


if __name__ == "__main__":
    main()
