"""MS MARCO-scale IVF serving bench: 8.8M docs on one chip.

Rebuilds the RESULTS.md "8.8M docs" row (reference scale: MS MARCO passage
is 8.84M docs, evaluate_repconc.py serves it on 8 V100s; here ONE v5e chip
holds the whole 0.49 GB uint8 code store in HBM). Index layout is synthetic
and generated ON DEVICE (the host tunnel moves ~10 MB/s); throughput
depends on layout shape, not code values.

Usage: python recipes/bench_ivf_scale.py [--nprobes 16,64,128]
                                         [--batches 1200,4800]
                                         [--lut_dtype bf16|int8|both]

--batches sweeps the serving batch size: at 8.8M docs / low nprobe the
1,200-query batch collectively probes ~all cells, so per-cell decode cost
is amortized over too few pairs — larger batches amortize it further
(round-3 analysis measured 9,110 QPS at batch 4,800 vs 3,971 at 1,200 for
nprobe=16); this makes that a first-class config instead of an ad-hoc note.
--pipeline_depth N uses bench.py's steady-state methodology (N batches in
flight, ONE readback barrier) so numbers compare 1:1 with the headline.

--lut_dtype both A/B-tests the quantized-LUT serving path (int8 LUT rows +
int8 one-hot scratch -> MXU s8xs8 contraction) against the default bf16 at
identical shapes — the roofline probe VERDICT round 2 asked for.
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nprobes", default="16,64,128")
    ap.add_argument("--nlist", type=int, default=5000)
    ap.add_argument("--lpad", type=int, default=2048)
    ap.add_argument("--batches", default=None,
                    help="comma list of serving batch sizes "
                         "(default: just --n_queries)")
    ap.add_argument("--pipeline_depth", type=int, default=4)
    ap.add_argument("--n_queries", type=int, default=1200)
    ap.add_argument("--topk", type=int, default=1000)
    ap.add_argument("--lut_dtype", default="bf16",
                    choices=("bf16", "int8", "both"))
    ap.add_argument("--serving", default="adc",
                    help="comma list of adc|decoded|decoded_int8, or 'all' "
                         "(= adc,decoded_int8 — bf16 residency is 16 GB at "
                         "8.8M docs and does NOT fit; request 'decoded' "
                         "explicitly at 1M scale where it is 1.6 GB). "
                         "adc = one-hot kernel over the code store; "
                         "decoded/decoded_int8 = HBM-resident "
                         "reconstructions scored as fat MXU matmuls "
                         "(int8 residency = 7.9 GB at 8.8M docs: the mode "
                         "that fits MS MARCO scale on one chip)")
    args = ap.parse_args()
    lut_dtypes = (["bf16", "int8"] if args.lut_dtype == "both"
                  else [args.lut_dtype])
    servings = (["adc", "decoded_int8"] if args.serving == "all"
                else args.serving.split(","))
    for s in servings:
        if s not in ("adc", "decoded", "decoded_int8"):
            ap.error(f"unknown serving mode {s!r}")

    import functools

    import jax
    import jax.numpy as jnp

    from repconc_tpu.index.pallas_ivf import (QT_G, _ivf_search_device,
                                              _ivf_search_device_decoded,
                                              _tile_budget, decode_cells,
                                              decode_cells_int8)

    D, M, K = 768, 48, 256
    nlist, lpad = args.nlist, args.lpad
    key = jax.random.PRNGKey(0)
    k1, k2, k3, k4 = jax.random.split(key, 4)

    # NOTE: the index arrays are passed as jit ARGUMENTS, never captured in
    # a closure — a closure-captured device array is embedded in the
    # compile payload, and through this environment's remote-compile tunnel
    # a 0.46 GiB constant means a ~45 min upload ending in HTTP 413.
    cell_codes = jax.random.randint(
        k1, (nlist, lpad, M), 0, K, dtype=jnp.uint8)
    cell_ids = jnp.arange(nlist * lpad, dtype=jnp.int32).reshape(nlist, lpad)
    coarse = jax.random.normal(k2, (nlist, D), dtype=jnp.float32)
    centroids = jax.random.normal(k3, (M, K, D // M), dtype=jnp.float32)
    batches = ([int(x) for x in args.batches.split(",")]
               if args.batches else [args.n_queries])
    queries_full = jax.random.normal(k4, (max(batches), D), dtype=jnp.float32)
    n_docs = nlist * lpad
    print(f"index: {n_docs/1e6:.1f}M padded slots, "
          f"{n_docs*M/2**30:.2f} GiB uint8 codes; "
          f"pipeline_depth={args.pipeline_depth}")

    # decoded residency is built ONCE (it is load-time work in serving);
    # each requested mode keeps its own store so adc/decoded/decoded_int8
    # rows can all come from one process at shapes where they co-fit
    stores = {}
    if "decoded" in servings:
        stores["decoded"] = (decode_cells(cell_codes, centroids), None)
        print(f"decoded store: {n_docs*D*2/2**30:.2f} GiB bf16")
    if "decoded_int8" in servings:
        stores["decoded_int8"] = decode_cells_int8(cell_codes, centroids)
        print(f"decoded store: {n_docs*D/2**30:.2f} GiB int8")

    @functools.partial(jax.jit, static_argnames=("nprobe", "T_max"))
    def fused_decoded(q, coarse, vecs, cell_ids, scale, nprobe, T_max):
        s, i, ov = _ivf_search_device_decoded(
            q, coarse, vecs, cell_ids, nprobe, args.topk, T_max,
            doc_scale=scale)
        return (jnp.sum(s) + i[0, 0].astype(jnp.float32)
                + ov.astype(jnp.float32) * 1e30)

    for n_queries, nprobe in ((b, p) for b in batches
                              for p in [int(x)
                                        for x in args.nprobes.split(",")]):
        queries = queries_full[:n_queries]
        T_worst = (n_queries * nprobe) // QT_G + nlist + 1
        T_max = min(T_worst, _tile_budget(n_queries, nprobe, nlist, 1.35))

        @functools.partial(jax.jit, static_argnames=("nprobe", "T_max",
                                                     "lut_dtype"))
        def fused(q, centroids, coarse, cell_codes, cell_ids,
                  nprobe, T_max, lut_dtype):
            s, i, ov = _ivf_search_device(
                q, centroids, coarse, cell_codes, cell_ids,
                nprobe, args.topk, K, T_max, lut_dtype)
            return (jnp.sum(s) + i[0, 0].astype(jnp.float32)
                    + ov.astype(jnp.float32) * 1e30)

        configs = []
        for serving in servings:
            if serving == "adc":
                for lut_dtype in lut_dtypes:
                    configs.append((f"adc/lut={lut_dtype}", functools.partial(
                        fused, queries, centroids, coarse, cell_codes,
                        cell_ids, nprobe=nprobe, T_max=T_max,
                        lut_dtype=lut_dtype)))
            else:
                vecs, scale = stores[serving]
                configs.append((serving, functools.partial(
                    fused_decoded, queries, coarse, vecs, cell_ids,
                    scale, nprobe=nprobe, T_max=T_max)))

        for label, call in configs:
            v = float(call())  # compile
            assert abs(v) < 1e29, "tile-capacity overflow"
            depth = args.pipeline_depth
            ts = []
            for _ in range(3):
                # steady-state: `depth` dispatches, one readback barrier
                # (single-core TPU executes in dispatch order; bench.py's
                # methodology, so rows compare 1:1 with the headline)
                t0 = time.perf_counter()
                outs = [call() for _ in range(depth)]
                barrier = float(outs[-1])
                ts.append(time.perf_counter() - t0)
                assert all(abs(float(o)) < 1e29 for o in outs[:-1]) and \
                    abs(barrier) < 1e29, "tile-capacity overflow"
            qps = depth * n_queries / min(ts)
            print(f"batch={n_queries:5d} nprobe={nprobe:4d} "
                  f"{label}: {qps:8.0f} QPS/chip "
                  f"({min(ts)/depth*1e3:.1f} ms/batch steady-state)")


if __name__ == "__main__":
    main()
