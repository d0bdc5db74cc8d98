"""Benchmark: IVF-PQ retrieval throughput on one TPU chip.

Measures the serving hot path — batched top-k search over a device-resident
IVF-PQ index (nlist=4096, nprobe=64, ~1M docs, M=48) via the cell-grouped
Pallas kernel. This is the BASELINE.json headline metric ("IVF queries/sec/
chip"); the reference's own deployed configuration is a faiss GPU brute-force
PQ scan (it sets nlist=1, evaluate_repconc.py:101-118) with search_batch=1200
and topk=1000 (its defaults, used here).

The index layout is synthetic (uniform cells, random codes): throughput
depends on layout shape, not code values. Timing models steady-state
serving: PIPELINE_DEPTH batches are dispatched back-to-back (as a serving
loop would — JAX dispatch is async and a single TPU executes programs in
dispatch order) with ONE fused scalar readback on the LAST batch as the
completion barrier, so the host<->device tunnel's per-readback round trip
(~27 ms here, an infrastructure artifact that varies per session) is
amortized 1/DEPTH instead of being counted once per batch. Every batch's
overflow sentinel is still verified, outside the timed region.

Prints ONE JSON line. The raw QPS ("value") is the defensible headline; the
reference publishes no QPS table (SURVEY.md §6), so the ratio field is
explicitly labeled as an ESTIMATE against an assumed 1,500-QPS faiss-GPU
(V100) brute PQ48 scan at 1M docs, and kept under that name.
"""
import json
import time

import numpy as np

import os

D, M, K = 768, 48, 256
NLIST, LPAD = 4096, 256          # ~1.05M docs
N_QUERIES, TOPK, NPROBE = 1200, 1000, 64
# batches in flight per timed measurement; REPCONC_BENCH_DEPTH=1 reproduces
# the round-1/2 per-batch-barrier methodology exactly
PIPELINE_DEPTH = int(os.environ.get("REPCONC_BENCH_DEPTH", "4"))
# REPCONC_BENCH_SERVING=adc skips the decoded-residency arm (kernel-geometry
# sweeps tune the ADC kernel only; decoded ignores QT_G/R_TILES)
SERVING = os.environ.get("REPCONC_BENCH_SERVING", "both")
BASELINE_QPS = 1500.0
# Grounding for BASELINE_QPS (round 5): faiss is not installable here, so
# recipes/bench_cpu_baseline.sh reimplements faiss's IndexIVFPQ scan loop
# (QueryTables + scan_list_with_table) in C++ and measures THIS host's
# single core at the exact headline geometry. Measured 2026-08-19:
CPU_CORE_IVFPQ_QPS = 241.1   # nprobe=64 arm (max of 2 runs)
CPU_CORE_BRUTE_QPS = 23.4    # nlist=1 brute arm (the reference's deployed
#                              config, evaluate_repconc.py:101-118)
# => the assumed 1,500-QPS V100 figure = ~64x one CPU core for the brute
# scan, inside faiss's published GPU-vs-CPU range (~5-20x a multi-core
# CPU, i.e. ~40-150x one core).

if os.environ.get("REPCONC_BENCH_SMOKE") == "1":
    # tiny shapes for CPU plumbing smokes of the bench + sweep drivers
    # (interpret-mode Pallas at the real 1M-doc config would take hours);
    # the reported QPS is meaningless in this mode and labeled as such
    NLIST, LPAD = 64, 128
    N_QUERIES, TOPK, NPROBE = 64, 50, 8


def _acquire_chip(timeout=120):
    """Cooperative chip handoff (replaces the round-3/4 pattern-matching
    watchdog, VERDICT r4 weak #3). A long-running experiment queue
    (recipes/round5_queue.sh) registers its process-group id in
    /tmp/chip.lock and stops between steps when /tmp/chip_release appears;
    if a step is mid-flight when the driver invokes this bench, we signal
    that EXACT registered pgid — never a name pattern — and wait for it to
    exit so the measurement runs uncontended. The queue's own bench.py
    children skip this via REPCONC_CHIP_LOCK_IGNORE=1 (they ARE the lock
    holder)."""
    if os.environ.get("REPCONC_CHIP_LOCK_IGNORE") == "1":
        return
    try:
        pgid = int(open("/tmp/chip.lock").read().strip())
    except (OSError, ValueError):
        return
    import signal
    import sys
    try:
        open("/tmp/chip_release", "w").close()
    except OSError:
        pass
    for sig in (signal.SIGTERM, signal.SIGKILL):
        try:
            os.killpg(pgid, sig)
        except (ProcessLookupError, PermissionError):
            break
        deadline = time.time() + timeout
        gone = False
        while time.time() < deadline:
            try:
                os.killpg(pgid, 0)
            except ProcessLookupError:
                gone = True
                break
            time.sleep(1)
        if gone:
            break
    try:
        os.remove("/tmp/chip.lock")
    except OSError:
        pass
    print("chip handoff: stopped queue pgid %d" % pgid, file=sys.stderr)
    time.sleep(10)  # let the TPU runtime drop the dead client's programs


def _int8_headline_eligible():
    """The decoded_int8 serving mode scores quantized reconstructions; it
    may carry the headline ONLY with measured end-to-end quality parity on
    a real trained index (ADVICE r4 #1). docs/decoded_parity.json is
    written from the round5_queue decoded_quality step's metric.json files
    and records MRR@10 per serving mode."""
    try:
        rec = json.load(open(os.path.join(os.path.dirname(
            os.path.abspath(__file__)), "docs", "decoded_parity.json")))
        return abs(rec["decoded_int8"]["MRR@10"]
                   - rec["adc"]["MRR@10"]) <= 0.002
    except (OSError, ValueError, KeyError):
        return False


def _check_tunnel_alive():
    """Fail fast if the axon relay is down: EVERY device op (even
    jax.devices()) hangs FOREVER through a dead tunnel (CLAUDE.md), which
    would wedge an unattended bench run. Only probes when the axon plugin
    is in play (PALLAS_AXON_POOL_IPS= disables it for CPU runs)."""
    if os.environ.get("PALLAS_AXON_POOL_IPS", "unset") == "":
        return
    import socket
    try:
        socket.create_connection(("127.0.0.1", 8082), timeout=5).close()
    except OSError:
        import sys
        print(json.dumps({
            "metric": "error", "value": 0, "unit": "",
            "error": "axon tunnel relay (127.0.0.1:8082) unreachable; "
                     "device ops would hang forever — aborting bench",
        }), file=sys.stderr)
        sys.exit(3)


def main():
    import jax

    if os.environ.get("PALLAS_AXON_POOL_IPS", "unset") == "":
        # CPU plumbing smokes: the env var alone does not stick (the axon
        # sitecustomize forces its platform); set it via jax.config like
        # tests/conftest.py does
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from repconc_tpu.index.ivf import IVFIndex
    from repconc_tpu.index.pallas_ivf import PallasIVFIndex

    from repconc_tpu.index.pallas_ivf import (_ivf_search_device,
                                              _ivf_search_device_decoded,
                                              _tile_budget, decode_cells,
                                              decode_cells_int8)

    rng = np.random.default_rng(0)
    index = IVFIndex(
        coarse_centroids=rng.normal(size=(NLIST, D)).astype(np.float32),
        cell_codes=rng.integers(0, K, size=(NLIST, LPAD, M), dtype=np.uint8),
        cell_ids=np.arange(NLIST * LPAD, dtype=np.int32).reshape(NLIST, LPAD),
        cell_sizes=np.full(NLIST, LPAD, dtype=np.int32),
        spill_codes=np.zeros((0, M), np.uint8),
        spill_ids=np.zeros((0,), np.int32),
        centroids=rng.normal(size=(M, K, D // M)).astype(np.float32),
    )
    pidx = PallasIVFIndex(index)
    queries = jnp.asarray(rng.normal(size=(N_QUERIES, D)).astype(np.float32))
    T_max = _tile_budget(N_QUERIES, NPROBE, NLIST, 1.35)

    # completion barrier = ONE fused scalar readback (block_until_ready does
    # not block through the axon tunnel, and each host<->device readback
    # costs a ~27 ms round trip — two separate readbacks would double-count
    # tunnel latency into the measurement). The work-tile overflow flag is
    # fused into the same readback: a huge sentinel would make the sanity
    # check below fail if the capacity-budgeted grid ever dropped a pair.
    # Index arrays are jit ARGUMENTS, not closure captures — captured
    # constants ship in the remote-compile payload (CLAUDE.md).
    import functools

    @functools.partial(jax.jit, static_argnames=())
    def searched_sum(q, centroids, coarse, cell_codes, cell_ids):
        s, i, overflow = _ivf_search_device(
            q, centroids, coarse, cell_codes, cell_ids,
            NPROBE, TOPK, K, T_max)
        return (jnp.sum(s) + i[0, 0].astype(jnp.float32)
                + overflow.astype(jnp.float32) * 1e30)

    def run():
        return float(searched_sum(queries, pidx.centroids, pidx.coarse,
                                  pidx.cell_codes, pidx.cell_ids))

    assert abs(run()) < 1e29, "tile-capacity overflow; results not exact"

    def run_pipelined(depth):
        """Steady-state measurement: dispatch `depth` batches, barrier once.

        A single TPU core runs programs in dispatch order, so the last
        batch's scalar readback proves all `depth` batches completed; the
        other batches' sentinels are read back AFTER timing."""
        t0 = time.perf_counter()
        outs = [searched_sum(queries, pidx.centroids, pidx.coarse,
                             pidx.cell_codes, pidx.cell_ids)
                for _ in range(depth)]
        barrier = float(outs[-1])
        dt = time.perf_counter() - t0
        sentinels = [float(o) for o in outs[:-1]] + [barrier]
        assert all(abs(v) < 1e29 for v in sentinels), \
            "tile-capacity overflow; results not exact"
        return dt

    times = [run_pipelined(PIPELINE_DEPTH) for _ in range(3)]
    adc_qps = PIPELINE_DEPTH * N_QUERIES / min(times)

    # ---- decoded-residency serving: same index, same results to bf16 ----
    # precision (ADC's LUT sum IS dot(query, reconstruction)); bf16
    # reconstructions stay HBM-resident (1.6 GB at this config) and each
    # work tile is ONE fat MXU matmul — no one-hot VPU build, no LUT
    # gather. The serving-mode choice is a documented memory/speed trade
    # (PallasIVFIndex docstring); both modes are reported below.
    if SERVING == "adc":
        print(json.dumps({
            "metric": (f"ivfpq{M}_nlist{NLIST}_nprobe{NPROBE}_qps_1M_top{TOPK}"
                       if os.environ.get("REPCONC_BENCH_SMOKE") != "1" else
                       f"SMOKE_ivfpq{M}_nlist{NLIST}_{NLIST * LPAD}docs"),
            "value": round(adc_qps, 2), "unit": "queries/s/chip",
            "methodology": "pipelined_dispatch",
            "pipeline_depth": PIPELINE_DEPTH, "serving_mode": "adc_bf16",
            "vs_baseline": round(adc_qps / BASELINE_QPS, 3),
            "vs_cpu_core_same_config": round(adc_qps / CPU_CORE_IVFPQ_QPS,
                                             1),
        }))
        return

    @jax.jit
    def searched_sum_decoded(q, coarse, vecs, cell_ids, scale=None):
        s, i, overflow = _ivf_search_device_decoded(
            q, coarse, vecs, cell_ids, NPROBE, TOPK, T_max, doc_scale=scale)
        return (jnp.sum(s) + i[0, 0].astype(jnp.float32)
                + overflow.astype(jnp.float32) * 1e30)

    def measure_decoded(vecs, scale):
        def run_once():
            return float(searched_sum_decoded(queries, pidx.coarse, vecs,
                                              pidx.cell_ids, scale))
        assert abs(run_once()) < 1e29

        def run_pipelined_decoded(depth):
            t0 = time.perf_counter()
            outs = [searched_sum_decoded(queries, pidx.coarse, vecs,
                                         pidx.cell_ids, scale)
                    for _ in range(depth)]
            barrier = float(outs[-1])
            dt = time.perf_counter() - t0
            sentinels = [float(o) for o in outs[:-1]] + [barrier]
            assert all(abs(v) < 1e29 for v in sentinels), \
                "tile-capacity overflow; results not exact"
            return dt

        times_d = [run_pipelined_decoded(PIPELINE_DEPTH) for _ in range(3)]
        return PIPELINE_DEPTH * N_QUERIES / min(times_d)

    # bf16 residency: scores identical to ADC at bf16 matmul precision
    decoded_qps = measure_decoded(decode_cells(pidx.cell_codes,
                                               pidx.centroids), None)
    # int8 residency: quantized scores (MRR parity measured end-to-end by
    # the round-4 chip queue's decoded_quality step on a real index)
    vecs_i8, doc_scale = decode_cells_int8(pidx.cell_codes, pidx.centroids)
    decoded_int8_qps = measure_decoded(vecs_i8, doc_scale)

    # Headline policy (ADVICE r4 #1): adc and decoded_bf16 score identically
    # (the ADC LUT sum IS dot(query, reconstruction) at bf16 precision) so
    # either may carry the headline; decoded_int8 is quantized scoring and
    # is eligible only with a measured MRR-parity record on disk. The
    # winner is picked with an explicit argmax over (value, label) pairs —
    # a float-keyed dict would collapse exact ties.
    arms = [(adc_qps, "adc_bf16"), (decoded_qps, "decoded_bf16")]
    int8_ok = _int8_headline_eligible()
    if int8_ok:
        arms.append((decoded_int8_qps, "decoded_int8"))
    qps, mode = max(arms, key=lambda a: a[0])

    print(json.dumps({
        # name kept identical across rounds (BENCH_r0N.json comparability);
        # smoke mode renames so tiny-shape numbers can't be mistaken for it
        "metric": (f"ivfpq{M}_nlist{NLIST}_nprobe{NPROBE}_qps_1M_top{TOPK}"
                   if os.environ.get("REPCONC_BENCH_SMOKE") != "1" else
                   f"SMOKE_ivfpq{M}_nlist{NLIST}_{NLIST * LPAD}docs"),
        "value": round(qps, 2),
        "unit": "queries/s/chip",
        # methodology tag: rounds 1-2 measured depth-1 (one readback barrier
        # per batch, tunnel round trip counted each batch); round 3+ measures
        # steady-state with PIPELINE_DEPTH batches in flight and one barrier.
        # Cross-round JSON values are only comparable at equal pipeline_depth
        # AND equal serving_mode (round 4 adds decoded residency — identical
        # results to bf16 precision, different HBM footprint; adc_qps is the
        # same-engine number comparable with BENCH_r03).
        "methodology": "pipelined_dispatch",
        "pipeline_depth": PIPELINE_DEPTH,
        "serving_mode": mode,
        "int8_headline_eligible": int8_ok,
        "adc_qps": round(adc_qps, 2),
        "decoded_qps": round(decoded_qps, 2),
        "decoded_int8_qps": round(decoded_int8_qps, 2),
        "vs_baseline": round(qps / BASELINE_QPS, 3),
        "vs_baseline_note": (
            "assumed 1500-QPS faiss V100 brute PQ48 scan (reference "
            "publishes no QPS table), grounded r5 by a same-geometry "
            "single-core CPU measurement on this host "
            "(recipes/bench_cpu_baseline.sh): brute 23.4 QPS/core, "
            "IVF-nprobe64 241 QPS/core => 1500 QPS = ~64x one core, "
            "inside faiss's published GPU-vs-CPU range"),
        "vs_cpu_core_same_config": round(qps / CPU_CORE_IVFPQ_QPS, 1),
    }))


if __name__ == "__main__":
    _check_tunnel_alive()
    _acquire_chip()
    main()
