"""Sweep the IVF serving kernel's geometry (QT_G x R_TILES) on the chip.

The cell-grouped kernel's remaining tuning lever is QT_G, the query slots
per work tile: at the headline shape (Q=1200, nprobe=64, nlist=4096) the
mean pairs/cell is ~19, so QT_G=32 pads ~40% of MXU rows; QT_G=16 halves
that padding but doubles the tile count (one one-hot build per tile), and
QT_G=64 does the reverse. Which side wins is a DMA-vs-VPU balance question
the round-2 notes left open ("more queries/tile is the structural escape").

Each config runs `bench.py` in a fresh subprocess (the constants are bound
at module import; see pallas_ivf.py REPCONC_IVF_* env overrides) and the
one-line JSON result is collected into a table.

Usage (on the chip):  python recipes/bench_kernel_sweep.py
"""
import itertools
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

QT_GS = (16, 32, 64)
R_TILESS = (1, 2)


def main():
    results = []
    for qt_g, r_tiles in itertools.product(QT_GS, R_TILESS):
        env = dict(os.environ,
                   REPCONC_IVF_QT_G=str(qt_g),
                   REPCONC_IVF_R_TILES=str(r_tiles),
                   # ADC arm only: decoded serving ignores kernel geometry
                   REPCONC_BENCH_SERVING="adc")
        print(f"=== QT_G={qt_g} R_TILES={r_tiles} ===", flush=True)
        try:
            out = subprocess.run(
                [sys.executable, os.path.join(REPO, "bench.py")],
                env=env, capture_output=True, text=True, timeout=1800)
            line = [l for l in out.stdout.splitlines()
                    if l.strip().startswith("{")][-1]
            rec = json.loads(line)
        except (subprocess.TimeoutExpired, IndexError, json.JSONDecodeError) as e:
            print(f"  failed: {e}", flush=True)
            results.append({"qt_g": qt_g, "r_tiles": r_tiles, "qps": None})
            continue
        print(f"  {rec['value']:.0f} {rec['unit']}", flush=True)
        results.append({"qt_g": qt_g, "r_tiles": r_tiles,
                        "qps": rec["value"]})

    print("\nQT_G  R_TILES  QPS")
    for r in sorted(results, key=lambda r: -(r["qps"] or 0)):
        qps = f"{r['qps']:.0f}" if r["qps"] else "FAIL"
        print(f"{r['qt_g']:>4}  {r['r_tiles']:>7}  {qps}")
    best = max((r for r in results if r["qps"]), key=lambda r: r["qps"],
               default=None)
    if best:
        print(f"\nbest: QT_G={best['qt_g']} R_TILES={best['r_tiles']} "
              f"({best['qps']:.0f} qps)")


if __name__ == "__main__":
    main()
