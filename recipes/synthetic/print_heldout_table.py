"""Print the held-out-encoder matrix table (RESULTS.md format) from a
round4_heldout.sh workspace. Usage:
  python recipes/synthetic/print_heldout_table.py [/root/ws4]
"""
import json
import os
import sys

ws = sys.argv[1] if len(sys.argv) > 1 else "/root/ws4"
root = os.path.join(ws, "experiments", "synth")
rows = [
    ("dense (task side)", f"{root}/dense/dev"),
    ("OPQ warmup (no training)", f"{root}/m12/opq_index/dev"),
    ("JPQ-only (stage 2 only)", f"{root}/m12/jpq_only_index/dev"),
    ("RepCONC (stage 1)", f"{root}/m12/conc_index/dev"),
    ("RepCONC+JPQ (stages 1+2)", f"{root}/m12/jpq_index/dev"),
]
print("| variant | dev MRR@10 | dev NDCG@10 | dev R@100 |")
print("|---|---|---|---|")
for name, p in rows:
    mp = os.path.join(p, "metric.json")
    if not os.path.exists(mp):
        print(f"| {name} | (missing) | | |")
        continue
    m = json.load(open(mp))
    print(f"| {name} | {m['mrr']['MRR@10']:.4f} | "
          f"{m['ndcg']['NDCG@10']:.4f} | "
          f"{m['recall']['Recall@100']:.4f} |")
