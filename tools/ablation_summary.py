"""Summarize the TPU ablation grid (Scripts/run_ablation_tpu.sh) into one
table: backbone x scorer -> final F1 +/- spread and edges/s, per dataset.
Exit 1 if any expected config's log is missing/incomplete."""
from __future__ import annotations

import os
import re
import sys

SUMMARY = re.compile(
    r"Mean Std of Loaded best Val model Test F1 Score: "
    r"([0-9.]+) \+/- ([0-9.]+)")
STATS = re.compile(r"edges_per_s=([0-9.]+)")

GNNS = ("GCN", "GIN", "Cheb", "GAT")
SCORERS = ("MLP", "GSAGE", "GCN")


def main(logs_dir="logs", datasets="SyntheticSBM,Moon"):
    bad = 0
    for ds in datasets.split(","):
        print(f"\n== {ds} (GNN x scorer, TPU) ==")
        print(f"{'GNN':6s} " + " ".join(f"{s:>20s}" for s in SCORERS)
              + f" {'edges/s (GCN scorer)':>22s}")
        for gnn in GNNS:
            cells = []
            eps = "-"
            for sc in SCORERS:
                path = os.path.join(logs_dir,
                                    f"ablation_{ds}_{gnn}_{sc}_tpu.log")
                try:
                    text = open(path).read()
                except OSError:
                    cells.append(f"{'MISSING':>20s}")
                    bad += 1
                    continue
                m = SUMMARY.findall(text)
                if not m:
                    cells.append(f"{'incomplete':>20s}")
                    bad += 1
                    continue
                cells.append(f"{float(m[-1][0]):13.4f}±{float(m[-1][1]):.4f}")
                if sc == "GCN":
                    es = STATS.findall(text)
                    if es:
                        eps = f"{float(es[-1]) / 1e6:.2f}M"
            print(f"{gnn:6s} " + " ".join(cells) + f" {eps:>22s}")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main(*sys.argv[1:]))
