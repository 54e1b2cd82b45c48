"""Compare CPU vs TPU quality-sweep F1 summaries.

The TPU quality sweep (Scripts/run_quality_tpu.sh) re-runs the CPU quality
protocol (Scripts/run_sgsgnn.sh, reference main.py:272-306) with the bench
configuration (bf16 matmuls, rbg PRNG, approx top-k, tile index auto, dense
route auto, fused head auto) — this tool pairs up logs/quality_<cfg>.log
with logs/quality_<cfg>_tpu.log and prints the three summary F1 lines side
by side, flagging any pair whose loaded-best-val test F1 differs by more
than the CPU run-to-run spread (3 sigma + 0.02 absolute floor).

Usage: python tools/quality_compare.py [logs_dir]
"""
from __future__ import annotations

import os
import re
import sys

SUMMARY = re.compile(
    r"Mean Std of Loaded best Val model Test F1 Score: "
    r"([0-9.]+) \+/- ([0-9.]+)")


def read_summary(path):
    try:
        with open(path) as f:
            m = SUMMARY.findall(f.read())
        return (float(m[-1][0]), float(m[-1][1])) if m else None
    except OSError:
        return None


def main(logs_dir="logs"):
    pairs = []
    for fn in sorted(os.listdir(logs_dir)):
        if fn.startswith("quality_") and fn.endswith("_tpu.log"):
            cpu = fn[:-8] + ".log"
            pairs.append((cpu, fn))
    if not pairs:
        print("no quality_*_tpu.log files found in", logs_dir)
        return 1
    bad = 0
    print(f"{'config':44s} {'cpu F1':>14s} {'tpu F1':>14s}  verdict")
    for cpu, tpu in pairs:
        s_cpu = read_summary(os.path.join(logs_dir, cpu))
        s_tpu = read_summary(os.path.join(logs_dir, tpu))
        name = tpu[len("quality_"):-len("_tpu.log")]
        if s_tpu is None:
            print(f"{name:44s} {'-':>14s} {'-':>14s}  tpu log incomplete")
            bad += 1
            continue
        if s_cpu is None:
            print(f"{name:44s} {'-':>14s} "
                  f"{s_tpu[0]:7.4f}±{s_tpu[1]:5.4f}  no cpu reference")
            continue
        # one-sided: only a REGRESSION below the CPU reference (beyond the
        # run spread) is a failure — the TPU config uses a different PRNG
        # stream (rbg), so run-to-run F1 legitimately differs in both
        # directions and higher is unobjectionable
        tol = max(3.0 * max(s_cpu[1], s_tpu[1]), 0.02)
        delta = s_tpu[0] - s_cpu[0]
        ok = delta >= -tol
        bad += 0 if ok else 1
        verdict = ("ok (better)" if delta > tol else "ok" if ok
                   else f"REGRESSES (tol {tol:.3f})")
        print(f"{name:44s} {s_cpu[0]:7.4f}±{s_cpu[1]:5.4f} "
              f"{s_tpu[0]:7.4f}±{s_tpu[1]:5.4f}  {verdict}")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main(*sys.argv[1:]))
