"""Reduced-scale discriminative smoke test for the SyntheticRedditLow recipe.

Before burning TPU wall-clock on the 116M-edge sweep
(Scripts/run_reddit_modes.sh), verify that community_sbm_low_graph's
regime (uninformative aggregate edge set + noisy features + clean labels)
separates the LEARNED sparsifier from random-20% and full-graph training
at a 20k-node / ~1.5M-edge scale — same generator, same driver path, same
modes as the flagship run (reference README.md:3-5 is the claim under
test).

Usage: python tools/redditlow_smoke.py [--epochs 40] [--n 20000]
"""
import argparse
import sys

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=20000)
    ap.add_argument("--deg", type=int, default=40)
    ap.add_argument("--communities", type=int, default=16)
    ap.add_argument("--epochs", type=int, default=40)
    ap.add_argument("--modes", nargs="+",
                    default=["learned", "random", "full"])
    args = ap.parse_args()

    import sgs_gnn_tpu.data.registry as reg
    from sgs_gnn_tpu.core.config import Config
    from sgs_gnn_tpu.data.synthetic import community_sbm_low_graph
    from sgs_gnn_tpu.run.driver import run_experiment

    orig_load = reg._load_raw

    def patched(cfg, name):
        if name == "SyntheticRedditLow":
            x, ei, y, (tr, va, te) = community_sbm_low_graph(
                n=args.n, communities=args.communities, deg=args.deg,
                seed=cfg.seed)
            return x, ei, y, {"train_mask": tr, "val_mask": va,
                              "test_mask": te}
        return orig_load(cfg, name)

    reg._load_raw = patched

    rows = {}
    for mode in args.modes:
        cfg = Config(dataset="SyntheticRedditLow", mode=mode,
                     pipeline="hybrid", sample_perc=0.2,
                     edge_mlp_type="GCN", GNN="GCN", sparse_edge_mlp=True,
                     conditional=True, reg1=True, reg2=True,
                     epochs=args.epochs, runs=1, convergence=0.0,
                     metis_threshold=1000000, dtype="bfloat16",
                     prng_impl="rbg", approx_topk=True,
                     num_samples_eval=1, save_csv=False, log=True)
        print(f"=== mode={mode} ===", flush=True)
        res = run_experiment(cfg)[0]
        rows[mode] = res
        print(f"[smoke] mode={mode} best_test={res.best_test_f1:.4f} "
              f"test_at_best_val={res.test_at_best_val:.4f} "
              f"epoch={res.mean_epoch_time:.3f}s", flush=True)

    print("\nmode        best_test  test@best_val")
    for m, r in rows.items():
        print(f"{m:<10}  {r.best_test_f1:.4f}     {r.test_at_best_val:.4f}")
    if "learned" in rows:
        others = [r.test_at_best_val for m, r in rows.items()
                  if m != "learned"]
        ok = all(rows["learned"].test_at_best_val > o + 0.05 for o in others)
        print(f"[smoke] learned separates by >0.05: {ok}")
        sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
