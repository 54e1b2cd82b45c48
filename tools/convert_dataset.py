#!/usr/bin/env python
"""Convert PyTorch/PyG dataset caches into the framework's npz convention.

The reference downloads datasets through PyG loaders (reference
datasets.py:43-107). This container has no network access, so real datasets
arrive as files. This tool converts:

  * a PyG `processed/data.pt` (torch.save of (data, slices) or Data)
  * a plain torch.save dict with x / edge_index / y / masks
  * .npy arrays in a directory

into `<out>/<name>.npz` with arrays `x`, `edge_index`, `y` and optional
`train_mask`/`val_mask`/`test_mask` — the format data/registry.py loads.

Usage:
  python tools/convert_dataset.py <input.pt|dir> <name> [--out ./Dataset]
"""
import argparse
import os
import sys

import numpy as np


def _to_np(t):
    import torch
    if isinstance(t, torch.Tensor):
        return t.detach().cpu().numpy()
    return np.asarray(t)


def load_torch_file(path):
    import torch
    obj = torch.load(path, map_location="cpu", weights_only=False)
    # PyG collate format: (data, slices) or InMemoryDataset payloads
    if isinstance(obj, tuple):
        obj = obj[0]
    if hasattr(obj, "to_dict"):
        obj = obj.to_dict()
    if not isinstance(obj, dict):
        # torch_geometric Data-like: pull attributes
        obj = {k: getattr(obj, k) for k in
               ("x", "edge_index", "y", "train_mask", "val_mask", "test_mask")
               if hasattr(obj, k)}
    return {k: _to_np(v) for k, v in obj.items() if v is not None}


def load_dir(path):
    out = {}
    for k in ("x", "edge_index", "y", "train_mask", "val_mask", "test_mask"):
        p = os.path.join(path, f"{k}.npy")
        if os.path.exists(p):
            out[k] = np.load(p)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("input")
    ap.add_argument("name")
    ap.add_argument("--out", default="./Dataset")
    args = ap.parse_args()

    if os.path.isdir(args.input):
        d = load_dir(args.input)
    else:
        d = load_torch_file(args.input)

    required = {"x", "edge_index", "y"}
    missing = required - set(d)
    if missing:
        sys.exit(f"missing arrays: {missing}; found {sorted(d)}")

    d["x"] = d["x"].astype(np.float32)
    d["edge_index"] = d["edge_index"].astype(np.int32)
    y = d["y"]
    if y.ndim > 1:  # multi-label -> argmax (reference Dataset.ipynb get_data)
        y = y.argmax(axis=1)
    y = y.astype(np.int64)
    if y.min() < 0:  # shift negatives (reference label normalization)
        y = y - y.min()
    d["y"] = y.astype(np.int32)

    os.makedirs(args.out, exist_ok=True)
    out_path = os.path.join(args.out, f"{args.name}.npz")
    np.savez_compressed(out_path, **d)
    n, e = d["x"].shape[0], d["edge_index"].shape[1]
    print(f"wrote {out_path}: {n} nodes, {e} edges, "
          f"{int(d['y'].max()) + 1} classes")


if __name__ == "__main__":
    main()
