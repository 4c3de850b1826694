#!/usr/bin/env python
"""Benchmark CLI — reproduces the reference test-script interface.

Reference:  python gcn-sparse.py <dataset> <pt2|pt1|isplib> [aggr] [nopad]
            (/root/reference/tests/cpu/gcn-sparse.py:25-37,
             graphSAGE-sparse.py:40-47)
Here:       python scripts/run_model.py gcn <dataset> <xla|pallas|auto>
                [--aggr sum|mean] [--epochs N] [--embedding 32]
                [--scale S] [--nopad]

Backends map as: pt2/pt1 (torch_sparse oracle) → xla; isplib (native
kernel) → pallas.  Prints the same TRG_TM / TRG_STD / TST_TM / TRG_ACC /
TST_ACC table (gcn-sparse.py:118-126) plus a CSV line for run_all.sh.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("model", choices=["gcn", "sage", "gin"])
    ap.add_argument("dataset")
    ap.add_argument("backend", nargs="?", default="auto",
                    choices=["xla", "pallas", "auto", "pt1"])
    ap.add_argument("--aggr", default="sum", choices=["sum", "mean",
                                                      "max", "min"])
    ap.add_argument("--epochs", type=int, default=2)      # EPOCH_COUNT
    ap.add_argument("--embedding", type=int, default=32)  # EMBEDDING_SIZE
    ap.add_argument("--scale", type=float, default=0.02)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--nopad", action="store_true",
                    help="skip feature padding to the lane multiple")
    ap.add_argument("--tiling", default="v5",
                    help="'v5' (r4 hybrid default), or rb,ct,eb for a "
                         "v2 plan")
    args = ap.parse_args()

    print(f"Running {args.model.upper()}, Epoch: {args.epochs}, "
          f"Embedding: {args.embedding}, Dataset: {args.dataset}, "
          f"Mode: {args.backend}")

    from isplib_tpu.data import load, pad_features
    from isplib_tpu.nn import MODEL_REGISTRY
    from isplib_tpu.train import train_node_classifier

    t0 = time.time()
    tiling = None
    if args.backend in ("pallas", "auto"):
        if args.tiling == "v5":
            tiling = dict(version=5, rb=512, dense_threshold=128, S=8,
                          g=8, gd=8, k=args.embedding,
                          build_minmax=args.model == "sage"
                          and args.aggr == "max")
        else:
            tiling = tuple(int(v) for v in args.tiling.split(","))
    ds = load(args.dataset, scale=args.scale, tiling=tiling)
    if not args.nopad:
        ds = pad_features(ds)
    print(f"loaded {ds.name}: {ds.num_nodes} nodes, {ds.graph.nnz} edges, "
          f"{ds.num_features} features, {ds.num_classes} classes "
          f"({time.time() - t0:.1f}s)", file=sys.stderr)

    if args.backend == "pt1":
        # the reference's torch-side comparison column (A/B format,
        # /root/reference/tests/cpu/gcn-sparse.py:29-37): same model,
        # protocol and dataset through plain torch CPU sparse ops
        from isplib_tpu.interop.torch_baseline import train_torch_baseline
        res = train_torch_baseline(
            args.model, ds, epochs=args.epochs, hidden=args.embedding,
            aggr=args.aggr, seed=args.seed)
    else:
        kwargs = dict(hidden=args.embedding, num_classes=ds.num_classes,
                      backend=args.backend)
        if args.model == "sage":
            kwargs["aggr"] = args.aggr
        model = MODEL_REGISTRY[args.model](**kwargs)

        res = train_node_classifier(model, ds, epochs=args.epochs,
                                    seed=args.seed)
    print()
    print(res.table())
    print()
    # CSV row (run_test.sh appends these per-config,
    # /root/reference/tests/cpu/run_test.sh:7-12)
    print(f"{res.train_time_avg:.4},{res.train_time_std:.4},"
          f"{res.test_time:.4},{res.train_acc:.4},{res.test_acc:.4}")
    print("---")


if __name__ == "__main__":
    main()
