#!/usr/bin/env bash
# Benchmark sweep — the analog of /root/reference/tests/cpu/run_test.sh:
# datasets × backends × models, appending CSV rows per model file.
# Usage: scripts/run_all.sh [scale] [epochs]
set -u
cd "$(dirname "$0")/.."

SCALE="${1:-0.02}"
EPOCHS="${2:-2}"
OUT_DIR="${BENCH_OUT:-bench_results}"
mkdir -p "$OUT_DIR"

datasets="reddit reddit2 protein mag"
# pt1 = the reference's torch CPU comparison column (A/B format,
# /root/reference/tests/cpu/run_test.sh:5-16)
backends="pt1 xla pallas"

for d in $datasets; do
  for b in $backends; do
    echo "=== GCN $d $b ==="
    python scripts/run_model.py gcn  "$d" "$b" --scale "$SCALE" --epochs "$EPOCHS" | tee -a "$OUT_DIR/gcn.txt"
    echo "=== SAGE-sum $d $b ==="
    python scripts/run_model.py sage "$d" "$b" --aggr sum  --scale "$SCALE" --epochs "$EPOCHS" | tee -a "$OUT_DIR/sage-sum.txt"
    echo "=== SAGE-mean $d $b (nopad) ==="
    python scripts/run_model.py sage "$d" "$b" --aggr mean --nopad --scale "$SCALE" --epochs "$EPOCHS" | tee -a "$OUT_DIR/sage-mean-nopad.txt"
    echo "=== GIN $d $b ==="
    python scripts/run_model.py gin  "$d" "$b" --scale "$SCALE" --epochs "$EPOCHS" | tee -a "$OUT_DIR/gin.txt"
  done
done
