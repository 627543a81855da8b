#!/bin/bash
# Round-3 pending measurement: self-sup batch sweep with/without --remat
# (ROADMAP.md "Performance": the B=64 HBM working-set cliff probe).
# Runs serially on the single real TPU chip.
set -u
cd "$(dirname "$0")/.."
for b in 32 64 128; do
  for flag in "" "--remat"; do
    echo "=== selfsup dispnet B=$b $flag ==="
    timeout 580 python benchmarks/train_bench.py --mode selfsup \
      --network dispnet --batch "$b" $flag --iters 10 2>&1 | tail -3
  done
done
