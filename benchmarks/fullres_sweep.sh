#!/bin/bash
# Round-5 full-resolution sweep (VERDICT r4 item 2): 384x1280 KITTI-raw
# resolution on one v5e chip. Finds the OOM boundary and measures whether
# --remat ever pays at full res (its stated motivation, parallel/mesh.py).
# Supervised B=4/8/16 were measured earlier this round (38.8 / 82.9 / 86.3
# img/s, no OOM); this script runs the remaining arms serially.
set -u
cd "$(dirname "$0")/.."
LOG=${1:-/tmp/fullres_sweep.jsonl}
: > "$LOG"
run() {
  desc="$1"; shift
  echo "=== $desc : $*" | tee -a "$LOG"
  timeout 900 python benchmarks/train_bench.py --img-height 384 --img-width 1280 "$@" 2>/tmp/arm_err.txt
  rc=$?
  if [ $rc -ne 0 ]; then
    echo "FAILED rc=$rc: $desc" | tee -a "$LOG"
    grep -i -m2 "RESOURCE_EXHAUSTED\|out of memory\|OOM" /tmp/arm_err.txt | tee -a "$LOG"
    tail -3 /tmp/arm_err.txt >> "$LOG"
  fi
}
# stdout of train_bench carries the img/s line; append it
exec > >(tee -a "$LOG") 2>&1
run "sup B=32"           --batch 32 --iters 10
run "sup B=64"           --batch 64 --iters 10
run "sup B=96"           --batch 96 --iters 5
run "sup B=32 remat"     --batch 32 --iters 10 --remat
run "sup B=64 remat"     --batch 64 --iters 10 --remat
run "selfsup B=4"        --mode selfsup --batch 4 --iters 10
run "selfsup B=8"        --mode selfsup --batch 8 --iters 10
run "selfsup B=16"       --mode selfsup --batch 16 --iters 10
run "selfsup B=32"       --mode selfsup --batch 32 --iters 5
run "selfsup B=16 remat" --mode selfsup --batch 16 --iters 10 --remat
run "selfsup B=32 remat" --mode selfsup --batch 32 --iters 5 --remat
echo "SWEEP DONE"
