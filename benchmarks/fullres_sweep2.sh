#!/bin/bash
# Round-5 full-res sweep, part 2: reduced self-sup arms + the sup B=32
# no-remat retry, each with a 40-min timeout (relay-degraded full-res
# compiles measured >15 min; the part-1 900 s arm budget was too tight).
set -u
cd "$(dirname "$0")/.."
LOG=${1:-/tmp/fullres_sweep2.jsonl}
: > "$LOG"
run() {
  desc="$1"; shift
  echo "=== $desc : $* [$(date +%H:%M:%S)]" >> "$LOG"
  timeout 2400 python benchmarks/train_bench.py --img-height 384 --img-width 1280 "$@" >> "$LOG" 2>/tmp/arm2_err.txt
  rc=$?
  if [ $rc -ne 0 ]; then
    echo "FAILED rc=$rc: $desc" >> "$LOG"
    grep -i -m2 "RESOURCE_EXHAUSTED\|out of memory\|hbm capacity" /tmp/arm2_err.txt >> "$LOG"
    tail -2 /tmp/arm2_err.txt >> "$LOG"
  fi
}
run "selfsup B=8"        --mode selfsup --batch 8 --iters 10
run "selfsup B=16"       --mode selfsup --batch 16 --iters 10
run "selfsup B=16 remat" --mode selfsup --batch 16 --iters 10 --remat
run "selfsup B=32"       --mode selfsup --batch 32 --iters 5
run "sup B=32 no-remat retry" --batch 32 --iters 10
echo "SWEEP2 DONE" >> "$LOG"
