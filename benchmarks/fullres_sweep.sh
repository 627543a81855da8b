#!/bin/sh
# Full-resolution KITTI (384x1280 ~= native 375x1242 rounded to /32)
# training sweep — the evidence VERDICT r4 item 2 asked for: does
# full-res fit one v5e chip, where is the OOM boundary, and does
# --remat (activation checkpointing) unlock anything there?
# Run: sh benchmarks/fullres_sweep.sh | tee /tmp/fullres_sweep.txt
set -x
for b in 4 8 16 32; do
  timeout 540 python benchmarks/train_bench.py --mode supervised \
    --network disp_res_50 --loss berhu --img-height 384 --img-width 1280 \
    --batch "$b" --iters 8 2>&1 | tail -1
done
for b in 16 32; do
  timeout 540 python benchmarks/train_bench.py --mode supervised \
    --network disp_res_50 --loss berhu --img-height 384 --img-width 1280 \
    --batch "$b" --iters 8 --remat 2>&1 | tail -1
done
for b in 4 8 16; do
  timeout 540 python benchmarks/train_bench.py --mode selfsup \
    --img-height 384 --img-width 1280 --batch "$b" --iters 8 2>&1 | tail -1
done
for b in 8 16; do
  timeout 540 python benchmarks/train_bench.py --mode selfsup \
    --img-height 384 --img-width 1280 --batch "$b" --iters 8 --remat 2>&1 | tail -1
done
