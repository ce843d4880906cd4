#!/bin/bash
# Round-5 perf measurement pass (VERDICT r04 items #2/#3): run AFTER the
# chip is free (single client through the relay — see QUIRKS.md).
#
#  1. serve_breakdown revalidation under the floor-subtracted harness
#     (+ ablations) — closes the round-4 floor-proof asterisk.
#  2. train_benchmark XLA vs --pallas_train at b64/b128 with the fused
#     block backward.
#  3. train_breakdown at b64 and (co-tenant permitting) b128 — the
#     per-consumer rows are floor-subtracted and meaningful now.
set -x
cd "$(dirname "$0")/.."
OUT_S=artifacts/serve_bench
OUT_T=artifacts/train_bench
mkdir -p "$OUT_S" "$OUT_T"

# Ordered so the highest-priority number (the fused-backward b128
# pallas_train throughput — VERDICT r04 item #2) lands first if a wall
# clock or a co-tenant cuts the pass short.
for b in 128 64; do
  timeout 4000 python -u -m sim2real_lane_segment_tpu.cli.train_benchmark \
    --archs 67 -b $b --pallas_train 2>&1 \
    | tee -a "$OUT_T"/train_benchmark_67_r5.log
  timeout 4000 python -u -m sim2real_lane_segment_tpu.cli.train_benchmark \
    --archs 67 -b $b 2>&1 | tee -a "$OUT_T"/train_benchmark_67_r5.log
done

timeout 4000 python -u -m sim2real_lane_segment_tpu.cli.serve_breakdown \
  --arch 67 -b 256 --ablate 120x160 2>&1 \
  | tee "$OUT_S"/serve_breakdown_67_b256_r5.log

timeout 4000 python -u -m sim2real_lane_segment_tpu.cli.train_breakdown \
  --arch 67 -b 64 2>&1 | tee "$OUT_T"/train_breakdown_67_b64_r5.log
timeout 4000 python -u -m sim2real_lane_segment_tpu.cli.train_breakdown \
  --arch 67 -b 128 2>&1 | tee "$OUT_T"/train_breakdown_67_b128_r5.log
