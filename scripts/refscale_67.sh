#!/bin/bash
# Reference-scale training recipe (VERDICT r02 item #4).
#
# The reference's actual recipe is batch 64 / 175 epochs on a ~2.3k-frame
# simData tree for the supervised module, and batch 32 / 175 epochs for
# MME from the baseline's weights (/root/reference/README.md:139,252).
# Every earlier committed study row was ~300 frames x 40 epochs; this
# runs the same one-command study machinery at the reference's scale:
# 16 episodes x 144 steps = 2,304 frames per domain, FCDenseNet67.
#
# Run on the TPU chip (single process; the study is crash-resumable).
# The dev chip is shared: co-tenant HBM spikes can kill a fit even after
# the in-process retries/relief valve (observed round 4: a 16-byte PRNG
# split failed RESOURCE_EXHAUSTED) — so each study command is retried
# here with a backoff, resuming from its own checkpoints.
cd "$(dirname "$0")/.."
W=${1:-/root/refscale_67}
# ARCH defaults to the rematerialized 67 ("67r": identical parameters and
# math to the 67 — remat recomputes block activations in backward), whose
# small HBM footprint rides out the shared chip's co-tenant pressure
# waves; observed round 4: the plain 67's b64 activations OOMed through
# every retry ladder during multi-minute waves.
ARCH=${2:-67r}

run_with_resume() {
  for attempt in 1 2 3 4 5; do
    timeout 10800 python -u -m sim2real_lane_segment_tpu.cli.domain_study "$@" \
      && return 0
    echo "refscale: attempt $attempt failed (rc=$?); resuming in $((attempt*120))s" >&2
    sleep $((attempt*120))
  done
  return 1
}

set -e
run_with_resume \
  --workdir "$W" --arch "$ARCH" --epochs 175 --episodes 16 --steps 144 \
  --batch_size 64 --device_cache --regimes baseline
run_with_resume \
  --workdir "$W" --arch "$ARCH" --epochs 175 --episodes 16 --steps 144 \
  --batch_size 32 --device_cache --regimes mme

OUT=artifacts/refscale_67
mkdir -p "$OUT"
cp "$W"/results/baseline/metrics.jsonl "$OUT"/baseline_metrics.jsonl
cp "$W"/results/mme/metrics.jsonl "$OUT"/mme_metrics.jsonl
cp "$W"/study_summary.json "$OUT"/study_summary.json
echo "reference-scale logs copied to $OUT"
