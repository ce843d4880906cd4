#!/bin/bash
# Reference-scale training recipe (VERDICT r02 item #4; extended to the
# full 5-regime + 5-student matrix in round 5 per VERDICT r04 item #1).
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
  local attempt
  for attempt in 1 2 3 4; do
    timeout 10800 python -u -m sim2real_lane_segment_tpu.cli.domain_study "$@" \
      && return 0
    echo "refscale: attempt $attempt failed (rc=$?); resuming in $((attempt*120))s" >&2
    sleep $((attempt*120))
  done
  # final try — no sleep after a terminal failure (ADVICE r04)
  timeout 10800 python -u -m sim2real_lane_segment_tpu.cli.domain_study "$@"
}

set -e
# Legs run serially, one regime per process, so a co-tenant OOM costs at
# most one regime's progress and the per-regime cache_attempts ladder
# (domain_study.regime_cache) stays scoped to the leg that crashed.
run_with_resume \
  --workdir "$W" --arch "$ARCH" --epochs 175 --episodes 16 --steps 144 \
  --batch_size 64 --device_cache --regimes baseline
run_with_resume \
  --workdir "$W" --arch "$ARCH" --epochs 175 --episodes 16 --steps 144 \
  --batch_size 32 --device_cache --regimes mme
run_with_resume \
  --workdir "$W" --arch "$ARCH" --epochs 175 --episodes 16 --steps 144 \
  --batch_size 64 --device_cache --regimes st
run_with_resume \
  --workdir "$W" --arch "$ARCH" --epochs 175 --episodes 16 --steps 144 \
  --batch_size 64 --device_cache --regimes hm
run_with_resume \
  --workdir "$W" --arch "$ARCH" --epochs 175 --episodes 16 --steps 144 \
  --batch_size 64 --device_cache --regimes cyclegan
# Students: one leg for all five so the distill loop sees every cached
# teacher; the regime fits themselves are all cached by now and skip.
run_with_resume \
  --workdir "$W" --arch "$ARCH" --epochs 175 --episodes 16 --steps 144 \
  --batch_size 64 --device_cache --distill \
  --regimes baseline st hm cyclegan mme

OUT=artifacts/refscale_67
mkdir -p "$OUT"
for r in baseline st hm cyclegan mme; do
  cp "$W"/results/$r/metrics.jsonl "$OUT"/${r}_metrics.jsonl
  # teacher weights too: container recycles have twice destroyed the
  # workdir between sessions — committed weights let a later session
  # run the student/distill legs without refitting 5 teachers
  if [ -f "$W"/results/$r/best_weights.msgpack ]; then
    cp "$W"/results/$r/best_weights.msgpack "$OUT"/${r}_weights.msgpack
  fi
  if [ -f "$W"/results/student_$r/metrics.jsonl ]; then
    cp "$W"/results/student_$r/metrics.jsonl "$OUT"/student_${r}_metrics.jsonl
  fi
  # reference-scale student weights: the artifact behind bench.py's
  # student-serving headline (VERDICT r04 stretch #8)
  if [ -f "$W"/results/student_$r/best_weights.msgpack ]; then
    cp "$W"/results/student_$r/best_weights.msgpack \
       "$OUT"/student_${r}_weights.msgpack
  fi
done
cp "$W"/study_summary.json "$OUT"/study_summary.json
echo "reference-scale logs copied to $OUT"
