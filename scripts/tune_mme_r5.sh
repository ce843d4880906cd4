#!/bin/bash
# Real HPO sweep on the chip (VERDICT r04 item #4): 16 MME trials,
# TPE + ASHA, over the reference's search space (tune.py:57-100 —
# log_lr, log_lrRatio, log_decay; mean_iou objective).  Toy-scale data
# (3 episodes x 144 steps per domain, the committed-study scale) keeps
# a trial to minutes; the capability under test is the sweep machinery
# end-to-end on real hardware, not the endpoint IoU.
#
# Usage: bash scripts/tune_mme_r5.sh [workdir]
set -e
cd "$(dirname "$0")/.."
W=${1:-/root/tune_mme_r5}
mkdir -p "$W"

# render the two domains + build the simRealData-contract tree with the
# same functions the domain study uses (appearance-shifted target)
python -u - "$W" <<'PY'
import os
import sys

from sim2real_lane_segment_tpu.cli.domain_study import (_build_tree,
                                                        _record_domain)

os.chdir(sys.argv[1])
_record_domain("sourceData", "loop_empty", seed=0, episodes=3, steps=144,
               distortion=True)
_record_domain("targetData", "zigzag", seed=9, episodes=3, steps=144,
               distortion=True, color_shift=((1.05, 0.85, 0.7), -12))
root = _build_tree("srd_mme", "sourceData", "targetData", 32, hm=False)
print("tree ready:", root)
PY

timeout 10800 python -u -m sim2real_lane_segment_tpu.cli.tune \
  --dataPath "$W/srd_mme" --arch 67r --num_samples 12 --num_epochs 40 \
  --grace_period 20 --reduction_factor 4 --search tpe --augment \
  --eval_default -b 32 --load2memory --device_cache \
  --out_dir "$W/tune_out" 2>&1 | tee "$W/tune_stdout.log"

OUT=artifacts/tune_mme
mkdir -p "$OUT"
cp "$W"/tune_out/best.json "$W"/tune_out/trials.json "$OUT"/
for d in "$W"/tune_out/trial_*; do
  if [ -f "$d/metrics.jsonl" ]; then
    cp "$d/metrics.jsonl" "$OUT"/$(basename "$d")_metrics.jsonl
  fi
done
cp "$W"/tune_stdout.log "$OUT"/
echo "sweep artifacts copied to $OUT"
