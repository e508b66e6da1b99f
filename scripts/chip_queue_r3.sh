#!/bin/bash
# Round-3 chip work queue v2: serialises the remaining single-chip jobs
# behind the in-flight three-arm quality study (scripts/quality_study.sh).
#
#   1. wait for the study driver to finish
#   2. if the skeleton study shows Experiment ~ Control (gap < +0.03 DSC
#      per-patient) AND /tmp/SKIP_DILATED is absent, run the
#      dilated-scribble Control/Experiment variant (richer supervision —
#      the regime the reference's +0.26 gain lives in)
#   3. LVSC-scale rehearsal (scripts/lvsc_rehearsal.sh)
#   4. warp-table construction A/B (xla vs pallas, aug-only profile)
#   5. bench.py -> /tmp/bench_r3.json
#
# Usage: nohup bash scripts/chip_queue_r3.sh <study_pid> \
#            > /tmp/chip_queue.log 2>&1 &
set -u
cd /root/repo
STUDY_PID=${1:?study driver pid}

echo "[$(date +%H:%M:%S)] waiting on study driver pid $STUDY_PID"
while kill -0 "$STUDY_PID" 2>/dev/null; do sleep 60; done
sleep 10   # let the chip relay settle

GAP=$(python - <<'EOF'
import json, subprocess, sys
r = subprocess.run(
    [sys.executable, "-m", "pacingpseudo_tpu.tools.study_summary",
     "--root", "study_r3", "--json", "/tmp/study_r3_summary.json"],
    capture_output=True, text=True)
print(r.stdout)
try:
    rows = {x["arm"]: x for x in json.load(open("/tmp/study_r3_summary.json"))}
    gap = rows["Experiment"]["test_dice_patient"] - rows["Control"]["test_dice_patient"]
    open("/tmp/study_gap.txt", "w").write(f"{gap:.4f}")
except Exception as e:
    open("/tmp/study_gap.txt", "w").write("nan")
EOF
cat /tmp/study_gap.txt)
echo "[$(date +%H:%M:%S)] skeleton study gap (Experiment-Control) = $GAP"

NEED_DILATED=$(python -c "
import math
g = open('/tmp/study_gap.txt').read()
try:
    v = float(g)
    print(1 if (math.isnan(v) or v < 0.03) else 0)
except ValueError:
    print(1)")
if [ "$NEED_DILATED" = 1 ] && [ ! -f /tmp/SKIP_DILATED ]; then
  echo "[$(date +%H:%M:%S)] gap weak -> dilated-scribble study"
  bash scripts/quality_study_dilated.sh
  sleep 10
else
  echo "[$(date +%H:%M:%S)] skipping dilated study"
fi

echo "[$(date +%H:%M:%S)] LVSC rehearsal (epochs=${LVSC_EPOCHS:-12})"
LVSC_EPOCHS=${LVSC_EPOCHS:-12} bash scripts/lvsc_rehearsal.sh
sleep 10

echo "[$(date +%H:%M:%S)] warp-table A/B (aug-only, batch 12)"
for impl in xla pallas; do
  timeout 900 python scripts/profile_step.py --aug_only --batch 12 \
      --steps 16 --warp_impl "$impl" --out "/tmp/prof_aug_$impl" \
      2>&1 | grep -E "aug batch|ms/step" || echo "warp $impl FAILED"
  sleep 5
done

echo "[$(date +%H:%M:%S)] bench.py"
timeout 1800 python bench.py > /tmp/bench_r3.json 2>/tmp/bench_r3.err \
    || echo "BENCH FAILED"
tail -1 /tmp/bench_r3.json
echo "[$(date +%H:%M:%S)] chip queue complete"
