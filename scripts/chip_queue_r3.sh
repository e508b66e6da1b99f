#!/bin/bash
# Round-3 chip work queue: serialises the remaining single-chip jobs
# behind the in-flight three-arm quality study (scripts/quality_study.sh).
#
#   1. wait for the study driver (and the LVSC datagen) to finish
#   2. LVSC-scale rehearsal (scripts/lvsc_rehearsal.sh, ~2 h)
#   3. warp-table construction A/B (xla vs pallas, aug-only profile)
#   4. bench.py -> /tmp/bench_r3.json
#
# Usage: nohup bash scripts/chip_queue_r3.sh <study_pid> <datagen_pid> \
#            > /tmp/chip_queue.log 2>&1 &
set -u
cd /root/repo
STUDY_PID=${1:?study driver pid}
GEN_PID=${2:-0}

echo "[$(date +%H:%M:%S)] waiting on study driver pid $STUDY_PID"
while kill -0 "$STUDY_PID" 2>/dev/null; do sleep 60; done
if [ "$GEN_PID" != 0 ]; then
  while kill -0 "$GEN_PID" 2>/dev/null; do sleep 30; done
fi
sleep 10   # let the chip relay settle

echo "[$(date +%H:%M:%S)] study done -> LVSC rehearsal"
bash scripts/lvsc_rehearsal.sh
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
