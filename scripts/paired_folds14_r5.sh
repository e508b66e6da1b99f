#!/bin/bash
# Round-5 continuation: extend the protocol-scale paired sweep from fold 0
# to the full five folds (README.md:100-126 protocol shape: 1,916 jagged
# slices, init_ch 32, 256^2, batch 12, 80-epoch arms under the ~18-min
# relay stream-stall horizon).  One sweep invocation per (fold, arm) so a
# stall costs at most one arm; fold{N}.json caches make every retry cheap.
# After all folds, re-invoke each arm over --folds 0..4 (all cached) to
# regenerate the five-fold sweep_summary.json + README-style table.
set -u
cd /root/repo
SW=/root/repo/study_r5/sweep
DEADLINE=$(cat /root/repo/study_r5/ROUND_DEADLINE 2>/dev/null || echo 0)
log() { echo "[$(date +%H:%M:%S)] $*"; }

EXP_FLAGS=(--do_loss_ent --do_decoder_consistency --do_aux_path --do_memory)

run_arm () { # run_arm <session> <fold> [extra flags...]
  local session=$1 fold=$2; shift 2
  local logf="$SW/${session}80.log"
  for attempt in 1 2 3; do
    [ -f "$SW/${session}80/fold${fold}.json" ] && return 0
    if [ "$DEADLINE" -gt 0 ] && [ "$(date +%s)" -gt $((DEADLINE - 1500)) ]; then
      log "deadline guard: skipping $session fold $fold"; return 1
    fi
    log "arm $session fold $fold attempt $attempt"
    timeout 2400 python -m pacingpseudo_tpu.cli.sweep \
        --dataset chaos --modality t1 --session "$session" \
        --tag "r5s80_$session" --epoch 80 \
        --synthetic_data 1916 --synthetic_difficulty jagged \
        --data_root "$SW/data" --root "$SW/runs" \
        --sweep_out "$SW/${session}80" --folds "$fold" "$@" \
        >> "$logf" 2>&1 &
    local pid=$!
    # stall watchdog: kill if the log stops growing for 330 s (compile
    # cache is hot after fold 0, so silent stretches should be short)
    local last=0 same=0
    while kill -0 $pid 2>/dev/null; do
      sleep 30
      local sz=$(wc -c < "$logf" 2>/dev/null || echo 0)
      if [ "$sz" -eq "$last" ]; then same=$((same+30)); else same=0; last=$sz; fi
      if [ "$same" -ge 330 ]; then
        log "STALL detected ($session fold $fold) — killing pid $pid"
        kill -9 $pid 2>/dev/null; rm -f /tmp/tpu_chip.lock
        break
      fi
    done
    wait $pid 2>/dev/null
    [ -f "$SW/${session}80/fold${fold}.json" ] && { log "arm $session fold $fold DONE"; return 0; }
  done
  log "arm $session fold $fold FAILED after retries"; return 1
}

for fold in 1 2 3 4; do
  run_arm Control "$fold"
  run_arm Experiment "$fold" "${EXP_FLAGS[@]}"
done

# Regenerate the five-fold summaries (every fold cached at this point;
# must pass the same synthetic flags — they are part of the config hash).
for session in Control Experiment; do
  extra=()
  [ "$session" = Experiment ] && extra=("${EXP_FLAGS[@]}")
  timeout 900 python -m pacingpseudo_tpu.cli.sweep \
      --dataset chaos --modality t1 --session "$session" \
      --tag "r5s80_$session" --epoch 80 \
      --synthetic_data 1916 --synthetic_difficulty jagged \
      --data_root "$SW/data" --root "$SW/runs" \
      --sweep_out "$SW/${session}80" --folds 0 1 2 3 4 "${extra[@]}" \
      >> "$SW/${session}80.log" 2>&1
done
log "paired folds 1-4 queue finished"
