#!/bin/bash
# Round-5 robustness extension: repeat the protocol-scale paired five-fold
# sweep (README.md:100-126 shape: 1,916 jagged slices, init_ch 32, 256^2,
# batch 12, 80-epoch arms) at a SECOND training seed.  The synthetic pools
# under $SW/data are reused verbatim (pool marker cache), so seed 2 varies
# only init/aug/dropout streams — the right axis for "does pacing win 5/5
# replicate?".  Same stall-watchdog + deadline-guard design as
# paired_folds14_r5.sh (one sweep invocation per (fold, arm), 330-s
# log-growth watchdog, fold{N}.json caches make retries cheap).
set -u
cd /root/repo
SW=/root/repo/study_r5/sweep
DEADLINE=$(cat /root/repo/study_r5/ROUND_DEADLINE 2>/dev/null || echo 0)
log() { echo "[$(date +%H:%M:%S)] $*"; }

EXP_FLAGS=(--do_loss_ent --do_decoder_consistency --do_aux_path --do_memory)

run_arm () { # run_arm <session> <fold> [extra flags...]
  local session=$1 fold=$2; shift 2
  local logf="$SW/${session}80_s2.log"
  for attempt in 1 2 3; do
    [ -f "$SW/${session}80_s2/fold${fold}.json" ] && return 0
    if [ "$DEADLINE" -gt 0 ] && [ "$(date +%s)" -gt $((DEADLINE - 2400)) ]; then
      log "deadline guard: skipping $session fold $fold"; return 1
    fi
    log "arm $session fold $fold seed2 attempt $attempt"
    timeout 2400 python -m pacingpseudo_tpu.cli.sweep \
        --dataset chaos --modality t1 --session "$session" \
        --tag "r5s80s2_$session" --epoch 80 --seed 2 \
        --synthetic_data 1916 --synthetic_difficulty jagged \
        --data_root "$SW/data" --root "$SW/runs" \
        --sweep_out "$SW/${session}80_s2" --folds "$fold" "$@" \
        >> "$logf" 2>&1 &
    local pid=$!
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
    [ -f "$SW/${session}80_s2/fold${fold}.json" ] && { log "arm $session fold $fold DONE"; return 0; }
  done
  log "arm $session fold $fold FAILED after retries"; return 1
}

for fold in 0 1 2 3 4; do
  run_arm Control "$fold"
  run_arm Experiment "$fold" "${EXP_FLAGS[@]}"
done

# Regenerate the five-fold summaries over whatever folds completed.
for session in Control Experiment; do
  extra=()
  [ "$session" = Experiment ] && extra=("${EXP_FLAGS[@]}")
  done_folds=()
  for f in 0 1 2 3 4; do
    [ -f "$SW/${session}80_s2/fold${f}.json" ] && done_folds+=("$f")
  done
  [ ${#done_folds[@]} -eq 0 ] && continue
  timeout 900 python -m pacingpseudo_tpu.cli.sweep \
      --dataset chaos --modality t1 --session "$session" \
      --tag "r5s80s2_$session" --epoch 80 --seed 2 \
      --synthetic_data 1916 --synthetic_difficulty jagged \
      --data_root "$SW/data" --root "$SW/runs" \
      --sweep_out "$SW/${session}80_s2" --folds "${done_folds[@]}" "${extra[@]}" \
      >> "$SW/${session}80_s2.log" 2>&1
done
log "seed-2 paired folds queue finished"
