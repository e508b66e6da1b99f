#!/bin/bash
# Round-5 fallback: ONE paired protocol-scale fold at 80 epochs.
# The relay develops a stream stall ~18 min into a sustained training
# session (two 120-epoch Control attempts wedged at epochs 107 and 85,
# one thread in wait_woken, log frozen); 80-epoch arms (~8-12 min) fit
# under that horizon, match the hunt protocol's length, and the
# mean-of-epochs-10+ headline statistic.  A stall watchdog converts a
# wedge into a retry.
set -u
cd /root/repo
SW=/root/repo/study_r5/sweep
log() { echo "[$(date +%H:%M:%S)] $*"; }

run_arm () { # run_arm <session> [extra flags...]
  local session=$1; shift
  local logf="$SW/${session}80.log"
  for attempt in 1 2; do
    [ -f "$SW/${session}80/fold0.json" ] && return 0
    log "arm $session attempt $attempt"
    timeout 1800 python -m pacingpseudo_tpu.cli.sweep \
        --dataset chaos --modality t1 --session "$session" \
        --tag "r5s80_$session" --epoch 80 \
        --synthetic_data 1916 --synthetic_difficulty jagged \
        --data_root "$SW/data" --root "$SW/runs" \
        --sweep_out "$SW/${session}80" --folds 0 "$@" \
        >> "$logf" 2>&1 &
    local pid=$!
    # stall watchdog: kill if the log stops growing for 330 s
    # (epoch-0 compile is ~180 s of silent log — do not shoot it)
    local last=0 same=0
    while kill -0 $pid 2>/dev/null; do
      sleep 30
      local sz=$(wc -c < "$logf" 2>/dev/null || echo 0)
      if [ "$sz" -eq "$last" ]; then same=$((same+30)); else same=0; last=$sz; fi
      if [ "$same" -ge 330 ]; then
        log "STALL detected ($session) — killing pid $pid"
        kill -9 $pid 2>/dev/null; rm -f /tmp/tpu_chip.lock
        break
      fi
    done
    wait $pid 2>/dev/null
    [ -f "$SW/${session}80/fold0.json" ] && { log "arm $session DONE"; return 0; }
  done
  log "arm $session FAILED after retries"; return 1
}

EXP_FLAGS=(--do_loss_ent --do_decoder_consistency --do_aux_path --do_memory)
run_arm Control
run_arm Experiment "${EXP_FLAGS[@]}"
log "paired fold80 queue finished"
