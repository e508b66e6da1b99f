#!/bin/bash
# Round-5 LVSC-scale rehearsal, stall-tolerant edition (VERDICT r4 item 5).
#
# Same protocol as scripts/lvsc_rehearsal.sh (29k-slice synthetic pool at
# 224^2, 40 epochs, then the ~5.8k-slice fold-0 inference pass — the
# reference LVSC protocol, /root/reference/inference.py:288), but built
# for the round-5 relay environment: the tunnel develops a stream stall
# ~18 min into any sustained session (thread parked in wait_woken, log
# frozen, ports open).  A 40-epoch train at ~107 s/epoch is ~71 min of
# sustained streaming, so stalls are EXPECTED.  Strategy:
#   * checkpoint every 4 epochs (~7 min of progress at risk per stall);
#   * a log-growth watchdog kills the wedged process (threshold 900 s
#     before the first epoch line to let the ~774-s LVSC compile through
#     — the persistent jax cache should make reruns much faster — and
#     510 s once epochs are streaming);
#   * rerun with --resume in the SAME run dir until DONE or deadline.
set -u
cd /root/repo
ROOT=${LVSC_ROOT:-/root/repo/lvsc_rehearsal}
DATA=$ROOT/data
RUN=$ROOT/run-fold0
EPOCHS=${LVSC_EPOCHS:-40}
SLICES=${LVSC_SLICES:-29086}
DEADLINE=$(cat /root/repo/study_r5/ROUND_DEADLINE 2>/dev/null || echo 0)
log() { echo "[$(date +%H:%M:%S)] $*"; }
mkdir -p "$ROOT"

past_deadline() {
  [ "$DEADLINE" -gt 0 ] && [ "$(date +%s)" -gt $((DEADLINE - ${1:-0})) ]
}

watchdog_run() { # watchdog_run <logf> <pre_thresh> <post_thresh> <timeout> <cmd...>
  local logf=$1 pre=$2 post=$3 tmo=$4; shift 4
  timeout "$tmo" "$@" >> "$logf" 2>&1 &
  local pid=$!
  local last=0 same=0
  while kill -0 $pid 2>/dev/null; do
    sleep 30
    local sz=$(wc -c < "$logf" 2>/dev/null || echo 0)
    if [ "$sz" -eq "$last" ]; then same=$((same+30)); else same=0; last=$sz; fi
    local thresh=$pre
    grep -q "epoch: 0" "$logf" 2>/dev/null && thresh=$post
    if [ "$same" -ge "$thresh" ]; then
      log "STALL detected — killing pid $pid (silent ${same}s, thresh ${thresh}s)"
      kill -9 $pid 2>/dev/null; rm -f /tmp/tpu_chip.lock
      break
    fi
    # hard deadline: free the chip for the round-end driver (bench +
    # graft compile check) no matter what is in flight
    if past_deadline 300; then
      log "DEADLINE — killing pid $pid to free the chip"
      kill -9 $pid 2>/dev/null; rm -f /tmp/tpu_chip.lock
      break
    fi
  done
  wait $pid 2>/dev/null
}

# ---- train (resumable across stall-kills) ----------------------------------
if [ ! -f "$ROOT/DONE_train" ]; then
  attempt=0
  while [ ! -f "$ROOT/DONE_train" ]; do
    attempt=$((attempt+1))
    if past_deadline 1200; then log "deadline guard: stopping train loop"; break; fi
    RESUME=()
    [ -d "$RUN/ckps" ] && RESUME=(--resume)
    log "train attempt $attempt (${RESUME[*]:-fresh})"
    # post-threshold 510 s: epochs stream at ~107 s on a quiet host but
    # can stretch ~2x when the round-end pytest suite shares the single
    # host core — a true relay stall is still caught within ~8.5 min
    watchdog_run "$ROOT/train_r5.log" 900 510 5400 \
      python train_chaos.py --dataset lvsc --session Experiment \
        --tag lvsc_scale --fold 0 --epoch "$EPOCHS" --ckp_interval 4 \
        --do_loss_ent --do_decoder_consistency --do_aux_path --do_memory \
        --synthetic_data "$SLICES" --synthetic_size_jitter 16 \
        --data_root "$DATA" --run_dir "$RUN" "${RESUME[@]}"
    # completion: the driver writes ckps/ckp_{last} at the final epoch
    # (train/loop.py:701 — interval OR final-epoch precedence)
    if [ -d "$RUN/ckps/ckp_$((EPOCHS-1))" ]; then
      touch "$ROOT/DONE_train"; log "train complete after $attempt attempt(s)"
    fi
    [ "$attempt" -ge 8 ] && { log "giving up after 8 attempts"; break; }
  done
fi

# ---- eval (the ~5.8k-slice fold, HD95 backlog, timing) ----------------------
if [ -f "$ROOT/DONE_train" ] && [ ! -f "$ROOT/DONE" ]; then
  for attempt in 1 2 3; do
    if past_deadline 600; then log "deadline guard: skipping eval"; break; fi
    log "eval attempt $attempt"
    watchdog_run "$ROOT/eval_r5.log" 900 900 2400 \
      python inference.py --dataset lvsc --fold 0 \
        --checkpoint_file "$RUN" --best_ckp --data_root "$DATA" \
        --root "$ROOT/outputs"
    grep -q "overall" "$ROOT/eval_r5.log" && { touch "$ROOT/DONE"; break; }
  done
fi
log "rehearsal driver finished"
grep -E "s/epoch|staging|overall|slices in|resumed" \
    "$ROOT/train_r5.log" "$ROOT/eval_r5.log" 2>/dev/null | tail -10
