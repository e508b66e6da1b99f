#!/bin/bash
# Round-5 CPU work queue (single host core -> strictly serial, chained
# behind the phase-4 hunt's lock).  VERDICT r4 items 2 and 3:
#
#   1. Control-bias ablation (weak item 2): torch_control vs jax_control,
#      paired streams/init, one axis toggled per run — BN eval-forever
#      quirk OFF, weight-decay 0 — at 3 seeds each, jagged regime.
#   2. Control-bias table (tools/control_bias.py): baseline pairs from
#      the 5-seed hunt + the ablation axes, sign test, +-0.005 bound.
#   3. CPU-SANE five-fold sweep at the validated hunt geometry
#      (init_ch 16, 64^2, float32, bilinear warp, pallas off, s2d off,
#      tb figures off — exactly what the hunt harness pins, ~17 s/epoch)
#      FOLD-INTERLEAVED Control/Experiment so any truncation leaves
#      paired folds; first-fold wall-clock gate aborts a doomed launch
#      (the round-4 sweep burned 8 h at 0.04 slices/s).
#   4. Full pytest suite (round-end green check).
#
# Usage: nohup bash scripts/cpu_queue_r5.sh > /tmp/cpu_queue_r5.log 2>&1 &
set -u
cd /root/repo
log() { echo "[$(date +%H:%M:%S)] $*"; }
CTRL=/root/repo/study_r5/ctrl
SW=/root/repo/study_r5/cpu_sweep
mkdir -p "$CTRL" "$SW/runs"

# Serialise behind the hunt (same lock file the r4 scripts used).  Retry
# in bounded waits until the round deadline — a fixed 8 h wait could
# expire while the 5-seed hunt still holds the lock and silently kill
# this whole lane.
DEADLINE=$(cat /root/repo/study_r5/ROUND_DEADLINE 2>/dev/null || echo 0)
exec 9>/tmp/cpu_sweep_r4.qlock
until flock -w 600 9; do
  if [ "$DEADLINE" -gt 0 ] && [ "$(date +%s)" -gt "$DEADLINE" ]; then
    echo "past round deadline and hunt lock never freed"; exit 1
  fi
  log "still waiting for the hunt lock..."
done
log "lock acquired — starting round-5 CPU queue"

# ---- 1. Control-bias ablations ---------------------------------------------
abl () { # abl <name> <seed> <extra flags...>
  local name=$1 seed=$2; shift 2
  local out=$CTRL/${name}_s${seed}.json
  if [ -f "$out" ]; then log "skip $name s$seed"; return 0; fi
  log "ablation $name seed $seed"
  nice -n 15 timeout 7200 python -m pacingpseudo_tpu.tools.torch_reference_study \
      --epochs 80 --n_train 96 --n_val 48 --batch 8 --difficulty jagged \
      --seed "$seed" --arms torch_control jax_control --out "$out" "$@" \
      >> "$CTRL/abl.log" 2>&1 || log "$name s$seed FAILED"
}
for seed in 1 2 3; do
  abl ctrlq   "$seed" --no_eval_quirk
  abl ctrlwd0 "$seed" --wd 0
done

# ---- 2. Control-bias table --------------------------------------------------
log "control-bias table"
python -m pacingpseudo_tpu.tools.control_bias \
    --root study_r4/hunt --ablation_root "$CTRL" \
    | tee "$CTRL/control_bias_table.md"

# ---- 3. full pytest suite ---------------------------------------------------
# Before the multi-hour sweep: a green suite is a hard round requirement;
# the fold-interleaved sweep below tolerates truncation by design.
log "full pytest suite"
PALLAS_AXON_POOL_IPS= nice -n 15 timeout 10800 python -m pytest tests/ -q \
    > /tmp/suite_r5.log 2>&1 && log "SUITE GREEN" \
    || { log "SUITE FAILED"; tail -5 /tmp/suite_r5.log; }
tail -2 /tmp/suite_r5.log

# ---- 4. CPU-sane five-fold sweep, fold-interleaved --------------------------
# Hunt-matched geometry: the direct 5-fold cross-validated version of the
# regime where pacing demonstrably wins in the reference's own code.
CPU_SANE=(--compute_dtype float32 --aug_image_interp bilinear
          --use_pallas_loss off --no-s2d_hires --no-tb_figures
          --init_ch 16 --max_ch 256 --hid_ch 32
          --epoch 80 --batch_size 8 --input_size 64 64
          --synthetic_data 120 --synthetic_difficulty jagged
          --data_root "$SW/data" --root "$SW/runs")
EXP_FLAGS=(--do_loss_ent --do_decoder_consistency --do_aux_path --do_memory)
sweep_fold () { # sweep_fold <session> <fold> [extra...]
  local session=$1 fold=$2; shift 2
  # ALWAYS invoke: cli/sweep's fold cache is config-hash-aware (a bare
  # file-existence skip would bypass the staleness check).
  log "cpu sweep: $session fold $fold"
  JAX_PLATFORMS=cpu PALLAS_AXON_POOL_IPS= nice -n 15 timeout 10800 \
    python -m pacingpseudo_tpu.cli.sweep \
      --session "$session" --tag "r5cpu_$session" \
      --dataset chaos --modality t1 \
      --sweep_out "$SW/$session" --folds "$fold" \
      "${CPU_SANE[@]}" "$@" \
      >> "$SW/${session}.log" 2>&1 \
      || log "CPU SWEEP $session fold $fold FAILED"
}
GATE_S=${SWEEP_GATE_S:-4500}   # one fold-arm must fit in 75 min
t0=$(date +%s)
sweep_fold Control 0
dt=$(( $(date +%s) - t0 ))
if [ ! -f "$SW/Control/fold0.json" ]; then
  log "LAUNCH GATE: Control fold 0 did not finish in $dt s — aborting the"
  log "sweep instead of burning the round (see $SW/Control.log)."
else
  folds_left="1 2 3 4"
  if [ "$dt" -gt "$GATE_S" ]; then
    log "LAUNCH GATE: $dt s/fold-arm (> $GATE_S) — limiting the sweep to"
    log "the fold-0 pair so the round still gets ONE paired fold."
    folds_left=""
  fi
  sweep_fold Experiment 0 "${EXP_FLAGS[@]}"
  for fold in $folds_left; do
    sweep_fold Control "$fold"
    sweep_fold Experiment "$fold" "${EXP_FLAGS[@]}"
  done
  # Summary pass over whatever exists (all-cached folds -> instant).
  for session in Control Experiment; do
    done_folds=$(ls "$SW/$session"/fold*.json 2>/dev/null \
        | sed 's/.*fold\([0-9]\).json/\1/' | tr '\n' ' ')
    [ -z "$done_folds" ] && continue
    extra=(); [ "$session" = Experiment ] && extra=("${EXP_FLAGS[@]}")
    # shellcheck disable=SC2086
    JAX_PLATFORMS=cpu PALLAS_AXON_POOL_IPS= nice -n 15 timeout 3600 \
      python -m pacingpseudo_tpu.cli.sweep \
        --session "$session" --tag "r5cpu_$session" \
        --dataset chaos --modality t1 \
        --sweep_out "$SW/$session" --folds $done_folds \
        "${CPU_SANE[@]}" ${extra[@]+"${extra[@]}"} \
        >> "$SW/${session}.log" 2>&1 || log "CPU SUMMARY $session FAILED"
  done
fi

log "round-5 CPU queue complete"
