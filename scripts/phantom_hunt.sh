#!/bin/bash
# Pacing-wins phantom-regime hunt (VERDICT r4 item 2).  CPU-ONLY — does
# not touch the TPU chip; safe to run while the relay is down or while
# chip jobs run (but it IS the host's single core: keep heavy pytest
# runs off while it executes).
#
# Phase 1 (prescreen, seed 1, torch oracle arms only): sweep the regime
# knobs the VERDICT names — scribble sparsity (the reference's own
# shortening-ablation axis), non-convex "jagged" boundaries, train/test
# intensity shift.
# Phase 2 (validation): the best config by mean torch gap (> +0.02 DSC)
# gets 2 more torch seeds + 3 jax seeds, giving the mean±sd table
# NOTES.md needs.  If nothing clears the gate, the falsified-knobs table
# itself is the deliverable.
#
# Usage: nohup bash scripts/phantom_hunt.sh > /tmp/phantom_hunt.log 2>&1 &
set -u
cd /root/repo
ROOT=${HUNT_ROOT:-/root/repo/study_r4/hunt}
EP=${HUNT_EPOCHS:-80}
NTR=${HUNT_NTRAIN:-96}
NVA=${HUNT_NVAL:-48}
B=${HUNT_BATCH:-8}
mkdir -p "$ROOT"

run () { # run <name> <seed> <arms...> -- <knob flags...>
  local name=$1 seed=$2; shift 2
  local arms=()
  while [ "$1" != "--" ]; do arms+=("$1"); shift; done
  shift
  local out=$ROOT/${name}_s${seed}.json
  if [ -f "$out" ]; then echo "skip $name s$seed"; return 0; fi
  echo "[$(date +%H:%M:%S)] $name seed $seed (${arms[*]})"
  nice -n 10 python -m pacingpseudo_tpu.tools.torch_reference_study \
      --epochs "$EP" --n_train "$NTR" --n_val "$NVA" --batch "$B" \
      --seed "$seed" --arms "${arms[@]}" --out "$out" "$@" \
      >> "$ROOT/hunt.log" 2>&1 || echo "$name s$seed FAILED"
}

TORCH="torch_control torch_pacing"

# ---- Phase 1: prescreen (seed 1, torch arms only)
run hard_r30  1 $TORCH -- --scribble_ratio 0.3
run jag_full  1 $TORCH -- --difficulty jagged
run jag_r30   1 $TORCH -- --difficulty jagged --scribble_ratio 0.3
run hard_r15  1 $TORCH -- --scribble_ratio 0.15
run hard_vg15 1 $TORCH -- --val_gamma 1.5
run jag_r15   1 $TORCH -- --difficulty jagged --scribble_ratio 0.15

echo "== prescreen table =="
python -m pacingpseudo_tpu.tools.hunt_summary --root "$ROOT"

# ---- Phase 2: multi-seed validation of the winner
FLAGS=$(python -m pacingpseudo_tpu.tools.hunt_summary --root "$ROOT" --pick)
if [ "$FLAGS" = "NONE" ]; then
  echo "no winner cleared the gate — falsified-knobs table stands"
  exit 0
fi
echo "winner flags: $FLAGS"
NAME=win$(echo "$FLAGS" | tr -cd '[:alnum:]' | tail -c 12)
for seed in 2 3; do
  run "$NAME" $seed $TORCH -- $FLAGS
done
for seed in 1 2 3; do
  run "${NAME}jax" $seed jax_control jax_pacing -- $FLAGS
done

echo "== final table =="
python -m pacingpseudo_tpu.tools.hunt_summary --root "$ROOT" \
    | tee "$ROOT/final_table.md"
echo "[$(date +%H:%M:%S)] hunt complete"
