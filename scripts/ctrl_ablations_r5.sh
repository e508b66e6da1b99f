#!/bin/bash
# Round-5 confirmatory Control-bias ablations (VERDICT r4 weak 2) —
# extracted from scripts/cpu_queue_r5.sh steps 1–2 so they can run alone:
# the CPU-sane five-fold sweep that followed them is redundant now that
# the protocol-scale sweep completed 5/5 folds ON CHIP (NOTES.md).
#
# One axis toggled per run, BOTH stacks (torch reference code vs this
# framework), paired streams + torch-drawn init, jagged regime, 3 seeds:
#   ctrlq   — reference BN eval-forever quirk OFF (textbook BN regime)
#   ctrlwd0 — weight decay 0
# Then tools/control_bias.py renders the paired-delta table (sign test,
# ±0.005 bound) over hunt baselines + these ablations.
#
# Usage: nohup bash scripts/ctrl_ablations_r5.sh > /tmp/ctrl_abl_r5.log 2>&1 &
set -u
cd /root/repo
log() { echo "[$(date +%H:%M:%S)] $*"; }
CTRL=/root/repo/study_r5/ctrl
mkdir -p "$CTRL"
DEADLINE=$(cat /root/repo/study_r5/ROUND_DEADLINE 2>/dev/null || echo 0)

# Same serialisation lock as every CPU lane (single host core).
exec 9>/tmp/cpu_sweep_r4.qlock
until flock -w 600 9; do
  if [ "$DEADLINE" -gt 0 ] && [ "$(date +%s)" -gt "$DEADLINE" ]; then
    echo "past round deadline and the CPU lock never freed"; exit 1
  fi
  log "still waiting for the CPU lane lock..."
done
log "lock acquired — ablation lane starts"

abl () { # abl <name> <seed> <extra flags...>
  local name=$1 seed=$2; shift 2
  local out=$CTRL/${name}_s${seed}.json
  if [ -f "$out" ]; then log "skip $name s$seed"; return 0; fi
  if [ "$DEADLINE" -gt 0 ] && [ "$(date +%s)" -gt $((DEADLINE - 3600)) ]; then
    log "deadline guard: skipping $name s$seed"; return 0
  fi
  log "ablation $name seed $seed"
  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
  nice -n 15 timeout 7200 python -m pacingpseudo_tpu.tools.torch_reference_study \
      --epochs 80 --n_train 96 --n_val 48 --batch 8 --difficulty jagged \
      --seed "$seed" --arms torch_control jax_control --out "$out" "$@" \
      >> "$CTRL/abl.log" 2>&1 || log "$name s$seed FAILED"
}
for seed in 1 2 3; do
  abl ctrlq   "$seed" --no_eval_quirk
  abl ctrlwd0 "$seed" --wd 0
done

log "control-bias table"
PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
python -m pacingpseudo_tpu.tools.control_bias \
    --root study_r4/hunt --ablation_root "$CTRL" \
    | tee "$CTRL/control_bias_table.md"
log "ablation lane finished"
