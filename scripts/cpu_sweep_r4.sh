#!/bin/bash
# CPU-scale five-fold sweep on the validated pacing-wins regime
# (VERDICT r4 item 6 insurance: the protocol-scale sweep is queued for
# the chip — scripts/chip_queue_r4.sh step 4 — but the relay has been
# down since the round-3 incident, so this exercises the full
# published-table machinery NOW at the phantom-hunt geometry: jagged
# boundaries, full scribbles, 64^2, batch 8, 80 epochs, 120-slice pool
# split into 10 pseudo-patients striped across 5 patient-level folds).
# Pinned to the CPU backend (JAX_PLATFORMS=cpu) and nice 15 so it can
# never contend for the chip or starve the chip queue's host feeding.
#
# Usage: nohup bash scripts/cpu_sweep_r4.sh > /tmp/cpu_sweep_r4.log 2>&1 &
set -u
cd /root/repo
SW=/root/repo/study_r4/cpu_sweep
mkdir -p "$SW/runs"
log() { echo "[$(date +%H:%M:%S)] $*"; }

exec 9>/tmp/cpu_sweep_r4.qlock
flock -n 9 || { echo "another cpu_sweep_r4 instance is running"; exit 1; }

sweep_arm () {
  local session=$1; shift
  if [ -f "$SW/DONE_$session" ]; then log "skip sweep $session"; return 0; fi
  log "five-fold CPU sweep: $session"
  # PALLAS_AXON_POOL_IPS= skips axon plugin registration entirely and
  # chiplock.honor_platform_env makes JAX_PLATFORMS=cpu stick despite the
  # sitecustomize 'axon,cpu' pin (either alone suffices; both = belt and
  # suspenders after the round-4 axon-init wedge).
  JAX_PLATFORMS=cpu PALLAS_AXON_POOL_IPS= nice -n 15 timeout 36000 \
    python -m pacingpseudo_tpu.cli.sweep \
      --dataset chaos --modality t1 --session "$session" \
      --tag "r4cpu_$session" --epoch 80 --batch_size 8 \
      --input_size 64 64 \
      --synthetic_data 120 --synthetic_difficulty jagged \
      --data_root "$SW/data" --root "$SW/runs" \
      --sweep_out "$SW/$session" "$@" \
      > "$SW/${session}.log" 2>&1 && touch "$SW/DONE_$session" \
      || log "SWEEP $session FAILED"
}
sweep_arm Control
sweep_arm Experiment --do_loss_ent --do_decoder_consistency --do_aux_path --do_memory
log "cpu sweep complete"
