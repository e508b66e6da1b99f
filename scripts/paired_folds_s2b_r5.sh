#!/bin/bash
# Round-5 robustness extension: repeat the protocol-scale paired five-fold
# sweep (README.md:100-126 shape: 1,916 jagged slices, init_ch 32, 256^2,
# batch 12, 80-epoch arms) at a SECOND seed (training streams + phantom
# pool draws; the pool stamp includes the seed, data/synthetic.py:178).
#
# Hardened after the 2026-08-19 incident (see NOTES.md):
#   * pool is PRE-GENERATED foreground (scripts/pregen_pool.py) — never
#     silently inside a watchdogged arm;
#   * every arm launches `python` DIRECTLY (no `timeout` wrapper): the
#     watchdog's kill -9 reaches the real process, not a wrapper whose
#     death orphans the chip client;
#   * the watchdog NEVER removes /tmp/tpu_chip.lock — deleting the lock
#     file while a client holds the flock lets a second client acquire a
#     fresh inode and wedge the relay stream;
#   * a real-op relay probe gates every attempt, so a wedged relay is
#     waited out instead of burning watchdog cycles.
set -u
cd /root/repo
SW=/root/repo/study_r5/sweep
DEADLINE=$(cat /root/repo/study_r5/ROUND_DEADLINE 2>/dev/null || echo 0)
log() { echo "[$(date +%H:%M:%S)] $*"; }

EXP_FLAGS=(--do_loss_ent --do_decoder_consistency --do_aux_path --do_memory)
DATA_FLAGS=(--dataset chaos --modality t1 --epoch 80 --seed 2
            --synthetic_data 1916 --synthetic_difficulty jagged
            --data_root "$SW/data" --root "$SW/runs")

relay_ok () {  # real chip op, not a TCP probe — a wedged stream has the
               # port listening but ops hang (round-3/5 failure signature)
  timeout -k 10 90 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((128, 128))
assert float(jnp.sum(x @ x)) > 0
assert jax.devices()[0].platform == 'tpu'" >/dev/null 2>&1
}

wait_for_relay () {
  while ! relay_ok; do
    if [ "$DEADLINE" -gt 0 ] && [ "$(date +%s)" -gt $((DEADLINE - 2400)) ]; then
      log "deadline guard while waiting for relay — giving up"; return 1
    fi
    log "relay not healthy (real-op probe) — waiting 120 s"
    sleep 120
  done
  return 0
}

run_arm () { # run_arm <session> <fold> [extra flags...]
  local session=$1 fold=$2; shift 2
  local logf="$SW/${session}80_s2.log"
  for attempt in 1 2 3 4 5 6 7 8; do
    [ -f "$SW/${session}80_s2/fold${fold}.json" ] && return 0
    if [ "$DEADLINE" -gt 0 ] && [ "$(date +%s)" -gt $((DEADLINE - 2400)) ]; then
      log "deadline guard: skipping $session fold $fold"; return 1
    fi
    wait_for_relay || return 1
    log "arm $session fold $fold seed2 attempt $attempt"
    python -m pacingpseudo_tpu.cli.sweep \
        --session "$session" --tag "r5s80s2_$session" \
        "${DATA_FLAGS[@]}" \
        --sweep_out "$SW/${session}80_s2" --folds "$fold" "$@" \
        >> "$logf" 2>&1 &
    local pid=$!
    # stall watchdog (log growth) + hard wall-clock cap; kill the python
    # itself and REAP it before the next attempt
    local last=0 same=0 t0=$(date +%s)
    while kill -0 $pid 2>/dev/null; do
      sleep 30
      local sz=$(wc -c < "$logf" 2>/dev/null || echo 0)
      if [ "$sz" -eq "$last" ]; then same=$((same+30)); else same=0; last=$sz; fi
      if [ "$same" -ge 330 ] || [ $(( $(date +%s) - t0 )) -ge 2400 ]; then
        log "STALL/timeout ($session fold $fold) — killing pid $pid"
        kill -9 $pid 2>/dev/null
        break
      fi
    done
    wait $pid 2>/dev/null
    [ -f "$SW/${session}80_s2/fold${fold}.json" ] && { log "arm $session fold $fold DONE"; return 0; }
  done
  log "arm $session fold $fold FAILED after retries"; return 1
}

# ---- Step 0: pool pre-generation (pure CPU; off-chip; visible) --------
if [ ! -f "$SW/data/chaos/slices/.generated" ]; then
  log "pre-generating the 1,916-slice seed-2 pool (foreground)"
  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python scripts/pregen_pool.py \
      --session Control --tag pregen "${DATA_FLAGS[@]}" \
      || { log "pool pre-generation FAILED"; exit 1; }
fi
log "pool marker present"

# ---- Steps 1..10: paired arms, fold-major --------------------------------
for fold in 0 1 2 3 4; do
  run_arm Control "$fold"
  run_arm Experiment "$fold" "${EXP_FLAGS[@]}"
done

# ---- Summary regeneration over whatever folds completed -------------------
for session in Control Experiment; do
  extra=()
  [ "$session" = Experiment ] && extra=("${EXP_FLAGS[@]}")
  done_folds=()
  for f in 0 1 2 3 4; do
    [ -f "$SW/${session}80_s2/fold${f}.json" ] && done_folds+=("$f")
  done
  [ ${#done_folds[@]} -eq 0 ] && continue
  timeout 900 python -m pacingpseudo_tpu.cli.sweep \
      --session "$session" --tag "r5s80s2_$session" \
      "${DATA_FLAGS[@]}" \
      --sweep_out "$SW/${session}80_s2" --folds "${done_folds[@]}" "${extra[@]}" \
      >> "$SW/${session}80_s2.log" 2>&1
done
log "seed-2 paired folds queue finished"
