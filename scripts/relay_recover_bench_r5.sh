#!/bin/bash
# Final-session relay-recovery watcher (2026-08-20).  The stream wedged
# at ~09:40 between a healthy real-op probe (09:39, clean exit) and the
# very next client's backend init — the third documented far-side wedge
# (see NOTES.md "Round-5 final-morning session").  Nothing local clears
# it (/root/.tpu_init.py is a stdio pump; its far side is harness-owned),
# so all we can do is watch for spontaneous recovery and, if it comes
# early enough, capture one fresh bench so bench_latest.json carries a
# same-session measurement.  Stops launching work 15 min before the
# round deadline so the driver's own round-end bench gets a free chip.
set -u
cd /root/repo
DEADLINE=$(cat /root/repo/study_r5/ROUND_DEADLINE 2>/dev/null || echo 0)
log() { echo "[$(date +%H:%M:%S)] $*"; }

relay_ok () {
  timeout -k 10 90 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((128, 128))
assert float(jnp.sum(x @ x)) > 0
assert jax.devices()[0].platform == 'tpu'" >/dev/null 2>&1
}

while true; do
  now=$(date +%s)
  if [ "$DEADLINE" -gt 0 ] && [ "$now" -gt $((DEADLINE - 900)) ]; then
    log "inside 15 min of round end — leaving the chip free for the driver"
    exit 0
  fi
  if relay_ok; then
    log "relay recovered — capturing a fresh bench"
    out=study_r5/chipq/bench_r5_recovered.json
    : > "$out"
    if python bench.py > "$out" 2> study_r5/chipq/bench_r5_recovered.err \
        && grep -q '"metric"' "$out" && ! grep -q '"cached": true' "$out"; then
      cp "$out" study_r5/chipq/bench_latest.json
      log "fresh capture landed in bench_latest.json"
    else
      log "bench did not produce a live capture (see .err)"
    fi
    exit 0
  fi
  log "relay still wedged (real-op probe hung) — waiting 120 s"
  sleep 120
done
