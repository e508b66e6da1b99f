#!/bin/bash
# Fire ONE bench only if the relay stream shows a STABLE health window:
# two consecutive lock-protected real-op probes 100 s apart.  The
# 2026-08-20 flap log (study_r5/chipq/flap_log.jsonl) shows single
# healthy samples bracketed by wedges 2-4 min later — one green probe is
# not enough to pay a ~10-program cold compile.  Worst case stays the
# provenance-marked cached emission: bench.py's own preflight re-checks
# the stream under the chip flock and degrades rc=0.
set -u
cd /root/repo
CAP=$(( $(date +%s) + ${STABLE_WINDOW_CAP_S:-2400} ))
log() { echo "[$(date +%H:%M:%S)] $*"; }

probe () {
  python - <<'EOF' >/dev/null 2>&1
import sys
sys.path.insert(0, "/root/repo")
from pacingpseudo_tpu.utils.chiplock import (
    ChipLockError, acquire_chip_lock, relay_alive, relay_stream_ok,
    release_chip_lock)
if not relay_alive():
    sys.exit(2)
try:
    acquire_chip_lock(owner_note="stable_window_bench_r5 probe")
except ChipLockError:
    sys.exit(3)  # busy: another client owns the chip — do not interfere
ok = relay_stream_ok()
release_chip_lock()
sys.exit(0 if ok else 1)
EOF
}

streak=0
while [ "$(date +%s)" -lt "$CAP" ]; do
  probe; rc=$?
  case $rc in
    0) streak=$((streak+1)); log "healthy (streak $streak)";;
    3) log "chip busy — standing down"; streak=0;;
    *) streak=0; log "not healthy (rc=$rc)";;
  esac
  if [ "$streak" -ge 2 ]; then
    log "stable window — firing one bench"
    out=study_r5/chipq/bench_r5_stable.json
    : > "$out"
    if python bench.py > "$out" 2> study_r5/chipq/bench_r5_stable.err \
        && grep -q '"metric"' "$out" && ! grep -q '"cached": true' "$out"; then
      cp "$out" study_r5/chipq/bench_latest.json
      log "LIVE capture landed in bench_latest.json"
    else
      log "no live capture (cached fallback or failure; see .err)"
    fi
    exit 0
  fi
  sleep 100
done
log "cap reached without a stable window"
