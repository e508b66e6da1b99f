#!/bin/bash
# After the seed-2 paired-folds queue exits: capture ONE fresh full bench
# on the chip (now carries the warp-table storage-dtype A/B wired this
# session) and refresh the canonical bench_latest.json the cached
# fallback prefers.  Belt-and-braces for the round-end driver bench: if
# the relay wedges again between the sweep and round end, the freshest
# real measurement still gets emitted.
#
# Usage: nohup bash scripts/postsweep_bench_r5.sh <sweep_pid> > log 2>&1 &
set -u
cd /root/repo
log() { echo "[$(date +%H:%M:%S)] $*"; }
SWEEP_PID=${1:?need the sweep queue pid}
DEADLINE=$(cat /root/repo/study_r5/ROUND_DEADLINE 2>/dev/null || echo 0)
OUT=study_r5/chipq/bench_r5_postsweep.json

while kill -0 "$SWEEP_PID" 2>/dev/null; do sleep 60; done
log "sweep queue (pid $SWEEP_PID) has exited"

if [ "$DEADLINE" -gt 0 ] && [ "$(date +%s)" -gt $((DEADLINE - 1800)) ]; then
  log "under 30 min to the round deadline — leaving the chip to the driver"
  exit 0
fi

# preflight_chip inside bench.py does the TCP + flock + real-op stream
# probe; give it up to 15 min for a finishing holder, and time-box the
# whole run well under the remaining window.
log "running full bench (fresh A/Bs incl. warp-table dtype)"
if timeout 3600 python bench.py > "$OUT.tmp" 2> study_r5/chipq/bench_r5_postsweep.err; then
  # only promote a FRESH measurement (not a cached re-emission)
  if python - "$OUT.tmp" <<'EOF'
import json, sys
rec = json.loads(open(sys.argv[1]).read().strip().splitlines()[-1])
sys.exit(1 if rec.get("cached") else 0)
EOF
  then
    mv "$OUT.tmp" "$OUT"
    cp "$OUT" study_r5/chipq/bench_latest.json
    log "fresh bench captured -> bench_latest.json"
  else
    log "bench returned a cached record (chip still unavailable); not promoting"
    rm -f "$OUT.tmp"
  fi
else
  log "bench failed or timed out (see bench_r5_postsweep.err)"
  rm -f "$OUT.tmp"
fi
