#!/bin/bash
# Poll for the axon relay (the TPU tunnel, /root/.tpu_init.py) and start
# the round-5 chip queue the moment it returns.  Unlike the r4 watcher
# this one keeps watching: if the relay flaps (queue dies, relay later
# returns), the resumable queue is restarted as long as no instance holds
# the queue lock.
#
# Usage: nohup bash scripts/relay_watch_r5.sh > /tmp/relay_watch_r5.log 2>&1 &
set -u
cd /root/repo
DEADLINE=$(cat /root/repo/study_r5/ROUND_DEADLINE 2>/dev/null || echo 0)
while true; do
  if [ -f /tmp/chip_queue_r5.complete ]; then
    echo "[$(date +%H:%M:%S)] queue reported complete — watcher standing down"
    exit 0
  fi
  if [ "$DEADLINE" -gt 0 ] && [ "$(date +%s)" -gt "$DEADLINE" ]; then
    echo "[$(date +%H:%M:%S)] past round deadline — watcher standing down"
    exit 0
  fi
  if ss -tln | grep -qE '127\.0\.0\.1:8082 '; then
    if flock -n /tmp/chip_queue_r5.qlock true 2>/dev/null; then
      echo "[$(date +%H:%M:%S)] relay UP and queue idle — starting chip_queue_r5"
      nohup bash scripts/chip_queue_r5.sh > /tmp/chip_queue_r5.log 2>&1 &
      sleep 300   # give the queue time to take its lock / make progress
    fi
  fi
  sleep 20
done
