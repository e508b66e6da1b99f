#!/bin/bash
# Poll for the axon relay (the TPU tunnel, /root/.tpu_init.py) and start
# the round-4 chip queue the moment it returns.  The round-3 outage left
# the relay down across a round boundary; this removes the human from the
# recovery loop.
#
# Usage: nohup bash scripts/relay_watch_r4.sh > /tmp/relay_watch_r4.log 2>&1 &
set -u
cd /root/repo
# Superseded by scripts/relay_watch_r5.sh — refuse to run alongside it.
if [ -f /root/repo/scripts/relay_watch_r5.sh ]; then
  echo "relay_watch_r4 is superseded by relay_watch_r5; exiting"
  exit 0
fi
while true; do
  if ss -tln | grep -qE '127\.0\.0\.1:8082 '; then
    echo "[$(date +%H:%M:%S)] relay is UP — starting chip_queue_r4"
    nohup bash scripts/chip_queue_r4.sh > /tmp/chip_queue_r4.log 2>&1 &
    exit 0
  fi
  sleep 30
done
