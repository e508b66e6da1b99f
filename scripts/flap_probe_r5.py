#!/usr/bin/env python
"""Sample the relay-stream health until shortly before the round deadline.

Appends one JSON line per sample to study_r5/chipq/flap_log.jsonl so the
2026-08-20 flap pattern (healthy windows of ~4 min between wedges, see
NOTES.md) is recorded mechanically rather than anecdotally.  Each probe
runs under the exclusive chip flock (skipped as "busy" when another
client holds it) so it can never be the second concurrent client that
wedges the stream, and the loop exits 5 min before the deadline so the
driver's round-end bench always finds a quiet chip.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pacingpseudo_tpu.utils.chiplock import (  # noqa: E402
    ChipLockError,
    acquire_chip_lock,
    relay_alive,
    relay_stream_ok,
    release_chip_lock,
)

OUT = "/root/repo/study_r5/chipq/flap_log.jsonl"


def main() -> None:
    try:
        deadline = int(open("/root/repo/study_r5/ROUND_DEADLINE").read().strip())
    except (OSError, ValueError):
        deadline = 0
    while True:
        now = time.time()
        if deadline and now > deadline - 300:
            break
        rec = {"ts": round(now, 1), "t": time.strftime("%H:%M:%S")}
        if not relay_alive():
            rec["state"] = "port_down"
        else:
            try:
                acquire_chip_lock(owner_note="flap_probe_r5")
            except ChipLockError:
                rec["state"] = "busy"  # another client holds the chip
            else:
                t0 = time.time()
                ok = relay_stream_ok()
                release_chip_lock()
                rec["state"] = "healthy" if ok else "wedged"
                rec["probe_s"] = round(time.time() - t0, 1)
        with open(OUT, "a") as f:
            f.write(json.dumps(rec) + "\n")
        time.sleep(75)


if __name__ == "__main__":
    main()
