"""Mechanical single-chip safety: relay-liveness preflight + exclusive lock.

Round-3 post-mortem (NOTES.md "environment incident"): two concurrent chip
clients wedged both trainers and killed the stdio<->TCP relay that fronts
the TPU.  Nothing *mechanical* prevented it — queue scripts and bench.py
relied on discipline.  This module is the mechanism:

* ``relay_alive()`` — TCP-connect probe of the axon relay frontend
  (127.0.0.1:8082 by default; the loopback relay `/root/.tpu_init.py`).
  Checked BEFORE any jax device op so a dead tunnel surfaces as one clear
  sentence instead of a multi-minute hang + axon traceback.
* ``acquire_chip_lock()`` — ``flock(LOCK_EX | LOCK_NB)`` on a well-known
  lock file.  A second would-be chip client provably refuses to start.

Both are no-ops when the session is not targeting the axon/TPU backend
(pytest runs pin the cpu platform; see tests/conftest.py).
"""
from __future__ import annotations

import fcntl
import os
import socket
from typing import Optional

RELAY_HOST = os.environ.get("PALLAS_AXON_POOL_IPS", "127.0.0.1").split(",")[0] \
    or "127.0.0.1"
RELAY_PORT = 8082
LOCK_PATH = "/tmp/tpu_chip.lock"


def honor_platform_env() -> None:
    """Make ``JAX_PLATFORMS=cpu`` actually stick.

    The sandbox's sitecustomize programmatically pins ``jax_platforms``
    to ``'axon,cpu'`` AFTER env parsing, so exporting JAX_PLATFORMS=cpu
    alone does NOT keep a worker off the chip — the process then wedges
    in axon backend init whenever the relay tunnel is down (round-4
    cpu-sweep incident).  Called from :func:`preflight_chip` (i.e. by
    every CLI driver and bench) before any jax device op: when the env
    var names no TPU-ish platform, re-pin the config to the env value.
    """
    plats = os.environ.get("JAX_PLATFORMS", "")
    if plats and "axon" not in plats and "tpu" not in plats:
        import jax

        jax.config.update("jax_platforms", plats)


def targeting_tpu() -> bool:
    """True when this process would claim the axon TPU backend."""
    plats = os.environ.get("JAX_PLATFORMS", "")
    if "axon" not in plats:
        return False
    # Empty pool-IP list is the documented pytest escape hatch — axon
    # registration is skipped entirely (verify skill).
    if os.environ.get("PALLAS_AXON_POOL_IPS", "127.0.0.1") == "":
        return False
    return True


def relay_alive(host: str = RELAY_HOST, port: int = RELAY_PORT,
                timeout: float = 2.0) -> bool:
    """TCP probe of the relay frontend; False when nothing is listening."""
    try:
        with socket.create_connection((host, port), timeout=timeout):
            return True
    except OSError:
        return False


class ChipLockError(RuntimeError):
    pass


_held_lock = None  # keep the fd alive for the process lifetime


def acquire_chip_lock(path: str = LOCK_PATH, owner_note: str = "",
                      wait_s: float = 0.0) -> Optional[object]:
    """Take the exclusive single-chip lock or raise ChipLockError.

    The lock is advisory (flock) and auto-released when the process exits,
    so a crashed holder never wedges the queue.  ``wait_s`` > 0 polls for
    that long before giving up (bench uses this so a queued job finishing
    seconds earlier doesn't fail the round's measurement).  Returns the
    open file object (also stashed module-globally) — callers need not
    keep it.
    """
    import time

    global _held_lock
    f = open(path, "a+")
    deadline = time.time() + wait_s
    while True:
        try:
            fcntl.flock(f.fileno(), fcntl.LOCK_EX | fcntl.LOCK_NB)
            break
        except OSError:
            if time.time() < deadline:
                time.sleep(5.0)
                continue
            f.seek(0)
            holder = f.read().strip()
            f.close()
            raise ChipLockError(
                f"chip lock {path} is held ({holder or 'unknown holder'}); "
                "only ONE TPU client may run — wait for it or kill it by PID")
    f.truncate(0)
    f.write(f"pid={os.getpid()} {owner_note}\n")
    f.flush()
    _held_lock = f
    return f


def release_chip_lock() -> None:
    """Release the module-held chip lock (flock drops with the close)."""
    global _held_lock
    if _held_lock is not None:
        _held_lock.close()
        _held_lock = None


def relay_stream_ok(timeout_s: Optional[float] = None) -> bool:
    """Real-op probe of the relay STREAM.

    A wedged relay keeps the TCP port LISTENing while every device op
    hangs forever (the round-3/round-5 incident signature), so
    :func:`relay_alive` alone cannot clear chip work to start.  This runs
    a tiny matmul on the chip in a SUBPROCESS — a hung in-process axon
    backend init cannot be aborted — and kills it on timeout.

    Call ONLY while holding the chip lock: the probe is itself a chip
    client, and two concurrent clients are exactly what wedges the relay.
    Escape hatches: ``CHIP_STREAM_PROBE=0`` skips the probe (trusted
    queues that just ran their own), ``CHIP_STREAM_PROBE_TIMEOUT``
    overrides the 90 s default (healthy axon init + compile is ~10 s;
    90 s rides out host-core contention).
    """
    import subprocess
    import sys

    if os.environ.get("CHIP_STREAM_PROBE", "1") == "0":
        return True
    if timeout_s is None:
        timeout_s = float(os.environ.get("CHIP_STREAM_PROBE_TIMEOUT", "90"))
    code = (
        "import jax, jax.numpy as jnp\n"
        "x = jnp.ones((128, 128))\n"
        "assert float(jnp.sum(x @ x)) > 0\n"
        "assert jax.devices()[0].platform == 'tpu'\n")
    try:
        r = subprocess.run([sys.executable, "-c", code],
                           env=os.environ.copy(), timeout=timeout_s,
                           stdout=subprocess.DEVNULL,
                           stderr=subprocess.DEVNULL)
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def preflight_chip(owner_note: str = "", wait_s: float = 0.0) -> None:
    """Fail fast (clear RuntimeError) when chip work cannot safely start.

    No-op off-TPU.  On TPU: relay must be listening, the chip lock free
    (optionally waiting ``wait_s`` for a finishing holder), and — new
    after the round-5 wedge incident — a real device op must complete
    (run under the freshly-held lock, so the probe is the only client).
    """
    honor_platform_env()
    if not targeting_tpu():
        return
    if not relay_alive():
        raise RuntimeError(
            f"TPU relay is DOWN (nothing listening on "
            f"{RELAY_HOST}:{RELAY_PORT}); the tunnel `/root/.tpu_init.py` "
            "must be re-established by the harness — refusing to start "
            "chip work (it would hang, then die in axon backend init)")
    acquire_chip_lock(owner_note=owner_note, wait_s=wait_s)
    if not relay_stream_ok():
        release_chip_lock()
        raise RuntimeError(
            f"TPU relay STREAM is WEDGED ({RELAY_HOST}:{RELAY_PORT} is "
            "listening but a real device op hung past the probe timeout); "
            "only a harness-side relay restart clears this — refusing to "
            "start chip work")
