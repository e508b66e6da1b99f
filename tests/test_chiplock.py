"""Mechanical chip-safety tests (utils/chiplock): flock exclusivity +
relay probe.  Round-3 post-mortem: two concurrent chip clients killed the
TPU relay; these guarantees are now code, not discipline."""
import os
import socket
import subprocess
import sys

import pytest

from pacingpseudo_tpu.utils import chiplock


def test_relay_alive_detects_listener_and_absence():
    srv = socket.socket()
    srv.bind(("127.0.0.1", 0))
    srv.listen(1)
    port = srv.getsockname()[1]
    try:
        assert chiplock.relay_alive("127.0.0.1", port, timeout=1.0)
    finally:
        srv.close()
    assert not chiplock.relay_alive("127.0.0.1", port, timeout=0.5)


def test_chip_lock_excludes_second_process(tmp_path):
    lock = str(tmp_path / "chip.lock")
    held = chiplock.acquire_chip_lock(lock, owner_note="first")
    assert held is not None
    # A SECOND PROCESS (flock is per-fd-owner; same process can re-lock)
    # must refuse to start.
    code = (
        "import sys; sys.path.insert(0, %r)\n"
        "from pacingpseudo_tpu.utils.chiplock import acquire_chip_lock, ChipLockError\n"
        "try:\n"
        "    acquire_chip_lock(%r, owner_note='second')\n"
        "except ChipLockError as e:\n"
        "    assert 'first' in str(e), e\n"
        "    sys.exit(42)\n"
        "sys.exit(0)\n" % (os.path.dirname(os.path.dirname(
            os.path.dirname(os.path.abspath(chiplock.__file__)))), lock)
    )
    env = dict(os.environ, PALLAS_AXON_POOL_IPS="", JAX_PLATFORMS="cpu")
    r = subprocess.run([sys.executable, "-c", code], env=env, timeout=60)
    assert r.returncode == 42, "second process acquired a held chip lock"
    # Release → second acquisition succeeds.
    import fcntl
    fcntl.flock(held.fileno(), fcntl.LOCK_UN)
    r2 = subprocess.run([sys.executable, "-c", code.replace(
        "sys.exit(42)", "sys.exit(43)").replace("sys.exit(0)", "sys.exit(0)")],
        env=env, timeout=60)
    assert r2.returncode == 0


def test_chip_lock_wait_succeeds_after_holder_exits(tmp_path):
    # bench.py acquires with wait_s=900 so a finishing queue job doesn't
    # fail the round's measurement; model that: a subprocess holds the lock
    # briefly, the waiting acquire succeeds once it exits.
    lock = str(tmp_path / "chip.lock")
    pkg_root = os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(chiplock.__file__))))
    code = (
        "import sys, time; sys.path.insert(0, %r)\n"
        "from pacingpseudo_tpu.utils.chiplock import acquire_chip_lock\n"
        "acquire_chip_lock(%r, owner_note='transient')\n"
        "print('HELD', flush=True)\n"
        "time.sleep(3)\n" % (pkg_root, lock))
    env = dict(os.environ, PALLAS_AXON_POOL_IPS="", JAX_PLATFORMS="cpu")
    p = subprocess.Popen([sys.executable, "-c", code], env=env,
                         stdout=subprocess.PIPE, text=True)
    try:
        assert p.stdout.readline().strip() == "HELD"
        f = chiplock.acquire_chip_lock(lock, owner_note="waiter", wait_s=60)
        assert f is not None
        assert p.poll() is not None, "acquired while holder still alive"
    finally:
        p.wait(timeout=30)


def test_preflight_is_noop_off_tpu(monkeypatch):
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    chiplock.preflight_chip("test")  # must not raise or probe anything


def test_preflight_raises_clearly_when_relay_down(monkeypatch):
    monkeypatch.setenv("JAX_PLATFORMS", "axon")
    monkeypatch.setenv("PALLAS_AXON_POOL_IPS", "127.0.0.1")
    monkeypatch.setattr(chiplock, "relay_alive", lambda *a, **k: False)
    with pytest.raises(RuntimeError, match="relay is DOWN"):
        chiplock.preflight_chip("test")


def test_preflight_raises_when_stream_wedged(monkeypatch, tmp_path):
    """Port listening + hanging ops is the round-3/5 wedge signature; the
    TCP probe alone must no longer clear chip work (NOTES.md incident)."""
    monkeypatch.setenv("JAX_PLATFORMS", "axon")
    monkeypatch.setenv("PALLAS_AXON_POOL_IPS", "127.0.0.1")
    monkeypatch.setattr(chiplock, "relay_alive", lambda *a, **k: True)
    monkeypatch.setattr(chiplock, "relay_stream_ok", lambda *a, **k: False)
    monkeypatch.setattr(chiplock, "LOCK_PATH", str(tmp_path / "chip.lock"))
    with pytest.raises(RuntimeError, match="STREAM is WEDGED"):
        chiplock.preflight_chip("test")
    # the lock must have been released so the next client can retry
    f = chiplock.acquire_chip_lock(str(tmp_path / "chip.lock"), "retry")
    assert f is not None
    chiplock.release_chip_lock()


def test_relay_stream_ok_kills_hung_probe(monkeypatch):
    """A wedged stream hangs the probe subprocess forever; the probe must
    kill it at the timeout and report False (never hang the caller)."""
    real_run = subprocess.run

    def fake_run(cmd, **kw):  # stand in a sleeper for the jax op
        return real_run([sys.executable, "-c", "import time; time.sleep(60)"],
                        timeout=kw["timeout"])

    monkeypatch.setattr(subprocess, "run", fake_run)
    import time
    t0 = time.time()
    assert chiplock.relay_stream_ok(timeout_s=2.0) is False
    assert time.time() - t0 < 30


def test_relay_stream_ok_env_skip(monkeypatch):
    monkeypatch.setenv("CHIP_STREAM_PROBE", "0")
    assert chiplock.relay_stream_ok(timeout_s=0.001) is True


def test_honor_platform_env_pins_cpu(monkeypatch):
    """JAX_PLATFORMS=cpu must override the sandbox's programmatic
    'axon,cpu' pin (round-4 cpu-sweep wedge: a worker meant for the CPU
    backend hung in axon init while the relay was down)."""
    import jax

    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    jax.config.update("jax_platforms", "axon,cpu")  # what sitecustomize does
    try:
        chiplock.honor_platform_env()
        assert jax.config.jax_platforms == "cpu"
    finally:
        jax.config.update("jax_platforms", "cpu")  # conftest regime


def test_honor_platform_env_keeps_tpu_sessions(monkeypatch):
    import jax

    monkeypatch.setenv("JAX_PLATFORMS", "axon,cpu")
    before = jax.config.jax_platforms
    chiplock.honor_platform_env()
    assert jax.config.jax_platforms == before


# ---- __graft_entry__.entry() wedge guard (round-5 flap incident) ---------
# The driver's single-chip compile check must never hang in axon backend
# init: entry() probes relay TCP + stream (real op) + lock under the
# exclusive chip flock and re-pins the process to CPU unless the chip is
# provably free AND healthy.  entry() imports the chiplock names at call
# time, so monkeypatching the module attributes here takes effect.

def _entry_platform(monkeypatch):
    import jax

    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert out[0].shape == (2, 256, 256, 5)
    return jax.config.jax_platforms


def test_entry_pins_cpu_when_relay_down(monkeypatch):
    import jax

    monkeypatch.setattr(chiplock, "targeting_tpu", lambda: True)
    monkeypatch.setattr(chiplock, "relay_alive", lambda: False)
    try:
        assert _entry_platform(monkeypatch) == "cpu"
    finally:
        jax.config.update("jax_platforms", "cpu")  # conftest regime


def test_entry_pins_cpu_when_stream_wedged(monkeypatch):
    import jax

    monkeypatch.setattr(chiplock, "targeting_tpu", lambda: True)
    monkeypatch.setattr(chiplock, "relay_alive", lambda: True)
    acquired = []
    released = []
    monkeypatch.setattr(chiplock, "acquire_chip_lock",
                        lambda **kw: acquired.append(kw))
    monkeypatch.setattr(chiplock, "release_chip_lock",
                        lambda: released.append(True))
    monkeypatch.setattr(chiplock, "relay_stream_ok", lambda: False)
    try:
        assert _entry_platform(monkeypatch) == "cpu"
    finally:
        jax.config.update("jax_platforms", "cpu")
    assert acquired and released  # probed under the lock, then dropped it


def test_entry_pins_cpu_when_chip_lock_held(monkeypatch):
    import jax

    def _busy(**kw):
        raise chiplock.ChipLockError("held by a training arm")

    monkeypatch.setattr(chiplock, "targeting_tpu", lambda: True)
    monkeypatch.setattr(chiplock, "relay_alive", lambda: True)
    monkeypatch.setattr(chiplock, "acquire_chip_lock", _busy)
    try:
        assert _entry_platform(monkeypatch) == "cpu"
    finally:
        jax.config.update("jax_platforms", "cpu")
