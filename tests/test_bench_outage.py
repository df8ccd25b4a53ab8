"""bench.py driver-contract hardening: a TPU outage on bench day (both axon
failure modes — wedged-lease init hang, relay-down fast-fail) must yield a
parseable one-line JSON artifact, never a stack trace or a hang past the
bounded probe (round-3 outage log; the reference has no analog — its bench
assumes a local GPU)."""

import json
import subprocess
import sys
from os import path

import pytest

sys.path.insert(0, path.dirname(path.dirname(path.abspath(__file__))))

import bench  # noqa: E402


def _parse_artifact(capsys):
    out = capsys.readouterr().out.strip().splitlines()
    art = json.loads(out[-1])
    assert art["value"] == 0.0
    assert art["vs_baseline"] == 0.0
    assert art["unit"] == "clips/s/chip"
    assert "error" in art and "note" in art
    return art


def test_outage_artifact_on_hung_init(monkeypatch, capsys):
    """Wedge mode: the bounded subprocess probe times out -> outage JSON."""
    def fake_run(*a, **k):
        raise subprocess.TimeoutExpired(cmd="probe", timeout=k.get("timeout", 1))

    monkeypatch.setenv("BENCH_INIT_TIMEOUT", "1")
    monkeypatch.setattr(subprocess, "run", fake_run)
    assert bench.main() == 1
    art = _parse_artifact(capsys)
    assert "hung" in art["error"]


def test_outage_artifact_on_fast_fail(monkeypatch, capsys):
    """Relay-down mode: probe fast-fails, all 5 in-process inits raise ->
    outage JSON after the (patched-out) retry sleeps."""
    import jax

    class _Probe:
        returncode = 1

    def raise_unavailable():
        raise RuntimeError("Unable to initialize backend 'axon': UNAVAILABLE")

    monkeypatch.setenv("BENCH_INIT_TIMEOUT", "1")
    monkeypatch.setattr(subprocess, "run", lambda *a, **k: _Probe())
    monkeypatch.setattr(jax, "devices", raise_unavailable)
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    assert bench.main() == 1
    art = _parse_artifact(capsys)
    assert "5 init attempts" in art["error"]


def test_probe_disabled_skips_subprocess(monkeypatch, capsys):
    """BENCH_INIT_TIMEOUT=0 must skip the subprocess probe entirely (CI /
    forced-CPU runs shouldn't pay a jax-import subprocess)."""
    import jax

    def boom(*a, **k):
        raise AssertionError("subprocess probe ran despite BENCH_INIT_TIMEOUT=0")

    def raise_unavailable():
        raise RuntimeError("UNAVAILABLE")

    monkeypatch.setenv("BENCH_INIT_TIMEOUT", "0")
    monkeypatch.setattr(subprocess, "run", boom)
    monkeypatch.setattr(jax, "devices", raise_unavailable)
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    assert bench.main() == 1
    _parse_artifact(capsys)


def test_decode_worker_death_signals_consumer(tmp_path):
    """A decode-worker crash must surface as an error, not an eternal hang:
    the worker records the failure, sets stop, and posts a None sentinel so
    the consumer's ready_q.get() unblocks (previously only ImportError was
    caught and any other worker death deadlocked the bench silently,
    producing no driver artifact at all)."""
    import queue
    import threading

    free_q: "queue.Queue" = queue.Queue()
    ready_q: "queue.Queue" = queue.Queue(maxsize=1)
    stop = threading.Event()
    err: list = []
    free_q.put(0)
    # nonexistent paths make the decode raise inside the worker loop
    buffers = [tuple(__import__("numpy").empty((1, 2, 8, 8), "uint8")
                     for _ in range(3))]
    w = threading.Thread(
        target=bench._decode_worker,
        args=([str(tmp_path / "missing.avi")], 20.0, buffers, free_q,
              ready_q, stop, err),
        daemon=True,
    )
    w.start()
    w.join(timeout=60)
    assert not w.is_alive()
    assert err, "worker must record its failure"
    assert stop.is_set()
    assert ready_q.get(timeout=5) is None  # sentinel unblocks the consumer
