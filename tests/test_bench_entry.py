"""Unit tests for the driver benchmark entry (bench.py).

bench.py is the one artifact the driver executes on real TPU hardware at
round end; these tests cover its host-side logic (baseline lookup and the
down-tunnel guard) without touching any backend.
"""

import importlib.util
import os
import subprocess
import sys

import pytest

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture()
def bench_mod():
    spec = importlib.util.spec_from_file_location(
        "bench_under_test", os.path.join(_REPO_ROOT, "bench.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_baseline_fps_reads_measured_file(bench_mod):
    fps, source = bench_mod._baseline_fps()
    # benchmarks/cpu_baseline.json is committed; the measured path must win.
    assert source == "measured_cpu_backend_batch1"
    assert fps > 0


def test_guard_skips_when_no_tunnel_plugin(bench_mod, monkeypatch):
    monkeypatch.delenv("PALLAS_AXON_POOL_IPS", raising=False)
    monkeypatch.delenv("DEPTHVO_BENCH_CPU_FALLBACK", raising=False)

    def _no_subprocess(*a, **k):  # pragma: no cover - would indicate a bug
        raise AssertionError("probe must not run without the axon plugin")

    monkeypatch.setattr(subprocess, "run", _no_subprocess)
    assert bench_mod._ensure_reachable_backend() == ""


def test_guard_is_idempotent_after_fallback(bench_mod, monkeypatch):
    # After the re-exec, the child must not probe (or exec) again.
    monkeypatch.setenv("DEPTHVO_BENCH_CPU_FALLBACK", "1")
    monkeypatch.setenv("PALLAS_AXON_POOL_IPS", "127.0.0.1")
    note = bench_mod._ensure_reachable_backend()
    assert note == "tpu_unreachable_fell_back_to_cpu"


def test_guard_passes_through_when_probe_answers(bench_mod, monkeypatch):
    monkeypatch.setenv("PALLAS_AXON_POOL_IPS", "127.0.0.1")
    monkeypatch.delenv("DEPTHVO_BENCH_CPU_FALLBACK", raising=False)

    class _Ok:
        returncode = 0

    monkeypatch.setattr(subprocess, "run", lambda *a, **k: _Ok())
    assert bench_mod._ensure_reachable_backend() == ""


def test_guard_execs_to_cpu_on_timeout(bench_mod, monkeypatch):
    monkeypatch.setenv("PALLAS_AXON_POOL_IPS", "127.0.0.1")
    monkeypatch.delenv("DEPTHVO_BENCH_CPU_FALLBACK", raising=False)

    def _timeout(*a, **k):
        raise subprocess.TimeoutExpired(cmd="probe", timeout=1)

    monkeypatch.setattr(subprocess, "run", _timeout)
    captured = {}

    def _fake_execve(path, argv, env):
        captured["env"] = env
        raise SystemExit(0)  # stand-in for the process image swap

    monkeypatch.setattr(os, "execve", _fake_execve)
    with pytest.raises(SystemExit):
        bench_mod._ensure_reachable_backend()
    env = captured["env"]
    assert "PALLAS_AXON_POOL_IPS" not in env
    assert env["JAX_PLATFORMS"] == "cpu"
    assert env["JAX_PLATFORM_NAME"] == "cpu"
    assert env["DEPTHVO_BENCH_CPU_FALLBACK"] == "1"
