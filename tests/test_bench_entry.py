"""Unit tests for the driver benchmark entry (bench.py).

bench.py is the one artifact the driver executes on real TPU hardware at
round end; these tests cover its host-side logic (baseline lookup and the
down-tunnel guard) without touching any backend.

Guard design under test (2026-08-20): the whole benchmark runs in ONE
guarded subprocess (DEPTHVO_BENCH_INNER=1) whose JSON line is forwarded
verbatim — a separate cheap probe would pay the tunnel's one-time
device-slot wait (measured ~5-6 min under pool contention) and then force
the real run to pay it again, and a short probe timeout misreads a
contended-but-alive tunnel as down.
"""

import importlib.util
import json
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


class _Done:
    def __init__(self, returncode=0, stdout=b"", stderr=b""):
        self.returncode = returncode
        self.stdout = stdout
        self.stderr = stderr


def test_guarded_attempt_forwards_inner_json(bench_mod, monkeypatch, capsys):
    inner = {"metric": "m", "value": 1.0}
    captured = {}

    def _run(argv, **kw):
        captured["env"] = kw["env"]
        captured["timeout"] = kw["timeout"]
        return _Done(stdout=(json.dumps(inner) + "\n").encode())

    monkeypatch.setattr(subprocess, "run", _run)
    assert bench_mod._run_guarded_tpu_attempt() == ""
    # The inner process must be marked so it benchmarks instead of re-guarding
    # (which would recurse), and the guard must outlast the measured slot wait.
    assert captured["env"]["DEPTHVO_BENCH_INNER"] == "1"
    assert captured["timeout"] >= 600
    assert json.loads(capsys.readouterr().out.strip()) == inner


@pytest.mark.parametrize(
    "outcome, note_match",
    [
        ("timeout", "timed_out"),
        ("nonzero", "exited_rc_3"),
        ("empty_stdout", "printed_no_output"),
        ("not_json", "not_json"),
    ],
)
def test_guarded_attempt_fails_closed(
    bench_mod, monkeypatch, outcome, note_match
):
    def _run(argv, **kw):
        if outcome == "timeout":
            raise subprocess.TimeoutExpired(cmd="bench", timeout=1)
        if outcome == "nonzero":
            return _Done(returncode=3, stdout=b"{}")
        if outcome == "empty_stdout":
            return _Done(stdout=b"")
        return _Done(stdout=b"tunnel wedged mid-print")

    monkeypatch.setattr(subprocess, "run", _run)
    # The note must name what actually failed — a benchmark crash with a
    # healthy tunnel must not be reported as "tpu unreachable".
    assert note_match in bench_mod._run_guarded_tpu_attempt()


def test_main_execs_to_cpu_when_attempt_fails(bench_mod, monkeypatch):
    monkeypatch.setenv("PALLAS_AXON_POOL_IPS", "127.0.0.1")
    monkeypatch.delenv("DEPTHVO_BENCH_CPU_FALLBACK", raising=False)
    monkeypatch.delenv("DEPTHVO_BENCH_INNER", raising=False)
    attempts = []
    monkeypatch.setattr(
        bench_mod,
        "_run_guarded_tpu_attempt",
        lambda annotate=None: attempts.append(annotate) or "tpu_attempt_timed_out",
    )
    captured = {}

    def _fake_execve(path, argv, env):
        captured["env"] = env
        raise SystemExit(0)  # stand-in for the process image swap

    monkeypatch.setattr(os, "execve", _fake_execve)
    with pytest.raises(SystemExit):
        bench_mod.main()
    # Default retry policy: 1 retry -> 2 total attempts before conceding,
    # so a transiently contended (not down) tunnel gets a second chance.
    assert len(attempts) == 1 + bench_mod._BENCH_RETRIES == 2
    assert attempts[1] == {"tpu_attempts": 2}
    env = captured["env"]
    assert "PALLAS_AXON_POOL_IPS" not in env
    assert env["JAX_PLATFORMS"] == "cpu"
    assert env["JAX_PLATFORM_NAME"] == "cpu"
    assert (
        env["DEPTHVO_BENCH_CPU_FALLBACK"]
        == "tpu_attempt_timed_out_fell_back_to_cpu"
    )


def test_main_retry_succeeds_without_fallback(bench_mod, monkeypatch):
    """First attempt fails, retry lands: no exec-to-CPU, exit 0."""
    monkeypatch.setenv("PALLAS_AXON_POOL_IPS", "127.0.0.1")
    monkeypatch.delenv("DEPTHVO_BENCH_CPU_FALLBACK", raising=False)
    monkeypatch.delenv("DEPTHVO_BENCH_INNER", raising=False)
    outcomes = ["tpu_attempt_timed_out_after_900s", ""]
    calls = []

    def _fake_attempt(annotate=None):
        calls.append(annotate)
        return outcomes[len(calls) - 1]

    monkeypatch.setattr(bench_mod, "_run_guarded_tpu_attempt", _fake_attempt)
    monkeypatch.setattr(
        os, "execve",
        lambda *a: (_ for _ in ()).throw(AssertionError("must not fall back")),
    )
    assert bench_mod.main() == 0
    assert calls == [None, {"tpu_attempts": 2}]


def test_guarded_attempt_annotates_retried_success(
    bench_mod, monkeypatch, capsys
):
    """A retried success stamps tpu_attempts into the forwarded detail."""
    inner = {"metric": "m", "value": 1.0, "detail": {"backend": "tpu"}}

    monkeypatch.setattr(
        subprocess, "run",
        lambda argv, **kw: _Done(stdout=(json.dumps(inner) + "\n").encode()),
    )
    assert bench_mod._run_guarded_tpu_attempt(annotate={"tpu_attempts": 2}) == ""
    out = json.loads(capsys.readouterr().out.strip())
    assert out["detail"]["tpu_attempts"] == 2
    assert out["detail"]["backend"] == "tpu"
    assert out["value"] == 1.0


def test_env_int_falls_back_on_malformed_value(bench_mod, monkeypatch, capsys):
    """A malformed env override must not raise at import time — that
    would deny the driver its JSON line, the exact failure the guard
    exists to prevent (ADVICE r4)."""
    monkeypatch.setenv("DEPTHVO_BENCH_TUNNEL_TIMEOUT_S", "15min")
    assert bench_mod._env_int("DEPTHVO_BENCH_TUNNEL_TIMEOUT_S", 900) == 900
    monkeypatch.setenv("DEPTHVO_BENCH_TUNNEL_TIMEOUT_S", "120")
    assert bench_mod._env_int("DEPTHVO_BENCH_TUNNEL_TIMEOUT_S", 900) == 120


def _stub_run_benchmark(monkeypatch, calls):
    from depthvo_tpu.utils import profiling

    def _fake(**kw):
        calls.append(kw)
        return {
            "frames_per_sec": 100.0,
            "backend": "stub",
            "device": "stub:0",
            "batch_size": kw["batch_size"],
            "median_s": 0.01,
        }

    monkeypatch.setattr(profiling, "run_benchmark", _fake)


def test_main_inner_mode_benchmarks_without_reguarding(
    bench_mod, monkeypatch, capsys
):
    monkeypatch.setenv("PALLAS_AXON_POOL_IPS", "127.0.0.1")
    monkeypatch.setenv("DEPTHVO_BENCH_INNER", "1")
    monkeypatch.delenv("DEPTHVO_BENCH_CPU_FALLBACK", raising=False)

    def _no_subprocess(*a, **k):  # pragma: no cover - would indicate a bug
        raise AssertionError("inner mode must not spawn another guard")

    monkeypatch.setattr(subprocess, "run", _no_subprocess)
    calls = []
    _stub_run_benchmark(monkeypatch, calls)
    assert bench_mod.main() == 0
    out = json.loads(capsys.readouterr().out.strip())
    assert calls[0]["batch_size"] == 128  # full TPU workload, not the CPU cut
    assert "note" not in out["detail"]


def test_main_cpu_fallback_notes_and_shrinks(bench_mod, monkeypatch, capsys):
    # After the re-exec the child must benchmark on CPU (small workload)
    # and stamp the fallback note — and must not guard or exec again.
    monkeypatch.setenv("DEPTHVO_BENCH_CPU_FALLBACK", "1")
    monkeypatch.setenv("PALLAS_AXON_POOL_IPS", "127.0.0.1")
    monkeypatch.setattr(
        os, "execve", lambda *a: (_ for _ in ()).throw(AssertionError("exec"))
    )
    calls = []
    _stub_run_benchmark(monkeypatch, calls)
    assert bench_mod.main() == 0
    out = json.loads(capsys.readouterr().out.strip())
    assert calls[0]["batch_size"] == 4
    assert out["detail"]["note"] == "tpu_unreachable_fell_back_to_cpu"


def test_main_no_tunnel_plugin_runs_directly(bench_mod, monkeypatch, capsys):
    monkeypatch.delenv("PALLAS_AXON_POOL_IPS", raising=False)
    monkeypatch.delenv("DEPTHVO_BENCH_CPU_FALLBACK", raising=False)
    monkeypatch.delenv("DEPTHVO_BENCH_INNER", raising=False)

    def _no_subprocess(*a, **k):  # pragma: no cover - would indicate a bug
        raise AssertionError("guard must not run without the axon plugin")

    monkeypatch.setattr(subprocess, "run", _no_subprocess)
    calls = []
    _stub_run_benchmark(monkeypatch, calls)
    assert bench_mod.main() == 0
    assert json.loads(capsys.readouterr().out.strip())["value"] == 100.0
