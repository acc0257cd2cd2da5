#!/usr/bin/env python
"""Benchmark entry point for the driver: prints ONE JSON line.

Metric: depth-inference frames/sec/chip at KITTI 608x160 (the BASELINE.json
headline: ">= 5x Caffe-CPU depth fps/chip on v5e-1"). BASELINE.json
publishes no reference throughput ("published": {}), so the denominator is
a MEASURED stand-in: the same depth network at batch 1 on this machine's
CPU backend (benchmarks/cpu_baseline.json, with provenance). vs_baseline
is fps / (5 x measured_cpu_fps) — >= 1.0 means the 5x gate is met against
the measured number. Falls back to a documented 4 fps estimate only if the
measured file is missing.
"""

import json
import os
import subprocess
import sys

CAFFE_CPU_FPS_FALLBACK = 4.0  # generous single-core Caffe-CPU estimate


def _env_int(name: str, default: int) -> int:
    """Parse an int env override; a malformed value falls back instead of
    raising at import time (the driver must ALWAYS get its JSON line —
    an exception here would defeat the guard this file exists to be)."""
    try:
        return int(os.environ.get(name, str(default)))
    except ValueError:
        sys.stderr.write(
            f"bench: ignoring malformed {name}={os.environ[name]!r}, "
            f"using {default}\n"
        )
        return default


# A healthy tunnel answers the first op in ~10 s, but under pool contention
# the one-time device-slot acquisition was MEASURED at ~5-6 min (2026-08-20;
# subsequent dispatches 30-70 ms). The guarded attempt must outlast that
# wait, which is paid exactly once per process.
_TUNNEL_TIMEOUT_S = _env_int("DEPTHVO_BENCH_TUNNEL_TIMEOUT_S", 900)
# Round 4 showed TWO distinct failure modes behind one symptom: a truly
# down tunnel, and a healthy tunnel whose slot wait + compile blew the
# budget under transient host contention. One retry distinguishes them
# cheaply before conceding to the CPU fallback.
_BENCH_RETRIES = _env_int("DEPTHVO_BENCH_RETRIES", 1)
TARGET_MULTIPLIER = 5.0
_BASELINE_FILE = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "benchmarks", "cpu_baseline.json"
)


def _baseline_fps() -> tuple:
    """(fps, source) — measured CPU-backend number if recorded."""
    try:
        with open(_BASELINE_FILE) as f:
            rec = json.load(f)
        return float(rec["value"]), "measured_cpu_backend_batch1"
    except (OSError, KeyError, ValueError):
        return CAFFE_CPU_FPS_FALLBACK, "estimate"


def _run_guarded_tpu_attempt(annotate: dict | None = None) -> str:
    """Run the full benchmark through the tunnel in one guarded subprocess.

    The axon plugin (registered whenever PALLAS_AXON_POOL_IPS is set) BLOCKS
    on the first device op while a pool slot is acquired — measured ~5-6 min
    under contention, and forever when the tunnel is truly down. A separate
    cheap "probe" subprocess would pay that slot wait, exit, and force the
    real run to pay it AGAIN (and a short probe timeout misreads a
    contended-but-alive tunnel as down — the 2026-08-20 failure mode). So:
    run the WHOLE benchmark in one subprocess with a generous hard timeout;
    its JSON line is forwarded verbatim on success. Returns "" on success,
    else a note naming WHY the caller should fall back to CPU — a crash
    with a healthy tunnel must not be reported as "tpu unreachable" — with
    the inner stderr tail forwarded to our stderr so the real traceback
    survives.
    """
    env = dict(os.environ)
    env["DEPTHVO_BENCH_INNER"] = "1"
    try:
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            timeout=_TUNNEL_TIMEOUT_S,
            capture_output=True,
            env=env,
        )
    except subprocess.TimeoutExpired as e:
        if e.stderr:
            sys.stderr.write(e.stderr.decode(errors="replace")[-4000:])
        return "tpu_attempt_timed_out_after_%ds" % _TUNNEL_TIMEOUT_S
    if r.stderr:
        sys.stderr.write(r.stderr.decode(errors="replace")[-4000:])
    if r.returncode != 0:
        return "tpu_benchmark_exited_rc_%d" % r.returncode
    line = r.stdout.decode(errors="replace").strip().splitlines()
    if not line:
        return "tpu_benchmark_printed_no_output"
    try:
        parsed = json.loads(line[-1])
    except ValueError:
        return "tpu_benchmark_output_not_json"
    if annotate and isinstance(parsed.get("detail"), dict):
        # A retried success records how many attempts it took, so the
        # driver artifact distinguishes "first try" from "recovered".
        parsed["detail"].update(annotate)
        print(json.dumps(parsed))
    else:
        print(line[-1])
    return ""


def main() -> int:
    fallback_note = ""
    if os.environ.get("DEPTHVO_BENCH_CPU_FALLBACK"):
        fallback_note = os.environ["DEPTHVO_BENCH_CPU_FALLBACK"]
        if fallback_note == "1":  # pre-note invocations
            fallback_note = "tpu_unreachable_fell_back_to_cpu"
    elif os.environ.get("PALLAS_AXON_POOL_IPS") and not os.environ.get(
        "DEPTHVO_BENCH_INNER"
    ):
        why = _run_guarded_tpu_attempt()
        attempt = 1
        while why and attempt <= _BENCH_RETRIES:
            attempt += 1
            sys.stderr.write(
                f"bench: TPU attempt {attempt - 1} failed ({why}); "
                f"retrying ({attempt}/{1 + _BENCH_RETRIES})\n"
            )
            why = _run_guarded_tpu_attempt(annotate={"tpu_attempts": attempt})
        if not why:
            return 0
        # Tunnel attempt failed/hung: re-exec pinned to the CPU backend so
        # the driver always gets its one JSON line instead of a hang. The
        # note travels in the env so the JSON says what actually happened.
        env = dict(os.environ)
        env.pop("PALLAS_AXON_POOL_IPS", None)
        env["JAX_PLATFORMS"] = "cpu"
        env["JAX_PLATFORM_NAME"] = "cpu"
        env["DEPTHVO_BENCH_CPU_FALLBACK"] = why + "_fell_back_to_cpu"
        os.execve(
            sys.executable, [sys.executable, os.path.abspath(__file__)], env
        )
        raise RuntimeError("unreachable")  # pragma: no cover

    from depthvo_tpu.utils.profiling import run_benchmark

    # Time the one-per-process device-slot acquisition explicitly (first
    # tiny op end-to-end): when a round-end number falls back or runs
    # slow, the JSON says whether the tunnel wait or the benchmark itself
    # ate the budget (VERDICT r4 item 4).
    import time as _time

    _t0 = _time.time()
    import jax as _jax
    import jax.numpy as _jnp

    _jax.block_until_ready(_jnp.zeros(()) + 1)
    slot_acquire_s = round(_time.time() - _t0, 1)

    # Batch 128: measured throughput knee on v5e-1 (32 -> 1.9k fps,
    # 128 -> 5.0k fps, 256 -> 5.3k fps); latency still under 26 ms/batch.
    # The CPU fallback shrinks the workload so one JSON line still lands
    # in minutes on a 1-core host.
    result = run_benchmark(
        mode="depth_infer",
        batch_size=4 if fallback_note else 128,
        height=160,
        width=608,
        steps=3 if fallback_note else 30,
    )
    fps = result["frames_per_sec"]
    base_fps, base_src = _baseline_fps()
    out = {
        "metric": "depth_infer_frames_per_sec_per_chip_608x160",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / (base_fps * TARGET_MULTIPLIER), 3),
        "detail": {
            "backend": result["backend"],
            "device": result["device"],
            "batch_size": result["batch_size"],
            "median_step_s": result["median_s"],
            "device_acquire_s": slot_acquire_s,
            "baseline_fps": base_fps,
            "baseline_source": base_src,
        },
    }
    if fallback_note:
        out["detail"]["note"] = fallback_note
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
