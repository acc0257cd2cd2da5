#!/usr/bin/env python
"""Per-category roofline of the train step (VERDICT r3 "next" #3).

Answers, with measurements rather than narrative, why training MFU sits
where it does and what the irreducible floor of a full_feat step is:

1. Measures THIS chip's achievable ceilings (not datasheet numbers):
   - bf16 matmul TF/s via a large square matmul (MXU ceiling),
   - HBM GB/s via a large f32 elementwise copy (bandwidth ceiling).
2. For each per-chip batch size (default 4/8/16), compiles the K=8 scan
   train step, pulls XLA cost analysis (flops + bytes accessed), times
   it, and parses a jax.profiler device trace into op categories
   (convolution fusions / Pallas warp custom-calls / data formatting /
   loop fusions / other).
3. Emits the speed-of-light table:
   - conv category: conv-attributed FLOPs / measured matmul TF/s,
   - warp category: analytic kernel HBM bytes / measured HBM GB/s,
   - whole step: max(compute SOL, memory SOL) vs measured ms.
4. Optional --loss-dtype A/B: photometric-region f32 vs bf16 step time.

Run on the real chip: PYTHONPATH=. python benchmarks/roofline.py
Prints one JSON document (indented) — PERF.md's roofline section is a
transcription of it.
"""

from __future__ import annotations

import argparse
import dataclasses
import glob
import gzip
import json
import os
import re
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


# ---------------------------------------------------------------- ceilings

def _delta_time(make_fn, l_short: int, l_long: int, reps: int = 5) -> float:
    """Seconds per scan iteration, with the constant per-dispatch cost
    (tunnel round-trip ~20 ms on this machine, launch overhead) cancelled
    by timing two scan lengths and differencing: (t_long - t_short) /
    (l_long - l_short). ``make_fn(length)`` returns a zero-arg callable
    whose result fetch is O(scalar) — fetching a full operand would time
    the tunnel link, not the device (the round-3 ceiling-measurement bug)."""
    fns = {length: make_fn(length) for length in (l_short, l_long)}
    for fn in fns.values():
        fn()  # warm/compile
    best = {length: 1e9 for length in fns}
    for _ in range(reps):
        for length, fn in fns.items():
            t0 = time.perf_counter()
            fn()
            best[length] = min(best[length], time.perf_counter() - t0)
    return (best[l_long] - best[l_short]) / (l_long - l_short)


def measured_matmul_tflops(n: int = 8192) -> float:
    """Achieved bf16 TF/s on a large square matmul (the MXU ceiling this
    program could ever see; datasheet v5e peak is 197)."""
    import jax
    import jax.numpy as jnp

    a = jnp.ones((n, n), jnp.bfloat16)
    b = jnp.ones((n, n), jnp.bfloat16)

    def make(length):
        @jax.jit
        def many(a, b):
            def body(c, _):
                # carry-dependent so the loop cannot be hoisted
                return (a @ (b + c[0, 0] * 0)).astype(jnp.bfloat16), None

            c, _ = jax.lax.scan(body, a, None, length=length)
            return c[0, 0]  # scalar fetch — don't time the link

        return lambda: np.asarray(many(a, b))

    per_iter = _delta_time(make, 4, 20)
    return 2 * n**3 / per_iter / 1e12


def measured_hbm_gbps(mb: int = 512) -> float:
    """Achieved HBM GB/s on a big f32 elementwise add (read + write)."""
    import jax
    import jax.numpy as jnp

    n = mb * 1024 * 1024 // 4
    x = jnp.ones((n,), jnp.float32)

    def make(length):
        @jax.jit
        def many(x):
            def body(c, _):
                return c + 1.0, None

            c, _ = jax.lax.scan(body, x, None, length=length)
            return c[0]

        return lambda: np.asarray(many(x))

    per_iter = _delta_time(make, 4, 20)
    return 2 * n * 4 / per_iter / 1e9


# ------------------------------------------------------- trace categories

# Event-name classification for TPU device lanes — the FALLBACK when an
# event has no ``hlo_category`` arg (XLA's own exact category, preferred).
_CATEGORIES = (
    ("convolution fusion", re.compile(r"convolution|conv_general|%conv")),
    ("custom-call", re.compile(r"custom-call|custom_call|tpu_custom")),
    ("data formatting", re.compile(
        r"transpose|copy(?!-done)|bitcast|reshape|pad|slice|concatenate"
    )),
    ("reduce", re.compile(r"reduce|all-reduce|psum")),
    ("loop fusion", re.compile(r"fusion")),
)


def classify(ev: dict) -> str:
    cat = ev.get("args", {}).get("hlo_category")
    if cat:
        return cat
    low = ev.get("name", "").lower()
    for cat, rx in _CATEGORIES:
        if rx.search(low):
            return cat
    return "other"


def parse_trace(trace_dir: str) -> dict:
    """Sum device-lane SELF time per category from a profiler trace.

    Reads the trace-viewer JSON (plugins/profile/*/*.trace.json.gz) and
    keeps ONLY the device "XLA Ops" thread — the "XLA Modules" and
    "Steps" lanes carry container events (whole-program / whole-step
    spans) that would otherwise swamp the categories, and host python
    threads are excluded. Events on the ops lane still nest (fusion
    parents contain sub-ops), so self time is computed with an interval
    stack: a parent's duration minus its children's.
    """
    paths = sorted(
        glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                  recursive=True),
        key=os.path.getmtime,
    )
    if not paths:
        return {"error": f"no trace.json.gz under {trace_dir}"}
    with gzip.open(paths[-1], "rt") as f:
        doc = json.load(f)
    events = doc.get("traceEvents", [])
    pid_name: dict = {}
    tid_name: dict = {}
    for ev in events:
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            pid_name[ev["pid"]] = ev.get("args", {}).get("name", "")
        if ev.get("ph") == "M" and ev.get("name") == "thread_name":
            tid_name[(ev["pid"], ev["tid"])] = ev.get("args", {}).get("name", "")
    op_lanes = {
        key for key, name in tid_name.items()
        if name == "XLA Ops" and "/device" in pid_name.get(key[0], "")
    }
    ops = [
        ev for ev in events
        if ev.get("ph") == "X" and ev.get("dur")
        and (ev.get("pid"), ev.get("tid")) in op_lanes
    ]
    ops.sort(key=lambda e: (e["ts"], -e["dur"]))
    totals: dict[str, float] = {}
    cat_bytes: dict[str, float] = {}
    cat_flops: dict[str, float] = {}
    examples: dict[str, dict] = {}
    # One interval stack PER (pid, tid) lane: events only nest within
    # their own device lane; a shared stack would subtract a device-1
    # op's time from whatever device-0 op happens to span it in wall
    # time (single-device runs are unaffected, but parse_trace is used
    # as a general tool).
    stacks: dict = {}  # (pid, tid) -> [(end_ts, event), ...]
    for ev in ops:
        ts, dur, name = ev["ts"], ev["dur"], ev.get("name", "")
        stack = stacks.setdefault((ev.get("pid"), ev.get("tid")), [])
        while stack and stack[-1][0] <= ts:
            stack.pop()
        if stack:
            # Child: subtract from the enclosing event's category so
            # every microsecond is counted exactly once (self time).
            parent_cat = classify(stack[-1][1])
            totals[parent_cat] = totals.get(parent_cat, 0.0) - dur
            ex = examples.setdefault(parent_cat, {})
            pname = stack[-1][1].get("name", "")
            ex[pname] = ex.get(pname, 0.0) - dur
        cat = classify(ev)
        args = ev.get("args", {})
        totals[cat] = totals.get(cat, 0.0) + dur
        cat_bytes[cat] = cat_bytes.get(cat, 0.0) + float(
            args.get("bytes_accessed", 0) or 0
        )
        cat_flops[cat] = cat_flops.get(cat, 0.0) + float(
            args.get("model_flops", 0) or 0
        )
        ex = examples.setdefault(cat, {})
        ex[name] = ex.get(name, 0.0) + dur
        stack.append((ts + dur, ev))
    # Keep the 4 biggest example op names per category (for auditing the
    # classifier, not for the table).
    top = {
        cat: sorted(ex.items(), key=lambda kv: -kv[1])[:4]
        for cat, ex in examples.items()
    }
    return {
        "total_device_us": sum(totals.values()),
        "by_category_us": {k: round(v, 1) for k, v in sorted(
            totals.items(), key=lambda kv: -kv[1])},
        "by_category_bytes": {k: round(v, 0) for k, v in cat_bytes.items()},
        "by_category_flops": {k: round(v, 0) for k, v in cat_flops.items()},
        "top_ops": top,
        "trace_file": paths[-1],
    }


# ----------------------------------------------------- warp byte analysis

def warp_hbm_bytes(cfg, batch: int) -> float:
    """Analytic HBM traffic (bytes, f32) of all warp kernel calls in ONE
    full_feat train step — the memory speed-of-light numerator for the
    warp category.

    Mirrors compute_losses' call sites: stereo warp at every scale,
    frozen temporal warp at the coarse scales, fused C=19 frozen warp at
    the finest. fwd reads (src, depth) writes (out, valid, du/dv factors
    for the frozen kernels); bwd reads (grad_out, factors/src rows)
    writes (d_depth [+ d_src for stereo]). We count each operand once —
    the optimistic (speed-of-light) assumption that every byte moves
    exactly once between HBM and VMEM.
    """
    H, W = cfg.model.height, cfg.model.width
    total = 0.0
    for i in range(cfg.model.num_scales):
        h, w = H // 2**i, W // 2**i
        hw = h * w * batch * 4.0  # f32 bytes of one (B,h,w) plane
        # stereo warp: fwd src(3) + depth(1) -> out(3) + valid(1);
        # bwd grad(3) + src(3) + depth(1) -> d_src(3) + d_depth(1)
        total += hw * (8 + 11)
        if cfg.use_temporal:
            # compute_losses runs the frozen temporal warp at EVERY
            # scale; at the finest it is the fused C=19 RGB+feature warp
            # when use_feature, else the plain C=3 warp
            # (train/loop.py: `use_temporal and not (finest and
            # use_feature)` plus the fused finest-scale feature path).
            finest = i == 0
            C = 19 if (finest and cfg.use_feature) else 3
            # frozen warp: fwd src(C)+depth -> out(C)+valid+factors(2);
            # bwd grad(C)+factors(2) -> d_depth(1)+d_twist-partials(~6)
            total += hw * ((2 * C + 4) + (C + 9))
    return total


# --------------------------------------------------------------- the step

def step_measurement(batch: int, variant: str, steps: int, trace: bool,
                     loss_dtype: str = "float32") -> dict:
    import jax

    from depthvo_tpu import configs
    from depthvo_tpu.data.synthetic import SyntheticScenes
    from depthvo_tpu.parallel import mesh as pmesh
    from depthvo_tpu.train import loop as train_loop
    from depthvo_tpu.train.state import create_state
    from depthvo_tpu.utils.profiling import time_fn

    cfg = getattr(configs, variant)(batch_size=batch)
    if loss_dtype != "float32":
        cfg = dataclasses.replace(cfg, loss_dtype=loss_dtype)
    mesh = pmesh.make_mesh(1)
    state = jax.device_put(
        create_state(cfg, jax.random.PRNGKey(0)), pmesh.replicated(mesh)
    )
    K_SCAN = 8
    batch_np = SyntheticScenes(cfg, seed=0, num_scenes=2).batch(batch)
    stacked = pmesh.shard_stacked_batch(
        train_loop.stack_batches([batch_np] * K_SCAN), mesh
    )
    step_fn = train_loop.make_scan_train_step(cfg, mesh)
    compiled = step_fn.lower(state, stacked).compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, (list, tuple)):
        cost = cost[0]
    flops = float(cost.get("flops", 0.0))
    bytes_accessed = float(cost.get("bytes accessed", 0.0))

    holder = {"state": state}

    def fn():
        holder["state"], m = compiled(holder["state"], stacked)
        return m

    stats = time_fn(fn, steps=steps, warmup=3, chunk=4)
    ms_per_step = stats["median_s"] / K_SCAN * 1e3

    out = {
        "batch": batch,
        "loss_dtype": loss_dtype,
        "ms_per_step": round(ms_per_step, 2),
        "frames_per_sec": round(batch / (ms_per_step / 1e3), 1),
        "flops_per_step": flops,
        "bytes_accessed_per_step": bytes_accessed,
        "warp_kernel_bytes_analytic": warp_hbm_bytes(cfg, batch),
    }
    if trace:
        tdir = f"/tmp/roofline_trace_b{batch}_{loss_dtype}"
        os.makedirs(tdir, exist_ok=True)
        with jax.profiler.trace(tdir):
            for _ in range(3):
                m = fn()
            np.asarray(jax.tree.leaves(m)[0])
        parsed = parse_trace(tdir)
        # Per-step category times: the trace covers 3 dispatches x K steps.
        if "by_category_us" in parsed:
            n_steps = 3 * K_SCAN
            out["category_ms_per_step"] = {
                k: round(v / 1e3 / n_steps, 3)
                for k, v in parsed["by_category_us"].items()
            }
            out["category_gb_per_step"] = {
                k: round(v / 1e9 / n_steps, 3)
                for k, v in parsed["by_category_bytes"].items()
            }
            out["category_gflop_per_step"] = {
                k: round(v / 1e9 / n_steps, 2)
                for k, v in parsed["by_category_flops"].items()
            }
            out["trace_total_ms_per_step"] = round(
                parsed["total_device_us"] / 1e3 / n_steps, 3
            )
            out["trace_top_ops"] = parsed["top_ops"]
    return out


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="4,8,16")
    ap.add_argument("--variant", default="full_feat")
    ap.add_argument("--steps", type=int, default=24,
                    help="timed dispatches per config (x8 scanned steps)")
    # Tracing is on by default; --no-trace is the only switch (a
    # store_true --trace alongside default=True would be a no-op flag).
    ap.add_argument(
        "--no-trace", dest="trace", action="store_false", default=True
    )
    ap.add_argument("--loss-dtype-ab", action="store_true",
                    help="also measure the photometric region in bf16")
    args = ap.parse_args(argv)

    import jax

    doc: dict = {
        "metric": "train_step_roofline",
        "backend": jax.default_backend(),
        "device": str(jax.devices()[0]),
    }
    doc["ceilings"] = {
        "matmul_bf16_tflops_measured": round(measured_matmul_tflops(), 1),
        "hbm_gbps_measured": round(measured_hbm_gbps(), 1),
    }
    mm = doc["ceilings"]["matmul_bf16_tflops_measured"] * 1e12
    bw = doc["ceilings"]["hbm_gbps_measured"] * 1e9

    rows = []
    for b in [int(x) for x in args.batches.split(",")]:
        row = step_measurement(b, args.variant, args.steps, args.trace)
        # Speed-of-light statements.
        sol_compute_ms = row["flops_per_step"] / mm * 1e3
        sol_memory_ms = row["bytes_accessed_per_step"] / bw * 1e3
        row["sol_ms"] = {
            "compute(flops/measured_matmul)": round(sol_compute_ms, 2),
            "memory(bytes/measured_hbm)": round(sol_memory_ms, 2),
            "floor(max)": round(max(sol_compute_ms, sol_memory_ms), 2),
        }
        row["x_above_floor"] = round(
            row["ms_per_step"] / max(sol_compute_ms, sol_memory_ms), 2
        )
        cat = row.get("category_ms_per_step", {})
        gb = row.get("category_gb_per_step", {})
        gf = row.get("category_gflop_per_step", {})
        # Per-category speed of light: each category's floor is the max
        # of its compute time at the measured matmul rate and its memory
        # time at the measured HBM rate (bytes/flops from the trace's
        # per-op XLA accounting). x = measured / floor names how far
        # each category sits from light and therefore which unit binds.
        percat = {}
        for k, ms in cat.items():
            floor_ms = max(gf.get(k, 0.0) * 1e9 / mm * 1e3,
                           gb.get(k, 0.0) * 1e9 / bw * 1e3)
            percat[k] = {
                "ms": ms,
                "gb": gb.get(k, 0.0),
                "gflop": gf.get(k, 0.0),
                "floor_ms": round(floor_ms, 3),
                "x_above_floor": round(ms / floor_ms, 2) if floor_ms > 1e-6
                else None,
            }
        row["per_category_sol"] = percat
        if "custom-call" in cat:
            # The Pallas warp kernels are the only custom-calls in the
            # step; their analytic one-pass byte count is a tighter
            # memory floor than XLA's per-op accounting.
            warp_sol = row["warp_kernel_bytes_analytic"] / bw * 1e3
            row["warp_sol_ms(bytes/hbm)"] = round(warp_sol, 3)
            row["warp_x_above_memory_sol"] = round(
                cat["custom-call"] / max(warp_sol, 1e-9), 2
            )
        rows.append(row)
    doc["rows"] = rows

    if args.loss_dtype_ab:
        b = int(args.batches.split(",")[0])
        doc["loss_dtype_ab"] = {
            "f32": step_measurement(b, args.variant, args.steps, False),
            "bf16": step_measurement(b, args.variant, args.steps, False,
                                     loss_dtype="bfloat16"),
        }

    print(json.dumps(doc, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
