"""Benchmark + profiling harness — the rebuild of ``caffe time``
(SURVEY.md §3.5, §5 "Tracing / profiling"): steady-state timing with
``jax.block_until_ready`` and optional ``jax.profiler`` traces
(Perfetto/XPlane) instead of CUDA-event per-layer timers. XLA fuses
across layer boundaries, so per-layer walltime is not a meaningful unit
on TPU — the trace viewer gives the per-fusion breakdown instead.
"""

from __future__ import annotations

import contextlib
import time
from typing import Any, Callable, Dict

import jax
import numpy as np


def _force_sync(out: Any) -> None:
    """Guarantee device completion: fetch one leaf to host.

    ``jax.block_until_ready`` is not a reliable fence on the tunneled
    axon/TPU backend (it returns before execution finishes, producing
    absurd timings); a host fetch is."""
    leaves = jax.tree.leaves(out)
    if leaves:
        np.asarray(leaves[0])


def time_fn(
    fn: Callable[[], Any],
    steps: int = 50,
    warmup: int = 5,
    chunk: int = 10,
) -> Dict[str, float]:
    """Steady-state wall time per call.

    Times chunks of ``chunk`` back-to-back dispatches ending in one forced
    host sync (chained dispatch is how the training loop runs; the single
    fetch amortizes tunnel round-trip latency out of the estimate).
    """
    out = None
    for _ in range(warmup):
        out = fn()
    _force_sync(out)
    chunk_times = []
    done = 0
    while done < steps:
        n = min(chunk, steps - done)
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn()
        _force_sync(out)
        chunk_times.append((time.perf_counter() - t0) / n)
        done += n
    arr = np.asarray(chunk_times)
    return {
        "mean_s": float(arr.mean()),
        "median_s": float(np.median(arr)),
        "p95_s": float(np.percentile(arr, 95)),
        "steps": steps,
    }


def depth_layer_order(num_scales: int, n_up: int = 5) -> list:
    """DepthNet top-level module boundaries in execution order (the rows
    of the ``caffe time``-style per-layer table)."""
    order = ["ConvBlock_0"] + [f"ResNetStage_{i}" for i in range(4)]
    head = 0
    for i in range(n_up):
        order += [f"UpConv_{i}", f"ConvBlock_{i + 1}"]
        if i - (n_up - num_scales) >= 0:
            order.append(f"Conv_{head}")
            head += 1
    return order


def depth_layer_table(
    batch_size: int = 128,
    height: int = 160,
    width: int = 608,
    steps: int = 5,
    variant: str = "full_feat",
) -> Dict[str, Any]:
    """Per-layer forward timing of DepthNet — the ``caffe time`` analog
    (SURVEY.md §3.5: per-layer Forward timing table).

    XLA compiles whole programs, so layers cannot be timed inside one
    run; instead each top-level module boundary is timed as its own
    jitted PREFIX program (flax ``capture_intermediates`` + XLA dead-code
    elimination discards everything after the returned intermediate), and
    the per-layer time is the difference of consecutive cumulative times.
    Differences of medians are noisy for cheap layers (can go slightly
    negative); the cumulative column is the trustworthy one. One compile
    per boundary — slow the first time, cached after.
    """
    import dataclasses

    import jax.numpy as jnp

    from depthvo_tpu import configs
    from depthvo_tpu.train.state import build_models, create_state

    cfg = getattr(configs, variant)()
    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, height=height, width=width)
    )
    depth_net, _, _ = build_models(cfg)
    state = create_state(cfg, jax.random.PRNGKey(0))
    variables = {
        "params": state.params["depth"],
        "batch_stats": state.batch_stats,
    }
    rng = np.random.default_rng(0)
    x = jnp.asarray(
        rng.uniform(-1, 1, (batch_size, height, width, 3)), jnp.float32
    )
    order = depth_layer_order(cfg.model.num_scales)

    def make_prefix_fn(boundary):
        @jax.jit
        def prefix(variables, x):
            def body(c, _):
                _, mods = depth_net.apply(
                    variables,
                    x + c * 0.0,  # carry-dependent: no loop hoisting
                    train=False,
                    # Match the TOP-LEVEL module only — name-matching would
                    # also hit nested Conv_0/ConvBlock_0 inside stages.
                    capture_intermediates=(
                        lambda mdl, name: mdl.path == (boundary,)
                    ),
                    mutable=["intermediates"],
                )
                leaf = jax.tree.leaves(mods["intermediates"])[0]
                return c + jnp.sum(leaf.astype(jnp.float32)), None

            c, _ = jax.lax.scan(body, jnp.float32(0), None, length=4)
            return c

        return prefix

    rows = []
    prev = 0.0
    for boundary in order:
        fn = make_prefix_fn(boundary)
        st = time_fn(lambda f=fn: f(variables, x), steps=steps, warmup=2, chunk=2)
        cum = st["median_s"] / 4
        rows.append(
            {
                "layer": boundary,
                "cumulative_ms": round(cum * 1e3, 3),
                "layer_ms": round((cum - prev) * 1e3, 3),
            }
        )
        prev = cum
    return {
        "mode": "depth_layers",
        "batch_size": batch_size,
        "height": height,
        "width": width,
        "backend": jax.default_backend(),
        "rows": rows,
    }


@contextlib.contextmanager
def maybe_trace(trace_dir: str | None):
    """jax.profiler trace context (no-op when trace_dir is None)."""
    if trace_dir is None:
        yield
        return
    with jax.profiler.trace(trace_dir):
        yield


def run_benchmark(
    mode: str = "depth_infer",
    batch_size: int = 4,
    height: int = 160,
    width: int = 608,
    steps: int = 50,
    trace_dir: str | None = None,
    variant: str = "full_feat",
) -> Dict[str, Any]:
    """Benchmark one of the hot paths; returns a JSON-able result dict.

    Modes:
      depth_infer — batched DepthNet forward (the BASELINE fps metric);
        measured with K inner iterations per dispatch (device time).
      odom_infer  — batched OdomNet forward + exp-map.
      train_step  — full train step (fwd+bwd+update), one dispatch each.
      train_step_scan — K=8 optimizer steps per dispatch (lax.scan);
        per-step time with dispatch latency amortized.
      warp        — the fused inverse-warp op alone.

    Note: modes other than depth_infer and train_step_scan time
    sequential dispatches, so on a remote/tunneled device they include
    ~20 ms per-dispatch latency on top of device time. train_step_scan
    folds K=8 optimizer steps into one dispatch via lax.scan (measured
    at parity with straight-line conv schedules — see
    train/loop.make_scan_train_step) and amortizes that latency away.
    """
    import dataclasses

    import jax.numpy as jnp

    from depthvo_tpu import configs
    from depthvo_tpu.api import DepthVO

    rng = np.random.default_rng(0)
    stats_scale = 1  # iterations folded inside one dispatch (scan modes)
    extra: Dict[str, Any] = {}  # mode-specific result fields

    def _cfg(**over):
        cfg = getattr(configs, variant)(**over)
        return dataclasses.replace(
            cfg, model=dataclasses.replace(cfg.model, height=height, width=width)
        )

    if mode == "depth_infer":
        cfg = _cfg()
        model = DepthVO.from_random(cfg)
        images = jnp.asarray(
            rng.uniform(-1, 1, (batch_size, height, width, 3)), jnp.float32
        )
        # Steady-state device throughput: K sequential forwards inside one
        # jitted scan (per-dispatch tunnel latency would otherwise dominate
        # and hide the real per-batch time).
        K_INNER = 10
        depth_net = model._depth_net

        @jax.jit
        def scan_fwd(params, batch_stats, images):
            def body(c, _):
                d = depth_net.apply(
                    {"params": params["depth"], "batch_stats": batch_stats},
                    images + c * 0.0,
                    train=False,
                )[-1]
                return c + jnp.mean(d), None
            c, _ = jax.lax.scan(body, jnp.float32(0), None, length=K_INNER)
            return c

        stats_scale = K_INNER
        fn = lambda: scan_fwd(model.params, model.batch_stats, images)
    elif mode == "odom_infer":
        model = DepthVO.from_random(_cfg())
        pairs = jnp.asarray(
            rng.uniform(-1, 1, (batch_size, height, width, 6)), jnp.float32
        )
        fn = lambda: model._pose_fn(model.params, pairs)
    elif mode in ("train_step", "train_step_scan"):
        from depthvo_tpu.data.synthetic import SyntheticScenes
        from depthvo_tpu.parallel import mesh as pmesh
        from depthvo_tpu.train import loop as train_loop
        from depthvo_tpu.train.state import create_state

        cfg = _cfg(batch_size=batch_size)
        mesh = pmesh.make_mesh(1)
        state = jax.device_put(
            create_state(cfg, jax.random.PRNGKey(0)), pmesh.replicated(mesh)
        )
        batch_np = SyntheticScenes(cfg, seed=0, num_scenes=2).batch(batch_size)
        if mode == "train_step_scan":
            K_SCAN = 8
            batch = pmesh.shard_stacked_batch(
                train_loop.stack_batches([batch_np] * K_SCAN), mesh
            )
            step_fn = train_loop.make_scan_train_step(
                cfg, mesh, steps_per_call=K_SCAN
            )
            stats_scale = K_SCAN
            extra = {"steps_per_call": K_SCAN}
        else:
            batch = pmesh.shard_batch(batch_np, mesh)
            step_fn = train_loop.make_train_step(cfg, mesh)
        # donate_argnums=0 invalidates state each call: rebind.
        holder = {"state": state}

        def fn():
            holder["state"], metrics = step_fn(holder["state"], batch)
            return metrics
    elif mode == "warp":
        from depthvo_tpu.ops import fused_warp

        src = jnp.asarray(
            rng.uniform(-1, 1, (batch_size, height, width, 3)), jnp.float32
        )
        depth = jnp.asarray(
            rng.uniform(4, 40, (batch_size, height, width)), jnp.float32
        )
        T = jnp.broadcast_to(jnp.eye(4).at[0, 3].set(-0.54), (batch_size, 4, 4))
        K = jnp.asarray(
            [[0.58 * width, 0, width / 2], [0, 1.92 * height, height / 2], [0, 0, 1]],
            jnp.float32,
        )
        warp_jit = jax.jit(lambda s, d: fused_warp(s, d, T, K))
        fn = lambda: warp_jit(src, depth)
    else:
        raise ValueError(f"unknown bench mode {mode!r}")

    with maybe_trace(trace_dir):
        stats = time_fn(fn, steps=steps)

    if stats_scale != 1:
        for k in ("mean_s", "median_s", "p95_s"):
            stats[k] = stats[k] / stats_scale
    frames_per_sec = batch_size / stats["median_s"]
    return {
        "mode": mode,
        "variant": variant,
        "batch_size": batch_size,
        "height": height,
        "width": width,
        "backend": jax.default_backend(),
        "device": str(jax.devices()[0]),
        **stats,
        **extra,
        "frames_per_sec": frames_per_sec,
    }
