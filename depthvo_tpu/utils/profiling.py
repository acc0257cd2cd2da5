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


# Per-chip bf16 peak (dense TFLOP/s) by device kind, for MFU reporting.
# Longest prefix wins ("TPU v5" must not shadow "TPU v5 lite"). Unknown
# kinds report no MFU rather than a number against the wrong peak.
_TPU_BF16_PEAK_TFLOPS = {
    "TPU v4": 275.0,
    "TPU v5 lite": 197.0,  # v5e
    "TPU v5": 459.0,  # v5p
    "TPU v6 lite": 918.0,  # v6e / Trillium
}


def _bf16_peak_tflops(device_kind: str) -> float | None:
    best = None
    for prefix, peak in _TPU_BF16_PEAK_TFLOPS.items():
        if device_kind.startswith(prefix):
            if best is None or len(prefix) > len(best[0]):
                best = (prefix, peak)
    return best[1] if best else None


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
        # Min over chunks: the lowest-noise estimator for repeated
        # identical device work (timing noise is strictly additive) —
        # what the per-layer difference table uses.
        "min_s": float(arr.min()),
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


def odom_layer_order(n_convs: int = 7, n_fc: int = 3) -> list:
    """OdomNet top-level module boundaries in execution order."""
    return [f"ConvBlock_{i}" for i in range(n_convs)] + [
        f"Dense_{i}" for i in range(n_fc)
    ]


def feat_layer_order(n_convs: int = 3) -> list:
    """FeatNet top-level module boundaries in execution order (dilated
    conv blocks + the final projection conv)."""
    return [f"ConvBlock_{i}" for i in range(n_convs)] + ["Conv_0"]


def depth_layer_table(
    batch_size: int = 128,
    height: int = 160,
    width: int = 608,
    steps: int = 20,
    variant: str = "full_feat",
    include_backward: bool = True,
    layers: "list | None" = None,
    net: str = "depth",
) -> Dict[str, Any]:
    """Per-layer Forward AND Backward timing of DepthNet (``net="depth"``),
    OdomNet (``net="odom"``), or FeatNet (``net="feat"``) — the
    ``caffe time`` analog (SURVEY.md §3.5: per-layer fwd/bwd table).

    XLA compiles whole programs, so layers cannot be timed inside one
    run; instead each top-level module boundary is timed as its own
    jitted PREFIX program (flax ``capture_intermediates`` + XLA dead-code
    elimination discards everything after the returned intermediate), and
    per-layer time is the difference of consecutive cumulative times.
    Backward: the same prefix with ``jax.grad`` of a scalar loss of the
    captured intermediate w.r.t. the params — forward-to-boundary plus
    backward-from-boundary; subtracting the forward cumulative isolates
    the backward share.

    Noise control (the round-2 negative-row fix): cumulative estimates
    use the MIN over timing chunks (additive-noise-optimal) at >= 20
    reps, instead of differences of 5-rep medians. One compile per
    boundary — slow the first time, cached after.
    """
    import dataclasses

    import jax.numpy as jnp

    from depthvo_tpu import configs
    from depthvo_tpu.train.state import build_models, create_state

    cfg = getattr(configs, variant)()
    # The table attributes time to the STANDARD module boundaries
    # (UpConv_i/ConvBlock_i/...); the s2d finest stage computes the same
    # function through param shells whose captured "intermediate" would
    # be the kernel itself, so the per-layer harness always times the
    # standard program (weights are interchangeable — models/depth_net.py).
    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(
            cfg.model, height=height, width=width, s2d_finest=False
        )
    )
    depth_model, odom_model, feat_model = build_models(cfg)
    state = create_state(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    if net == "feat":
        if "feat" not in state.params:
            raise ValueError(f"variant {variant!r} has no feature net")
        the_net = feat_model
        variables = {"params": state.params["feat"]}
        in_ch = 3
        order = feat_layer_order(len(feat_model.conv_features))
    elif net == "odom":
        if "odom" not in state.params:
            raise ValueError(f"variant {variant!r} has no odometry net")
        the_net = odom_model
        variables = {"params": state.params["odom"]}
        in_ch = 6
        order = odom_layer_order(
            len(odom_model.conv_features), len(odom_model.fc_features) + 1
        )
    elif net == "depth":
        the_net = depth_model
        variables = {
            "params": state.params["depth"],
            "batch_stats": state.batch_stats,
        }
        in_ch = 3
        order = depth_layer_order(cfg.model.num_scales)
    else:
        raise ValueError(
            f"unknown net {net!r} (want 'depth', 'odom', or 'feat')"
        )
    x = jnp.asarray(
        rng.uniform(-1, 1, (batch_size, height, width, in_ch)), jnp.float32
    )
    if layers is not None:
        # Restrict to a boundary subset (each boundary costs 1-2 fresh
        # XLA compiles; CI times a prefix of the table, PERF.md the whole).
        order = [b for b in order if b in set(layers)]
    K_INNER = 4

    def capture(boundary):
        # Match the TOP-LEVEL module only — name-matching would also hit
        # nested Conv_0/ConvBlock_0 inside stages.
        return lambda mdl, name: mdl.path == (boundary,)

    def make_prefix_fn(boundary):
        @jax.jit
        def prefix(variables, x):
            def body(c, _):
                _, mods = the_net.apply(
                    variables,
                    x + c * 0.0,  # carry-dependent: no loop hoisting
                    train=False,
                    capture_intermediates=capture(boundary),
                    mutable=["intermediates"],
                )
                leaf = jax.tree.leaves(mods["intermediates"])[0]
                return c + jnp.sum(leaf.astype(jnp.float32)), None

            c, _ = jax.lax.scan(body, jnp.float32(0), None, length=K_INNER)
            return c

        return prefix

    def make_prefix_grad_fn(boundary):
        @jax.jit
        def prefix_grad(variables, x):
            def body(c, _):
                def loss_fn(params):
                    _, mods = the_net.apply(
                        {**variables, "params": params},
                        x + c * 0.0,
                        train=False,
                        capture_intermediates=capture(boundary),
                        mutable=["intermediates"],
                    )
                    leaf = jax.tree.leaves(mods["intermediates"])[0]
                    return jnp.sum(jnp.square(leaf.astype(jnp.float32)))

                loss, grads = jax.value_and_grad(loss_fn)(variables["params"])
                gsum = sum(
                    jnp.sum(g.astype(jnp.float32)) for g in jax.tree.leaves(grads)
                )
                return c + loss + gsum, None

            c, _ = jax.lax.scan(body, jnp.float32(0), None, length=K_INNER)
            return c

        return prefix_grad

    def cum_time(fn):
        st = time_fn(
            lambda: fn(variables, x), steps=steps, warmup=2, chunk=4
        )
        return st["min_s"] / K_INNER

    rows = []
    prev_f = 0.0
    prev_b = 0.0
    for boundary in order:
        # Monotone-cumulative projection: a longer prefix can't be
        # cheaper, so residual noise is clamped into the NEXT row's
        # difference instead of printing a negative layer time.
        cum_f = max(cum_time(make_prefix_fn(boundary)), prev_f)
        row = {
            "layer": boundary,
            "forward_ms": round((cum_f - prev_f) * 1e3, 3),
            "fwd_cumulative_ms": round(cum_f * 1e3, 3),
        }
        if include_backward:
            # fwd+bwd program minus the forward cumulative -> backward
            # cumulative; consecutive differences -> per-layer backward.
            cum_fb = cum_time(make_prefix_grad_fn(boundary))
            cum_b = max(cum_fb - cum_f, prev_b)
            row["backward_ms"] = round((cum_b - prev_b) * 1e3, 3)
            row["bwd_cumulative_ms"] = round(cum_b * 1e3, 3)
            prev_b = cum_b
        rows.append(row)
        prev_f = cum_f
    return {
        "mode": f"{net}_layers",
        "batch_size": batch_size,
        "height": height,
        "width": width,
        "backend": jax.default_backend(),
        "estimator": f"min over chunks, {steps} reps, K_inner={K_INNER}",
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
    remat: bool = False,
    int8: bool = False,
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
            cfg,
            model=dataclasses.replace(
                cfg.model, height=height, width=width, remat=remat
            ),
        )

    if mode == "depth_infer":
        cfg = _cfg()
        model = DepthVO.from_random(cfg)
        images = jnp.asarray(
            rng.uniform(-1, 1, (batch_size, height, width, 3)), jnp.float32
        )
        quant_vars = None
        if int8:
            # w8a8 serving path: calibrate on the benchmark batch, then
            # time the quantized program (api.calibrate_int8 flow).
            model.calibrate_int8(np.asarray(images))
            quant_vars = model.quant
            from depthvo_tpu.train.state import build_models

            depth_net, _, _ = build_models(cfg, depth_quant="int8")
            extra["int8"] = True
        else:
            depth_net = model._depth_net
        # Steady-state device throughput: K sequential forwards inside one
        # jitted scan (per-dispatch tunnel latency would otherwise dominate
        # and hide the real per-batch time).
        K_INNER = 10

        @jax.jit
        def scan_fwd(params, batch_stats, quant, images):
            def body(c, _):
                variables = {
                    "params": params["depth"], "batch_stats": batch_stats,
                }
                if quant is not None:
                    variables["quant"] = quant
                d = depth_net.apply(variables, images + c * 0.0, train=False)[-1]
                return c + jnp.mean(d), None
            c, _ = jax.lax.scan(body, jnp.float32(0), None, length=K_INNER)
            return c

        stats_scale = K_INNER
        fn = lambda: scan_fwd(
            model.params, model.batch_stats, quant_vars, images
        )
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
            step_fn = train_loop.make_scan_train_step(cfg, mesh)
            stats_scale = K_SCAN
            extra = {"steps_per_call": K_SCAN}
        else:
            batch = pmesh.shard_batch(batch_np, mesh)
            step_fn = train_loop.make_train_step(cfg, mesh)
        # FLOPs of the whole step program from XLA cost analysis — the
        # basis of the training-MFU number (SURVEY.md §6: the perf bar
        # is per-chip throughput; MFU is its honest form). Computed
        # BEFORE timing: donation invalidates the state buffers after
        # the first call. The AOT executable is then USED for the timed
        # calls — the jit dispatch cache does not share it, so calling
        # step_fn afterwards would trace+compile the program a second
        # time.
        call_fn = step_fn
        try:
            compiled = step_fn.lower(state, batch).compile()
            cost = compiled.cost_analysis()
            if isinstance(cost, (list, tuple)):
                cost = cost[0]
            flops = float(cost.get("flops", 0.0))
            if flops > 0:
                # XLA cost analysis counts a while-loop body ONCE, not
                # x trip count (verified: the K=8 scan program reports
                # ~1x the straight-line step's flops, not ~8x), so the
                # scanned program's total already IS per-step flops.
                extra["flops_per_step"] = flops
            call_fn = compiled
        except Exception:  # cost analysis is best-effort per backend
            pass

        # donate_argnums=0 invalidates state each call: rebind.
        holder = {"state": state}

        def fn():
            holder["state"], metrics = call_fn(holder["state"], batch)
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
        for k in ("mean_s", "median_s", "min_s", "p95_s"):
            stats[k] = stats[k] / stats_scale
    if "flops_per_step" in extra and jax.default_backend() == "tpu":
        peak = _bf16_peak_tflops(jax.devices()[0].device_kind)
        if peak is not None:
            extra["mfu"] = round(
                extra["flops_per_step"] / stats["median_s"] / (peak * 1e12), 4
            )
            # Record the denominator so the number can never be read
            # against the wrong generation's peak.
            extra["bf16_peak_tflops_assumed"] = peak
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
