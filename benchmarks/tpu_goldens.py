"""TPU golden + timing for the aux-backward general warp."""
import time

import jax
import jax.numpy as jnp
import numpy as np

from depthvo_tpu import ops
from depthvo_tpu.geometry import se3

print("backend:", jax.default_backend(), jax.devices()[0])

B, H, W = 4, 160, 608
rng = np.random.default_rng(0)
K = jnp.asarray(
    np.stack([np.array([[350.0, 0, 304], [0, 350.0, 80], [0, 0, 1]], np.float32)] * B)
)


def make(C):
    src = jnp.asarray(rng.uniform(-1, 1, (B, H, W, C)), jnp.float32)
    depth = jnp.asarray(rng.uniform(4.0, 30.0, (B, H, W)), jnp.float32)
    twist = jnp.asarray(rng.normal(0, 0.01, (B, 6)), jnp.float32)
    return src, depth, twist


def loss_fn(use_pallas, src, depth, twist):
    T = se3.exp(twist)
    w, v = ops.frozen_warp(src, depth, T, K, use_pallas=use_pallas)
    m = v.astype(jnp.float32)[..., None]
    return jnp.sum(jnp.abs(w * m)) / jnp.sum(m)


for C in (3, 19):
    src, depth, twist = make(C)
    gp = jax.jit(jax.grad(lambda d, t: loss_fn(True, src, d, t), argnums=(0, 1)))
    gx = jax.jit(jax.grad(lambda d, t: loss_fn(False, src, d, t), argnums=(0, 1)))
    (dd_p, dt_p) = gp(depth, twist)
    (dd_x, dt_x) = gx(depth, twist)
    dd_p, dt_p, dd_x, dt_x = map(np.asarray, (dd_p, dt_p, dd_x, dt_x))
    # Compare only where both paths agree the pixel is in the kernel window
    # (the jnp path has no window bound).
    fp = jax.jit(lambda d, t: loss_fn(True, src, d, t))
    fx = jax.jit(lambda d, t: loss_fn(False, src, d, t))
    lp, lx = float(fp(depth, twist)), float(fx(depth, twist))
    scale = np.abs(dd_x).max()
    err = np.abs(dd_p - dd_x).max()
    terr = np.abs(dt_p - dt_x).max() / max(np.abs(dt_x).max(), 1e-9)
    print(
        f"C={C}: loss pallas {lp:.6f} vs jnp {lx:.6f} | "
        f"d_depth max abs err {err:.3e} (scale {scale:.3e}, rel {err/scale:.2e}) | "
        f"d_twist rel err {terr:.2e}"
    )

# Timing: fwd+bwd per call via scan.
def timed(use_pallas, C, reps=3, K_inner=20):
    src, depth, twist = make(C)

    @jax.jit
    def many(d, t):
        def body(c, _):
            (l, (gd, gt)) = jax.value_and_grad(
                lambda dd, tt: loss_fn(use_pallas, src, dd, tt), argnums=(0, 1)
            )(d + c * 0.0, t)
            return c + l + jnp.sum(gd) * 0.0 + jnp.sum(gt) * 0.0, None

        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=K_inner)
        return c

    np.asarray(many(depth, twist))  # compile+warm
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(many(depth, twist))
        best = min(best, (time.perf_counter() - t0) / K_inner)
    return best * 1e3


for C in (3, 19):
    tp = timed(True, C)
    tx = timed(False, C)
    print(f"C={C}: fwd+bwd pallas {tp:.3f} ms vs XLA {tx:.3f} ms ({tx/tp:.2f}x)")
print("GEN-AUX-OK")


# ---- Stereo warp: golden + timing (the second kernel family) -------------
# Same harness/protocol as the general warp above so README/PARITY/PERF can
# quote ONE number: fwd+bwd per call via a 20-step scan, best-of-3 minimum.
# Two gradient protocols:
#   * d_depth only — what the TRAINING GRAPH does (the stereo source is an
#     input image; no gradient flows to it). This is the number the docs
#     quote.
#   * d_(src,depth) — exercises the full custom VJP incl. the scatter-free
#     d_src backward; the XLA comparison pays a real scatter here, so the
#     ratio is much larger. Reported for completeness, not the headline.

def stereo_loss_fn(use_pallas, src, depth, fxb):
    w, v = ops.stereo_warp(src, depth, fxb, use_pallas=use_pallas, dmax=128)
    m = v.astype(jnp.float32)[..., None]
    return jnp.sum(jnp.abs(w * m)) / jnp.sum(m)


src_s = jnp.asarray(rng.uniform(-1, 1, (B, H, W, 3)), jnp.float32)
depth_s = jnp.asarray(rng.uniform(4.0, 30.0, (B, H, W)), jnp.float32)
fxb = jnp.float32(350.0 * 0.54)

gp = jax.jit(jax.grad(lambda s, d: stereo_loss_fn(True, s, d, fxb), argnums=(0, 1)))
gx = jax.jit(jax.grad(lambda s, d: stereo_loss_fn(False, s, d, fxb), argnums=(0, 1)))
(ds_p, dd_p) = map(np.asarray, gp(src_s, depth_s))
(ds_x, dd_x) = map(np.asarray, gx(src_s, depth_s))
lp = float(jax.jit(lambda s, d: stereo_loss_fn(True, s, d, fxb))(src_s, depth_s))
lx = float(jax.jit(lambda s, d: stereo_loss_fn(False, s, d, fxb))(src_s, depth_s))
print(
    f"stereo: loss pallas {lp:.6f} vs jnp {lx:.6f} | "
    f"d_src max abs err {np.abs(ds_p - ds_x).max():.3e} | "
    f"d_depth rel err "
    f"{np.abs(dd_p - dd_x).max() / max(np.abs(dd_x).max(), 1e-9):.2e}"
)


def timed_stereo(use_pallas, grad_src, reps=3, K_inner=20):
    @jax.jit
    def many(s, d):
        def body(c, _):
            if grad_src:
                l, (gs, gd) = jax.value_and_grad(
                    lambda ss, dd: stereo_loss_fn(use_pallas, ss, dd, fxb),
                    argnums=(0, 1),
                )(s + c * 0.0, d)
                return c + l + jnp.sum(gs) * 0.0 + jnp.sum(gd) * 0.0, None
            l, gd = jax.value_and_grad(
                lambda dd: stereo_loss_fn(use_pallas, s + c * 0.0, dd, fxb)
            )(d)
            return c + l + jnp.sum(gd) * 0.0, None

        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=K_inner)
        return c

    np.asarray(many(src_s, depth_s))
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(many(src_s, depth_s))
        best = min(best, (time.perf_counter() - t0) / K_inner)
    return best * 1e3


for label, grad_src in (("d_depth only (training protocol)", False),
                        ("d_(src,depth) (full VJP)", True)):
    tsp = timed_stereo(True, grad_src)
    tsx = timed_stereo(False, grad_src)
    print(
        f"stereo [{label}]: fwd+bwd pallas {tsp:.3f} ms vs XLA {tsx:.3f} ms "
        f"({tsx/tsp:.2f}x)"
    )
print("STEREO-OK")
