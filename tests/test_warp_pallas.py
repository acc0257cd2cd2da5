"""Golden tests for the stereo (epipolar-horizontal) warp op.

On the CPU test mesh the dispatcher uses the jnp fallback; these tests
pin the op's semantics against the general ``inverse_warp`` with the
pure-x-translation transform — the contract the Pallas kernel is held to
on TPU (validated there by the same comparisons; see ops/warp_pallas.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from depthvo_tpu.geometry import camera, warp as ref_warp
from depthvo_tpu.ops import stereo_warp

B, H, W, C = 2, 32, 96, 3
FX = 0.58 * W
BASE = 0.54
K = camera.intrinsics_matrix(fx=FX, fy=1.92 * H, cx=W / 2, cy=H / 2)
T_LR = jnp.broadcast_to(jnp.eye(4).at[0, 3].set(-BASE), (B, 4, 4))


def _scene(rng):
    small = rng.normal(size=(B, H // 4, W // 4, C))
    src = jax.image.resize(jnp.asarray(small, jnp.float32), (B, H, W, C), "linear")
    depth = jnp.asarray(rng.uniform(4.0, 40.0, (B, H, W)), jnp.float32)
    return src, depth


class TestStereoWarpEquivalence:
    def test_matches_general_inverse_warp(self, rng):
        src, depth = _scene(rng)
        w_gen, v_gen = ref_warp.inverse_warp(src, depth, T_LR, K)
        w_st, v_st = stereo_warp(src, depth, FX * BASE)
        v_gen = np.asarray(v_gen)
        v_st = np.asarray(v_st)
        # The general path computes v through the full projection, so f32
        # jitter (v = y +/- 1e-5) randomly invalidates boundary rows; the
        # specialized op's v == y is exact. Compare on interior rows.
        interior = slice(1, H - 2)
        assert (v_gen[:, interior] == v_st[:, interior]).mean() > 0.999
        both = v_gen & v_st
        err = np.abs(np.asarray(w_gen) - np.asarray(w_st))[both]
        assert err.max() < 1e-3

    def test_zero_disparity_is_identity(self, rng):
        src, depth = _scene(rng)
        w, v = stereo_warp(src, depth, 0.0)
        m = np.asarray(v)
        np.testing.assert_allclose(
            np.asarray(w)[m], np.asarray(src)[m], atol=1e-5
        )

    def test_constant_depth_constant_shift(self, rng):
        src, _ = _scene(rng)
        d = 5.0
        shift = FX * BASE / d  # pixels
        depth = jnp.full((B, H, W), d)
        w, v = stereo_warp(src, depth, FX * BASE)
        grid = camera.pixel_grid(H, W)[None, ..., :2] - jnp.array([shift, 0.0])
        expected, _ = ref_warp.bilinear_sample(src, jnp.broadcast_to(grid, (B, H, W, 2)))
        m = np.asarray(v)
        np.testing.assert_allclose(
            np.asarray(w)[m], np.asarray(expected)[m], atol=1e-4
        )

    def test_invalid_at_left_edge(self, rng):
        src, _ = _scene(rng)
        depth = jnp.full((B, H, W), 2.0)  # disparity ~15 px
        _, v = stereo_warp(src, depth, FX * BASE)
        v = np.asarray(v)
        assert not v[:, :, :10].any()  # left strip samples off-image
        assert v[:, : H - 1, 40:-2].mean() > 0.99

    def test_gradients_flow_and_match_general_path(self, rng):
        src, depth = _scene(rng)

        # Fix one mask for both losses so the comparison isolates the
        # sampling gradients (the general path's masks jitter on boundary
        # rows — see test_matches_general_inverse_warp).
        _, v_fixed = stereo_warp(src, depth, FX * BASE)
        v_fixed = v_fixed & (
            jax.lax.broadcasted_iota(jnp.int32, v_fixed.shape, 1) >= 1
        )

        def loss_stereo(depth):
            w, _ = stereo_warp(src, depth, FX * BASE)
            return jnp.sum(jnp.where(v_fixed[..., None], w, 0.0) ** 2)

        def loss_general(depth):
            w, _ = ref_warp.inverse_warp(src, depth, T_LR, K)
            return jnp.sum(jnp.where(v_fixed[..., None], w, 0.0) ** 2)

        g_st = jax.grad(loss_stereo)(depth)
        g_gen = jax.grad(loss_general)(depth)
        assert bool(jnp.all(jnp.isfinite(g_st)))
        err = np.abs(np.asarray(g_st) - np.asarray(g_gen))
        scale = np.abs(np.asarray(g_gen)).max()
        assert err.max() < 0.02 * scale + 1e-4

    def test_batched_fx_baseline(self, rng):
        src, depth = _scene(rng)
        fxb = jnp.asarray([FX * BASE, FX * BASE * 0.5])
        w, v = stereo_warp(src, depth, fxb)
        # Second image has half the disparity of the first: warp with the
        # scalar halves must match per-image.
        w0, _ = stereo_warp(src[:1], depth[:1], FX * BASE)
        w1, _ = stereo_warp(src[1:], depth[1:], FX * BASE * 0.5)
        np.testing.assert_allclose(np.asarray(w[:1]), np.asarray(w0), atol=1e-6)
        np.testing.assert_allclose(np.asarray(w[1:]), np.asarray(w1), atol=1e-6)


@pytest.mark.skipif(jax.default_backend() != "tpu", reason="kernel needs TPU")
class TestPallasKernelOnTPU:
    """The same contract, exercised through the actual Pallas kernel.

    Skipped on the CPU test mesh; run manually on the TPU host:
    ``JAX_PLATFORMS=axon python -m pytest tests/test_warp_pallas.py -k TPU``.
    """

    def test_kernel_matches_fallback(self, rng):
        from depthvo_tpu.ops import warp_pallas

        src, depth = _scene(rng)
        w_k, v_k = warp_pallas.stereo_warp(src, depth, FX * BASE)
        w_f, v_f = stereo_warp(src, depth, FX * BASE, use_pallas=False)
        both = np.asarray(v_k) & np.asarray(v_f)
        assert (np.asarray(v_k) == np.asarray(v_f)).mean() > 0.999
        assert np.abs(np.asarray(w_k) - np.asarray(w_f))[both].max() < 1e-4
