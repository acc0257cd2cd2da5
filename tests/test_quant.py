"""w8a8 int8 serving path (models/layers.py::QuantConv, api.calibrate_int8).

The int8 convolution itself is exact integer math (verified against a
hand-rolled reference); end-to-end accuracy is a quantization-error
question checked as closeness to the f32 forward on a small DepthNet.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from depthvo_tpu.models.layers import ConvBlock, QuantConv


@pytest.fixture
def rng():
    return np.random.default_rng(3)


class TestQuantConv:
    def test_int8_matches_manual_reference(self, rng):
        x = jnp.asarray(rng.normal(size=(1, 8, 12, 4)).astype(np.float32))
        mod = QuantConv(6, kernel=3, use_bias=True, calibrate=False)
        variables = mod.init(jax.random.PRNGKey(0), x)
        # Calibrate by hand: a_max = max|x|.
        a_max = jnp.max(jnp.abs(x))
        variables = {
            "params": variables["params"],
            "quant": {"a_max": a_max},
        }
        got = mod.apply(variables, x)

        # Manual reference: quantize, integer conv, dequantize.
        k = np.asarray(variables["params"]["kernel"])
        b = np.asarray(variables["params"]["bias"])
        a_scale = float(a_max) / 127.0
        x_q = np.clip(np.round(np.asarray(x) / a_scale), -127, 127)
        w_scale = np.maximum(np.abs(k).max(axis=(0, 1, 2)), 1e-12) / 127.0
        w_q = np.clip(np.round(k / w_scale), -127, 127)
        from jax import lax

        y_int = lax.conv_general_dilated(
            jnp.asarray(x_q, jnp.int8), jnp.asarray(w_q, jnp.int8),
            (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32,
        )
        want = np.asarray(y_int, np.float32) * (a_scale * w_scale) + b
        np.testing.assert_allclose(np.asarray(got), want, rtol=0, atol=1e-5)

    def test_calibrate_records_running_max(self, rng):
        x1 = jnp.asarray(rng.normal(size=(1, 8, 12, 4)).astype(np.float32))
        x2 = 3.0 * x1
        mod = QuantConv(6, kernel=3, calibrate=True)
        variables = mod.init(jax.random.PRNGKey(0), x1)
        _, m1 = mod.apply(variables, x1, mutable=["quant"])
        assert float(m1["quant"]["a_max"]) == pytest.approx(
            float(jnp.max(jnp.abs(x1))), rel=1e-6
        )
        # Second batch with larger range raises the max; smaller keeps it.
        _, m2 = mod.apply(
            {"params": variables["params"], "quant": m1["quant"]},
            x2, mutable=["quant"],
        )
        assert float(m2["quant"]["a_max"]) == pytest.approx(
            float(jnp.max(jnp.abs(x2))), rel=1e-6
        )
        _, m3 = mod.apply(
            {"params": variables["params"], "quant": m2["quant"]},
            x1, mutable=["quant"],
        )
        assert float(m3["quant"]["a_max"]) == float(m2["quant"]["a_max"])

    def test_quant_close_to_f32_conv(self, rng):
        x = jnp.asarray(rng.normal(size=(2, 16, 24, 8)).astype(np.float32))
        f32 = ConvBlock(16, 3, 1, use_bn=False, quant_mode="off")
        q = ConvBlock(16, 3, 1, use_bn=False, quant_mode="int8")
        variables = f32.init(jax.random.PRNGKey(1), x)
        y_f = f32.apply(variables, x)
        qv = {
            "params": variables["params"],
            "quant": {"Conv_0": {"a_max": jnp.max(jnp.abs(x))}},
        }
        y_q = q.apply(qv, x)
        err = float(jnp.max(jnp.abs(y_q - y_f)))
        ref = float(jnp.max(jnp.abs(y_f)))
        assert err < 0.05 * ref  # int8 quantization noise, not a bug

    def test_param_tree_identical_across_modes(self, rng):
        x = jnp.asarray(rng.normal(size=(1, 8, 12, 4)).astype(np.float32))
        off = ConvBlock(6, 3, 2, use_bn=True, quant_mode="off")
        q = ConvBlock(6, 3, 2, use_bn=True, quant_mode="int8")
        p_off = off.init(jax.random.PRNGKey(0), x)["params"]
        p_q = q.init(jax.random.PRNGKey(0), x)["params"]
        flat_off = jax.tree_util.tree_flatten_with_path(p_off)[0]
        flat_q = jax.tree_util.tree_flatten_with_path(p_q)[0]
        assert [(p, v.shape) for p, v in flat_off] == [
            (p, v.shape) for p, v in flat_q
        ]


class TestDepthNetInt8:
    def _cfg(self):
        from depthvo_tpu.configs import tiny_test

        return tiny_test()

    def test_calibrate_int8_end_to_end_close_to_f32(self, rng):
        """api.calibrate_int8: checkpointed weights, calibration batch,
        int8 forward close to the f32 forward — the serving flow."""
        from depthvo_tpu import api

        model = api.DepthVO.from_random(self._cfg(), seed=4)
        imgs = rng.integers(
            0, 255, size=(2, 32, 96, 3), dtype=np.uint8
        )
        d_f32 = model.depth(imgs)
        model.calibrate_int8(imgs)
        assert model.quant  # scales recorded
        leaves = jax.tree_util.tree_leaves(model.quant)
        assert all(float(v) > 0 for v in leaves)
        d_int8 = model.depth(imgs)
        assert d_int8.shape == d_f32.shape
        assert np.isfinite(d_int8).all()
        # Quantization noise, not divergence: high rank correlation and
        # bounded median relative error on the depth map.
        rel = np.abs(d_int8 - d_f32) / np.maximum(d_f32, 1e-3)
        assert np.median(rel) < 0.08, float(np.median(rel))
        corr = np.corrcoef(d_int8.ravel(), d_f32.ravel())[0, 1]
        assert corr > 0.98, corr

    def test_f32_path_untouched_for_training_nets(self, rng):
        # quant_mode stays "off" through create_state / training.
        from depthvo_tpu.train.state import build_models

        depth, _, _ = build_models(self._cfg())
        assert depth.quant_mode == "off"


class TestGuards:
    def test_uncalibrated_int8_is_nan_not_garbage(self, rng):
        x = jnp.asarray(rng.normal(size=(1, 8, 12, 4)).astype(np.float32))
        mod = QuantConv(6, kernel=3, calibrate=False)
        variables = mod.init(jax.random.PRNGKey(0), x)  # a_max stays 0
        y = mod.apply(
            {"params": variables["params"], "quant": variables["quant"]}, x
        )
        assert np.isnan(np.asarray(y)).all()  # loud, not plausible garbage

    def test_uncalibrate_restores_f32(self, rng):
        from depthvo_tpu import api
        from depthvo_tpu.configs import tiny_test

        model = api.DepthVO.from_random(tiny_test(), seed=4)
        imgs = rng.integers(0, 255, size=(2, 32, 96, 3), dtype=np.uint8)
        d_f32 = model.depth(imgs)
        model.calibrate_int8(imgs)
        d_q = model.depth(imgs)
        assert not np.allclose(d_q, d_f32)  # int8 noise: paths differ
        model.uncalibrate()
        assert model.quant is None
        np.testing.assert_array_equal(model.depth(imgs), d_f32)


def test_int8_data_parallel_matches_single():
    """Quantized inference composes with the DP mesh: to_mesh replicates
    the quant scales and the sharded sweep matches single-device."""
    import jax

    from depthvo_tpu import api
    from depthvo_tpu.configs import tiny_test
    from depthvo_tpu.eval.runner import predict_depths
    from depthvo_tpu.parallel import mesh as pmesh

    assert len(jax.devices()) >= 8
    model = api.DepthVO.from_random(tiny_test(), seed=7)
    rng = np.random.default_rng(8)
    frames = rng.integers(0, 256, size=(8, 32, 96, 3), dtype=np.uint8)
    model.calibrate_int8(frames)
    single = predict_depths(model, frames, batch_size=8)
    mesh = pmesh.make_mesh(8)
    model.to_mesh(mesh)
    sharded = predict_depths(model, frames, batch_size=8, mesh=mesh)
    np.testing.assert_allclose(sharded, single, rtol=2e-4, atol=1e-5)
