"""End-to-end fidelity-gate machinery test: encode a synthetic network's
weights as a .caffemodel (test-side protobuf encoder), import it into a
flax model of the same architecture, and check forward outputs agree with
the Caffe-semantics computation (SURVEY.md §7 step 2, absent the real
released weights)."""

import numpy as np
import pytest
import flax.linen as nn
import jax
import jax.numpy as jnp

from depthvo_tpu.io import caffemodel, import_weights
from tests.test_caffemodel import encode_net


class SmallNet(nn.Module):
    """conv3x3(8) -> relu -> conv3x3(4) -> relu -> dense(5)."""

    @nn.compact
    def __call__(self, x):
        x = nn.relu(nn.Conv(8, (3, 3), padding="SAME")(x))
        x = nn.relu(nn.Conv(4, (3, 3), padding="SAME")(x))
        x = x.mean(axis=(1, 2))
        return nn.Dense(5)(x)


def _caffe_forward(x_rgb, w1, b1, w2, b2, wf, bf):
    """Numpy reference with Caffe semantics: BGR input, OIHW kernels."""
    from jax import lax

    x = jnp.asarray(np.transpose(x_rgb[..., ::-1], (0, 3, 1, 2)))

    def conv(x, w, b):
        y = lax.conv_general_dilated(
            x, jnp.asarray(w), (1, 1), "SAME",
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
        )
        return jax.nn.relu(y + jnp.asarray(b)[None, :, None, None])

    x = conv(x, w1, b1)
    x = conv(x, w2, b2)
    pooled = np.asarray(x).mean(axis=(2, 3))  # (B, C)
    return pooled @ wf.T + bf


class TestImportByShapeOrder:
    def test_full_forward_parity(self, rng):
        w1 = rng.normal(size=(8, 3, 3, 3)).astype(np.float32)
        b1 = rng.normal(size=(8,)).astype(np.float32)
        w2 = rng.normal(size=(4, 8, 3, 3)).astype(np.float32)
        b2 = rng.normal(size=(4,)).astype(np.float32)
        wf = rng.normal(size=(5, 4)).astype(np.float32)
        bf = rng.normal(size=(5,)).astype(np.float32)
        raw = encode_net([
            ("conv1", "Convolution", [w1, b1]),
            ("conv2", "Convolution", [w2, b2]),
            ("fc", "InnerProduct", [wf, bf]),
        ])
        layers = caffemodel.parse_caffemodel(raw)

        model = SmallNet()
        x = rng.normal(size=(2, 8, 8, 3)).astype(np.float32)
        params = model.init(jax.random.PRNGKey(0), jnp.asarray(x))["params"]
        new_params, report = import_weights.import_by_shape_order(
            layers, params, strict=True
        )
        assert len(report) == 3

        ours = np.asarray(model.apply({"params": new_params}, jnp.asarray(x)))
        ref = _caffe_forward(x, w1, b1, w2, b2, wf, bf)
        np.testing.assert_allclose(ours, np.asarray(ref), rtol=2e-4, atol=2e-4)

    def test_strict_raises_on_shape_mismatch(self, rng):
        raw = encode_net([
            ("conv1", "Convolution", [rng.normal(size=(7, 3, 3, 3)).astype(np.float32)]),
        ])
        layers = caffemodel.parse_caffemodel(raw)
        model = SmallNet()
        params = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3))
        )["params"]
        with pytest.raises(ValueError):
            import_weights.import_by_shape_order(layers, params, strict=True)

    def test_non_strict_leaves_unmatched_params(self, rng):
        layers = {}
        model = SmallNet()
        params = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3))
        )["params"]
        new_params, report = import_weights.import_by_shape_order(layers, params)
        assert report == {}
        for a, b in zip(jax.tree.leaves(new_params), jax.tree.leaves(params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TwinNet(nn.Module):
    """conv1(3->8) -> relu -> two IDENTICALLY-SHAPED 8->8 convs -> relu.

    The two 8x8x3x3 kernels are indistinguishable by shape — the case
    where shape-order import silently mis-seats weights when file order
    differs from traversal order (a real ResNet-50 is full of these)."""

    @nn.compact
    def __call__(self, x):
        x = nn.relu(nn.Conv(8, (3, 3), padding="SAME")(x))
        x = nn.relu(nn.Conv(8, (3, 3), padding="SAME")(x))
        x = nn.relu(nn.Conv(8, (3, 3), padding="SAME")(x))
        return x


def _twin_reference(x_rgb, w1, b1, w2a, b2a, w2b, b2b):
    """Caffe-semantics forward: BGR input, OIHW kernels, relu stack."""
    from jax import lax

    x = jnp.asarray(np.transpose(x_rgb[..., ::-1], (0, 3, 1, 2)))

    def conv(x, w, b):
        y = lax.conv_general_dilated(
            x, jnp.asarray(w), (1, 1), "SAME",
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
        )
        return jax.nn.relu(y + jnp.asarray(b)[None, :, None, None])

    y = np.asarray(conv(conv(conv(x, w1, b1), w2a, b2a), w2b, b2b))
    return np.transpose(y, (0, 2, 3, 1))  # NCHW -> NHWC to match flax


class TestImportByName:
    """VERDICT r2 item 1: the name_map path of the fidelity gate.

    Fixture uses realistic BVLC-style layer names and is deliberately
    PERMUTED from flax traversal order so shape-order matching
    mis-assigns while the name map places correctly."""

    def _make(self, rng):
        w1 = rng.normal(size=(8, 3, 3, 3)).astype(np.float32)
        b1 = rng.normal(size=(8,)).astype(np.float32)
        w2a = rng.normal(size=(8, 8, 3, 3)).astype(np.float32)
        b2a = rng.normal(size=(8,)).astype(np.float32)
        w2b = rng.normal(size=(8, 8, 3, 3)).astype(np.float32)
        b2b = rng.normal(size=(8,)).astype(np.float32)
        # File order permuted: branch2b BEFORE branch2a.
        raw = encode_net([
            ("conv1", "Convolution", [w1, b1]),
            ("res2a_branch2b", "Convolution", [w2b, b2b]),
            ("res2a_branch2a", "Convolution", [w2a, b2a]),
        ])
        layers = caffemodel.parse_caffemodel(raw)
        model = TwinNet()
        x = rng.normal(size=(2, 8, 8, 3)).astype(np.float32)
        params = model.init(jax.random.PRNGKey(0), jnp.asarray(x))["params"]
        ref = _twin_reference(x, w1, b1, w2a, b2a, w2b, b2b)
        return layers, model, params, x, ref

    def test_shape_order_misassigns_permuted_file(self, rng):
        layers, model, params, x, ref = self._make(rng)
        p_order, _ = import_weights.import_by_shape_order(
            layers, params, strict=True
        )
        got = np.asarray(model.apply({"params": p_order}, jnp.asarray(x)))
        # File order != traversal order -> the twins land swapped.
        assert not np.allclose(got, ref, rtol=2e-4, atol=2e-4)

    def test_name_map_places_correctly(self, rng):
        layers, model, params, x, ref = self._make(rng)
        name_map = {
            "conv1": "Conv_0",
            "res2a_branch2a": "Conv_1",
            "res2a_branch2b": "Conv_2",
        }
        p_name, report = import_weights.import_by_name(
            layers, params, name_map, strict=True
        )
        assert all(v["via"] == "name" for v in report.values())
        assert report["Conv_1.kernel"]["layer"] == "res2a_branch2a"
        got = np.asarray(model.apply({"params": p_name}, jnp.asarray(x)))
        np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)
        # The report is printable.
        text = import_weights.format_report(report)
        assert "res2a_branch2a" in text and "[name]" in text

    def test_partial_map_falls_back_to_shape_order(self, rng):
        layers, model, params, x, ref = self._make(rng)
        # Map only the ambiguous twins; conv1 (unique shape) via fallback.
        name_map = {
            "res2a_branch2a": "Conv_1",
            "res2a_branch2b": "Conv_2",
        }
        p_name, report = import_weights.import_by_name(
            layers, params, name_map, strict=True
        )
        assert report["Conv_0.kernel"]["via"] == "shape"
        assert report["Conv_0.kernel"]["layer"] == "conv1"
        got = np.asarray(model.apply({"params": p_name}, jnp.asarray(x)))
        np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)

    def test_strict_reports_all_problems(self, rng):
        layers, model, params, x, _ = self._make(rng)
        name_map = {
            "no_such_layer": "Conv_0",
            "res2a_branch2a": "Conv_9",  # no such path
            "res2a_branch2b": "Conv_0",  # 8x8 kernel vs 3->8 slot
        }
        with pytest.raises(ValueError) as e:
            import_weights.import_by_name(
                layers, params, name_map, strict=True
            )
        msg = str(e.value)
        assert "no_such_layer" in msg
        assert "Conv_9" in msg
        assert "shape" in msg
        assert "3 problem(s)" in msg

    def test_strict_raises_on_uncovered_params(self, rng):
        layers, model, params, x, _ = self._make(rng)
        with pytest.raises(ValueError, match="unmatched"):
            import_weights.import_by_name(
                layers,
                params,
                {"conv1": "Conv_0"},
                strict=True,
                fallback_shape_order=False,
            )


class BNNet(nn.Module):
    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(6, (3, 3), padding="SAME", use_bias=False)(x)
        x = nn.BatchNorm(use_running_average=not train)(x)
        return nn.relu(x)


class TestImportBN:
    def test_bn_scale_pair_import(self, rng):
        c = 6
        mean = rng.normal(size=(c,)).astype(np.float32)
        var = (np.abs(rng.normal(size=(c,))) + 0.1).astype(np.float32)
        gamma = rng.normal(size=(c,)).astype(np.float32)
        beta = rng.normal(size=(c,)).astype(np.float32)
        f = 123.0
        raw = encode_net([
            ("conv1", "Convolution", [rng.normal(size=(c, 3, 3, 3)).astype(np.float32)]),
            ("bn1", "BatchNorm", [mean * f, var * f, np.array([f], np.float32)]),
            ("scale1", "Scale", [gamma, beta]),
        ])
        layers = caffemodel.parse_caffemodel(raw)
        model = BNNet()
        variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)))
        new_p, new_s, report = import_weights.import_bn_by_order(
            layers, variables["params"], variables["batch_stats"]
        )
        assert len(report) == 1
        flat_p = jax.tree_util.tree_flatten_with_path(new_p)[0]
        got = {tuple(str(k) for k in path): np.asarray(v) for path, v in flat_p}
        found_scale = [v for p, v in got.items() if "scale" in str(p)]
        np.testing.assert_allclose(found_scale[0], gamma, rtol=1e-5)
        flat_s = jax.tree_util.tree_flatten_with_path(new_s)[0]
        stats = {path[-1].key: np.asarray(v) for path, v in flat_s}
        np.testing.assert_allclose(stats["mean"], mean, rtol=1e-4)
        np.testing.assert_allclose(stats["var"], var, rtol=1e-4)

    def test_bn_by_name(self, rng):
        c = 6
        mean = rng.normal(size=(c,)).astype(np.float32)
        var = (np.abs(rng.normal(size=(c,))) + 0.1).astype(np.float32)
        gamma = rng.normal(size=(c,)).astype(np.float32)
        beta = rng.normal(size=(c,)).astype(np.float32)
        f = 99.0
        raw = encode_net([
            ("conv1", "Convolution", [rng.normal(size=(c, 3, 3, 3)).astype(np.float32)]),
            ("bn_conv1", "BatchNorm", [mean * f, var * f, np.array([f], np.float32)]),
            ("scale_conv1", "Scale", [gamma, beta]),
        ])
        layers = caffemodel.parse_caffemodel(raw)
        model = BNNet()
        variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)))
        new_p, new_s, report = import_weights.import_bn_by_name(
            layers,
            variables["params"],
            variables["batch_stats"],
            {"bn_conv1": "BatchNorm_0"},
            strict=True,
        )
        assert report["BatchNorm_0"]["layer"] == "bn_conv1"
        flat_p = {
            ".".join(str(k.key) for k in path): np.asarray(v)
            for path, v in jax.tree_util.tree_flatten_with_path(new_p)[0]
        }
        np.testing.assert_allclose(flat_p["BatchNorm_0.scale"], gamma, rtol=1e-5)
        np.testing.assert_allclose(flat_p["BatchNorm_0.bias"], beta, rtol=1e-5)
        flat_s = {
            ".".join(str(k.key) for k in path): np.asarray(v)
            for path, v in jax.tree_util.tree_flatten_with_path(new_s)[0]
        }
        np.testing.assert_allclose(flat_s["BatchNorm_0.mean"], mean, rtol=1e-4)
        np.testing.assert_allclose(flat_s["BatchNorm_0.var"], var, rtol=1e-4)

    def test_bn_by_name_strict_missing_scale_pair(self, rng):
        c = 6  # matches BNNet's channel count so only the Scale pair is missing
        raw = encode_net([
            ("bn_lonely", "BatchNorm", [
                rng.normal(size=(c,)).astype(np.float32),
                np.abs(rng.normal(size=(c,))).astype(np.float32) + 0.1,
                np.array([1.0], np.float32),
            ]),
        ])
        layers = caffemodel.parse_caffemodel(raw)
        model = BNNet()
        variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)))
        with pytest.raises(ValueError, match="no Scale pair"):
            import_weights.import_bn_by_name(
                layers,
                variables["params"],
                variables["batch_stats"],
                {"bn_lonely": "BatchNorm_0"},
                strict=True,
            )


class ValidConvNet(nn.Module):
    """Single biased conv, VALID padding (no zero-pad taps -> the
    input-transform fold is exact everywhere)."""

    @nn.compact
    def __call__(self, x):
        return nn.Conv(5, (3, 3), padding="VALID")(x)


class TestFoldInputTransform:
    """Caffe data-layer preprocessing (BGR 0-255, mean_value, scale)
    folded into the imported first conv must reproduce Caffe activations
    from this framework's raw/127.5-1 RGB inputs (the fidelity seam a
    real released-weights run hits first)."""

    MEAN_BGR = np.array([104.0, 116.7, 122.7], np.float32)
    SCALE = 0.00390625  # a realistic transform_param.scale (1/256)

    def _raw_frames(self, rng, shape=(2, 8, 10, 3)):
        return rng.integers(0, 256, size=shape).astype(np.float32)

    def test_biased_conv_exact(self, rng):
        w = rng.normal(size=(5, 3, 3, 3)).astype(np.float32)
        b = rng.normal(size=(5,)).astype(np.float32)
        layers = caffemodel.parse_caffemodel(
            encode_net([("conv1", "Convolution", [w, b])])
        )
        model = ValidConvNet()
        raw255 = self._raw_frames(rng)  # RGB channel order
        x_ours = jnp.asarray(raw255 / 127.5 - 1.0)
        variables = model.init(jax.random.PRNGKey(0), x_ours)

        params, _ = import_weights.import_by_shape_order(
            layers, variables["params"], strict=True
        )
        params, _ = import_weights.fold_input_transform(
            params,
            conv_path="Conv_0",
            mean=self.MEAN_BGR,
            scale=self.SCALE,
        )
        got = model.apply({"params": params}, x_ours)

        # Caffe semantics: BGR input, mean subtracted, scaled, OIHW conv.
        x_caffe = (
            np.transpose(raw255[..., ::-1], (0, 3, 1, 2))
            - self.MEAN_BGR[None, :, None, None]
        ) * self.SCALE
        want = jax.lax.conv_general_dilated(
            jnp.asarray(x_caffe), jnp.asarray(w), (1, 1), "VALID",
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
        ) + jnp.asarray(b)[None, :, None, None]
        np.testing.assert_allclose(
            np.asarray(got), np.transpose(np.asarray(want), (0, 2, 3, 1)),
            rtol=2e-4, atol=2e-4,
        )

    def test_bn_absorbs_offset_interior_exact(self, rng):
        """Bias-less conv + BN (the ResNet input block shape): the offset
        lands in the running mean; SAME-padding interior pixels are exact
        and only the pad-width border ring may differ (documented)."""
        c = 6
        w = rng.normal(size=(c, 3, 3, 3)).astype(np.float32)
        bn_mean = rng.normal(size=(c,)).astype(np.float32)
        bn_var = (np.abs(rng.normal(size=(c,))) + 0.5).astype(np.float32)
        gamma = rng.normal(size=(c,)).astype(np.float32)
        beta = rng.normal(size=(c,)).astype(np.float32)
        layers = caffemodel.parse_caffemodel(encode_net([
            ("conv1", "Convolution", [w]),
            ("bn_conv1", "BatchNorm",
             [bn_mean, bn_var, np.ones((1,), np.float32)]),
            ("scale_conv1", "Scale", [gamma, beta]),
        ]))
        model = BNNet()
        raw255 = self._raw_frames(rng)
        x_ours = jnp.asarray(raw255 / 127.5 - 1.0)
        variables = model.init(jax.random.PRNGKey(0), x_ours)

        params, _ = import_weights.import_by_shape_order(
            layers, variables["params"], strict=True
        )
        params, stats, _ = import_weights.import_bn_by_order(
            layers, params, variables["batch_stats"]
        )
        params, stats = import_weights.fold_input_transform(
            params, stats,
            conv_path="Conv_0",
            mean=self.MEAN_BGR,
            scale=self.SCALE,
            bn_path="BatchNorm_0",
        )
        got = model.apply({"params": params, "batch_stats": stats}, x_ours)

        x_caffe = (
            np.transpose(raw255[..., ::-1], (0, 3, 1, 2))
            - self.MEAN_BGR[None, :, None, None]
        ) * self.SCALE
        y = jax.lax.conv_general_dilated(
            jnp.asarray(x_caffe), jnp.asarray(w), (1, 1), "SAME",
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
        )
        eps = 1e-5
        norm = (np.asarray(y) - bn_mean[None, :, None, None]) / np.sqrt(
            bn_var[None, :, None, None] + eps
        )
        want = np.maximum(
            norm * gamma[None, :, None, None] + beta[None, :, None, None],
            0.0,
        ).transpose(0, 2, 3, 1)
        # Interior (1-px pad of a 3x3 SAME conv): exact.
        np.testing.assert_allclose(
            np.asarray(got)[:, 1:-1, 1:-1], want[:, 1:-1, 1:-1],
            rtol=2e-4, atol=2e-4,
        )
        # The border ring genuinely differs (zero-pad represents
        # different raw values in the two pipelines) — guards against
        # the test accidentally passing for trivial reasons.
        assert np.abs(np.asarray(got)[:, 0] - want[:, 0]).max() > 1e-3

    def test_six_channel_mean_tiling_and_errors(self, rng):
        w = rng.normal(size=(4, 6, 3, 3)).astype(np.float32)
        b = rng.normal(size=(4,)).astype(np.float32)
        layers = caffemodel.parse_caffemodel(
            encode_net([("conv1", "Convolution", [w, b])])
        )

        class SixIn(nn.Module):
            @nn.compact
            def __call__(self, x):
                return nn.Conv(4, (3, 3), padding="VALID")(x)

        model = SixIn()
        raw255 = self._raw_frames(rng, shape=(1, 6, 8, 6))
        x_ours = jnp.asarray(raw255 / 127.5 - 1.0)
        variables = model.init(jax.random.PRNGKey(0), x_ours)
        params, _ = import_weights.import_by_shape_order(
            layers, variables["params"], strict=True
        )
        params, _ = import_weights.fold_input_transform(
            params, conv_path="Conv_0", mean=self.MEAN_BGR, scale=self.SCALE
        )
        got = model.apply({"params": params}, x_ours)
        # Caffe: each stacked frame is BGR with the same per-frame mean.
        mean6 = np.tile(self.MEAN_BGR, 2)
        x_bgr6 = raw255[..., [2, 1, 0, 5, 4, 3]]
        x_caffe = (
            np.transpose(x_bgr6, (0, 3, 1, 2)) - mean6[None, :, None, None]
        ) * self.SCALE
        want = jax.lax.conv_general_dilated(
            jnp.asarray(x_caffe), jnp.asarray(w), (1, 1), "VALID",
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
        ) + jnp.asarray(b)[None, :, None, None]
        np.testing.assert_allclose(
            np.asarray(got), np.transpose(np.asarray(want), (0, 2, 3, 1)),
            rtol=2e-4, atol=2e-4,
        )

        with pytest.raises(ValueError, match="no kernel"):
            import_weights.fold_input_transform(
                params, conv_path="Nope", mean=self.MEAN_BGR
            )
        with pytest.raises(ValueError, match="channels"):
            import_weights.fold_input_transform(
                params, conv_path="Conv_0", mean=np.zeros(4, np.float32)
            )


def test_cli_import_caffemodel_roundtrip(tmp_path):
    """export-caffemodel -> import-caffemodel -> checkpoint -> identical
    depth maps: the whole released-weights entry path as one CLI flow."""
    from depthvo_tpu import cli, configs
    from depthvo_tpu.api import DepthVO
    from depthvo_tpu.io.export_weights import export_caffemodel

    cfg = configs.tiny_test()
    model = DepthVO.from_random(cfg, seed=3)
    cm = tmp_path / "depth.caffemodel"
    export_caffemodel(
        model.params["depth"], batch_stats=model.batch_stats, path=str(cm)
    )
    ck = tmp_path / "ck"
    rc = cli.main([
        "import-caffemodel", "--variant", "tiny_test",
        "--caffemodel", str(cm), "--net", "depth",
        "--checkpoint-dir", str(ck),
    ])
    assert rc == 0
    # No config passed: from_checkpoint must pick up the tiny_test
    # config.json the import wrote (not silently assume full_feat).
    loaded = DepthVO.from_checkpoint(str(ck))
    rng = np.random.default_rng(11)
    x = rng.integers(0, 256, size=(2, 32, 96, 3), dtype=np.uint8)
    np.testing.assert_allclose(
        loaded.depth(x), model.depth(x), rtol=1e-5, atol=1e-6
    )


def test_input_conv_autodetect_on_real_depth_net():
    """_first_input_conv/_sibling_bn find the DepthNet stem (what
    import-caffemodel --input-mean relies on without --input-conv)."""
    import jax as _jax

    from depthvo_tpu import configs
    from depthvo_tpu.train.state import create_state

    cfg = configs.tiny_test()
    state = create_state(cfg, _jax.random.PRNGKey(0))
    conv = import_weights._first_input_conv(state.params["depth"])
    assert conv == "ConvBlock_0.Conv_0"
    bn = import_weights._sibling_bn(state.batch_stats, conv)
    assert bn == "ConvBlock_0.BatchNorm_0"


class TestBgrFlipRobustness:
    """Code-review r3: the BGR-flip heuristic must key on 'consumes raw
    frames' (3/6 input channels), not 'first 4-d conv in file order' —
    untrusted file order is the whole reason import_by_name exists."""

    def _make_interior_first(self, rng):
        w1 = rng.normal(size=(8, 3, 3, 3)).astype(np.float32)
        b1 = rng.normal(size=(8,)).astype(np.float32)
        w2a = rng.normal(size=(8, 8, 3, 3)).astype(np.float32)
        b2a = rng.normal(size=(8,)).astype(np.float32)
        w2b = rng.normal(size=(8, 8, 3, 3)).astype(np.float32)
        b2b = rng.normal(size=(8,)).astype(np.float32)
        # An INTERIOR conv serialized before the input conv.
        raw = encode_net([
            ("res2a_branch2b", "Convolution", [w2b, b2b]),
            ("conv1", "Convolution", [w1, b1]),
            ("res2a_branch2a", "Convolution", [w2a, b2a]),
        ])
        layers = caffemodel.parse_caffemodel(raw)
        model = TwinNet()
        x = rng.normal(size=(2, 8, 8, 3)).astype(np.float32)
        params = model.init(jax.random.PRNGKey(0), jnp.asarray(x))["params"]
        ref = _twin_reference(x, w1, b1, w2a, b2a, w2b, b2b)
        return layers, model, params, x, ref

    def test_interior_conv_first_in_file_not_scrambled(self, rng):
        layers, model, params, x, ref = self._make_interior_first(rng)
        name_map = {
            "conv1": "Conv_0",
            "res2a_branch2a": "Conv_1",
            "res2a_branch2b": "Conv_2",
        }
        p, _ = import_weights.import_by_name(
            layers, params, name_map, strict=True
        )
        got = np.asarray(model.apply({"params": p}, jnp.asarray(x)))
        np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)

    def test_bgr_layers_respected_in_fallback(self, rng):
        """A layer explicitly listed in bgr_layers must flip even when
        it is seated by the shape-order fallback, not the map."""
        layers, model, params, x, ref = self._make_interior_first(rng)
        name_map = {  # conv1 deliberately NOT mapped -> fallback seats it
            "res2a_branch2a": "Conv_1",
            "res2a_branch2b": "Conv_2",
        }
        p, report = import_weights.import_by_name(
            layers, params, name_map, bgr_layers=["conv1"], strict=True
        )
        assert report["Conv_0.kernel"]["via"] == "shape"
        got = np.asarray(model.apply({"params": p}, jnp.asarray(x)))
        np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)

    def test_empty_bgr_layers_flips_nothing(self, rng):
        layers, model, params, x, ref = self._make_interior_first(rng)
        name_map = {"res2a_branch2a": "Conv_1", "res2a_branch2b": "Conv_2"}
        p_none, _ = import_weights.import_by_name(
            layers, params, name_map, bgr_layers=[], strict=True
        )
        p_off, _ = import_weights.import_by_name(
            layers, params, name_map, flip_bgr_first_conv=False, strict=True
        )
        for a, b in zip(jax.tree.leaves(p_none), jax.tree.leaves(p_off)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_import_net_warns_on_bn_order_fallback_after_named_convs(
        self, rng
    ):
        c = 6
        layers = caffemodel.parse_caffemodel(encode_net([
            ("conv1", "Convolution", [rng.normal(size=(c, 3, 3, 3)).astype(np.float32)]),
            ("bn_conv1", "BatchNorm",
             [rng.normal(size=(c,)).astype(np.float32),
              (np.abs(rng.normal(size=(c,))) + 0.5).astype(np.float32),
              np.ones((1,), np.float32)]),
            ("scale_conv1", "Scale",
             [rng.normal(size=(c,)).astype(np.float32),
              rng.normal(size=(c,)).astype(np.float32)]),
        ]))
        model = BNNet()
        variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)))
        with pytest.warns(UserWarning, match="FILE-ORDER"):
            import_weights.import_net(
                layers,
                variables["params"],
                variables["batch_stats"],
                name_map={"conv1": "Conv_0"},
            )

    def test_bn_by_name_strict_on_missing_stats_tree(self, rng):
        c = 6
        layers = caffemodel.parse_caffemodel(encode_net([
            ("bn_conv1", "BatchNorm",
             [rng.normal(size=(c,)).astype(np.float32),
              (np.abs(rng.normal(size=(c,))) + 0.5).astype(np.float32),
              np.ones((1,), np.float32)]),
            ("scale_conv1", "Scale",
             [rng.normal(size=(c,)).astype(np.float32),
              rng.normal(size=(c,)).astype(np.float32)]),
        ]))
        model = BNNet()
        variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)))
        with pytest.raises(ValueError, match="batch_stats"):
            import_weights.import_bn_by_name(
                layers,
                variables["params"],
                {},  # wrong tree: params hit, stats missing
                {"bn_conv1": "BatchNorm_0"},
            )


def test_bf16_peak_table_prefix_resolution():
    from depthvo_tpu.utils.profiling import _bf16_peak_tflops

    assert _bf16_peak_tflops("TPU v5 lite") == 197.0
    assert _bf16_peak_tflops("TPU v5") == 459.0
    assert _bf16_peak_tflops("TPU v5p chip") == 459.0
    assert _bf16_peak_tflops("TPU v4") == 275.0
    assert _bf16_peak_tflops("TPU v6 lite") == 918.0
    assert _bf16_peak_tflops("TPU v7x") is None


class TestTrainWeightsFlag:
    """`train --weights x.caffemodel` (cli._state_with_caffe_weights):
    the caffe train --weights analog seats exporter-written blobs into a
    fresh TrainState exactly."""

    def test_seats_depth_net(self, tmp_path):
        from depthvo_tpu.cli import _state_with_caffe_weights
        from depthvo_tpu.configs import base as configs
        from depthvo_tpu.io.export_weights import export_caffemodel
        from depthvo_tpu.train.state import create_state

        cfg = configs.tiny_test()
        src = create_state(cfg, jax.random.PRNGKey(7))
        path = str(tmp_path / "depth.caffemodel")
        export_caffemodel(src.params["depth"], src.batch_stats, path)

        st = _state_with_caffe_weights(cfg, [f"depth={path}"])
        for (pa, a), (pb, b) in zip(
            sorted(jax.tree_util.tree_leaves_with_path(st.params["depth"]),
                   key=lambda kv: str(kv[0])),
            sorted(jax.tree_util.tree_leaves_with_path(src.params["depth"]),
                   key=lambda kv: str(kv[0])),
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-6, err_msg=str(pa)
            )
        # other nets stay at the fresh init (seed cfg.seed=0 != 7)
        fresh = create_state(cfg, jax.random.PRNGKey(cfg.seed))
        for a, b in zip(
            jax.tree_util.tree_leaves(st.params["odom"]),
            jax.tree_util.tree_leaves(fresh.params["odom"]),
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_seats_permuted_file_via_name_map_with_audit(
        self, tmp_path, capsys
    ):
        """VERDICT r3 item 5: `train --weights` must route through the
        audited name-map derivation, not silent shape-order. A file with
        the input-conv block moved to the END (a between-class
        permutation a re-serialized release could produce) must seat
        exactly, and the order-trusted audit must land in stdout."""
        from depthvo_tpu.cli import _state_with_caffe_weights
        from depthvo_tpu.configs import base as configs
        from depthvo_tpu.io.export_weights import export_caffemodel
        from depthvo_tpu.train.state import create_state

        cfg = configs.tiny_test()
        src = create_state(cfg, jax.random.PRNGKey(7))
        raw = export_caffemodel(src.params["depth"], src.batch_stats, None)
        parsed = caffemodel.parse_caffemodel(raw)
        entries = [(n, l["type"], l["blobs"]) for n, l in parsed.items()]
        # Locate the input conv (the only 3-in-channel kernel) and carry
        # its BN/Scale companions along so the block stays contiguous.
        start = next(
            i for i, (_, _, blobs) in enumerate(entries)
            if blobs and blobs[0].ndim == 4 and blobs[0].shape[1] == 3
        )
        end = start + 1
        while end < len(entries) and entries[end][2][0].ndim == 1:
            end += 1
        permuted = entries[:start] + entries[end:] + entries[start:end]
        assert permuted != entries
        path = str(tmp_path / "permuted.caffemodel")
        with open(path, "wb") as f:
            f.write(encode_net(permuted))

        st = _state_with_caffe_weights(cfg, [f"depth={path}"])
        out = capsys.readouterr().out
        assert "audited name map" in out
        assert "order-trusted" in out
        assert "falling back to shape-order" not in out
        for (pa, a), (pb, b) in zip(
            import_weights._flatten_with_path(src.params["depth"]),
            import_weights._flatten_with_path(st.params["depth"]),
        ):
            assert pa == pb
            np.testing.assert_allclose(a, b, rtol=0, atol=1e-6, err_msg=pa)
        for (pa, a), (pb, b) in zip(
            import_weights._flatten_with_path(src.batch_stats),
            import_weights._flatten_with_path(st.batch_stats),
        ):
            assert pa == pb
            np.testing.assert_allclose(a, b, rtol=0, atol=1e-6, err_msg=pa)

    def test_default_net_is_depth_and_bad_net_rejected(self, tmp_path):
        from depthvo_tpu.cli import _state_with_caffe_weights
        from depthvo_tpu.configs import base as configs
        from depthvo_tpu.io.export_weights import export_caffemodel
        from depthvo_tpu.train.state import create_state

        cfg = configs.tiny_test()
        src = create_state(cfg, jax.random.PRNGKey(7))
        path = str(tmp_path / "d.caffemodel")
        export_caffemodel(src.params["depth"], src.batch_stats, path)
        st = _state_with_caffe_weights(cfg, [path])  # bare path -> depth
        leaf = jax.tree_util.tree_leaves(st.params["depth"])[0]
        src_leaf = jax.tree_util.tree_leaves(src.params["depth"])[0]
        np.testing.assert_allclose(
            np.asarray(leaf), np.asarray(src_leaf), rtol=1e-6
        )
        with pytest.raises(SystemExit, match="not in variant"):
            _state_with_caffe_weights(cfg, [f"pose={path}"])
