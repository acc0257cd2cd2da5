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
