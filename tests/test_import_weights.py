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
