"""Round-trip: flax params -> .caffemodel bytes -> imported flax params.

The exporter (io/export_weights.py) is the inverse of the fidelity-gate
importer (io/import_weights.py); these tests pin the contract that an
exported file re-imports to EXACTLY the original weights — kernels
(incl. the BGR first-conv flip), biases, dense transposes, and
BatchNorm+Scale pairs folded back to scale/bias/mean/var.
"""

import numpy as np
import jax
import pytest

from depthvo_tpu import configs
from depthvo_tpu.io import caffemodel
from depthvo_tpu.io.export_weights import export_caffemodel, export_layers
from depthvo_tpu.io.import_weights import (
    import_bn_by_order,
    import_by_shape_order,
)
from depthvo_tpu.train.state import create_state


def _tiny_state(seed=0):
    cfg = configs.tiny_test()
    return create_state(cfg, jax.random.PRNGKey(seed)), cfg


class TestWireEncoder:
    def test_blob_roundtrip_via_parser(self):
        rng = np.random.default_rng(0)
        w = rng.normal(size=(4, 3, 3, 5)).astype(np.float32)
        b = rng.normal(size=(7,)).astype(np.float32)
        raw = caffemodel.write_caffemodel(
            [("convA", "Convolution", [w, b]), ("fc", "InnerProduct", [b])]
        )
        layers = caffemodel.parse_caffemodel(raw)
        assert list(layers) == ["convA", "fc"]
        assert layers["convA"]["type"] == "Convolution"
        np.testing.assert_array_equal(layers["convA"]["blobs"][0], w)
        np.testing.assert_array_equal(layers["convA"]["blobs"][1], b)
        np.testing.assert_array_equal(layers["fc"]["blobs"][0], b)

    def test_hwio_oihw_inverse(self):
        w = np.arange(2 * 3 * 4 * 5, dtype=np.float32).reshape(2, 3, 4, 5)
        np.testing.assert_array_equal(
            caffemodel.oihw_to_hwio(caffemodel.hwio_to_oihw(w)), w
        )


class TestExportImportRoundtrip:
    def test_depth_net_roundtrip_exact(self):
        """Export the depth net (+BN stats), re-import into a DIFFERENT
        random init, and recover the original weights exactly."""
        state, cfg = _tiny_state(seed=0)
        other, _ = _tiny_state(seed=1)

        raw = export_caffemodel(
            state.params["depth"], batch_stats=state.batch_stats
        )
        layers = caffemodel.parse_caffemodel(raw)

        params2, report = import_by_shape_order(
            layers, other.params["depth"], strict=True
        )
        params2, stats2, bn_report = import_bn_by_order(
            layers, params2, other.batch_stats
        )
        assert report and bn_report

        flat_a = jax.tree_util.tree_leaves_with_path(state.params["depth"])
        flat_b = dict(jax.tree_util.tree_leaves_with_path(params2))
        for path, leaf in flat_a:
            np.testing.assert_array_equal(
                np.asarray(leaf), np.asarray(flat_b[path]),
                err_msg=jax.tree_util.keystr(path),
            )
        flat_sa = jax.tree_util.tree_leaves_with_path(state.batch_stats)
        flat_sb = dict(jax.tree_util.tree_leaves_with_path(stats2))
        for path, leaf in flat_sa:
            np.testing.assert_allclose(
                np.asarray(leaf), np.asarray(flat_sb[path]),
                rtol=1e-6, atol=1e-7, err_msg=jax.tree_util.keystr(path),
            )

    def test_odom_net_roundtrip_exact(self):
        """Odometry net: convs + dense head, no BN stats."""
        state, _ = _tiny_state(seed=0)
        other, _ = _tiny_state(seed=1)
        raw = export_caffemodel(state.params["odom"])
        layers = caffemodel.parse_caffemodel(raw)
        params2, report = import_by_shape_order(
            layers, other.params["odom"], strict=True
        )
        flat_a = jax.tree_util.tree_leaves_with_path(state.params["odom"])
        flat_b = dict(jax.tree_util.tree_leaves_with_path(params2))
        for path, leaf in flat_a:
            np.testing.assert_array_equal(
                np.asarray(leaf), np.asarray(flat_b[path]),
                err_msg=jax.tree_util.keystr(path),
            )

    def test_exported_first_conv_is_bgr(self):
        """The exported file is a faithful Caffe-convention model: its
        first conv consumes BGR (flip applied on export, undone by the
        importer's flip_bgr)."""
        state, _ = _tiny_state()
        layers_list = export_layers(
            state.params["depth"], batch_stats=state.batch_stats
        )
        name, type_str, blobs = layers_list[0]
        assert type_str == "Convolution" and blobs[0].shape[1] == 3
        flat = jax.tree_util.tree_leaves_with_path(state.params["depth"])
        first_kernel = next(
            np.asarray(l) for p, l in flat
            if jax.tree_util.keystr(p).endswith("kernel']") and l.ndim == 4
        )
        # OIHW export of the HWIO kernel, input channels reversed.
        np.testing.assert_array_equal(
            blobs[0], np.transpose(first_kernel, (3, 2, 0, 1))[:, ::-1]
        )


def test_multiframe_first_conv_flip_preserves_frame_order():
    """The odometry net's 6-channel first conv flips BGR per frame, NOT
    across the whole axis (which would swap the two frames and break
    Caffe-ecosystem interop)."""
    import numpy as np

    from depthvo_tpu.io.caffemodel import bgr_flip_input_channels

    w = np.zeros((1, 1, 6, 1), np.float32)
    w[0, 0, :, 0] = [0, 1, 2, 10, 11, 12]  # frame1 RGB, frame2 RGB
    flipped = bgr_flip_input_channels(w)[0, 0, :, 0]
    # Each frame's triplet reversed in place; frame order intact.
    np.testing.assert_array_equal(flipped, [2, 1, 0, 12, 11, 10])

    # 3-channel first conv: unchanged semantics (full reverse).
    w3 = np.zeros((1, 1, 3, 1), np.float32)
    w3[0, 0, :, 0] = [0, 1, 2]
    np.testing.assert_array_equal(
        bgr_flip_input_channels(w3)[0, 0, :, 0], [2, 1, 0]
    )

    # Export -> import round trip still exact for the odom net.
    state, _ = _tiny_state(seed=2)
    other, _ = _tiny_state(seed=3)
    raw = export_caffemodel(state.params["odom"])
    layers = caffemodel.parse_caffemodel(raw)
    params2, _ = import_by_shape_order(layers, other.params["odom"], strict=True)
    flat_a = jax.tree_util.tree_leaves_with_path(state.params["odom"])
    flat_b = dict(jax.tree_util.tree_leaves_with_path(params2))
    for path, leaf in flat_a:
        np.testing.assert_array_equal(np.asarray(leaf), np.asarray(flat_b[path]))
