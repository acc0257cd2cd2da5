"""Tests for the .caffemodel wire-format importer: round-trip against an
independent hand-rolled protobuf encoder, plus the Caffe->flax weight
conversions (OIHW->HWIO, BGR flip, BN+Scale folding)."""

import struct

import numpy as np
import pytest

from depthvo_tpu.io import caffemodel


# --- minimal protobuf encoder (test-side, independent of the parser) ---

def _varint(v: int) -> bytes:
    out = b""
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out += bytes([b | 0x80])
        else:
            return out + bytes([b])


def _tag(field: int, wt: int) -> bytes:
    return _varint((field << 3) | wt)


def _len_delim(field: int, payload: bytes) -> bytes:
    return _tag(field, 2) + _varint(len(payload)) + payload


def _packed_floats(field: int, vals) -> bytes:
    return _len_delim(field, b"".join(struct.pack("<f", float(v)) for v in vals))


def _packed_varints(field: int, vals) -> bytes:
    return _len_delim(field, b"".join(_varint(int(v)) for v in vals))


def encode_blob(arr: np.ndarray, legacy_dims: bool = False) -> bytes:
    out = b""
    if legacy_dims:
        dims = ([1] * (4 - arr.ndim)) + list(arr.shape)
        for field, d in zip((1, 2, 3, 4), dims):
            out += _tag(field, 0) + _varint(d)
    else:
        out += _len_delim(7, _packed_varints(1, arr.shape))
    out += _packed_floats(5, arr.reshape(-1))
    return out


def encode_layer(name: str, type_: str, blobs, legacy: bool = False) -> bytes:
    if legacy:
        payload = _len_delim(4, name.encode())
        payload += _tag(5, 0) + _varint(4)  # V1 enum CONVOLUTION=4
    else:
        payload = _len_delim(1, name.encode()) + _len_delim(2, type_.encode())
    blob_field = 6 if legacy else 7
    for b in blobs:
        payload += _len_delim(blob_field, encode_blob(b, legacy_dims=legacy))
    return payload


def encode_net(layers, legacy: bool = False) -> bytes:
    out = _len_delim(1, b"testnet")
    field = 2 if legacy else 100
    for name, type_, blobs in layers:
        out += _len_delim(field, encode_layer(name, type_, blobs, legacy))
    return out


class TestWireParser:
    def test_roundtrip_modern_format(self, rng):
        w = rng.normal(size=(8, 3, 3, 3)).astype(np.float32)
        b = rng.normal(size=(8,)).astype(np.float32)
        raw = encode_net([("conv1", "Convolution", [w, b])])
        layers = caffemodel.parse_caffemodel(raw)
        assert set(layers) == {"conv1"}
        assert layers["conv1"]["type"] == "Convolution"
        np.testing.assert_array_equal(layers["conv1"]["blobs"][0], w)
        np.testing.assert_array_equal(layers["conv1"]["blobs"][1], b)

    def test_roundtrip_legacy_format(self, rng):
        w = rng.normal(size=(4, 2, 5, 5)).astype(np.float32)
        raw = encode_net([("old_conv", "", [w])], legacy=True)
        layers = caffemodel.parse_caffemodel(raw)
        assert layers["old_conv"]["blobs"][0].shape == (4, 2, 5, 5)
        np.testing.assert_array_equal(layers["old_conv"]["blobs"][0], w)
        assert layers["old_conv"]["type"] == 4  # V1 enum value

    def test_multiple_layers_and_file_path(self, rng, tmp_path):
        layers_in = [
            ("conv1", "Convolution", [rng.normal(size=(4, 3, 3, 3)).astype(np.float32)]),
            ("bn1", "BatchNorm", [
                rng.normal(size=(4,)).astype(np.float32),
                np.abs(rng.normal(size=(4,))).astype(np.float32),
                np.array([1.0], np.float32),
            ]),
            ("fc", "InnerProduct", [rng.normal(size=(6, 20)).astype(np.float32)]),
        ]
        raw = encode_net(layers_in)
        p = tmp_path / "model.caffemodel"
        p.write_bytes(raw)
        layers = caffemodel.parse_caffemodel(str(p))
        assert list(layers) == ["conv1", "bn1", "fc"]
        assert layers["fc"]["blobs"][0].shape == (6, 20)

    def test_unknown_fields_skipped(self, rng):
        w = rng.normal(size=(2, 2, 1, 1)).astype(np.float32)
        # Insert an unknown varint field (200) and fixed64 field (201).
        raw = (
            _tag(200, 0) + _varint(12345)
            + _tag(201, 1) + struct.pack("<Q", 42)
            + encode_net([("c", "Convolution", [w])])
        )
        layers = caffemodel.parse_caffemodel(raw)
        np.testing.assert_array_equal(layers["c"]["blobs"][0], w)

    def test_summarize(self, rng):
        raw = encode_net([("conv1", "Convolution", [rng.normal(size=(2, 3, 1, 1)).astype(np.float32)])])
        s = caffemodel.summarize(caffemodel.parse_caffemodel(raw))
        assert "conv1" in s and "(2, 3, 1, 1)" in s


class TestConversions:
    def test_oihw_to_hwio(self, rng):
        w = rng.normal(size=(8, 3, 5, 7)).astype(np.float32)
        h = caffemodel.oihw_to_hwio(w)
        assert h.shape == (5, 7, 3, 8)
        assert h[1, 2, 0, 4] == w[4, 0, 1, 2]

    def test_bgr_flip(self, rng):
        w = rng.normal(size=(3, 3, 3, 8)).astype(np.float32)
        f = caffemodel.bgr_flip_input_channels(w)
        np.testing.assert_array_equal(f[:, :, 0, :], w[:, :, 2, :])
        np.testing.assert_array_equal(f[:, :, 1, :], w[:, :, 1, :])

    def test_conv_params_equivalence(self, rng):
        """Imported conv must compute the same map as Caffe's would:
        correlate OIHW/BGR kernel with BGR image == flax HWIO/RGB conv on
        RGB image (after flip)."""
        import jax.numpy as jnp
        from jax import lax

        o, i, k = 4, 3, 3
        w_oihw = rng.normal(size=(o, i, k, k)).astype(np.float32)
        img_rgb = rng.normal(size=(1, 8, 8, 3)).astype(np.float32)
        img_bgr = img_rgb[..., ::-1]

        # "Caffe" result: NCHW correlation with OIHW kernel on BGR input.
        caffe_out = lax.conv_general_dilated(
            jnp.asarray(np.transpose(img_bgr, (0, 3, 1, 2))),
            jnp.asarray(w_oihw),
            (1, 1), "SAME",
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
        )
        # Ours: NHWC conv with converted kernel on RGB input.
        params = caffemodel.conv_params(
            {"blobs": [w_oihw], "type": "Convolution"}, flip_bgr=True
        )
        ours = lax.conv_general_dilated(
            jnp.asarray(img_rgb), jnp.asarray(params["kernel"]),
            (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        np.testing.assert_allclose(
            np.transpose(np.asarray(caffe_out), (0, 2, 3, 1)), np.asarray(ours),
            atol=1e-5,
        )

    def test_fold_bn_scale_matches_reference_math(self, rng):
        c = 6
        mean = rng.normal(size=(c,)).astype(np.float32)
        var = np.abs(rng.normal(size=(c,))).astype(np.float32) + 0.1
        factor = np.array([999.0], np.float32)
        gamma = rng.normal(size=(c,)).astype(np.float32)
        beta = rng.normal(size=(c,)).astype(np.float32)
        folded = caffemodel.fold_bn_scale(
            [mean * 999.0, var * 999.0, factor], [gamma, beta]
        )
        np.testing.assert_allclose(folded["batch_stats"]["mean"], mean, rtol=1e-5)
        np.testing.assert_allclose(folded["batch_stats"]["var"], var, rtol=1e-5)
        # Full normalization path equals Caffe BN+Scale on a sample.
        x = rng.normal(size=(2, 4, 4, c)).astype(np.float32)
        eps = 1e-5
        caffe_y = (x - mean) / np.sqrt(var + eps) * gamma + beta
        ours_y = (
            (x - folded["batch_stats"]["mean"])
            / np.sqrt(folded["batch_stats"]["var"] + eps)
            * folded["params"]["scale"]
            + folded["params"]["bias"]
        )
        np.testing.assert_allclose(ours_y, caffe_y, atol=1e-5)

    def test_inner_product_transpose(self, rng):
        w = rng.normal(size=(6, 20)).astype(np.float32)
        params = caffemodel.conv_params({"blobs": [w], "type": "InnerProduct"})
        assert params["kernel"].shape == (20, 6)
        x = rng.normal(size=(20,)).astype(np.float32)
        np.testing.assert_allclose(x @ params["kernel"], w @ x, rtol=1e-5)


class TestParserHardening:
    """Review findings 2026-08-18: double_data field number, truncation,
    legacy InnerProduct 4-D blobs."""

    def test_double_data_is_field_8_not_9(self):
        # double_data=8; field 9 is double_DIFF (gradients) and must be
        # ignored, not concatenated into the weights.
        w = np.arange(6, dtype=np.float64).reshape(2, 3)
        blob = _len_delim(7, _packed_varints(1, w.shape))
        blob += _len_delim(8, w.reshape(-1).tobytes())  # double_data
        blob += _len_delim(9, (w + 100).reshape(-1).tobytes())  # double_diff
        payload = _len_delim(1, b"fc") + _len_delim(2, b"InnerProduct")
        payload += _len_delim(7, blob)
        raw = _len_delim(100, payload)
        layers = caffemodel.parse_caffemodel(raw)
        got = layers["fc"]["blobs"][0]
        np.testing.assert_allclose(got, w.astype(np.float32))

    def test_truncated_file_raises(self):
        w = np.ones((4, 3), np.float32)
        raw = _len_delim(
            100,
            _len_delim(1, b"fc") + _len_delim(2, b"InnerProduct")
            + _len_delim(7, encode_blob(w)),
        )
        with pytest.raises(ValueError, match="truncated"):
            caffemodel.parse_caffemodel(raw[:-5])

    def test_legacy_ip_4d_blob_is_dense_not_conv(self):
        # V1 InnerProduct blobs carry legacy dims (1, 1, out, in).
        w = np.random.default_rng(0).normal(size=(5, 7)).astype(np.float32)
        w4 = w.reshape(1, 1, 5, 7)
        params = caffemodel.conv_params(
            {"blobs": [w4], "type": "InnerProduct"}
        )
        assert params["kernel"].shape == (7, 5)  # (in, out) dense
        x = np.ones((7,), np.float32)
        np.testing.assert_allclose(
            x @ params["kernel"], w @ x, rtol=1e-5
        )

    def test_real_1x1_conv_still_a_conv(self):
        w = np.random.default_rng(0).normal(size=(5, 7, 1, 1)).astype(
            np.float32
        )  # OIHW 1x1 conv: trailing ones
        params = caffemodel.conv_params({"blobs": [w], "type": "Convolution"})
        assert params["kernel"].shape == (1, 1, 7, 5)  # HWIO
