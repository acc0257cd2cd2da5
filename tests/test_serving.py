"""Serving export: jax.export StableHLO artifact round trip.

Reference parity: the deploy.prototxt + .caffemodel pair users load with
pycaffe (SURVEY.md §1) becomes ONE weights-embedded, ahead-of-time
lowered program file, loadable with jax alone (io/serving.py).
"""

import numpy as np
import pytest

from depthvo_tpu import api, configs
from depthvo_tpu.io import serving


@pytest.fixture(scope="module")
def tiny_model():
    return api.DepthVO.from_random(configs.tiny_test())


@pytest.fixture(scope="module")
def artifact(tiny_model, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("serving") / "tiny.depthvo.bin")
    sidecar = serving.export_depth(tiny_model, path)
    return path, sidecar


def test_sidecar_contract(artifact):
    _, sidecar = artifact
    assert sidecar["input"]["dtype"] == "uint8"
    assert sidecar["input"]["shape"] == ["b", 32, 96, 3]  # symbolic batch
    assert set(sidecar["platforms"]) == {"cpu", "tpu"}
    assert sidecar["output"] == "depth"


def test_roundtrip_matches_api_depth(artifact, tiny_model):
    path, _ = artifact
    served = serving.load(path)
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (2, 32, 96, 3), dtype=np.uint8)
    got = served(img)
    want = tiny_model.depth(img)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_symbolic_batch_serves_any_size(artifact):
    path, _ = artifact
    served = serving.load(path)
    rng = np.random.default_rng(1)
    for b in (1, 3, 5):
        out = served(rng.integers(0, 255, (b, 32, 96, 3), dtype=np.uint8))
        assert out.shape == (b, 32, 96)
        assert np.isfinite(out).all() and (out > 0).all()


def test_wrong_dtype_rejected(artifact):
    path, _ = artifact
    served = serving.load(path)
    with pytest.raises(TypeError, match="expects uint8"):
        served(np.zeros((1, 32, 96, 3), np.float32))


def test_concrete_batch_and_disparity_head(tiny_model, tmp_path):
    path = str(tmp_path / "b2.bin")
    sidecar = serving.export_depth(
        tiny_model, path, batch=2, output="disparity", input_dtype="float32"
    )
    assert sidecar["input"]["shape"][0] == 2
    served = serving.load(path)
    disp = served(np.zeros((2, 32, 96, 3), np.float32))
    want = tiny_model.inverse_depth(np.zeros((2, 32, 96, 3), np.float32))
    np.testing.assert_allclose(disp, want, rtol=1e-5)


def test_bad_args_rejected(tiny_model, tmp_path):
    with pytest.raises(ValueError, match="input_dtype"):
        serving.export_depth(tiny_model, str(tmp_path / "x"), input_dtype="int8")
    with pytest.raises(ValueError, match="output"):
        serving.export_depth(tiny_model, str(tmp_path / "x"), output="rgb")


def test_int8_export_roundtrip(tmp_path):
    """A calibrate_int8'd model exports its w8a8 program: the sidecar
    records int8=true and the served artifact reproduces the quantized
    (not the f32) forward."""
    import numpy as np

    from depthvo_tpu import api, configs

    model = api.DepthVO.from_random(configs.tiny_test(), seed=9)
    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 255, size=(2, 32, 96, 3), dtype=np.uint8)
    model.calibrate_int8(imgs)
    want = model.depth(imgs)

    path = str(tmp_path / "int8.depthvo.bin")
    sidecar = serving.export_depth(model, path, batch=2)
    assert sidecar["int8"] is True
    served = serving.load(path)
    got = served(imgs)
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)
