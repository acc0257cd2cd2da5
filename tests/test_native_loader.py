"""Tests for the native C++ data-loading runtime: PNG decode golden-tested
against PIL, resize/normalize parity with the Python path, and the
threaded prefetch loader's batching/shuffling/error behavior."""

import os

import numpy as np
import pytest
from PIL import Image

from depthvo_tpu.data import native_loader

pytestmark = pytest.mark.skipif(
    not native_loader.available(), reason="native toolchain unavailable"
)


@pytest.fixture(scope="module")
def png_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("pngs")
    rng = np.random.default_rng(0)
    paths = []
    for i in range(6):
        arr = rng.integers(0, 256, size=(37 + i, 53, 3), dtype=np.uint8)
        p = str(d / f"img_{i}.png")
        Image.fromarray(arr).save(p)
        paths.append((p, arr))
    return paths


class TestDecode:
    def test_rgb_decode_matches_pil(self, png_dir):
        for path, arr in png_dir:
            out = native_loader.decode_png(path)
            np.testing.assert_array_equal(out, arr)

    def test_gray_and_rgba(self, tmp_path):
        rng = np.random.default_rng(1)
        gray = rng.integers(0, 256, size=(20, 30), dtype=np.uint8)
        p = str(tmp_path / "gray.png")
        Image.fromarray(gray, mode="L").save(p)
        np.testing.assert_array_equal(native_loader.decode_png(p)[..., 0], gray)

        rgba = rng.integers(0, 256, size=(20, 30, 4), dtype=np.uint8)
        p = str(tmp_path / "rgba.png")
        Image.fromarray(rgba, mode="RGBA").save(p)
        np.testing.assert_array_equal(native_loader.decode_png(p), rgba)

    def test_missing_file_raises(self):
        with pytest.raises(ValueError):
            native_loader.decode_png("/nonexistent/nope.png")

    def test_corrupt_file_raises(self, tmp_path):
        p = str(tmp_path / "bad.png")
        with open(p, "wb") as f:
            f.write(b"\x89PNG\r\n\x1a\n" + b"garbage" * 10)
        with pytest.raises(ValueError):
            native_loader.decode_png(p)


class TestLoadResized:
    def test_range_and_shape(self, png_dir):
        path, _ = png_dir[0]
        out = native_loader.load_resized(path, 16, 48)
        assert out.shape == (16, 48, 3)
        assert out.min() >= -1.0 and out.max() <= 1.0

    def test_matches_python_loader_closely(self, png_dir):
        from depthvo_tpu.data.kitti import load_image

        path, _ = png_dir[0]
        a = native_loader.load_resized(path, 16, 48)
        b = load_image(path, 16, 48)
        # Both bilinear at pixel centers; PIL uses a slightly different
        # triangle filter near edges — allow small average deviation.
        assert np.abs(a - b).mean() < 0.05

    def test_identity_resize_exact(self, png_dir):
        path, arr = png_dir[0]
        out = native_loader.load_resized(path, arr.shape[0], arr.shape[1])
        expected = arr.astype(np.float32) / 127.5 - 1.0
        np.testing.assert_allclose(out, expected, atol=1e-5)


class TestBatchLoader:
    def test_batches_and_indices(self, png_dir):
        paths = [p for p, _ in png_dir]
        loader = native_loader.NativeBatchLoader(
            paths, batch_size=4, height=16, width=48, num_threads=2, shuffle=False
        )
        seen = []
        for _ in range(3):
            batch, idx = loader.next()
            assert batch.shape == (4, 16, 48, 3)
            assert np.isfinite(batch).all()
            seen.extend(idx.tolist())
        loader.close()
        # Unshuffled: indices cycle 0..5,0..5,...
        assert seen == [i % 6 for i in range(12)]

    def test_batch_content_matches_single_loads(self, png_dir):
        paths = [p for p, _ in png_dir]
        loader = native_loader.NativeBatchLoader(
            paths, batch_size=3, height=16, width=48, num_threads=3, shuffle=False
        )
        batch, idx = loader.next()
        loader.close()
        for row, i in zip(batch, idx):
            single = native_loader.load_resized(paths[i], 16, 48)
            np.testing.assert_allclose(row, single, atol=1e-6)

    def test_shuffle_covers_dataset(self, png_dir):
        paths = [p for p, _ in png_dir]
        loader = native_loader.NativeBatchLoader(
            paths, batch_size=6, height=8, width=16, num_threads=2,
            shuffle=True, seed=7,
        )
        _, idx = loader.next()
        loader.close()
        assert sorted(idx.tolist()) == list(range(6))

    def test_decode_error_in_batch_raises(self, tmp_path, png_dir):
        bad = str(tmp_path / "bad.png")
        with open(bad, "wb") as f:
            f.write(b"not a png at all")
        loader = native_loader.NativeBatchLoader(
            [png_dir[0][0], bad], batch_size=2, height=8, width=16,
            num_threads=1, shuffle=False,
        )
        with pytest.raises(ValueError):
            loader.next()
        loader.close()
