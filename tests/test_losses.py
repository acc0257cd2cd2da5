"""Loss-term contracts (losses/photometric.py).

The warp kernels' validity contract says invalid pixels carry
backend-dependent garbage and their loss cotangent must be ZERO
(ops/warp_pallas.py); these tests pin that the loss terms — including
the optional SSIM mix — honor it.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from depthvo_tpu.losses.photometric import masked_l1, photometric_loss, ssim


@pytest.fixture
def case():
    rng = np.random.default_rng(0)
    warped = jnp.asarray(rng.uniform(-1, 1, (2, 8, 12, 3)), jnp.float32)
    target = jnp.asarray(rng.uniform(-1, 1, (2, 8, 12, 3)), jnp.float32)
    valid = jnp.asarray(rng.uniform(size=(2, 8, 12)) > 0.3)
    return warped, target, valid


@pytest.mark.parametrize("w", [0.0, 0.85])
def test_invalid_pixels_have_zero_cotangent(case, w):
    warped, target, valid = case
    g = jax.grad(lambda x: photometric_loss(x, target, valid, ssim_weight=w))(
        warped
    )
    inv = ~np.asarray(valid)
    assert np.all(np.asarray(g)[inv] == 0.0), (
        f"ssim_weight={w}: nonzero cotangent at invalid pixels violates "
        "the warp kernels' masking contract (backend-dependent gradients)"
    )


@pytest.mark.parametrize("w", [0.0, 0.85])
def test_invalid_pixel_values_cannot_change_the_loss(case, w):
    warped, target, valid = case
    base = float(photometric_loss(warped, target, valid, ssim_weight=w))
    # Inject backend-dependent-style garbage at invalid pixels.
    garbage = jnp.where(
        jnp.asarray(valid)[..., None], warped, jnp.float32(1e3)
    )
    poked = float(photometric_loss(garbage, target, valid, ssim_weight=w))
    assert base == pytest.approx(poked, rel=1e-6), (
        f"ssim_weight={w}: invalid-pixel values leaked into the loss"
    )


def test_ssim_identical_images_score_one(case):
    warped, _, _ = case
    s = np.asarray(ssim(warped, warped))
    np.testing.assert_allclose(s, 1.0, atol=1e-4)


def test_masked_l1_normalizes_by_valid_count(case):
    warped, target, valid = case
    full = masked_l1(warped, target, jnp.ones_like(valid))
    # Doubling the batch with an all-invalid copy must not change it.
    w2 = jnp.concatenate([warped, warped])
    t2 = jnp.concatenate([target, target])
    v2 = jnp.concatenate([jnp.ones_like(valid), jnp.zeros_like(valid)])
    np.testing.assert_allclose(
        float(masked_l1(w2, t2, v2)), float(full), rtol=1e-6
    )


class TestChwVariants:
    """The training loss graph keeps its photometric region in the warp
    kernels' (B, C, H, W) layout (train/loop.py::compute_losses); these
    pin that the CHW loss variants are numerically the SAME functions as
    the NHWC ones on transposed inputs."""

    @staticmethod
    def _chw(x):
        return jnp.transpose(x, (0, 3, 1, 2))

    def test_masked_l1_chw_matches_nhwc(self, case):
        from depthvo_tpu.losses.photometric import masked_l1_chw

        warped, target, valid = case
        a = float(masked_l1(warped, target, valid))
        b = float(masked_l1_chw(self._chw(warped), self._chw(target), valid))
        assert a == pytest.approx(b, rel=1e-6)

    def test_ssim_chw_matches_nhwc(self, case):
        from depthvo_tpu.losses.photometric import ssim_chw

        warped, target, _ = case
        a = np.asarray(ssim(warped, target))
        b = np.asarray(ssim_chw(self._chw(warped), self._chw(target)))
        np.testing.assert_allclose(a, np.transpose(b, (0, 2, 3, 1)), rtol=2e-5, atol=1e-6)

    @pytest.mark.parametrize("w", [0.0, 0.85])
    def test_photometric_chw_matches_nhwc(self, case, w):
        from depthvo_tpu.losses.photometric import photometric_loss_chw

        warped, target, valid = case
        a = float(photometric_loss(warped, target, valid, ssim_weight=w))
        b = float(
            photometric_loss_chw(
                self._chw(warped), self._chw(target), valid, ssim_weight=w
            )
        )
        assert a == pytest.approx(b, rel=1e-5)

    @pytest.mark.parametrize("w", [0.0, 0.85])
    def test_photometric_chw_invalid_pixels_zero_cotangent(self, case, w):
        from depthvo_tpu.losses.photometric import photometric_loss_chw

        warped, target, valid = case
        g = jax.grad(
            lambda x: photometric_loss_chw(
                x, self._chw(target), valid, ssim_weight=w
            )
        )(self._chw(warped))
        inv = ~np.asarray(valid)[:, None]
        inv = np.broadcast_to(inv, g.shape)
        assert np.all(np.asarray(g)[inv] == 0.0)

    def test_smoothness_chw_matches_nhwc(self):
        from depthvo_tpu.losses.smoothness import smoothness_loss

        rng = np.random.default_rng(1)
        disp = jnp.asarray(rng.uniform(0.01, 0.5, (2, 8, 12, 1)), jnp.float32)
        img = jnp.asarray(rng.uniform(0, 1, (2, 8, 12, 3)), jnp.float32)
        a = float(smoothness_loss(disp, img, edge_aware=True))
        b = float(
            smoothness_loss(
                disp, self._chw(img), edge_aware=True, image_layout="chw"
            )
        )
        assert a == pytest.approx(b, rel=1e-6)
