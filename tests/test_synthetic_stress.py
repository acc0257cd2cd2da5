"""Photometric-ambiguity stressors in SyntheticScenes (VERDICT r3 item 2).

The reference's feature-reconstruction loss exists for conditions where
pure photometric matching fails: exposure/tone drift between temporal
frames and repeated texture along the epipolar direction. These tests
pin the stressor semantics the benchmarks/feat_ab.py --stress A/B
relies on (numpy-only; no jit)."""

import numpy as np

from depthvo_tpu.configs import base as configs
from depthvo_tpu.data.synthetic import SyntheticScenes

STRESS = dict(exposure_jitter=0.5, gamma_jitter=0.25, repeat_texture=True)


def _pair(seed=3):
    cfg = configs.tiny_test()
    clean = SyntheticScenes(cfg, seed=seed, num_scenes=2)
    stress = SyntheticScenes(cfg, seed=seed, num_scenes=2, **STRESS)
    return clean.fixed_batch(2), stress.fixed_batch(2)


def test_stress_preserves_batch_contract():
    b, s = _pair()
    assert set(b) == set(s)
    for k in b:
        assert b[k].shape == s[k].shape, k
        assert np.isfinite(s[k]).all(), k


def test_exposure_jitter_hits_temporal_view_only():
    """Stereo rigs share exposure; consecutive frames don't. The jitter
    must land on image_s (temporal source) and leave image_t/image_r
    photometrically consistent with each other."""
    cfg = configs.tiny_test()
    # Exposure only (no repeat texture) so the scene geometry/texture of
    # clean and stressed instances is identical draw-for-draw.
    clean = SyntheticScenes(cfg, seed=11, num_scenes=2)
    stress = SyntheticScenes(cfg, seed=11, num_scenes=2,
                             exposure_jitter=0.5, gamma_jitter=0.25)
    b, s = clean.fixed_batch(2), stress.fixed_batch(2)
    np.testing.assert_array_equal(b["image_t"], s["image_t"])
    np.testing.assert_array_equal(b["image_r"], s["image_r"])
    # The temporal view is measurably brightness-shifted per scene.
    diff = np.abs(s["image_s"] - b["image_s"]).mean(axis=(1, 2, 3))
    assert (diff > 0.01).all(), diff


def test_repeat_texture_is_periodic_along_epipolar_axis():
    b, s = _pair()
    w = s["image_t"].shape[2]
    period = max(w // 4, 8)
    t = s["image_t"][0, :, :, 0]
    ac = np.corrcoef(t[:, :-period].ravel(), t[:, period:].ravel())[0, 1]
    t0 = b["image_t"][0, :, :, 0]
    ac0 = np.corrcoef(t0[:, :-period].ravel(), t0[:, period:].ravel())[0, 1]
    # Stressed texture repeats exactly at the tile period; the clean
    # band-limited texture decorrelates over the same shift.
    assert ac > 0.95, ac
    assert ac0 < 0.5, ac0


def test_stress_defaults_off():
    """No stress kwargs -> bit-identical scenes to round-3 behavior
    (feat_ab clean arms and every existing overfit test stay valid)."""
    cfg = configs.tiny_test()
    a = SyntheticScenes(cfg, seed=5, num_scenes=2).fixed_batch(2)
    b = SyntheticScenes(cfg, seed=5, num_scenes=2,
                        exposure_jitter=0.0, gamma_jitter=0.0,
                        repeat_texture=False).fixed_batch(2)
    for k in a:
        np.testing.assert_array_equal(a[k], b[k])
