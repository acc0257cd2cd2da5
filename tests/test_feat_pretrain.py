"""Smoke test for contrastive feature pretraining: loss finite and
decreasing on synthetic frames (the in-framework replacement for the
reference's externally-trained NYUv2 feature extractor)."""

import numpy as np

from depthvo_tpu import configs
from depthvo_tpu.data.synthetic import SyntheticScenes
from depthvo_tpu.train.feat_pretrain import pretrain_features


def test_pretrain_loss_decreases():
    cfg = configs.tiny_test()
    scenes = SyntheticScenes(cfg, seed=0, num_scenes=2)
    it = scenes.iterator(cfg.batch_size, fixed=True)
    losses = []
    pretrain_features(
        cfg, it, num_steps=10, learning_rate=3e-4,
        log_fn=lambda i, l: losses.append(l),
    )
    assert np.isfinite(losses).all()
    assert np.mean(losses[-3:]) < np.mean(losses[:3])
