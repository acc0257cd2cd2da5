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


class TestPretrainCheckpointPlumbing:
    """pretrain-feat -> checkpoint -> train --init-feat-from: the staged
    combinator that replaces the reference's external NYUv2 feature
    weights (SURVEY.md §0 item 3)."""

    def test_restore_param_subtree_swaps_only_feat(self, tmp_path):
        import dataclasses

        import jax
        import numpy as np

        from depthvo_tpu import configs
        from depthvo_tpu.io import checkpoint as ckpt_io
        from depthvo_tpu.train.state import create_state

        cfg = configs.tiny_test(batch_size=2)
        donor = create_state(cfg, jax.random.PRNGKey(7))
        ckpt = str(tmp_path / "feat_ck")
        mgr = ckpt_io.make_manager(ckpt)
        ckpt_io.save(mgr, donor)
        mgr.wait_until_finished()

        target = create_state(cfg, jax.random.PRNGKey(1))
        before_depth = jax.tree.leaves(target.params["depth"])[0].copy()
        restored = ckpt_io.restore_param_subtree(ckpt, target, "feat")
        # feat now equals the donor's, depth untouched.
        for a, b in zip(
            jax.tree.leaves(restored.params["feat"]),
            jax.tree.leaves(donor.params["feat"]),
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        np.testing.assert_array_equal(
            np.asarray(jax.tree.leaves(restored.params["depth"])[0]),
            np.asarray(before_depth),
        )

    def test_fit_init_feat_from(self, tmp_path):
        import dataclasses

        import jax
        import numpy as np

        from depthvo_tpu import configs
        from depthvo_tpu.data.synthetic import SyntheticScenes
        from depthvo_tpu.io import checkpoint as ckpt_io
        from depthvo_tpu.train import loop as train_loop
        from depthvo_tpu.train.state import create_state

        cfg = configs.tiny_test(batch_size=2)
        donor = create_state(cfg, jax.random.PRNGKey(9))
        ckpt = str(tmp_path / "feat_ck2")
        mgr = ckpt_io.make_manager(ckpt)
        ckpt_io.save(mgr, donor)
        mgr.wait_until_finished()

        cfg2 = dataclasses.replace(cfg, init_feat_from=ckpt, train_feat=False)
        it = SyntheticScenes(cfg2, seed=0).iterator(cfg2.batch_size)
        state = train_loop.fit(cfg2, it, 1)
        # feat is frozen (train_feat=False), so after 1 step it still
        # equals the donor's pretrained values.
        for a, b in zip(
            jax.tree.leaves(state.params["feat"]),
            jax.tree.leaves(donor.params["feat"]),
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
