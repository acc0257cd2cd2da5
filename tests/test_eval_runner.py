"""End-to-end test of the Eigen-split depth eval runner over a synthetic
fixture tree (images + gt-depth .npy + split file) — the rebuild of the
reference's `--func depth prediction` + `--func depth eval` pipeline
(SURVEY.md §3.2)."""

import os

import numpy as np
import pytest
from PIL import Image

from depthvo_tpu.eval.runner import predict_depths, run_depth_eval


@pytest.fixture(scope="module")
def eigen_tree(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("eigen"))
    rng = np.random.default_rng(0)
    lines = []
    for i in range(3):
        img_rel = f"imgs/{i:06d}.png"
        gt_rel = f"gt/{i:06d}.npy"
        img_path = os.path.join(root, img_rel)
        gt_path = os.path.join(root, gt_rel)
        os.makedirs(os.path.dirname(img_path), exist_ok=True)
        os.makedirs(os.path.dirname(gt_path), exist_ok=True)
        Image.fromarray(
            rng.integers(0, 255, (375, 1242, 3), dtype=np.uint8)
        ).save(img_path)
        gt = rng.uniform(1.0, 70.0, size=(375, 1242)).astype(np.float32)
        gt[:150] = 0.0  # sky region: no lidar returns (invalid)
        np.save(gt_path, gt)
        lines.append(f"{img_rel} {gt_rel}")
    split = os.path.join(root, "eigen_test.txt")
    with open(split, "w") as f:
        f.write("\n".join(lines) + "\n")
    return root, split


def test_run_depth_eval_end_to_end(eigen_tree):
    root, split = eigen_tree
    metrics = run_depth_eval(
        checkpoint_dir=None,  # random weights: metrics finite, not good
        kitti_root=root,
        split_file=split,
        height=32,
        width=96,
        batch_size=2,  # exercises trailing-batch padding
    )
    for k in ("abs_rel", "sq_rel", "rmse", "rmse_log", "a1", "a2", "a3"):
        assert np.isfinite(metrics[k]), k
    assert 0.0 <= metrics["a1"] <= 1.0


def test_predict_depths_padding_consistency():
    """Batched prediction with trailing padding == per-frame prediction."""
    from depthvo_tpu import configs
    from depthvo_tpu.api import DepthVO

    cfg = configs.full_feat()
    mc = configs.ModelConfig(height=32, width=96, compute_dtype="float32")
    cfg = configs.ExperimentConfig(**{**cfg.__dict__, "model": mc})
    model = DepthVO.from_random(cfg)
    rng = np.random.default_rng(1)
    frames = rng.uniform(-1, 1, size=(5, 32, 96, 3)).astype(np.float32)
    batched = predict_depths(model, frames, batch_size=4)
    single = np.concatenate([model.depth(frames[i : i + 1]) for i in range(5)])
    np.testing.assert_allclose(batched, single, rtol=2e-4, atol=1e-5)
