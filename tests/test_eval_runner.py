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
    with pytest.warns(UserWarning, match="NON-CANONICAL"):
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
    # Split provenance rides the result (VERDICT r2 item 9).
    assert metrics["split"]["n_frames"] == 3
    assert metrics["split"]["canonical"] is False
    assert metrics["split"]["median_scale"] is True


def test_run_depth_eval_unscaled_differs(eigen_tree):
    """--no-median-scale (the reference's protocol for stereo-trained,
    metric-scale models) produces genuinely unscaled metrics."""
    root, split = eigen_tree
    with pytest.warns(UserWarning, match="NON-CANONICAL"):
        unscaled = run_depth_eval(
            checkpoint_dir=None,
            kitti_root=root,
            split_file=split,
            height=32,
            width=96,
            batch_size=2,
            median_scale=False,
        )
    assert unscaled["split"]["median_scale"] is False
    with pytest.warns(UserWarning, match="NON-CANONICAL"):
        scaled = run_depth_eval(
            checkpoint_dir=None,
            kitti_root=root,
            split_file=split,
            height=32,
            width=96,
            batch_size=2,
            median_scale=True,
        )
    # Random weights are nowhere near metric scale, so the two protocols
    # must disagree (guards the flag actually reaching the metric pass).
    assert abs(unscaled["abs_rel"] - scaled["abs_rel"]) > 1e-3


def test_predict_depths_postprocess_ordered_and_equivalent():
    """The drain-time thread-pool postprocess returns per-frame results
    in order, identical to postprocessing the stacked array afterwards
    (VERDICT r2 item 8: overlapped host work, same numbers)."""
    model = _tiny_model()
    rng = np.random.default_rng(8)
    frames = rng.integers(0, 256, size=(7, 32, 96, 3), dtype=np.uint8)
    plain = predict_depths(model, frames, batch_size=3)
    posted = predict_depths(
        model,
        frames,
        batch_size=3,
        postprocess=lambda i, p: (i, p * 2.0),
    )
    assert [i for i, _ in posted] == list(range(7))
    np.testing.assert_allclose(
        np.stack([p for _, p in posted]), plain * 2.0, rtol=0, atol=0
    )


def test_cli_infer_batched(tmp_path):
    """cli infer runs the whole directory through the batched async
    runner (one compiled shape), not a per-image loop — outputs match
    per-frame model.depth calls (VERDICT r2 item 4)."""
    from depthvo_tpu import cli

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    rng = np.random.default_rng(9)
    for i in range(5):
        Image.fromarray(
            rng.integers(0, 255, (40, 128, 3), dtype=np.uint8)
        ).save(img_dir / f"f{i:03d}.png")
    out_dir = tmp_path / "depths"
    rc = cli.main([
        "infer", "--variant", "tiny_test", "--images", str(img_dir),
        "--output-dir", str(out_dir), "--batch-size", "2", "--save-png",
    ])
    assert rc == 0
    outs = sorted(out_dir.glob("*_depth.npy"))
    assert len(outs) == 5
    pngs = sorted(out_dir.glob("*_depth.png"))
    assert len(pngs) == 5
    vis = np.asarray(Image.open(pngs[0]))
    assert vis.shape == (32, 96, 3) and vis.max() > vis.min()
    d0 = np.load(outs[0])
    assert d0.shape == (32, 96)
    assert np.isfinite(d0).all() and (d0 > 0).all()


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


def _tiny_model():
    from depthvo_tpu import configs
    from depthvo_tpu.api import DepthVO

    cfg = configs.full_feat()
    mc = configs.ModelConfig(height=32, width=96, compute_dtype="float32")
    cfg = configs.ExperimentConfig(**{**cfg.__dict__, "model": mc})
    return DepthVO.from_random(cfg)


def test_uint8_input_matches_host_normalize():
    """uint8 frames normalized on-device == host-normalized f32 frames
    up to 1 ulp (XLA may fuse the normalize into an FMA; the inputs to
    the net differ by at most one rounding)."""
    model = _tiny_model()
    rng = np.random.default_rng(2)
    u8 = rng.integers(0, 256, size=(2, 32, 96, 3), dtype=np.uint8)
    f32 = u8.astype(np.float32) / 127.5 - 1.0
    np.testing.assert_allclose(
        model.depth(u8), model.depth(f32), rtol=1e-5, atol=1e-6
    )
    pair_u8 = np.concatenate([u8, u8[::-1]], axis=-1)
    pair_f32 = np.concatenate([f32, f32[::-1]], axis=-1)
    np.testing.assert_allclose(
        model.pose(pair_u8), model.pose(pair_f32), rtol=1e-5, atol=1e-6
    )


def test_load_image_u8_matches_load_image(tmp_path):
    """load_image_u8 / 127.5 - 1 == load_image within half a uint8 grid
    step (exactly equal on the PIL path; the native runtime resizes in
    float, so u8 rounds by <= 1/255 in [-1, 1] units)."""
    from depthvo_tpu.data.kitti import load_image, load_image_u8

    rng = np.random.default_rng(3)
    path = str(tmp_path / "frame.png")
    Image.fromarray(
        rng.integers(0, 256, (370, 1226, 3), dtype=np.uint8)
    ).save(path)
    f32 = load_image(path, 32, 96)
    u8 = load_image_u8(path, 32, 96)
    assert u8.dtype == np.uint8
    diff = np.abs(f32 - (u8.astype(np.float32) / 127.5 - 1.0))
    assert diff.max() <= 1.0 / 255.0 + 1e-6


def test_pose_sequence_matches_pairwise():
    """On-device pairing (pose_sequence) == host-built pairs through
    model.pose, including the trailing-chunk padding path (N-1=6 pairs,
    chunk=4)."""
    model = _tiny_model()
    rng = np.random.default_rng(4)
    frames = rng.integers(0, 256, size=(7, 32, 96, 3), dtype=np.uint8)
    seq_T = model.pose_sequence(frames, chunk=4)
    assert seq_T.shape == (6, 4, 4)
    f32 = frames.astype(np.float32) / 127.5 - 1.0
    pairs = np.concatenate([f32[:-1], f32[1:]], axis=-1)
    pair_T = model.pose(pairs)
    np.testing.assert_allclose(seq_T, pair_T, rtol=1e-5, atol=1e-6)


def test_predict_trajectory_fast_path_matches_fallback():
    from depthvo_tpu.eval.runner import predict_trajectory

    model = _tiny_model()
    rng = np.random.default_rng(5)
    u8 = rng.integers(0, 256, size=(6, 32, 96, 3), dtype=np.uint8)
    f32 = u8.astype(np.float32) / 127.5 - 1.0

    class _Fast:
        def frames_u8(self):
            return u8

    class _Slow:
        def pair_iterator(self, batch_size):
            pairs = np.concatenate([f32[:-1], f32[1:]], axis=-1)
            for i in range(0, len(pairs), batch_size):
                yield pairs[i : i + batch_size]

    fast = predict_trajectory(model, _Fast(), batch_size=4)
    slow = predict_trajectory(model, _Slow(), batch_size=4)
    assert fast.shape == slow.shape == (6, 4, 4)
    np.testing.assert_allclose(fast, slow, rtol=1e-5, atol=1e-6)


def test_predict_depths_data_parallel_matches_single():
    """Data-parallel eval over the virtual 8-device mesh == single-device
    (batch sharded on 'data', weights replicated via to_mesh)."""
    import jax
    from depthvo_tpu.parallel import mesh as pmesh

    assert len(jax.devices()) >= 8
    model = _tiny_model()
    rng = np.random.default_rng(6)
    frames = rng.integers(0, 256, size=(10, 32, 96, 3), dtype=np.uint8)
    single = predict_depths(model, frames, batch_size=8)
    mesh = pmesh.make_mesh(8)
    model.to_mesh(mesh)
    sharded = predict_depths(model, frames, batch_size=8, mesh=mesh)
    np.testing.assert_allclose(sharded, single, rtol=2e-4, atol=1e-5)

    with pytest.raises(ValueError, match="divisible"):
        predict_depths(model, frames, batch_size=6, mesh=mesh)


def test_predict_depths_bounded_inflight_preserves_order(monkeypatch):
    """With MAX_IN_FLIGHT forced below the chunk count, the interleaved
    enqueue/drain path must return frames in order and match the
    all-enqueued result."""
    from depthvo_tpu.eval import runner

    model = _tiny_model()
    rng = np.random.default_rng(7)
    frames = rng.integers(0, 256, size=(10, 32, 96, 3), dtype=np.uint8)
    baseline = predict_depths(model, frames, batch_size=2)  # 5 chunks < 32
    monkeypatch.setattr(runner, "MAX_IN_FLIGHT", 2)
    out = predict_depths(model, frames, batch_size=2)  # drains mid-loop
    np.testing.assert_array_equal(out, baseline)


def test_cli_device_query(capsys):
    """`device-query` (the caffe device_query analog) lists every device
    on the active backend with platform + process info."""
    from depthvo_tpu import cli

    rc = cli.main(["device-query"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "backend:" in out and "devices: 8" in out
    assert out.count("(platform=") == 8


class TestSavedPredictionEval:
    """--pred-path: the reference's two-phase eval_depth protocol
    (SURVEY §3.2) — saved predictions from any source, no model."""

    def _save_then_eval(self, eigen_tree, tmp_path):
        root, split = eigen_tree
        preds_dir = str(tmp_path / "preds")
        with pytest.warns(UserWarning, match="NON-CANONICAL"):
            live = run_depth_eval(
                checkpoint_dir=None, kitti_root=root, split_file=split,
                height=32, width=96, batch_size=2,
                save_preds_dir=preds_dir,
            )
        return root, split, preds_dir, live

    def test_stack_reproduces_live_metrics(self, eigen_tree, tmp_path):
        root, split, preds_dir, live = self._save_then_eval(
            eigen_tree, tmp_path
        )
        with pytest.warns(UserWarning, match="NON-CANONICAL"):
            offline = run_depth_eval(
                checkpoint_dir=None, kitti_root=root, split_file=split,
                pred_path=os.path.join(preds_dir, "depth_predictions.npy"),
            )
        for k in ("abs_rel", "sq_rel", "rmse", "rmse_log", "a1", "a2", "a3"):
            np.testing.assert_allclose(offline[k], live[k], rtol=1e-6,
                                       err_msg=k)
        assert offline["split"]["predictions"].endswith(
            "depth_predictions.npy"
        )
        assert offline["split"]["pred_inverse"] is False

    def test_directory_forms_and_inverse(self, eigen_tree, tmp_path):
        root, split, preds_dir, live = self._save_then_eval(
            eigen_tree, tmp_path
        )
        # Directory containing the stack file:
        with pytest.warns(UserWarning, match="NON-CANONICAL"):
            from_dir = run_depth_eval(
                checkpoint_dir=None, kitti_root=root, split_file=split,
                pred_path=preds_dir,
            )
        np.testing.assert_allclose(from_dir["abs_rel"], live["abs_rel"],
                                   rtol=1e-6)
        # Per-frame files + inverse-depth convention:
        stack = np.load(os.path.join(preds_dir, "depth_predictions.npy"))
        per_frame = tmp_path / "per_frame"
        per_frame.mkdir()
        for i, p in enumerate(stack):
            np.save(per_frame / f"{i:06d}.npy", 1.0 / np.maximum(p, 1e-6))
        with pytest.warns(UserWarning, match="NON-CANONICAL"):
            inv = run_depth_eval(
                checkpoint_dir=None, kitti_root=root, split_file=split,
                pred_path=str(per_frame), pred_inverse=True,
            )
        np.testing.assert_allclose(inv["abs_rel"], live["abs_rel"],
                                   rtol=1e-4)

    def test_count_mismatch_raises(self, eigen_tree, tmp_path):
        root, split, preds_dir, _ = self._save_then_eval(
            eigen_tree, tmp_path
        )
        stack = np.load(os.path.join(preds_dir, "depth_predictions.npy"))
        short = tmp_path / "short.npy"
        np.save(short, stack[:-1])
        with pytest.raises(ValueError, match="2 predictions"):
            run_depth_eval(
                checkpoint_dir=None, kitti_root=root, split_file=split,
                pred_path=str(short),
            )


class TestSplitShaPinning:
    """VERDICT r3 item 8: split-file SHA-256 provenance + pinning."""

    def test_provenance_carries_hash_and_pin_state(self, eigen_tree):
        import hashlib

        root, split = eigen_tree
        with open(split, "rb") as f:
            digest = hashlib.sha256(f.read()).hexdigest()
        with pytest.warns(UserWarning, match="NON-CANONICAL"):
            unpinned = run_depth_eval(
                checkpoint_dir=None, kitti_root=root, split_file=split,
                height=32, width=96, batch_size=2,
            )
        assert unpinned["split"]["sha256"] == digest
        assert unpinned["split"]["pinned"] is False
        assert unpinned["quant"] == "off"

        with pytest.warns(UserWarning, match="NON-CANONICAL"):
            pinned = run_depth_eval(
                checkpoint_dir=None, kitti_root=root, split_file=split,
                height=32, width=96, batch_size=2, split_sha=digest.upper(),
            )
        assert pinned["split"]["pinned"] is True

    def test_mismatched_pin_refuses_to_run(self, eigen_tree):
        root, split = eigen_tree
        with pytest.raises(ValueError, match="does not match the pinned"):
            run_depth_eval(
                checkpoint_dir=None, kitti_root=root, split_file=split,
                height=32, width=96, batch_size=2, split_sha="0" * 64,
            )

    def test_saved_prediction_phase_carries_hash(self, eigen_tree, tmp_path):
        root, split = eigen_tree
        preds = np.full((3, 24, 80), 10.0, np.float32)
        path = str(tmp_path / "preds.npy")
        np.save(path, preds)
        with pytest.warns(UserWarning, match="NON-CANONICAL"):
            m = run_depth_eval(
                checkpoint_dir=None, kitti_root=root, split_file=split,
                pred_path=path,
            )
        assert len(m["split"]["sha256"]) == 64
        assert m["split"]["pinned"] is False
        assert m["quant"] == "external"
