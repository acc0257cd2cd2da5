"""Eval drivers: batched inference + metric computation over KITTI.

Reference parity (SURVEY.md §3.2/§3.3 call stacks): where the reference
loops pycaffe ``net.forward()`` per frame, the rebuild batches frames
through one jitted forward — the per-image Python->C++->GPU round trip of
the reference becomes a single XLA program invocation per batch.
"""

from __future__ import annotations

import os
from typing import Dict, List

import numpy as np

from depthvo_tpu.api import DepthVO
from depthvo_tpu.eval.depth_metrics import compute_depth_metrics
from depthvo_tpu.eval.odometry import (
    ate,
    compose_trajectory,
    kitti_odometry_errors,
    snippet_ate,
    write_kitti_poses,
)


# Bound on enqueued-but-unfetched eval batches (inputs + outputs both
# stay in HBM until drained): large enough to overlap transfers with
# compute, small enough that sweeps of any length stay memory-bounded.
MAX_IN_FLIGHT = 32


def _batched(items: List, batch_size: int):
    for i in range(0, len(items), batch_size):
        yield items[i : i + batch_size]


def predict_depths(
    model: DepthVO,
    frames: np.ndarray,
    batch_size: int = 16,
    mesh=None,
    postprocess=None,
    postprocess_workers: int = 4,
):
    """Batched depth inference over (N, H, W, 3) frames -> (N, H, W).

    Pads the trailing batch to keep a single compiled shape (XLA
    recompiles per shape; padding is cheaper than a second program).

    The whole sweep is issued asynchronously — all host->device uploads
    and forward programs are enqueued before the first result fetch, so
    transfers overlap compute AND earlier fetches (on a remote/tunneled
    device the link, not the chip, is the bottleneck). Pass uint8 frames
    (data/kitti.py::load_image_u8) to cut upload bytes 4x; normalization
    then runs on-device, matching the host loader's to 1 ulp.

    ``mesh``: a 1-D data mesh for multi-chip eval — each batch is sharded
    over the 'data' axis (weights must be replicated first:
    ``model.to_mesh(mesh)``); XLA partitions the forward with no further
    code. ``batch_size`` must divide by ``mesh.size``.

    ``postprocess``: optional ``fn(frame_idx, depth_2d) -> Any`` applied
    per frame ON A THREAD POOL as results drain, so host-side work (e.g.
    the eval protocol's resize-to-gt) overlaps the remaining device
    fetches instead of serializing after them (VERDICT r2 item 8). PIL
    and numpy release the GIL, so this overlaps even on a 1-core host
    whose fetches are link-bound. Returns the ordered list of
    postprocess results instead of the stacked array.
    """
    import jax

    if mesh is not None:
        if batch_size % mesh.size:
            raise ValueError(
                f"batch_size {batch_size} not divisible by mesh {mesh.size}"
            )
        from depthvo_tpu.parallel import mesh as pmesh

        sharding = pmesh.batch_sharding(mesh)
        put = lambda b: jax.device_put(b, sharding)
    else:
        put = jax.device_put

    pool = None
    if postprocess is not None:
        from concurrent.futures import ThreadPoolExecutor

        pool = ThreadPoolExecutor(max_workers=postprocess_workers)

    n = len(frames)
    pending: list = []
    out = []

    def drain_one():
        d, c, start = pending.pop(0)
        arr = np.asarray(1.0 / d[..., 0])[:c]
        if pool is not None:
            out.extend(
                pool.submit(postprocess, start + j, arr[j]) for j in range(c)
            )
        else:
            out.append(arr)

    try:
        for chunk in _batched(list(range(n)), batch_size):
            batch = frames[chunk[0] : chunk[-1] + 1]
            pad = batch_size - len(batch)
            if pad:
                batch = np.concatenate([batch, np.repeat(batch[-1:], pad, 0)])
            dev = put(batch)  # async upload
            pending.append(
                (
                    model._depth_fn(model.params, model.batch_stats, dev),
                    len(chunk),
                    chunk[0],
                )
            )
            if len(pending) >= MAX_IN_FLIGHT:
                drain_one()
        while pending:
            drain_one()
        if pool is not None:
            return [f.result() for f in out]
        return np.concatenate(out, axis=0)
    finally:
        if pool is not None:
            pool.shutdown(wait=False)


def predict_trajectory(
    model: DepthVO, seq, batch_size: int = 16
) -> np.ndarray:
    """Run the odometry net over a KittiOdometrySequence and compose the
    global trajectory (SURVEY.md §3.3).

    Sequences exposing ``frames_u8`` (KittiOdometrySequence) take the
    fast path: one uint8 upload of the whole sequence, pairs formed
    on-device (api.DepthVO.pose_sequence). Other sequence objects fall
    back to host-built float32 pair batches."""
    if hasattr(seq, "frames_u8"):
        rel = model.pose_sequence(seq.frames_u8(), chunk=batch_size)
        return compose_trajectory(rel)
    rels = []
    for pairs in seq.pair_iterator(batch_size):
        pad = batch_size - len(pairs)
        padded = (
            np.concatenate([pairs, np.repeat(pairs[-1:], pad, 0)]) if pad else pairs
        )
        T = model.pose(padded)
        rels.append(T[: len(pairs)])
    rel = np.concatenate(rels, axis=0)
    return compose_trajectory(rel)


def run_depth_eval(
    checkpoint_dir: str | None,
    kitti_root: str,
    split_file: str,
    max_depth: float = 80.0,
    height: int = 160,
    width: int = 608,
    batch_size: int = 16,
    save_preds_dir: str | None = None,
    model: DepthVO | None = None,
    num_devices: int | None = None,
    median_scale: bool = True,
    pred_path: str | None = None,
    pred_inverse: bool = False,
    int8: bool = False,
    split_sha: str | None = None,
) -> Dict[str, float]:
    """Eigen-split depth benchmark: read test frames + gt depth npz/npy,
    run batched inference, resize to gt, compute the metric table.

    ``split_file`` lines: `<relative_image_path> <relative_gt_depth_npy>`.
    Comment lines (``#``) are skipped; a ``# split-source: ...`` header
    (written by ``prep-eigen``) is read as provenance.

    ``pred_path`` makes the run the reference's SECOND phase only
    (SURVEY.md §3.2: predictions saved as .npy, then ``eval_depth``):
    no model runs — saved predictions from ANY source (this framework's
    ``save_preds_dir`` stack, the original Caffe tooling's dumps, a
    directory of per-frame ``.npy``) go through the identical crop/cap/
    scale metric pass, which is how metric-protocol parity is checked
    against the reference's own outputs. ``pred_inverse`` treats the
    stored maps as inverse depth (the raw network output convention).

    The returned dict carries a ``split`` sub-dict —
    ``{split_file, n_frames, canonical, source, sha256, pinned}`` — and a
    warning is emitted unless the run used the canonical 697-frame Eigen
    list, so a derived-scene-list run can never be silently compared to
    published tables (SURVEY.md §3.2; VERDICT r2 item 9).

    ``split_sha`` pins the identity of a user-supplied canonical split
    file (VERDICT r3 item 8): the run REFUSES to start if the file's
    SHA-256 differs, and the provenance block records ``pinned: True`` —
    which ``zoo --check`` requires before it will accept a "canonical"
    claim (the widely-circulated Eigen-697 file cannot be fetched and
    checksummed from this machine, so the pin is the operator's
    attestation of which exact file produced the numbers).
    """
    import hashlib
    import warnings

    from depthvo_tpu.data.kitti import load_image_u8

    with open(split_file, "rb") as fb:
        digest = hashlib.sha256(fb.read()).hexdigest()
    if split_sha is not None and digest != split_sha.strip().lower():
        raise ValueError(
            f"split file {split_file} has SHA-256 {digest}, which does "
            f"not match the pinned --split-sha {split_sha} — refusing to "
            "evaluate against the wrong split"
        )
    sha_prov = {"sha256": digest, "pinned": split_sha is not None}

    if model is None and pred_path is None:
        model = (
            DepthVO.from_checkpoint(checkpoint_dir)
            if checkpoint_dir
            else DepthVO.from_random()
        )
    frames, gts = [], []
    split_source = "unknown"
    with open(split_file) as f:
        for line in f:
            if line.startswith("#"):
                if line[1:].strip().startswith("split-source:"):
                    split_source = line.split(":", 1)[1].strip()
                continue
            parts = line.split()
            if len(parts) < 2:
                continue
            img_path = os.path.join(kitti_root, parts[0])
            gt_path = os.path.join(kitti_root, parts[1])
            if pred_path is None:
                # uint8: normalized on-device (4x fewer upload bytes —
                # see predict_depths and data/kitti.py::load_image_u8).
                frames.append(load_image_u8(img_path, height, width))
            gts.append(np.load(gt_path))
    if pred_path is not None:
        metrics = _eval_saved_predictions(
            pred_path, gts, split_file, split_source,
            max_depth=max_depth, median_scale=median_scale,
            pred_inverse=pred_inverse,
        )
        metrics["split"].update(sha_prov)
        # Saved predictions may come from any tool/precision; the JSON
        # must not claim a quantization mode it cannot know.
        metrics["quant"] = "external"
        return metrics
    if int8:
        # w8a8 serving sweep: calibrate on the first frames of the split
        # (representative by construction), then run quantized.
        model.calibrate_int8(np.stack(frames[: max(batch_size, 32)]))
    mesh = None
    if num_devices is not None and num_devices > 1:
        # Data-parallel eval: weights replicated, batches sharded on
        # 'data' (SURVEY.md §5 distributed backend — eval scales the
        # same way training does).
        from depthvo_tpu.parallel import mesh as pmesh

        mesh = pmesh.make_mesh(num_devices)
        model.to_mesh(mesh)
        batch_size = -(-batch_size // mesh.size) * mesh.size

    # Per-frame resize-to-gt (reference protocol) runs as a postprocess
    # on predict_depths' drain path: the PIL work of batch i overlaps
    # the (link-bound) fetch of batch i+1 instead of serializing after
    # the whole sweep (VERDICT r2 item 8).
    from PIL import Image

    raw_preds: list = [None] * len(frames) if save_preds_dir else None

    def _resize_to_gt(i: int, p: np.ndarray) -> np.ndarray:
        if raw_preds is not None:
            raw_preds[i] = p
        g = gts[i]
        im = Image.fromarray(p.astype(np.float32), mode="F")
        return np.asarray(im.resize((g.shape[1], g.shape[0]), Image.BILINEAR))

    preds_resized = predict_depths(
        model,
        np.stack(frames),
        batch_size,
        mesh=mesh,
        postprocess=_resize_to_gt,
    )
    if save_preds_dir:
        # Reference parity: predictions land on disk as .npy before the
        # metric pass (SURVEY.md §3.2 "save predictions (.npy)").
        os.makedirs(save_preds_dir, exist_ok=True)
        np.save(
            os.path.join(save_preds_dir, "depth_predictions.npy"),
            np.stack(raw_preds),
        )
    metrics = _finish_depth_eval(
        preds_resized, gts, split_file, split_source,
        max_depth=max_depth, median_scale=median_scale,
        extra_split=sha_prov,
    )
    # Quantization provenance: the int8-aware zoo gate (`zoo --check
    # --int8`) requires the eval JSON to declare how it was produced.
    metrics["quant"] = "int8" if int8 else "off"
    return metrics


def _finish_depth_eval(
    preds_resized, gts, split_file, split_source, *,
    max_depth, median_scale, extra_split: Dict | None = None,
) -> Dict[str, float]:
    import warnings

    n = len(gts)
    canonical = n == 697 and "derived" not in split_source
    if not canonical:
        warnings.warn(
            f"depth eval ran on a NON-CANONICAL split ({n} frames, "
            f"source: {split_source}) — metrics are not comparable to "
            "published Eigen-697 tables",
            stacklevel=2,
        )
    metrics = compute_depth_metrics(
        preds_resized, gts, max_depth=max_depth, median_scale=median_scale
    )
    metrics["split"] = {
        "split_file": os.path.abspath(split_file),
        "n_frames": n,
        "canonical": canonical,
        "source": split_source,
        # Stereo-trained models are metric-scaled by construction and the
        # reference reports them UNSCALED; monocular protocols median-
        # scale. Record which one produced these numbers.
        "median_scale": median_scale,
        **(extra_split or {}),
    }
    return metrics


def _load_saved_predictions(pred_path: str) -> List[np.ndarray]:
    """Saved predictions: a stacked ``.npy``/``.npz`` (N,H,W), or a
    directory holding either ``depth_predictions.npy`` (our
    ``save_preds_dir`` format) or per-frame ``*.npy`` in sorted order."""
    if os.path.isdir(pred_path):
        stack = os.path.join(pred_path, "depth_predictions.npy")
        if os.path.isfile(stack):
            return list(np.load(stack))

        def natural(s: str):
            # frame_2 before frame_10: other frameworks' dumps are often
            # numbered without zero padding, and a lexicographic order
            # would silently misalign predictions with gt frames.
            import re

            return [int(t) if t.isdigit() else t
                    for t in re.split(r"(\d+)", s)]

        files = sorted(
            (f for f in os.listdir(pred_path) if f.endswith(".npy")),
            key=natural,
        )
        if not files:
            raise FileNotFoundError(
                f"{pred_path}: no depth_predictions.npy and no *.npy files"
            )
        return [np.load(os.path.join(pred_path, f)) for f in files]
    arr = np.load(pred_path)
    if hasattr(arr, "files"):  # npz: take the first array
        arr = arr[arr.files[0]]
    if arr.ndim != 3:
        raise ValueError(
            f"{pred_path}: expected a (N, H, W) stack, got {arr.shape}"
        )
    return list(arr)


def _eval_saved_predictions(
    pred_path, gts, split_file, split_source, *,
    max_depth, median_scale, pred_inverse,
) -> Dict[str, float]:
    from PIL import Image

    preds = _load_saved_predictions(pred_path)
    if len(preds) != len(gts):
        raise ValueError(
            f"{pred_path} holds {len(preds)} predictions but the split "
            f"file lists {len(gts)} frames"
        )
    resized = []
    for p, g in zip(preds, gts):
        p = np.asarray(p, np.float32)
        if pred_inverse:
            p = 1.0 / np.maximum(p, 1e-6)
        im = Image.fromarray(p, mode="F")
        resized.append(
            np.asarray(im.resize((g.shape[1], g.shape[0]), Image.BILINEAR))
        )
    return _finish_depth_eval(
        resized, gts, split_file, split_source,
        max_depth=max_depth, median_scale=median_scale,
        extra_split={
            "predictions": os.path.abspath(pred_path),
            "pred_inverse": pred_inverse,
        },
    )


def run_odometry_eval(
    checkpoint_dir: str | None,
    kitti_odom_root: str,
    sequence: str = "09",
    output_dir: str | None = None,
    height: int = 160,
    width: int = 608,
    model: DepthVO | None = None,
    pose_file: str | None = None,
) -> Dict[str, float]:
    """Seq eval: predict trajectory, write KITTI pose file, devkit
    metrics + ATE against ground truth.

    ``pose_file`` runs the devkit phase alone (SURVEY.md §3.3's
    ``eval_odom``): an existing KITTI-format pose file — from this
    framework's ``output_dir``, the original Caffe tooling, or any other
    VO system — is scored against the sequence's ground truth; no model
    runs."""
    if pose_file is not None:
        from depthvo_tpu.eval.odometry import read_kitti_poses

        poses = read_kitti_poses(pose_file)
        gt_path = os.path.join(kitti_odom_root, "poses", sequence + ".txt")
        if not os.path.isfile(gt_path):
            # Scoring a pose file without gt is meaningless; a mistyped
            # root must not "succeed" with an empty scorecard.
            raise FileNotFoundError(
                f"no ground-truth poses at {gt_path} — check "
                "--kitti-root/--sequence"
            )
        gt_poses = read_kitti_poses(gt_path)
        if output_dir:
            from depthvo_tpu.eval.odometry import plot_trajectory

            os.makedirs(output_dir, exist_ok=True)
            plot_trajectory(
                poses, gt_poses,
                os.path.join(output_dir, f"{sequence}.png"),
                title=f"seq {sequence} ({os.path.basename(pose_file)})",
            )
        result: Dict[str, float] = {
            "sequence": sequence,
            "frames": len(poses),
            "pose_file": os.path.abspath(pose_file),
        }
        if gt_poses is not None:
            if len(gt_poses) != len(poses):
                raise ValueError(
                    f"{pose_file} holds {len(poses)} poses but ground "
                    f"truth for seq {sequence} has {len(gt_poses)}"
                )
            result.update(kitti_odometry_errors(poses, gt_poses))
            result["ate_m"] = ate(poses, gt_poses)
            result.update(snippet_ate(poses, gt_poses))
        return result

    from depthvo_tpu.data.kitti import KittiOdometrySequence

    if model is None:
        model = (
            DepthVO.from_checkpoint(checkpoint_dir)
            if checkpoint_dir
            else DepthVO.from_random()
        )
    seq = KittiOdometrySequence(kitti_odom_root, sequence, height, width)
    poses = predict_trajectory(model, seq)
    if output_dir:
        from depthvo_tpu.eval.odometry import plot_trajectory

        os.makedirs(output_dir, exist_ok=True)
        write_kitti_poses(poses, os.path.join(output_dir, f"{sequence}.txt"))
        plot_trajectory(
            poses,
            seq.gt_poses,
            os.path.join(output_dir, f"{sequence}.png"),
            title=f"seq {sequence}",
        )
    result: Dict[str, float] = {"sequence": sequence, "frames": len(seq)}
    if seq.gt_poses is not None:
        result.update(kitti_odometry_errors(poses, seq.gt_poses))
        result["ate_m"] = ate(poses, seq.gt_poses)
        result.update(snippet_ate(poses, seq.gt_poses))
    return result
