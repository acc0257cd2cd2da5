#!/usr/bin/env python
"""Host data-pipeline throughput: C++ prefetch ring vs Python thread pool.

The training input pipeline (SURVEY.md §2b(ii), Caffe's base_data_layer/
internal_thread rebuild) has two implementations; this benchmark decides
which feeds KITTI-resolution PNGs faster. Prints one JSON line with
frames/s (a frame = one decoded+resized+normalized image; a training
sample consumes 3).

Uses generated 1242x375 PNGs (KITTI raw size) in a temp dir — measures
decode+resize+batch assembly, not disk (files are hot in page cache).
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _make_fixture(root: str, n_frames: int = 24) -> str:
    from PIL import Image

    date = "2011_09_26"
    drive = "2011_09_26_drive_0001_sync"
    rng = np.random.default_rng(0)
    for cam in ("image_02", "image_03"):
        d = os.path.join(root, date, drive, cam, "data")
        os.makedirs(d, exist_ok=True)
        for i in range(n_frames):
            Image.fromarray(
                rng.integers(0, 255, (375, 1242, 3), dtype=np.uint8)
            ).save(os.path.join(d, f"{i:010d}.png"))
    with open(os.path.join(root, date, "calib_cam_to_cam.txt"), "w") as f:
        f.write(
            "P_rect_02: 7.2e+02 0.0 6.0e+02 0.0 0.0 7.2e+02 1.8e+02 0.0 "
            "0.0 0.0 1.0 0.0\n"
        )
        f.write("S_rect_02: 1.242e+03 3.75e+02\n")
    return drive


def _time_pipeline(it, batches: int, batch_size: int, warmup: int = 3) -> float:
    for _ in range(warmup):
        next(it)
    t0 = time.perf_counter()
    for _ in range(batches):
        b = next(it)
        assert b["image_t"].shape[0] == batch_size
    dt = time.perf_counter() - t0
    return batches * batch_size * 3 / dt  # 3 decoded frames per sample


def main() -> int:
    from depthvo_tpu.data import native_loader
    from depthvo_tpu.data.kitti import KittiRawStereo

    batch_size, batches = 4, 12
    with tempfile.TemporaryDirectory() as root:
        drive = _make_fixture(root)
        ds = KittiRawStereo(root, [drive], height=160, width=608)
        ds_u8 = KittiRawStereo(root, [drive], height=160, width=608, u8=True)

        pool_fps = _time_pipeline(
            ds.iterator(batch_size, native_ring=False), batches, batch_size
        )
        # Production contract: uint8 batches (4x smaller uplink), both
        # host implementations.
        pool_u8_fps = _time_pipeline(
            ds_u8.iterator(batch_size, native_ring=False), batches, batch_size
        )
        ring_fps = ring_u8_fps = None
        if native_loader.available():
            ring_fps = _time_pipeline(
                ds.iterator(batch_size, native_ring=True), batches, batch_size
            )
            ring_u8_fps = _time_pipeline(
                ds_u8.iterator(batch_size, native_ring=True),
                batches,
                batch_size,
            )
    out = {
        "metric": "host_pipeline_frames_per_sec_1242x375_to_608x160",
        "value": round(ring_u8_fps or ring_fps or pool_u8_fps, 1),
        "unit": "frames/s",
        "detail": {
            "thread_pool_fps": round(pool_fps, 1),
            "thread_pool_u8_fps": round(pool_u8_fps, 1),
            "native_ring_fps": round(ring_fps, 1) if ring_fps else None,
            "native_ring_u8_fps": (
                round(ring_u8_fps, 1) if ring_u8_fps else None
            ),
            "ring_speedup": round(ring_fps / pool_fps, 2) if ring_fps else None,
            "batch_size": batch_size,
        },
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
