"""Structured per-step logging.

Reference parity (SURVEY.md §5 "Metrics / logging"): Caffe's solver
prints every loss output with its loss_weight each ``display`` interval
via glog; the reference has no TensorBoard. The rebuild keeps loss terms
separate under the same names the loss graph produces (loss/stereo,
loss/temporal, loss/feature, loss/smooth, loss/total) and writes
human-readable lines, optional JSONL (machine-readable; the analog of
parsing glog output), and optional TensorBoard scalars (the SURVEY §5
"optional TensorBoard" upgrade).
"""

from __future__ import annotations

import json
import sys
import time
from typing import Dict, IO


class MetricLogger:
    """Prints `step N: k=v ...` lines; optionally appends JSONL and/or
    writes TensorBoard scalar events (``tensorboard_dir``)."""

    def __init__(
        self,
        stream: IO | None = None,
        jsonl_path: str | None = None,
        tensorboard_dir: str | None = None,
    ):
        self.stream = stream or sys.stdout
        self.tb = None
        if tensorboard_dir:
            try:
                # torch's SummaryWriter writes standard tfevents files
                # without TensorFlow; it is an OPTIONAL dependency
                # (pyproject extra "tensorboard").
                from torch.utils.tensorboard import SummaryWriter
            except ModuleNotFoundError as e:
                raise ModuleNotFoundError(
                    "--tensorboard needs torch + tensorboard: "
                    "pip install 'depthvo-tpu[tensorboard]'"
                ) from e
            self.tb = SummaryWriter(tensorboard_dir)
        self.jsonl = open(jsonl_path, "a") if jsonl_path else None
        self._t0 = time.time()

    def __call__(self, step: int, metrics: Dict[str, float]) -> None:
        parts = " ".join(f"{k}={v:.6g}" for k, v in sorted(metrics.items()))
        self.stream.write(f"step {step}: {parts}\n")
        self.stream.flush()
        if self.jsonl is not None:
            rec = {"step": step, "t": time.time() - self._t0, **metrics}
            self.jsonl.write(json.dumps(rec) + "\n")
            self.jsonl.flush()
        if self.tb is not None:
            for k, v in metrics.items():
                self.tb.add_scalar(k, float(v), global_step=step)

    def close(self) -> None:
        if self.jsonl is not None:
            self.jsonl.close()
        if self.tb is not None:
            self.tb.close()
