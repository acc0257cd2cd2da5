"""Serving export: freeze the depth forward into a portable StableHLO
artifact via ``jax.export``.

The reference's deploy story is a ``deploy.prototxt`` + ``.caffemodel``
pair loaded by pycaffe (SURVEY.md §1 "the API surface users consume");
its TPU-native analog is an ahead-of-time-lowered, weights-embedded XLA
program: one file that any JAX runtime (CPU or TPU, no depthvo_tpu
install, no flax, no checkpoint directory) can deserialize and call.

Properties of the artifact:

* **weights baked in** as program constants — no separate checkpoint;
* **multi-platform** — lowered for both ``cpu`` and ``tpu`` by default
  (the loader picks the branch matching the runtime backend);
* **symbolic batch** — one artifact serves every batch size (shape
  polymorphism via ``jax.export.symbolic_shape``); height/width/channels
  stay static, as XLA tiling wants;
* **uint8 or float32 input** — uint8 is the throughput default (4x
  fewer host->device bytes; normalization happens on-device, matching
  the training loaders to 1 ulp).

A JSON sidecar records the input contract so consumers don't guess.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax import export as jax_export


def export_depth(
    model,
    path: str,
    *,
    input_dtype: str = "uint8",
    platforms: tuple = ("cpu", "tpu"),
    batch: int | None = None,
    output: str = "depth",
) -> Dict[str, Any]:
    """Serialize ``model``'s depth forward (weights embedded) to ``path``.

    Args:
      model: an ``api.DepthVO``.
      path: output file (conventionally ``.depthvo.bin``); a ``.json``
        sidecar with the input spec lands next to it.
      input_dtype: "uint8" (normalized on-device) or "float32" ([-1, 1]).
      platforms: lowering targets; the artifact runs on any of them.
      batch: concrete batch size, or None for a symbolic batch dimension
        (one artifact, every batch size).
      output: "depth" (metric, 1/disparity — what ``model.depth``
        returns) or "disparity" (the net's raw finest-scale output).

    Returns the sidecar dict (also written to ``path + ".json"``).
    """
    if input_dtype not in ("uint8", "float32"):
        raise ValueError(f"input_dtype must be uint8|float32, got {input_dtype!r}")
    if output not in ("depth", "disparity"):
        raise ValueError(f"output must be depth|disparity, got {output!r}")
    mc = model.config.model
    params, batch_stats = model.params, model.batch_stats

    def fwd(images):
        disp = model._depth_fn(params, batch_stats, images)[..., 0]
        return 1.0 / disp if output == "depth" else disp

    if batch is None:
        (b,) = jax_export.symbolic_shape("b")
    else:
        b = int(batch)
    spec = jax.ShapeDtypeStruct((b, mc.height, mc.width, 3), jnp.dtype(input_dtype))
    exported = jax_export.export(jax.jit(fwd), platforms=tuple(platforms))(spec)
    with open(path, "wb") as f:
        f.write(exported.serialize())
    sidecar = {
        "format": "jax.export StableHLO",
        "function": f"images -> {output}",
        "input": {
            "shape": ["b" if batch is None else batch, mc.height, mc.width, 3],
            "dtype": input_dtype,
            "layout": "NHWC, RGB",
            "range": "[0, 255]" if input_dtype == "uint8" else "[-1, 1]",
        },
        "output": output,
        "platforms": list(platforms),
        "variant": model.config.name,
        # A calibrate_int8'd model exports its w8a8 program: the quant
        # scales and int8 weights become compile-time constants.
        "int8": getattr(model, "quant", None) is not None,
        "artifact_bytes": os.path.getsize(path),
    }
    with open(path + ".json", "w") as f:
        json.dump(sidecar, f, indent=2)
    return sidecar


class ServingModel:
    """Thin callable over a deserialized artifact: images -> np.ndarray."""

    def __init__(self, exported, sidecar: Dict[str, Any] | None):
        self._exported = exported
        self.sidecar = sidecar or {}

    def __call__(self, images: np.ndarray) -> np.ndarray:
        want = self.sidecar.get("input", {}).get("dtype")
        arr = jnp.asarray(images)
        if want and str(arr.dtype) != want:
            raise TypeError(
                f"artifact expects {want} input, got {arr.dtype} "
                "(see the .json sidecar)"
            )
        return np.asarray(self._exported.call(arr))


def load(path: str) -> ServingModel:
    """Deserialize a serving artifact written by ``export_depth``.

    Needs only ``jax`` — no checkpoint, no model code, no config.
    """
    with open(path, "rb") as f:
        exported = jax_export.deserialize(f.read())
    sidecar = None
    if os.path.isfile(path + ".json"):
        with open(path + ".json") as f:
            sidecar = json.load(f)
    return ServingModel(exported, sidecar)
