"""Bridge imported Caffe layers into flax parameter trees.

Completes the fidelity-gate path (SURVEY.md §7 step 2): ``caffemodel.py``
parses the released file into {layer_name: blobs}; this module places
those blobs into a model's parameter pytree.

Because the reference's exact prototxt layer names are unverifiable
(empty mount — SURVEY.md header), the primary strategy is *shape-ordered
matching*: walk the flax params in definition order and consume imported
conv/BN/dense layers in file order wherever shapes agree exactly. With
the real prototxt available this can be tightened to name-based mapping
via an explicit ``name_map``.
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import jax
import numpy as np

from depthvo_tpu.io import caffemodel


def _flatten_with_path(tree: Any) -> List[Tuple[Tuple[str, ...], np.ndarray]]:
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    out = []
    for path, leaf in flat:
        keys = tuple(
            p.key if hasattr(p, "key") else str(p) for p in path
        )
        out.append((keys, np.asarray(leaf)))
    return out


def import_by_shape_order(
    layers: Dict[str, Dict],
    params: Any,
    flip_bgr_first_conv: bool = True,
    strict: bool = False,
) -> Tuple[Any, Dict[str, str]]:
    """Fill ``params`` (a flax params pytree) from parsed Caffe layers.

    Walks the model's conv/dense kernels in traversal order and the
    imported layers in file order; a layer is consumed when its converted
    kernel shape matches the next unfilled parameter of the same kind.
    Biases ride along with their kernel's layer.

    Returns (new_params, assignment_report {param_path: caffe_layer}).
    With ``strict`` raises if any model parameter goes unmatched.
    """
    flat = _flatten_with_path(params)
    # Work on a mutable dict copy of the pytree.
    leaves = {path: leaf.copy() for path, leaf in flat}
    report: Dict[str, str] = {}

    conv_layers = [
        (name, l)
        for name, l in layers.items()
        if l["blobs"] and l["blobs"][0].ndim in (2, 4)
    ]
    used = set()
    first_conv_seen = False

    kernel_paths = [p for p, v in flat if p[-1] == "kernel"]
    for path in kernel_paths:
        target_shape = leaves[path].shape
        for name, layer in conv_layers:
            if name in used:
                continue
            w = layer["blobs"][0]
            if w.ndim == 4:
                conv = caffemodel.conv_params(
                    layer,
                    flip_bgr=flip_bgr_first_conv and not first_conv_seen,
                )
            else:
                conv = caffemodel.conv_params(layer)
            if conv["kernel"].shape != tuple(target_shape):
                continue
            leaves[path] = conv["kernel"]
            report[".".join(path)] = name
            if w.ndim == 4:
                first_conv_seen = True
            bias_path = path[:-1] + ("bias",)
            if "bias" in conv and bias_path in leaves:
                if conv["bias"].shape == leaves[bias_path].shape:
                    leaves[bias_path] = conv["bias"]
            used.add(name)
            break
        else:
            if strict:
                raise ValueError(
                    f"no imported layer matches {'.'.join(path)} {target_shape}"
                )

    unmatched = [".".join(p) for p in kernel_paths if ".".join(p) not in report]
    if strict and unmatched:
        raise ValueError(f"unmatched params: {unmatched}")

    # Rebuild the pytree.
    treedef = jax.tree_util.tree_structure(params)
    path_order = [tuple(
        p.key if hasattr(p, "key") else str(p) for p in path
    ) for path, _ in jax.tree_util.tree_flatten_with_path(params)[0]]
    new_leaves = [leaves[p] for p in path_order]
    return jax.tree_util.tree_unflatten(treedef, new_leaves), report


def import_bn_by_order(
    layers: Dict[str, Dict],
    params: Any,
    batch_stats: Any,
) -> Tuple[Any, Any, Dict[str, str]]:
    """Fill flax BatchNorm {scale,bias} params and {mean,var} batch_stats
    from Caffe BatchNorm+Scale layer pairs, matched by channel count in
    order. Returns (params, batch_stats, report)."""
    bn_layers = []
    names = list(layers)
    for i, name in enumerate(names):
        layer = layers[name]
        if len(layer["blobs"]) == 3 and layer["blobs"][0].ndim == 1:
            # BatchNorm: look ahead for its Scale pair (2 blobs, same C).
            scale = None
            for j in (i + 1, i + 2):
                if j < len(names):
                    cand = layers[names[j]]
                    if (
                        len(cand["blobs"]) in (1, 2)
                        and cand["blobs"][0].shape == layer["blobs"][0].shape
                    ):
                        scale = cand
                        break
            if scale is not None:
                bn_layers.append((name, layer, scale))

    p_flat = _flatten_with_path(params)
    s_flat = _flatten_with_path(batch_stats)
    p_leaves = {path: leaf.copy() for path, leaf in p_flat}
    s_leaves = {path: leaf.copy() for path, leaf in s_flat}
    report: Dict[str, str] = {}

    scale_paths = [p for p, _ in p_flat if p[-1] == "scale"]
    cursor = 0
    for path in scale_paths:
        c = p_leaves[path].shape[0]
        while cursor < len(bn_layers):
            name, bn, sc = bn_layers[cursor]
            cursor += 1
            if bn["blobs"][0].shape[0] != c:
                continue
            folded = caffemodel.fold_bn_scale(bn["blobs"], sc["blobs"])
            p_leaves[path] = folded["params"]["scale"]
            bias_path = path[:-1] + ("bias",)
            if bias_path in p_leaves:
                p_leaves[bias_path] = folded["params"]["bias"]
            # flax batch_stats mirror the params module path:
            # params[...module]['scale'] <-> batch_stats[...module]['mean'].
            mean_path = path[:-1] + ("mean",)
            var_path = path[:-1] + ("var",)
            if mean_path in s_leaves:
                s_leaves[mean_path] = folded["batch_stats"]["mean"]
            if var_path in s_leaves:
                s_leaves[var_path] = folded["batch_stats"]["var"]
            report[".".join(path[:-1])] = name
            break

    def rebuild(tree, leaves):
        treedef = jax.tree_util.tree_structure(tree)
        order = [tuple(
            p.key if hasattr(p, "key") else str(p) for p in path
        ) for path, _ in jax.tree_util.tree_flatten_with_path(tree)[0]]
        return jax.tree_util.tree_unflatten(treedef, [leaves[p] for p in order])

    return rebuild(params, p_leaves), rebuild(batch_stats, s_leaves), report
