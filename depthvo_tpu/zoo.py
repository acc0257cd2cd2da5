"""Model zoo: the reference's released-model table, machine-readable.

Reference parity: the Depth-VO-Feat README's model zoo (SURVEY.md §1
row 8, §2a "Docs / model zoo") is a table of released ``.caffemodel``
variants with their published KITTI metrics — the contract a user checks
their own runs against. This module carries that table as data plus an
automated parity checker, so the fidelity gate ("within 1% of the
published metrics", BASELINE.md) is a one-command comparison instead of
an eyeball diff:

    depthvo eval-depth ... > eval.json
    depthvo zoo --check eval.json --variant full_nyuv2

Download URLs are deliberately ABSENT: the reference hosted weights on
an external file share whose links cannot be verified from this machine
(zero egress — see SURVEY.md header). ``depthvo zoo`` points at the
reference README as the authority and prints the exact
``import-caffemodel`` command to run once the files are in hand.

Values mirror BASELINE.md (provenance and confidence tags included
there); [M]/[L] rows carry ``approximate: True`` and widen the check
tolerance accordingly.
"""

from __future__ import annotations

from typing import Any, Dict

# Per-variant entries. ``depth_metrics`` follow the Eigen-697 protocol
# (Garg crop, cap 80 m); stereo-trained variants are evaluated UNSCALED
# (median_scale=False), matching the reference protocol.
ZOO: Dict[str, Dict[str, Any]] = {
    "full_nyuv2": {
        "title": "Temporal+Stereo + NYUv2 feature loss (the flagship)",
        "nets": ("depth", "odom", "feat"),
        "train_variant": "full_feat",
        "stage": 3,
        "approximate": False,
        "depth_metrics": {
            "abs_rel": 0.135,
            "sq_rel": 1.132,
            "rmse": 5.585,
            "rmse_log": 0.229,
            "a1": 0.820,
            "a2": 0.933,
            "a3": 0.971,
        },
        "odom_metrics": {
            "09": {"t_err_pct": 11.9, "r_err_deg_per_100m": 3.9},
            "10": {"t_err_pct": 12.5, "r_err_deg_per_100m": 3.5},
        },
    },
    "temporal": {
        "title": "Temporal-only (no stereo, no feature loss)",
        "nets": ("depth", "odom"),
        "train_variant": "temporal_stereo",
        "stage": 2,
        "approximate": True,  # [M] rows in BASELINE.md
        "depth_metrics": {
            "abs_rel": 0.144,
            "sq_rel": 1.391,
            "rmse": 5.869,
            "rmse_log": 0.241,
            "a1": 0.803,
            "a2": 0.928,
            "a3": 0.969,
        },
        "odom_metrics": None,
    },
    "stereo": {
        "title": "Stereo-only depth (stage-1 recipe)",
        "nets": ("depth",),
        "train_variant": "stereo",
        "stage": 1,
        "approximate": True,  # [L]: exact README row unverified
        "depth_metrics": None,
        "odom_metrics": None,
    },
}

#: gate tolerance for exact [H] rows (BASELINE.md: "within 1 %")
PARITY_RTOL = 0.01
#: widened tolerance for approximate [M]/[L] rows
APPROX_RTOL = 0.05
#: extra tolerance granted to int8 (w8a8) serving on top of the row's
#: base tolerance. Sourced from benchmarks/int8_ab.py: measured +2.75%
#: relative abs-rel degradation on the synthetic A/B (PERF.md), rounded
#: up to 3% as the declared serving budget — the pre-wired "int8 stays
#: within X% of the published table" gate for the day real weights
#: arrive (VERDICT r3 weak #6 / item 7).
INT8_EXTRA_RTOL = 0.03


def _compare_metrics(published: Dict[str, float], measured: Dict[str, Any], rtol: float):
    """Per-metric relative comparison -> (rows, all_passed)."""
    rows = []
    ok = True
    for name, ref in published.items():
        if name not in measured:
            rows.append({"metric": name, "status": "missing"})
            ok = False
            continue
        got = float(measured[name])
        rel = abs(got - ref) / abs(ref)
        passed = rel <= rtol
        ok = ok and passed
        rows.append(
            {
                "metric": name,
                "published": ref,
                "measured": round(got, 4),
                "rel_err": round(rel, 4),
                "status": "pass" if passed else "FAIL",
            }
        )
    return rows, ok


# The exact flow a user runs on a NETWORKED machine to pin the canonical
# Eigen-697 split (this machine has zero egress, so the known-good digest
# cannot be derived here — VERDICT r4 item 7). The widely-mirrored
# canonical frame list is the one shipped in the monodepth repo (697
# lines, the Eigen NIPS'14 test split every published table uses).
CANONICAL_SPLIT_PIN_HOWTO = (
    "# On a machine with network access:\n"
    "curl -fsSL https://raw.githubusercontent.com/mrharicot/monodepth/"
    "master/utils/filenames/eigen_test_files.txt -o eigen_test_files.txt\n"
    "test \"$(wc -l < eigen_test_files.txt)\" = 697  # canonical length\n"
    "depthvo prep-eigen --kitti-root <KITTI_RAW> --split-file "
    "eigen_test_files.txt --output-dir <OUT>\n"
    "sha256sum <OUT>/eigen_list.txt   # pass to: eval-depth --split-sha "
    "<digest>"
)


def check_parity(
    measured: Dict[str, Any],
    variant: str = "full_nyuv2",
    rtol: float | None = None,
    int8: bool = False,
    trust_split: bool = False,
) -> Dict[str, Any]:
    """Compare measured eval-depth metrics against a zoo row.

    ``measured`` is the dict ``cli eval-depth`` prints (depth metric keys
    at the top level; the ``split`` sub-dict, if present, is consulted
    for canonical-split provenance). Returns a report with per-metric
    pass/fail and an overall verdict; raises KeyError on unknown variant.

    ``int8=True`` gates a quantized-serving run: the eval JSON must
    declare ``quant: "int8"`` (written by ``eval-depth --int8``), and the
    row tolerance widens by :data:`INT8_EXTRA_RTOL` — published + the
    declared serving degradation budget.

    ``trust_split=True`` is the explicit escape hatch for the unpinned-
    canonical refusal: the gate proceeds, but the report carries
    ``split_trusted_unpinned: True`` and a loud warning naming the
    split's hash, so the provenance records that the canonical claim
    rests on operator trust rather than a pinned digest. The report
    always includes ``pin_howto`` (:data:`CANONICAL_SPLIT_PIN_HOWTO`)
    whenever the pin is missing.
    """
    entry = ZOO[variant]
    published = entry["depth_metrics"]
    if published is None:
        raise ValueError(
            f"zoo variant {variant!r} has no published depth metrics to "
            "check against (see BASELINE.md provenance)"
        )
    if rtol is None:
        rtol = APPROX_RTOL if entry["approximate"] else PARITY_RTOL
    if int8:
        if measured.get("quant") != "int8":
            raise ValueError(
                "--int8 gate requested but the eval JSON declares "
                f"quant={measured.get('quant')!r} — produce it with "
                "`eval-depth --int8` (the gate must not grant the int8 "
                "tolerance to a float run)"
            )
        rtol += INT8_EXTRA_RTOL
    rows, ok = _compare_metrics(published, measured, rtol)
    report: Dict[str, Any] = {
        "variant": variant,
        "rtol": rtol,
        "int8": int8,
        "approximate_reference": entry["approximate"],
        "rows": rows,
        "parity": ok,
    }
    split = measured.get("split")
    if isinstance(split, dict) and not split.get("canonical", True):
        report["warning"] = (
            "measured metrics came from a NON-CANONICAL split "
            f"({split.get('n_frames')} frames) — not comparable to the "
            "published Eigen-697 table"
        )
        report["parity"] = False
    elif isinstance(split, dict) and not split.get("pinned", False):
        # A canonical CLAIM is only as good as the file it came from;
        # with no egress the canonical Eigen-697 list's identity cannot
        # be verified here, so the gate requires the operator to have
        # pinned it (`eval-depth --split-sha <sha256>`) — VERDICT r3
        # item 8. The hash travels in the provenance for later audit.
        report["pin_howto"] = CANONICAL_SPLIT_PIN_HOWTO
        if trust_split:
            # Loud escape (VERDICT r4 item 7): gate proceeds, provenance
            # says exactly what was taken on trust.
            report["split_trusted_unpinned"] = True
            report["warning"] = (
                "canonical-split claim accepted ON TRUST (--trust-split): "
                f"file sha256={split.get('sha256', '<hash>')} was never "
                "pinned against a verified canonical Eigen-697 list. This "
                "parity verdict is only as good as that file. Pin it "
                "properly on a networked machine (see pin_howto) and "
                "re-run with eval-depth --split-sha."
            )
        else:
            report["warning"] = (
                "split claims canonical but its SHA-256 was never pinned "
                "(re-run eval-depth with --split-sha "
                f"{split.get('sha256', '<hash>')} after verifying the "
                "file, or pass --trust-split to proceed on operator "
                "trust) — refusing the canonical claim. To obtain and "
                "pin the canonical list on a networked machine:\n"
                + CANONICAL_SPLIT_PIN_HOWTO
            )
            report["parity"] = False
    return report


def check_odom_parity(
    measured: Dict[str, Any],
    variant: str = "full_nyuv2",
    rtol: float = APPROX_RTOL,
) -> Dict[str, Any]:
    """Compare measured eval-odom output (``cli eval-odom``: a dict with
    ``sequence``, ``t_err_pct``, ``r_err_deg_per_100m``) against the zoo
    row's published devkit numbers for that sequence.

    Default tolerance is the widened one: the published odometry rows are
    [M]-confidence (BASELINE.md) and devkit errors are themselves
    trajectory-length-bucketed averages.
    """
    entry = ZOO[variant]
    om = entry["odom_metrics"]
    seq = str(measured.get("sequence", ""))
    if not om or seq not in om:
        raise ValueError(
            f"zoo variant {variant!r} publishes no odometry metrics for "
            f"sequence {seq!r} (has: {sorted(om) if om else 'none'})"
        )
    rows, ok = _compare_metrics(om[seq], measured, rtol)
    return {
        "variant": variant,
        "sequence": seq,
        "rtol": rtol,
        "rows": rows,
        "parity": ok,
    }


def import_commands(variant: str) -> list:
    """The exact CLI invocations (one per net — ``import-caffemodel``
    seats one ``.caffemodel`` at a time) to turn the reference's released
    weights for this variant into a depthvo checkpoint."""
    entry = ZOO[variant]
    return [
        f"depthvo import-caffemodel --variant {entry['train_variant']} "
        f"--net {net} --caffemodel {net}.caffemodel "
        f"--checkpoint-dir ./ckpt_{variant}"
        for net in entry["nets"]
    ]
