"""Model-zoo manifest + automated fidelity-gate checker.

Reference parity: the README model-zoo table (SURVEY.md §1 row 8) and
the BASELINE.md "within 1%" gate, as a one-command comparison.
"""

import json

import pytest

from depthvo_tpu import zoo


def _published():
    return dict(zoo.ZOO["full_nyuv2"]["depth_metrics"])


def test_parity_passes_within_one_percent():
    measured = {k: v * 1.009 for k, v in _published().items()}
    report = zoo.check_parity(measured, "full_nyuv2")
    assert report["parity"]
    assert all(r["status"] == "pass" for r in report["rows"])
    assert report["rtol"] == zoo.PARITY_RTOL  # exact [H] row -> 1%


def test_parity_fails_beyond_one_percent():
    measured = _published()
    measured["abs_rel"] *= 1.02
    report = zoo.check_parity(measured, "full_nyuv2")
    assert not report["parity"]
    failed = [r for r in report["rows"] if r["status"] == "FAIL"]
    assert [r["metric"] for r in failed] == ["abs_rel"]


def test_approximate_row_widens_tolerance():
    measured = {
        k: v * 1.03 for k, v in zoo.ZOO["temporal"]["depth_metrics"].items()
    }
    report = zoo.check_parity(measured, "temporal")
    assert report["rtol"] == zoo.APPROX_RTOL
    assert report["parity"]  # 3% off passes the widened 5% gate


def test_missing_metric_fails():
    measured = _published()
    del measured["rmse"]
    report = zoo.check_parity(measured, "full_nyuv2")
    assert not report["parity"]
    assert any(r["status"] == "missing" for r in report["rows"])


def test_non_canonical_split_poisons_parity():
    """Split provenance from eval-depth output must gate the check: a
    derived split's numbers are not comparable to the Eigen-697 table."""
    measured = _published()
    measured["split"] = {"canonical": False, "n_frames": 200}
    report = zoo.check_parity(measured, "full_nyuv2")
    assert not report["parity"]
    assert "NON-CANONICAL" in report["warning"]


def test_variant_without_published_metrics_raises():
    with pytest.raises(ValueError, match="no published depth metrics"):
        zoo.check_parity({}, "stereo")


def test_import_commands_cover_every_net():
    for name, entry in zoo.ZOO.items():
        cmds = zoo.import_commands(name)
        assert len(cmds) == len(entry["nets"])
        for net, cmd in zip(entry["nets"], cmds):
            assert f"--net {net}" in cmd
            assert f"--variant {entry['train_variant']}" in cmd


def test_cli_zoo_check_exit_codes(tmp_path, capsys):
    from depthvo_tpu import cli

    good = tmp_path / "good.json"
    good.write_text(json.dumps(_published()))
    assert cli.main(["zoo", "--check", str(good)]) == 0
    out = capsys.readouterr().out
    assert "pass" in out and "FAIL" not in out

    bad = tmp_path / "bad.json"
    measured = _published()
    measured["rmse"] *= 1.05
    bad.write_text(json.dumps(measured))
    assert cli.main(["zoo", "--check", str(bad)]) == 1
    assert "FAIL" in capsys.readouterr().out


def test_odom_parity_check():
    m = {"sequence": "09", "t_err_pct": 12.1, "r_err_deg_per_100m": 3.95}
    report = zoo.check_odom_parity(m, "full_nyuv2")
    assert report["parity"] and report["sequence"] == "09"
    m["t_err_pct"] = 14.0  # >5% off the published 11.9
    assert not zoo.check_odom_parity(m, "full_nyuv2")["parity"]
    with pytest.raises(ValueError, match="no odometry metrics"):
        zoo.check_odom_parity({"sequence": "05"}, "full_nyuv2")


def test_cli_zoo_check_routes_odom_json(tmp_path, capsys):
    from depthvo_tpu import cli

    f = tmp_path / "odom.json"
    f.write_text(json.dumps(
        {"sequence": "10", "t_err_pct": 12.6, "r_err_deg_per_100m": 3.48}
    ))
    assert cli.main(["zoo", "--check", str(f)]) == 0
    assert "t_err_pct" in capsys.readouterr().out


def test_cli_zoo_lists_table(capsys):
    from depthvo_tpu import cli

    assert cli.main(["zoo"]) == 0
    out = capsys.readouterr().out
    for name in zoo.ZOO:
        assert name in out
    assert "import-caffemodel" in out


def test_int8_gate_widens_tolerance_and_requires_declaration():
    """VERDICT r3 item 7: `zoo --check --int8` applies published + the
    declared serving budget (INT8_EXTRA_RTOL), and refuses float runs."""
    measured = {k: v * 1.03 for k, v in _published().items()}
    measured["quant"] = "int8"
    # 3% off fails the plain 1% gate but passes the int8 gate (1% + 3%).
    assert not zoo.check_parity(measured, "full_nyuv2")["parity"]
    report = zoo.check_parity(measured, "full_nyuv2", int8=True)
    assert report["parity"] and report["int8"]
    assert report["rtol"] == zoo.PARITY_RTOL + zoo.INT8_EXTRA_RTOL

    # Above the widened gate: still fails.
    worse = {k: v * 1.05 for k, v in _published().items()}
    worse["quant"] = "int8"
    assert not zoo.check_parity(worse, "full_nyuv2", int8=True)["parity"]

    # A float (or undeclared) run must not be granted the int8 budget.
    undeclared = {k: v * 1.03 for k, v in _published().items()}
    with pytest.raises(ValueError, match="quant"):
        zoo.check_parity(undeclared, "full_nyuv2", int8=True)
    undeclared["quant"] = "off"
    with pytest.raises(ValueError, match="quant"):
        zoo.check_parity(undeclared, "full_nyuv2", int8=True)


def test_cli_zoo_check_int8_flag(tmp_path, capsys):
    from depthvo_tpu import cli

    measured = {k: v * 1.03 for k, v in _published().items()}
    measured["quant"] = "int8"
    path = tmp_path / "int8.json"
    path.write_text(json.dumps(measured))
    assert cli.main(["zoo", "--check", str(path)]) == 1
    capsys.readouterr()
    assert cli.main(["zoo", "--check", str(path), "--int8"]) == 0
    assert "pass" in capsys.readouterr().out


def test_unpinned_canonical_claim_is_refused():
    """VERDICT r3 item 8: a canonical-split claim without a pinned
    SHA-256 is refused; pinned provenance passes."""
    measured = _published()
    measured["split"] = {
        "canonical": True, "n_frames": 697,
        "sha256": "ab" * 32, "pinned": False,
    }
    report = zoo.check_parity(measured, "full_nyuv2")
    assert not report["parity"]
    assert "pinned" in report["warning"]
    assert "ab" * 32 in report["warning"]  # tells the user what to pin

    measured["split"]["pinned"] = True
    assert zoo.check_parity(measured, "full_nyuv2")["parity"]


def test_trust_split_escape_is_loud():
    """VERDICT r4 item 7: --trust-split lets an unpinned canonical claim
    through the gate, but the report must record the trust decision and
    the file hash, and must always ship the networked pin recipe."""
    measured = _published()
    measured["split"] = {
        "canonical": True, "n_frames": 697,
        "sha256": "cd" * 32, "pinned": False,
    }
    refused = zoo.check_parity(measured, "full_nyuv2")
    assert not refused["parity"]
    # The refusal prints the exact one-liner flow for a networked machine.
    assert "pin_howto" in refused
    assert "eigen_test_files.txt" in refused["pin_howto"]
    assert "sha256sum" in refused["pin_howto"]
    assert "curl" in refused["warning"] or "eigen_test_files" in refused["warning"]

    trusted = zoo.check_parity(measured, "full_nyuv2", trust_split=True)
    assert trusted["parity"]  # gate proceeds...
    assert trusted["split_trusted_unpinned"] is True  # ...on the record
    assert "cd" * 32 in trusted["warning"]
    assert "TRUST" in trusted["warning"]
    assert "pin_howto" in trusted

    # A pinned run must NOT carry the trust markers.
    measured["split"]["pinned"] = True
    pinned = zoo.check_parity(measured, "full_nyuv2", trust_split=True)
    assert pinned["parity"]
    assert "split_trusted_unpinned" not in pinned
    assert "pin_howto" not in pinned


def test_cli_zoo_check_trust_split_flag(tmp_path, capsys):
    from depthvo_tpu import cli

    measured = _published()
    measured["split"] = {
        "canonical": True, "n_frames": 697,
        "sha256": "ef" * 32, "pinned": False,
    }
    path = tmp_path / "unpinned.json"
    path.write_text(json.dumps(measured))
    assert cli.main(["zoo", "--check", str(path)]) == 1
    capsys.readouterr()
    assert cli.main(["zoo", "--check", str(path), "--trust-split"]) == 0
    out = capsys.readouterr().out
    assert "ON TRUST" in out
