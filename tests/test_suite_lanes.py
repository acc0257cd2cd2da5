"""The fast/slow lane split (VERDICT r4 item 5) stays disjoint + complete.

The default `pytest -q` run deselects `slow`-marked tests (pyproject
addopts); `pytest -m slow` runs only them. A typo'd marker expression or
an unregistered marker would silently drop tests from BOTH lanes — this
test collects each lane and checks their union equals an unfiltered
collection, so the split can never lose coverage.
"""

import os
import subprocess
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _collect(marker_expr: str | None) -> set:
    argv = [sys.executable, "-m", "pytest", "tests/", "--collect-only", "-q",
            "--no-header", "-p", "no:cacheprovider"]
    if marker_expr is not None:
        argv += ["-m", marker_expr]
    env = dict(os.environ, PYTHONPATH=_REPO)
    r = subprocess.run(argv, cwd=_REPO, capture_output=True, text=True,
                       timeout=300)
    assert r.returncode in (0, 5), r.stdout[-2000:] + r.stderr[-2000:]
    return {
        line.strip() for line in r.stdout.splitlines()
        if "::" in line and not line.startswith("=")
    }


def test_lanes_are_disjoint_and_complete():
    fast = _collect(None)          # addopts default: -m 'not slow'
    slow = _collect("slow")        # later -m wins over addopts
    every = _collect("slow or not slow")
    assert fast, "fast lane collected nothing"
    assert slow, "slow lane collected nothing — marker lost?"
    assert fast.isdisjoint(slow)
    assert fast | slow == every
    # The fast lane is the point: the cluster tests must not be in it.
    assert not any("test_multiprocess" in t and "local_slice" not in t
                   for t in fast)
