"""In-suite exercise of the scaling harness (the parallel_test.c analogue —
SURVEY §4: the reference prints per-stage thread scaling; here the harness
itself is executed so pod runs inherit a known-good tool)."""

import json
import os
import subprocess
import sys

import pytest


@pytest.mark.parametrize("mode,solver", [("dp", "rslqr"), ("sp", "rslqr"), ("sp", "pscan")])
def test_bench_scaling_runs(mode, solver):
    env = dict(
        os.environ,
        SCALE_DEVICES="1,2",
        SCALE_BATCH="4",
        SCALE_HORIZON="16",
        SCALE_MODE=mode,
        SCALE_SOLVER=solver,
        SCALE_REPS="1",
        SCALE_CHAIN="2",
        SCALE_PLATFORM="cpu",
    )
    out = subprocess.run(
        [sys.executable, "bench_scaling.py"],
        capture_output=True,
        text=True,
        env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        timeout=900,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    lines = [json.loads(l) for l in out.stdout.strip().splitlines()]
    assert len(lines) == 2  # one JSON line per device count
    for rec in lines:
        assert rec["value"] > 0
        assert "efficiency_vs_1dev" in rec
