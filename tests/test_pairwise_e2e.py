"""RUN_SLOW: launcher -> train -> test across the full 3-pair matrix.

The committed artifact (benchmarks/pairwise_r05.json) pins that this
path ran on the real chip; this test keeps the same launcher ->
subprocess-train -> conversion flow regression-checked on the CPU test
platform (small R). ~4 min, so gated behind RUN_SLOW like the full-size
dynamics pin.
"""

import json
import os
import subprocess
import sys

import pytest

if not os.environ.get("RUN_SLOW"):
    pytest.skip("set RUN_SLOW=1 to run the pairwise e2e", allow_module_level=True)

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_pairwise_launcher_end_to_end(tmp_path):
    out = tmp_path / "artifact.json"
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    subprocess.run(
        [sys.executable, os.path.join(_REPO, "benchmarks", "pairwise_run.py"),
         "--workdir", str(tmp_path / "work"),
         "--epochs", "1", "--n_utts", "2", "--residual_channels", "8",
         "--out", str(out)],
        check=True, env=env, cwd=_REPO, timeout=1800)
    with open(out) as f:
        a = json.load(f)
    assert len(a["pairs"]) == 3
    for row in a["pairs"]:
        assert row["conversions"] == 2
