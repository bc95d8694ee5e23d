"""bench.py must emit exactly one JSON line with the driver's expected
fields — run at sf0.001 in a subprocess (the driver invokes it the same
way at sf0.1)."""

from __future__ import annotations

import json
import os
import subprocess
import sys


def test_bench_emits_single_json_line():
    env = dict(os.environ)
    env["SPARK_GRAFT_SF_DIR"] = "/root/testdata/sf0.001"
    env["SPARK_GRAFT_CPUS"] = "8"
    proc = subprocess.run(
        [sys.executable, "bench.py"],
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    lines = [ln for ln in proc.stdout.strip().splitlines() if ln.strip()]
    assert len(lines) == 1, f"expected one stdout line, got {len(lines)}"
    d = json.loads(lines[0])
    assert d["unit"] == "sec"
    assert d["sf"] == 0.001
    assert isinstance(d["value"], (int, float)) and d["value"] > 0
    assert len(d["queries"]) >= 40
    assert all(isinstance(v, (int, float)) for v in d["queries"].values())
