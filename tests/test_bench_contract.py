"""bench.py must emit exactly one JSON line with the driver's expected
fields — run at sf0.001 in a subprocess (the driver invokes it the same
way at sf0.1)."""

from __future__ import annotations

import json
import os
import subprocess
import sys


def test_bench_emits_single_json_line(tmp_path):
    env = dict(os.environ)
    env["SPARK_GRAFT_SF_DIR"] = "/root/testdata/sf0.001"
    env["SPARK_GRAFT_CPUS"] = "8"
    env["SPARK_GRAFT_BENCH_RUNS"] = "2"  # keep the toy run inside the timeout
    # keep the committed sf0.1 sidecar out of reach of this toy run
    env["SPARK_GRAFT_DETAIL_PATH"] = str(tmp_path / "BENCH_DETAIL.json")
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
    # r2 lesson: a valid-but-long line overflowed the driver's stdout
    # tail capture ("parsed": null) — the line must stay compact.
    assert len(lines[0]) <= 2000, f"bench line too long ({len(lines[0])} chars)"
    d = json.loads(lines[0])
    assert d["unit"] == "sec"
    assert d["sf"] == 0.001
    assert isinstance(d["value"], (int, float)) and d["value"] > 0
    # stdout carries only the top-10 slowest; the full map is in the sidecar
    assert 1 <= len(d["queries"]) <= 10
    assert all(isinstance(v, (int, float)) for v in d["queries"].values())
    assert d["n_queries"] >= 40
    with open(tmp_path / "BENCH_DETAIL.json") as f:
        detail = json.load(f)
    assert len(detail["queries"]) == d["n_queries"]
    assert set(detail["spread"]) == set(detail["queries"])
    assert detail["runs_per_query"] == 2  # honored from the env override
    # one-time artifact builds must be split out, not hidden in timings
    one_time = [
        n for n, s in detail["phase_split"].items() if s.get("one_time")
    ]
    assert "dedup_canonical_docs" in one_time or "dedup_cluster_assign" in one_time
