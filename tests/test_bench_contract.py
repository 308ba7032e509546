"""Driver-contract guard for bench.py: must print exactly one JSON line
with the agreed keys. Runs the real script in a subprocess at sf0.001
(small but end-to-end — a broken bench costs a whole driver round)."""

from __future__ import annotations

import json
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def test_bench_prints_one_json_line():
    env = dict(os.environ)
    env["SPARK_GRAFT_SF_DIR"] = "/root/testdata/sf0.001"
    env["SPARK_GRAFT_CPUS"] = "4"
    out = subprocess.run(
        [sys.executable, str(REPO / "bench.py")],
        capture_output=True,
        text=True,
        timeout=420,
        cwd=str(REPO),
        env=env,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    lines = [ln for ln in out.stdout.strip().splitlines() if ln.strip()]
    assert len(lines) == 1, f"expected one JSON line, got: {lines}"
    payload = json.loads(lines[0])
    assert payload["unit"] == "sec"
    assert payload["sf"] == 0.001
    assert payload["value"] > 0
    assert set(payload) >= {"metric", "value", "unit", "queries", "sf"}
    assert len(payload["queries"]) >= 12  # r02: headline set widened (VERDICT #10)
    assert all(v >= 0 for v in payload["queries"].values())
