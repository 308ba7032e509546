"""CLI entry point (Hive CliDriver analogue — SURVEY.md §3): statement
splitting and end-to-end subprocess invocation."""

from __future__ import annotations

import subprocess
import sys
from pathlib import Path

from hive_release_spark.catalog import register_views
from hive_release_spark.cli import run_statements
from tests.conftest import SF_SMOKE

REPO = Path(__file__).resolve().parent.parent


def test_run_statements_splits_and_executes(spark, capsys):
    register_views(spark, SF_SMOKE)
    run_statements(spark, "SELECT 1 AS one; SELECT count(*) AS n FROM region;")
    out = capsys.readouterr().out
    assert "one" in out and "|1  |" in out
    assert "|5  |" in out  # region always has 5 rows


def test_cli_subprocess_end_to_end():
    out = subprocess.run(
        [sys.executable, "-m", "hive_release_spark.cli",
         "--sf", SF_SMOKE, "-e", "SELECT n_name FROM nation ORDER BY n_name LIMIT 1"],
        capture_output=True, text=True, cwd=str(REPO), timeout=240,
    )
    assert out.returncode == 0, out.stderr[-1500:]
    assert "NATION_0" in out.stdout  # synthetic corpus nation names
