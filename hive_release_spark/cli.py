"""SQL CLI — the Hive CLI / beeline analogue (SURVEY.md §3 entry point
#2: ``hive-cli-2.3.10.jar :: CliDriver``).

Runs ad-hoc SQL over the registered testdata views (or any parquet
directory) and prints results. The server-side analogue (HS2/Thrift)
is Spark Thrift Server — same TCLIService protocol, started with
``$SPARK_HOME/sbin/start-thriftserver.sh`` against this session config;
documented rather than embedded (a daemon doesn't belong in a library).

Usage:
    python -m hive_release_spark.cli "SELECT count(*) FROM lineitem"
    python -m hive_release_spark.cli --sf /root/testdata/sf0.01 -e "..."
    echo "SELECT 1; SELECT 2;" | python -m hive_release_spark.cli -
"""

from __future__ import annotations

import argparse
import sys

from hive_release_spark.catalog import DEFAULT_SF_DIR, register_views
from hive_release_spark.session import get_session


def run_statements(spark, sql_text: str, max_rows: int = 100) -> None:
    for stmt in [s.strip() for s in sql_text.split(";") if s.strip()]:
        df = spark.sql(stmt)
        df.show(n=max_rows, truncate=False)


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description="hive_release_spark SQL CLI")
    ap.add_argument("sql", nargs="?", help="SQL text, or '-' to read stdin")
    ap.add_argument("-e", dest="expr", help="SQL text (hive -e style)")
    ap.add_argument("--sf", default=DEFAULT_SF_DIR, help="testdata dir to register")
    ap.add_argument("--max-rows", type=int, default=100)
    args = ap.parse_args(argv)

    sql_text = args.expr or args.sql
    if sql_text == "-":
        sql_text = sys.stdin.read()
    if not sql_text:
        ap.error("no SQL given (positional, -e, or '-' for stdin)")

    spark = get_session(
        master="local[*]",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    register_views(spark, args.sf)
    run_statements(spark, sql_text, args.max_rows)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
