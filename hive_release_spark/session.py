"""SparkSession factory.

Replaces Hive's Driver/SessionState bootstrap (reference: Hive 2.3
``ql/session/SessionState`` + ``ql/Driver`` — SURVEY.md §3): in Spark the
whole compile/optimize/execute pipeline is provided by the session, so the
engine only configures it for scale and Hive-compatible semantics.

Scale posture (100 TB design point, BASELINE.md B5):
- AQE on: runtime partition coalescing, skew-join splitting, plan re-opt —
  Hive's SkewJoinOptimizer / CommonJoinResolver / SetReducerParallelism
  equivalents, for free (SURVEY.md §4.3).
- Arrow on: any unavoidable Python stage is vectorized, not row-at-a-time.
- Broadcast by threshold: Hive's ``hive.auto.convert.join`` analogue is
  ``spark.sql.autoBroadcastJoinThreshold`` (default 10 MB) — left at default
  so Catalyst auto-converts, queries additionally hint where the dim side is
  known-small.
- UTC session timezone: Hive TIMESTAMP is timezone-less wall clock
  (SURVEY.md §7.6.1); pinning UTC makes classic TimestampType behave like
  TimestampNTZ for parity.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def get_session(
    app_name: str = "hive_release_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    hive_parity: bool = True,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or get) a SparkSession configured for this engine.

    ``hive_parity=True`` applies Hive-2.3 semantic knobs (SURVEY.md §7.6):
    non-ANSI arithmetic (int overflow wraps, ``/`` never errors) and UTC
    session time. Queries in this repo are written to be correct under
    either setting.
    """
    builder = SparkSession.builder.appName(app_name)
    if master:
        builder = builder.master(master)
        if master.startswith("local"):
            # local mode = driver-only: the driver heap IS executor memory.
            # The 1g default causes GC thrash with 32 task threads.
            builder = builder.config("spark.driver.memory", "16g")
    conf: dict[str, str] = {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.execution.arrow.pyspark.enabled": "true",
        "spark.sql.session.timeZone": "UTC",
        # partition-size knobs sized so a partition fits executor memory at
        # scale; AQE coalesces small ones back together.
        "spark.sql.files.maxPartitionBytes": "256m",
        "spark.sql.parquet.filterPushdown": "true",
        # CBO join reordering kicks in once tables carry ANALYZE stats
        # (ddl.analyze) — Hive's CalcitePlanner cost path (SURVEY.md §4.2).
        "spark.sql.cbo.enabled": "true",
        "spark.sql.cbo.joinReorder.enabled": "true",
    }
    if shuffle_partitions is not None:
        conf["spark.sql.shuffle.partitions"] = str(shuffle_partitions)
    if hive_parity:
        conf["spark.sql.ansi.enabled"] = "false"
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
