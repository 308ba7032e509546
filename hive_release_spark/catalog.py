"""Catalog: parquet-backed table registry.

The Hive metastore (reference: ``hive-metastore-2.3.10.jar`` Thrift service,
SURVEY.md §1.1) maps databases/tables/partitions to directories; Spark's
catalog + parquet datasource provide the same mapping natively. This module
is the thin layer that registers the driver testdata
(``/root/testdata/sf*/{table}.parquet`` — TESTDATA.md) as queryable views.

At 100 TB these would be real external tables (``saveAsTable`` +
``partitionBy``/``bucketBy``); the loader keeps that path open by accepting
any directory layout where ``{name}.parquet`` exists.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# The ten driver tables (TESTDATA.md / FIXTURES.md group A).
TABLES: tuple[str, ...] = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


# events.ts unit handling. The fixture has stored ``ts`` as parquet
# TIMESTAMP(NANOS) in some generations and TIMESTAMP(MICROS) in others
# (FIXTURES.md has been stale before), so the loader sniffs the parquet
# logical type from the file footer instead of trusting documentation:
#   * timestamp[us]/[ms]/[s]  -> Spark reads it natively; no conversion.
#   * timestamp[ns]           -> Spark 4 rejects NANOS at schema inference
#     under default configs; read the column as raw int64 nanos with an
#     explicit schema and convert with exact integer division.
_EVENTS_RAW_NS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.LongType()),  # nanos since epoch
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)

_events_ts_unit_cache: dict[str, str] = {}


def events_ts_unit(path: str) -> str:
    """Return the parquet time unit ('ns', 'us', 'ms', 's') of events.ts.

    Reads only the file footer (cheap), cached per path. Self-verifying by
    design: if the driver regenerates the fixture with a different unit the
    loader adapts instead of silently corrupting every event-time operator.
    """
    unit = _events_ts_unit_cache.get(path)
    if unit is None:
        import pyarrow.parquet as pq

        field = pq.read_schema(path).field("ts")
        type_str = str(field.type)
        if not type_str.startswith("timestamp["):
            raise ValueError(
                f"events.ts at {path} has unexpected parquet type {type_str!r}; "
                "expected a timestamp logical type"
            )
        # Validate the tz flag too, not just the unit: a tz-adjusted
        # (isAdjustedToUTC=true) fixture would make the batch reader infer
        # TIMESTAMP_LTZ while the stream schema forces NTZ, silently
        # breaking the "identical schema on both paths" contract the NTZ
        # cast below relies on. Fail loudly instead.
        if getattr(field.type, "tz", None) is not None:
            raise ValueError(
                f"events.ts at {path} is tz-adjusted (tz={field.type.tz!r}); "
                "the loader's batch/stream schema contract requires a "
                "tz-naive (isAdjustedToUTC=false) timestamp"
            )
        unit = type_str[len("timestamp[") :].split("]")[0].split(",")[0]
        _events_ts_unit_cache[path] = unit
    return unit


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one table (Hive TableScanOperator analogue — SURVEY.md §2.A).

    Column pruning and predicate pushdown happen automatically once callers
    ``select``/``filter`` on the returned frame.
    """
    path = table_path(sf_dir, name)
    if name == "events" and events_ts_unit(path) == "ns":
        df = spark.read.schema(_EVENTS_RAW_NS_SCHEMA).parquet(path)
        # Cast to NTZ so both unit paths return the identical schema
        # (session tz is pinned UTC, so the cast is value-preserving).
        return df.withColumn(
            "ts", F.timestamp_micros(F.expr("ts DIV 1000")).cast(T.TimestampNTZType())
        )
    return spark.read.parquet(path)


def register_views(spark: SparkSession, sf_dir: str, tables: tuple[str, ...] = TABLES) -> None:
    """Register every table as a temp view so ``spark.sql`` works on them."""
    for name in tables:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
