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


# events.ts is parquet TIMESTAMP(NANOS) (FIXTURES.md), which Spark 4 rejects
# at schema inference under default configs. Read it as raw nanos with an
# explicit schema (works on any session, no config needed) and convert to a
# microsecond timestamp with exact integer division.
_EVENTS_RAW_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.LongType()),  # nanos since epoch
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one table (Hive TableScanOperator analogue — SURVEY.md §2.A).

    Column pruning and predicate pushdown happen automatically once callers
    ``select``/``filter`` on the returned frame.
    """
    path = table_path(sf_dir, name)
    if name == "events":
        df = spark.read.schema(_EVENTS_RAW_SCHEMA).parquet(path)
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    return spark.read.parquet(path)


def register_views(spark: SparkSession, sf_dir: str, tables: tuple[str, ...] = TABLES) -> None:
    """Register every table as a temp view so ``spark.sql`` works on them."""
    for name in tables:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
