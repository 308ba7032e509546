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


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one table (Hive TableScanOperator analogue — SURVEY.md §2.A).

    Column pruning and predicate pushdown happen automatically once callers
    ``select``/``filter`` on the returned frame.
    """
    return spark.read.parquet(table_path(sf_dir, name))


def register_views(spark: SparkSession, sf_dir: str, tables: tuple[str, ...] = TABLES) -> None:
    """Register every table as a temp view so ``spark.sql`` works on them."""
    for name in tables:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
