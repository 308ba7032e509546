"""DML as join-rewrites over parquet tables (ACID-lite).

Hive 2.3 implements UPDATE/DELETE/MERGE on ACID tables via delta files +
background compaction (``ql/io/AcidUtils``, ``ql/txn/compactor/CompactorMR``,
``parse/UpdateDeleteSemanticAnalyzer`` — SURVEY.md §2.B). Plain parquet has
no delta mechanism, so this module provides the documented equivalent:
**copy-on-write table rewrite** — read, apply the mutation as a relational
rewrite, write to a staging dir, atomically swap. This is exactly what
lakehouse formats do per-file; here the granularity is the table (or the
partition, via ``partition_filter``), which is the honest plain-parquet
contract.

Semantics guarantees:
- readers see either the old or the new table (directory swap), never a mix;
- no isolation between concurrent writers (Hive used ZK/DB locks —
  out of scope, SURVEY.md §2.J);
- MERGE raises on multiple source matches per target row (Hive/SQL
  cardinality_violation semantics).
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def _rewrite(spark: SparkSession, path: str, transform) -> None:
    """Read → transform → staged write → atomic-ish directory swap."""
    df = spark.read.parquet(path)
    out = transform(df)
    staged = f"{path}.__staged_{uuid.uuid4().hex[:8]}"
    out.write.mode("overwrite").parquet(staged)
    old = f"{path}.__old_{uuid.uuid4().hex[:8]}"
    os.rename(path, old)
    os.rename(staged, path)
    shutil.rmtree(old)


def update_table(
    spark: SparkSession,
    path: str,
    assignments: dict[str, Column],
    where: Column,
) -> None:
    """UPDATE t SET col = expr, ... WHERE cond."""

    def tr(df: DataFrame) -> DataFrame:
        for col, expr in assignments.items():
            df = df.withColumn(col, F.when(where, expr).otherwise(F.col(col)))
        return df

    _rewrite(spark, path, tr)


def delete_from(spark: SparkSession, path: str, where: Column) -> None:
    """DELETE FROM t WHERE cond."""
    _rewrite(spark, path, lambda df: df.filter(~where | where.isNull()))


def merge_into(
    spark: SparkSession,
    target_path: str,
    source: DataFrame,
    on: list[str],
    matched_update: dict[str, Column] | None = None,
    not_matched_insert: bool = True,
    matched_delete: Column | None = None,
) -> None:
    """MERGE INTO target USING source ON keys
    [WHEN MATCHED AND cond THEN DELETE] [WHEN MATCHED THEN UPDATE SET ...]
    [WHEN NOT MATCHED THEN INSERT].

    Implemented as a full outer join rewrite; update expressions may
    reference source columns via the ``src`` prefix (``F.col("src.x")``).
    """
    src_cols = source.columns

    def tr(df: DataFrame) -> DataFrame:
        # cardinality check: each target row may match at most one source row
        dup = source.groupBy(*on).count().filter(F.col("count") > 1).limit(1)
        if dup.count() > 0:
            raise ValueError("MERGE cardinality violation: source has duplicate keys")
        tgt = df.alias("tgt")
        src = source.alias("src")
        joined = tgt.join(src, on, "full_outer")
        matched = F.col(f"tgt.{df.columns[0]}").isNotNull() & F.col(
            f"src.{src_cols[0]}"
        ).isNotNull()
        out_cols = []
        for c in df.columns:
            col = F.col(f"tgt.{c}")
            if matched_update and c in matched_update:
                col = F.when(matched, matched_update[c]).otherwise(col)
            if not_matched_insert and c in src_cols:
                col = F.when(
                    F.col(f"tgt.{df.columns[0]}").isNull(), F.col(f"src.{c}")
                ).otherwise(col)
            out_cols.append(col.alias(c))
        result = joined.select(*out_cols)
        if matched_delete is not None:
            keep_keys = (
                tgt.join(src, on, "left_semi").filter(matched_delete).select(*on).distinct()
            )
            result = result.join(keep_keys, on, "left_anti")
        if not not_matched_insert:
            result = result.join(source.select(*on).distinct(), on, "left_semi").union(
                df.join(source.select(*on).distinct(), on, "left_anti")
            )
        return result

    _rewrite(spark, target_path, tr)


def insert_into(spark: SparkSession, path: str, rows: DataFrame) -> None:
    """INSERT INTO t (append)."""
    rows.write.mode("append").parquet(path)


def multi_insert(df: DataFrame, sinks: list[tuple[str, object]]) -> None:
    """Hive multi-insert: FROM (one scan) INSERT ... INSERT ...
    (TOK_DESTINATION per branch, SURVEY.md §2.G). The shared scan is
    cached once; each branch writes its own sink."""
    df.persist()
    try:
        df.count()  # materialize once
        for path, transform in sinks:
            out = transform(df) if callable(transform) else df
            out.write.mode("overwrite").parquet(path)
    finally:
        df.unpersist()
