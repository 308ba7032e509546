"""DDL / utility-statement surface (SURVEY.md §2.J).

Hive's DDL grammar (DDLSemanticAnalyzer: CREATE/ALTER/DROP DATABASE|
TABLE|VIEW, TRUNCATE, MSCK REPAIR, ANALYZE, EXPLAIN, SHOW, DESCRIBE) is
native Spark SQL — these helpers are thin, typed entry points proving
the passthrough and adding the engine's defaults. Out of scope exactly
as documented in the survey: indexes (deprecated upstream), GRANT/roles,
LOCK/UNLOCK, compaction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def create_database(spark: SparkSession, name: str) -> None:
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {name}")


def drop_database(spark: SparkSession, name: str, cascade: bool = True) -> None:
    spark.sql(f"DROP DATABASE IF EXISTS {name}" + (" CASCADE" if cascade else ""))


def create_table_as(
    spark: SparkSession, name: str, select_sql: str, fmt: str = "parquet"
) -> None:
    """CTAS — the Hive workhorse for materializing query results."""
    spark.sql(f"CREATE TABLE {name} USING {fmt} AS {select_sql}")


def create_external_table(
    spark: SparkSession, name: str, path: str, fmt: str = "parquet"
) -> None:
    """External table over an existing directory (Hive EXTERNAL TABLE:
    schema from footers, data stays in place)."""
    spark.sql(f"CREATE TABLE {name} USING {fmt} LOCATION '{path}'")


def create_view(spark: SparkSession, name: str, select_sql: str) -> None:
    spark.sql(f"CREATE OR REPLACE VIEW {name} AS {select_sql}")


def analyze(spark: SparkSession, table: str, columns: list[str] | None = None) -> None:
    """ANALYZE TABLE ... COMPUTE STATISTICS [FOR COLUMNS ...] — feeds
    Catalyst CBO (Hive StatsOptimizer / ColumnStatsSemanticAnalyzer
    analogue)."""
    stmt = f"ANALYZE TABLE {table} COMPUTE STATISTICS"
    if columns:
        stmt += " FOR COLUMNS " + ", ".join(columns)
    spark.sql(stmt)


def describe(spark: SparkSession, table: str, extended: bool = True) -> DataFrame:
    return spark.sql(f"DESCRIBE {'EXTENDED ' if extended else ''}{table}")


def show_tables(spark: SparkSession, db: str | None = None) -> DataFrame:
    return spark.sql(f"SHOW TABLES{f' IN {db}' if db else ''}")


def show_functions(spark: SparkSession, pattern: str | None = None) -> DataFrame:
    return spark.sql(f"SHOW FUNCTIONS{f' LIKE {pattern!r}' if pattern else ''}")


def explain(spark: SparkSession, sql: str, mode: str = "formatted") -> str:
    df = spark.sql(sql)
    return df._jdf.queryExecution().explainString(
        df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    )


def msck_repair(spark: SparkSession, table: str) -> None:
    """MSCK REPAIR TABLE — discover partitions added outside the catalog
    (Hive's partition-directory recovery)."""
    spark.sql(f"MSCK REPAIR TABLE {table}")


def truncate(spark: SparkSession, table: str) -> None:
    spark.sql(f"TRUNCATE TABLE {table}")


def create_materialized_view(
    spark: SparkSession, name: str, select_sql: str, fmt: str = "parquet"
) -> None:
    """Hive 2.3 CREATE MATERIALIZED VIEW (TOK_CREATE_MATERIALIZED_VIEW).

    2.3 has no automatic query rewrite (SURVEY.md §1.1), so the faithful
    mapping is: materialize the definition as a table and record the
    defining SQL in a table property so REFRESH can re-run it."""
    escaped = select_sql.replace("'", "''")
    spark.sql(
        f"CREATE TABLE {name} USING {fmt} "
        f"TBLPROPERTIES ('mv.definition' = '{escaped}') AS {select_sql}"
    )


def refresh_materialized_view(spark: SparkSession, name: str) -> None:
    """ALTER MATERIALIZED VIEW ... REBUILD analogue: re-run the recorded
    definition with INSERT OVERWRITE (atomic swap of the table contents)."""
    props = {r["key"]: r["value"] for r in spark.sql(f"SHOW TBLPROPERTIES {name}").collect()}
    definition = props.get("mv.definition")
    if definition is None:
        raise ValueError(f"{name} is not a materialized view (no mv.definition property)")
    spark.sql(f"INSERT OVERWRITE TABLE {name} {definition}")


def create_partitioned_materialized_view(
    spark: SparkSession,
    name: str,
    select_sql: str,
    partition_col: str,
    fmt: str = "parquet",
) -> None:
    """Materialized view whose output is PARTITIONED on one of its group
    columns — the layout that makes incremental REBUILD possible (each
    output partition depends only on the matching slice of the base)."""
    escaped = select_sql.replace("'", "''")
    spark.sql(
        f"CREATE TABLE {name} USING {fmt} PARTITIONED BY ({partition_col}) "
        f"TBLPROPERTIES ('mv.definition' = '{escaped}', "
        f"'mv.partition_col' = '{partition_col}') AS {select_sql}"
    )


def refresh_materialized_view_incremental(
    spark: SparkSession, name: str, partition_values: list
) -> None:
    """Incremental ALTER MATERIALIZED VIEW ... REBUILD: re-run the
    recorded definition restricted to the given partition values and
    dynamically overwrite ONLY those output partitions — at 100 TB the
    nightly refresh touches one day, not the table's history.

    Contract (documented, same as every incremental-view system): the
    definition must group by the partition column, so an output
    partition depends only on base rows with that value. Untouched
    partitions keep identical files (test-pinned)."""
    props = {
        r["key"]: r["value"] for r in spark.sql(f"SHOW TBLPROPERTIES {name}").collect()
    }
    definition = props.get("mv.definition")
    pcol = props.get("mv.partition_col")
    if definition is None or pcol is None:
        raise ValueError(f"{name} is not a partitioned materialized view")
    vals = ", ".join(f"'{v}'" for v in partition_values)
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        # dynamic mode + no PARTITION clause: only the partitions present
        # in the written data are replaced; SELECT * keeps the column
        # order positionally identical to the CTAS'd table schema
        spark.sql(
            f"INSERT OVERWRITE TABLE {name} "
            f"SELECT * FROM ({definition}) WHERE {pcol} IN ({vals})"
        )
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)


def add_columns(spark: SparkSession, table: str, cols: dict[str, str]) -> None:
    """ALTER TABLE ... ADD COLUMNS (Hive TOK_ALTERTABLE_ADDCOLS)."""
    spec = ", ".join(f"{c} {t}" for c, t in cols.items())
    spark.sql(f"ALTER TABLE {table} ADD COLUMNS ({spec})")


def rename_table(spark: SparkSession, old: str, new: str) -> None:
    """ALTER TABLE ... RENAME TO."""
    spark.sql(f"ALTER TABLE {old} RENAME TO {new}")


def add_partition(spark: SparkSession, table: str, spec: dict[str, str]) -> None:
    """ALTER TABLE ... ADD PARTITION (directory registered in the catalog)."""
    kv = ", ".join(f"{k} = '{v}'" for k, v in spec.items())
    spark.sql(f"ALTER TABLE {table} ADD IF NOT EXISTS PARTITION ({kv})")


def drop_partition(spark: SparkSession, table: str, spec: dict[str, str]) -> None:
    """ALTER TABLE ... DROP PARTITION."""
    kv = ", ".join(f"{k} = '{v}'" for k, v in spec.items())
    spark.sql(f"ALTER TABLE {table} DROP IF EXISTS PARTITION ({kv})")
