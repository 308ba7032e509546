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
