"""Storage formats & connectors (SURVEY.md §2.G).

Hive's SerDe matrix → Spark datasources:

| Hive (2.3 release jars)                         | here              |
|-------------------------------------------------|-------------------|
| LazySimpleSerDe delimited text                  | ``delimited``     |
| OpenCSVSerde                                    | ``csv``           |
| JsonSerDe / get_json_object                     | ``json``          |
| ORC (OrcInputFormat/OrcSerde)                   | ``orc``           |
| Parquet (ParquetHiveSerDe)                      | ``parquet``       |
| AvroSerDe                                       | ``avro`` (probed) |
| RegexSerDe                                      | ``read_regex``    |
| RCFile/SequenceFile (legacy row/columnar)       | mapped to orc/parquet (documented) |
| JDBC (Hive is server-side only; Spark reads too)| ``jdbc`` passthrough |

Partitioned/bucketed/sorted writes + dynamic partition overwrite map
Hive's FileSinkOperator + SortedDynPartitionOptimizer surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_BASIC_FORMATS = ("parquet", "orc", "json", "csv", "text")


def avro_available(spark: SparkSession) -> bool:
    """spark-avro is an external module; probe instead of assuming."""
    try:
        spark.read.format("avro").load("/nonexistent-avro-probe")
    except Exception as e:  # noqa: BLE001
        # DATA_SOURCE_NOT_FOUND wording: "Failed to find data source: avro"
        return "Failed to find data source: avro" not in str(e)
    return True


def require_avro(spark: SparkSession) -> None:
    """Loud gate for the Avro path (Hive AvroSerDe — SURVEY.md §2.G).

    The reader/writer code is format-generic and works as soon as the
    spark-avro datasource is on the classpath; this environment ships only
    the core avro-*.jar libraries, not the datasource module."""
    if not avro_available(spark):
        raise RuntimeError(
            "Avro support requires the spark-avro datasource jar "
            "(org.apache.spark:spark-avro_2.13) on the Spark classpath; "
            "/opt/spark/jars has only the core avro libraries. Add the jar "
            "via spark.jars / spark.jars.packages and retry."
        )


def write_table(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    options: dict[str, str] | None = None,
) -> None:
    """FileSinkOperator analogue: INSERT OVERWRITE/INTO DIRECTORY with
    dynamic partitions (``partition_by``)."""
    w = df.write.format(fmt).mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    for k, v in (options or {}).items():
        w = w.option(k, v)
    w.save(path)


def read_table(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema=None,
    options: dict[str, str] | None = None,
) -> DataFrame:
    r = spark.read.format(fmt)
    if schema is not None:
        r = r.schema(schema)
    for k, v in (options or {}).items():
        r = r.option(k, v)
    return r.load(path)


def write_delimited(
    df: DataFrame, path: str, sep: str = "\x01", mode: str = "overwrite"
) -> None:
    """Hive LazySimpleSerDe default: ^A-delimited text."""
    df.write.mode(mode).option("sep", sep).option("header", "false").csv(path)


def read_delimited(spark: SparkSession, path: str, schema, sep: str = "\x01") -> DataFrame:
    return spark.read.schema(schema).option("sep", sep).csv(path)


def read_regex(
    spark: SparkSession, path: str, pattern: str, columns: list[str]
) -> DataFrame:
    """RegexSerDe analogue: raw text lines parsed by regexp_extract into
    the declared columns (schema-on-read, exactly Hive's model)."""
    lines = spark.read.text(path)
    return lines.select(
        *[
            F.regexp_extract("value", pattern, i + 1).alias(c)
            for i, c in enumerate(columns)
        ]
    )


def write_bucketed_table(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    num_buckets: int,
    sort_cols: list[str] | None = None,
    fmt: str = "parquet",
    path: str | None = None,
) -> None:
    """CLUSTERED BY (..) SORTED BY (..) INTO N BUCKETS — enables
    shuffle-free joins/aggs between co-bucketed tables. NOTE (SURVEY.md
    §7.6.3): Spark's bucket hash (Murmur3) ≠ Hive's ObjectInspector hash,
    so layouts are Spark-internal, not byte-compatible with Hive."""
    w = df.write.format(fmt).mode("overwrite").bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    if path:
        w = w.option("path", path)
    w.saveAsTable(table_name)
