"""Streaming ingest sink + compaction (SURVEY.md §2.K last row): the
Hive 'HCatalog streaming ingest into ACID table + compactor' analogue —
foreachBatch appends micro-batches to a parquet table, a compaction
rewrite consolidates small files, counts stay exact throughout."""

from __future__ import annotations

import glob

from hive_release_spark.streaming import pipelines as P
from tests.conftest import SF_SMOKE


def test_foreachbatch_ingest_then_compact(spark, tmp_path):
    table = str(tmp_path / "ingested")

    def write_batch(batch_df, batch_id: int) -> None:
        # repartition(4) simulates many writers → many small files
        batch_df.repartition(4).write.mode("append").parquet(table)

    stream = P.load_events_stream(spark, SF_SMOKE)
    q = (
        stream.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    q.stop()

    n_files_before = len(glob.glob(f"{table}/part-*"))
    total = spark.read.parquet(table).count()
    assert total == 1000  # sf0.001 events
    assert n_files_before >= 4

    # compactor pass (Hive CompactorMR analogue): rewrite to few files
    compacted = str(tmp_path / "compacted")
    spark.read.parquet(table).coalesce(1).write.parquet(compacted)
    assert len(glob.glob(f"{compacted}/part-*")) == 1
    assert spark.read.parquet(compacted).count() == total


def test_foreachbatch_cdc_merge_upsert(spark, tmp_path):
    """Streaming CDC upsert — the 'streaming ingest into an ACID table'
    contract end-to-end: each micro-batch MERGEs into a parquet target
    (latest event per user wins) instead of blind-appending, so the
    table holds one current row per key at every point. Exercises
    streaming + dml.merge_into + the copy-on-write commit together;
    final state must equal the batch-computed last-event-per-user."""
    import os

    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from hive_release_spark.catalog import load_table
    from hive_release_spark.operators import dml

    table = str(tmp_path / "user_state")

    def upsert_batch(batch_df, batch_id: int) -> None:
        # reduce the micro-batch to one row per key (MERGE cardinality
        # contract), latest ts wins with event_id as the tie-break
        latest = (
            batch_df.withColumn(
                "_r",
                F.row_number().over(
                    W.partitionBy("user_id").orderBy(
                        F.col("ts").desc(), F.col("event_id").desc()
                    )
                ),
            )
            .filter(F.col("_r") == 1)
            .select("user_id", "ts", "event_type", "value", "event_id")
        )
        if not os.path.isdir(table):
            latest.write.parquet(table)
            return
        dml.merge_into(
            spark,
            table,
            latest,
            on=["user_id"],
            matched_update={
                c: F.col(f"src.{c}") for c in ("ts", "event_type", "value", "event_id")
            },
            not_matched_insert=True,
        )

    stream = P.load_events_stream(spark, SF_SMOKE)
    q = (
        stream.writeStream.foreachBatch(upsert_batch)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .option("maxFilesPerTrigger", "1")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    q.stop()

    got = spark.read.parquet(table)
    ev = load_table(spark, SF_SMOKE, "events")
    expect = (
        ev.withColumn(
            "_r",
            F.row_number().over(
                W.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
            ),
        )
        .filter(F.col("_r") == 1)
        .select("user_id", "ts", "event_id")
    )
    assert got.count() == expect.count()  # one row per user
    joined = got.select("user_id", "ts", "event_id").exceptAll(expect)
    assert joined.count() == 0, joined.limit(5).collect()
