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
