"""Z-order clustered writes (sources/layout.py): correctness (same rows)
and EFFECTIVENESS — after z-ordering on (x, y), every file's parquet
footer must carry narrow min/max ranges on BOTH columns, which is what
makes engine-side row-group pruning fire for either predicate. Measured
from the real file footers, not asserted from the plan."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from hive_release_spark.sources.layout import write_zordered


def _per_file_spans(path: str, col: str) -> list[float]:
    spans = []
    for f in sorted(glob.glob(f"{path}/part-*.parquet")):
        md = pq.ParquetFile(f).metadata
        lo, hi = None, None
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                c = md.row_group(rg).column(ci)
                if c.path_in_schema == col and c.statistics is not None:
                    lo = c.statistics.min if lo is None else min(lo, c.statistics.min)
                    hi = c.statistics.max if hi is None else max(hi, c.statistics.max)
        if lo is not None:
            spans.append(float(hi - lo))
    return spans


def test_zorder_write_narrows_file_ranges_on_both_columns(spark, tmp_path):
    # x and y are decorrelated: a single-column sort would give narrow x
    # ranges but full-range y (and vice versa); z-order narrows BOTH.
    df = spark.range(0, 20_000).select(
        F.col("id"),
        (F.col("id") % 1000).cast("double").alias("x"),
        ((F.col("id") * 7919) % 1000).cast("double").alias("y"),
    )
    plain = str(tmp_path / "plain")
    zord = str(tmp_path / "zord")
    df.repartition(16).write.parquet(plain)  # hash layout: every file spans everything
    write_zordered(df, zord, ["x", "y"], n_files=16)

    # correctness: identical row multiset
    a = sorted(tuple(r) for r in spark.read.parquet(zord).collect())
    b = sorted(tuple(r) for r in df.collect())
    assert a == b

    for col in ("x", "y"):
        plain_spans = _per_file_spans(plain, col)
        z_spans = _per_file_spans(zord, col)
        assert plain_spans and z_spans
        avg_plain = sum(plain_spans) / len(plain_spans)
        avg_z = sum(z_spans) / len(z_spans)
        # 16 files over a 2-D z-curve → each file covers ~1/4 of each
        # axis; demand at least a 2x narrowing vs the hash layout
        assert avg_z < 0.5 * avg_plain, (col, avg_z, avg_plain)
