"""Bucketed range (interval) join — the batch scale path for
"left rows matching right rows within a time window".

Hive/Spark express this as an equi join plus a range RESIDUAL
(``l.key = r.key AND r.ts BETWEEN l.ts - w AND l.ts``); the engine's
sort-merge join then materializes every same-key pair before filtering —
quadratic in per-key activity, which is exactly what explodes on a hot
key at 100 TB. The inverted-file trick applies: quantize time into
buckets no finer than the window, join on ``(key, bucket)`` equality,
and keep the range predicate as a residual. Each left row EXPLODES the
(at most ``ceil(w/G)+1``) buckets its window covers; each right row
carries its ONE home bucket, so every qualifying pair is produced
exactly once — no distinct step needed — and the candidate set shrinks
from |same-key pairs| to |same-(key, adjacent-bucket) pairs|.

This is the batch twin of the stream-stream interval join
(`streaming_batch.stream_stream_join`, whose state store does the same
time-bucketed pruning via watermarks).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def range_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    window_seconds: int,
    bucket_seconds: int | None = None,
) -> DataFrame:
    """All (left, right) pairs with equal ``key`` and
    ``right_ts ∈ [left_ts - window, left_ts]`` (inclusive-exclusive on
    neither end deliberately: both ends inclusive matches the common
    attribution-SQL ``BETWEEN``). Returns left.* + right.* columns
    (right's prefixed ``r_`` where names collide).

    bucket_seconds defaults to window_seconds (the optimum when windows
    are uniform: ≤ 2 buckets per left row)."""
    g = bucket_seconds or window_seconds
    if g < window_seconds:
        # finer buckets mean MORE exploded rows per left row with no
        # candidate reduction — never correct to go below the window
        raise ValueError("bucket_seconds must be >= window_seconds")
    lsec = F.unix_timestamp(F.col(left_ts))
    rsec = F.unix_timestamp(F.col(right_ts))

    lo_bucket = F.floor((lsec - window_seconds) / g)
    hi_bucket = F.floor(lsec / g)
    lx = left.withColumn(
        "_bucket", F.explode(F.sequence(lo_bucket, hi_bucket))
    )
    rename = {
        c: f"r_{c}" for c in right.columns if c in left.columns and c != key
    }
    rx = right
    for old, new in rename.items():
        rx = rx.withColumnRenamed(old, new)
    r_ts_col = rename.get(right_ts, right_ts)
    rx = rx.withColumn("_bucket", F.floor(F.unix_timestamp(F.col(r_ts_col)) / g))

    # Residual on the FULL-precision timestamps (unix_timestamp truncates
    # to seconds — bucketing may quantize, the predicate must not). The
    # second-truncated buckets still cover every qualifying pair:
    # floor(x - w) >= floor(x) - w for integer w.
    residual: Column = (
        F.col(r_ts_col) >= F.col(left_ts) - F.expr(f"INTERVAL {window_seconds} SECOND")
    ) & (F.col(r_ts_col) <= F.col(left_ts))
    return lx.join(rx, [key, "_bucket"]).filter(residual).drop("_bucket")
