"""MatchPath: row-sequence pattern matching over ordered partitions.

Hive ships this as the one nontrivial custom PTF (``ql/udf/ptf/
MatchPath.java`` — SURVEY.md §2.D): within each partition, ordered rows
are mapped to symbols and a path expression is matched over the symbol
sequence. Spark has no built-in equivalent (MATCH_RECOGNIZE is absent),
so this is the designed escape hatch: ``applyInPandas`` per partition —
one shuffle on the partition key, regex over the in-memory ordered
partition, Arrow both ways. Partition = one user/session: bounded state,
scales horizontally.

KNOWN BOUNDARY LIMIT (r12 temporal axis, canary-pinned in
tests/test_empty_input.py): the Arrow→pandas input conversion maps
timestamp columns to datetime64[ns], which OVERFLOWS for values past
2262-04-11 — a corrupt far-future timestamp anywhere in the frame
kills the whole task. Callers should ship timestamps across this
boundary as int64 µs (``unix_micros``) — order-identical, lossless,
corruption-proof; see queries/coverage.py::ptf_matchpath.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def match_path(
    df: DataFrame,
    partition_cols: list[str],
    order_cols: list[str],
    symbol: Column,
    pattern: str,
) -> DataFrame:
    """Return the rows participating in any (non-overlapping) match of
    ``pattern`` over the per-partition symbol string, annotated with
    ``match_pos`` (0-based offset within the match).

    ``symbol`` must evaluate to a single character per row. Rows are
    ordered by ``order_cols`` within each partition (include a unique
    tie-break key for determinism — same rule as every window here).
    """
    tagged = df.withColumn("__sym", symbol)
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    ) + ", match_pos int"
    rx = re.compile(pattern)
    data_cols = [f.name for f in df.schema.fields]

    def matcher(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_cols, kind="mergesort").reset_index(drop=True)
        s = "".join(pdf["__sym"])
        take: list[int] = []
        pos: list[int] = []
        for m in rx.finditer(s):
            for i in range(m.start(), m.end()):
                take.append(i)
                pos.append(i - m.start())
        out = pdf.iloc[take][data_cols].copy()
        out["match_pos"] = pos
        return out

    return tagged.groupBy(*partition_cols).applyInPandas(matcher, out_schema)
