"""AS-OF join semantics pins (operators/asof.py): at-or-before matching,
carry-forward across multiple rights, unmatched-left NULLs, key
isolation. The fixture-corpus behavior is oracle-gated (DuckDB native
ASOF LEFT JOIN, query `join_asof_orders`); these cover the corner rows."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F  # noqa: F401

from hive_release_spark.operators.asof import asof_join


def _t(m):
    return datetime(2024, 1, 1, 0, m)


def test_asof_join_semantics(spark):
    left = spark.createDataFrame(
        [
            (1, _t(0), 100),   # before any right row -> NULLs
            (1, _t(5), 101),   # exactly at right t=5 -> matches it (at-or-before)
            (1, _t(7), 102),   # between rights at 5 and 10 -> carries t=5
            (1, _t(30), 103),  # after the last right -> carries t=10
            (2, _t(6), 200),   # key 2 never sees key 1's rows
        ],
        "k BIGINT, t TIMESTAMP, ev BIGINT",
    )
    right = spark.createDataFrame(
        [
            (1, _t(5), "a"),
            (1, _t(10), "b"),
            (2, _t(1), "z"),
        ],
        "k BIGINT, t TIMESTAMP, tag STRING",
    )
    out = {
        r.ev: r.tag
        for r in asof_join(
            left, right, on="k", left_t="t", right_t="t", right_payload=["tag"]
        ).collect()
    }
    assert out == {100: None, 101: "a", 102: "a", 103: "b", 200: "z"}


def test_asof_join_output_cardinality_is_left(spark):
    """Left-outer semantics: |output| == |left| regardless of how many
    right rows precede each left row."""
    left = spark.createDataFrame(
        [(1, _t(i), i) for i in range(10)], "k BIGINT, t TIMESTAMP, ev BIGINT"
    )
    right = spark.createDataFrame(
        [(1, _t(i), f"r{i}") for i in range(0, 10, 2)],
        "k BIGINT, t TIMESTAMP, tag STRING",
    )
    got = asof_join(left, right, on="k", left_t="t", right_t="t")
    assert got.count() == 10
    # every left row at minute i >= 0 matches r(2*floor(i/2))
    assert {r.ev: r.tag for r in got.collect()} == {
        i: f"r{i - (i % 2)}" for i in range(10)
    }


def test_asof_join_matches_pandas_merge_asof(spark):
    """Independent-reference parity: pandas merge_asof (by=key,
    direction='backward', allow_exact_matches=True) implements the same
    contract — drive both over a deterministic pseudo-random series and
    compare row-for-row."""
    import random

    import pandas as pd

    rng = random.Random(7)
    left_rows = [
        (rng.randrange(5), _t(rng.randrange(60)), i) for i in range(200)
    ]
    right_rows = []
    seen = set()
    for j in range(80):
        k, m = rng.randrange(5), rng.randrange(60)
        if (k, m) in seen:  # unique (key, t) like the deduped query side
            continue
        seen.add((k, m))
        right_rows.append((k, _t(m), f"tag{j}"))

    left = spark.createDataFrame(left_rows, "k BIGINT, t TIMESTAMP, ev BIGINT")
    right = spark.createDataFrame(right_rows, "k BIGINT, t TIMESTAMP, tag STRING")
    got = {
        r.ev: r.tag
        for r in asof_join(
            left, right, on="k", left_t="t", right_t="t", right_payload=["tag"]
        ).collect()
    }

    lp = pd.DataFrame(left_rows, columns=["k", "t", "ev"]).sort_values("t")
    rp = pd.DataFrame(right_rows, columns=["k", "t", "tag"]).sort_values("t")
    ref = pd.merge_asof(lp, rp, on="t", by="k", direction="backward")
    want = {
        int(row.ev): (None if pd.isna(row.tag) else row.tag)
        for row in ref.itertuples()
    }
    assert got == want


def test_asof_join_rejects_colliding_payload_columns(spark):
    import pytest

    left = spark.createDataFrame([(1, _t(0), "x")], "k BIGINT, t TIMESTAMP, tag STRING")
    right = spark.createDataFrame([(1, _t(0), "y")], "k BIGINT, t TIMESTAMP, tag STRING")
    with pytest.raises(ValueError, match="duplicate columns"):
        asof_join(left, right, on="k", left_t="t", right_t="t", right_payload=["tag"])


def test_asof_join_nearest_semantics(spark):
    from hive_release_spark.operators.asof import asof_join_nearest

    left = spark.createDataFrame(
        [
            (1, _t(0), 100),   # right at t=1 is 60s after -> within tol
            (1, _t(6), 101),   # rights at 5 (60s back) and 10 (240s fwd) -> prev
            (1, _t(9), 102),   # rights at 5 (240s) and 10 (60s) -> next
            (1, _t(40), 103),  # nearest right is 30min away -> beyond tol, NULL
            (2, _t(3), 200),   # equal distance to 1 and 5 -> at-or-before wins
        ],
        "k BIGINT, t TIMESTAMP, ev BIGINT",
    )
    right = spark.createDataFrame(
        [
            (1, _t(1), "r1"),
            (1, _t(5), "r5"),
            (1, _t(10), "r10"),
            (2, _t(1), "z1"),
            (2, _t(5), "z5"),
        ],
        "k BIGINT, t TIMESTAMP, tag STRING",
    )
    out = {
        r.ev: r.tag
        for r in asof_join_nearest(
            left,
            right.withColumnRenamed("t", "rt"),
            on="k",
            left_t="t",
            right_t="rt",
            tolerance_s=600,
            right_payload=["tag"],
        ).collect()
    }
    assert out == {100: "r1", 101: "r5", 102: "r10", 103: None, 200: "z1"}


def test_asof_join_nearest_matches_pandas(spark):
    import pandas as pd

    from hive_release_spark.operators.asof import asof_join_nearest

    left_rows = [(k, _t(m), k * 1000 + m) for k in (1, 2) for m in range(0, 50, 3)]
    right_rows = [(k, _t(m), f"r{k}_{m}") for k in (1, 2) for m in (2, 11, 29)]
    left = spark.createDataFrame(left_rows, "k BIGINT, t TIMESTAMP, ev BIGINT")
    right = spark.createDataFrame(right_rows, "k BIGINT, rt TIMESTAMP, tag STRING")
    got = (
        asof_join_nearest(
            left, right, on="k", left_t="t", right_t="rt",
            tolerance_s=300, right_payload=["tag"],
        )
        .orderBy("k", "t")
        .toPandas()
    )
    lp = pd.DataFrame(left_rows, columns=["k", "t", "ev"]).sort_values("t")
    rp = pd.DataFrame(right_rows, columns=["k", "rt", "tag"]).sort_values("rt")
    exp = pd.merge_asof(
        lp, rp, left_on="t", right_on="rt", by="k",
        direction="nearest", tolerance=pd.Timedelta(seconds=300),
    ).sort_values(["k", "t"])
    assert list(got["tag"].fillna("-")) == list(exp["tag"].fillna("-"))


def test_asof_join_nearest_subsecond_precision(spark):
    """r5 (ADVICE #3): distances are computed at MICROSECOND precision.
    Whole-second truncation (the old unix_timestamp path) would rank a
    right 0.4s ahead as distance-0 and a right 0.7s behind as
    distance-0 too, mis-picking via the at-or-before tie rule; and a
    right 1.4s away would slip inside a 1s tolerance. Sub-second
    fixtures pin both the ranking and the tolerance edge."""
    from datetime import datetime

    from hive_release_spark.operators.asof import asof_join_nearest

    def us(s, micro):
        return datetime(2024, 1, 1, 0, 0, s, micro)

    left = spark.createDataFrame(
        [
            # prev at 0.7s back, next at 0.4s ahead -> next wins (truncated
            # arithmetic would call both distance 0 and pick prev)
            (1, us(1, 0), 100),
            # only candidate is 1.4s away with tolerance 1s -> NULL
            # (truncated distance would be 1s and sneak inside)
            (2, us(3, 400_000), 200),
            # exact microsecond tie at ±0.5s -> at-or-before (prev) wins
            (3, us(1, 500_000), 300),
        ],
        "k BIGINT, t TIMESTAMP, ev BIGINT",
    )
    right = spark.createDataFrame(
        [
            (1, us(0, 300_000), "p"),
            (1, us(1, 400_000), "n"),
            (2, us(2, 0), "far"),
            (3, us(1, 0), "tie_prev"),
            (3, us(2, 0), "tie_next"),
        ],
        "k BIGINT, rt TIMESTAMP, tag STRING",
    )
    out = {
        r.ev: r.tag
        for r in asof_join_nearest(
            left, right, on="k", left_t="t", right_t="rt",
            tolerance_s=1, right_payload=["tag"],
        ).collect()
    }
    assert out == {100: "n", 200: None, 300: "tie_prev"}
