"""Event-analytics queries over the ``events`` table: ordered funnel
conversion and cohort retention — the product-analytics shapes a
warehouse serves next to its OLAP workload (Hive users run these today
as multi-self-join SQL; here each is a SINGLE event-scan formulation).

Scale notes: both queries reduce the event stream to per-user state in
one partial-agged shuffle on user_id (high-cardinality, uniform), then
operate on bounded per-user arrays with JVM higher-order functions —
no self-joins, no window over the raw stream, no second scan. Per-user
array size is bounded by one user's activity; for pathological power
users the MatchPath PTF (``ptf_matchpath``) is the streaming-state
alternative.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hive_release_spark.catalog import load_table
from hive_release_spark.queries.registry import register


@register(
    "funnel_conversion",
    oracle="""
    WITH v AS (SELECT user_id, min(ts) AS t1 FROM events
               WHERE event_type = 'view' GROUP BY user_id),
    c AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e
          JOIN v ON e.user_id = v.user_id
          WHERE e.event_type = 'click' AND e.ts > v.t1 GROUP BY e.user_id),
    p AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e
          JOIN c ON e.user_id = c.user_id
          WHERE e.event_type = 'purchase' AND e.ts > c.t2 GROUP BY e.user_id),
    u AS (SELECT DISTINCT user_id FROM events
          WHERE event_type IN ('view', 'click', 'purchase'))
    SELECT (SELECT count(*) FROM u) AS users_total,
           (SELECT count(*) FROM v) AS n_view,
           (SELECT count(*) FROM c) AS n_click_after_view,
           (SELECT count(*) FROM p) AS n_purchase_after_click
    """,
    tags=("analytics", "events", "funnel", "hof"),
)
def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel view → click → purchase over the events table —
    see :func:`funnel` for semantics and the scale shape."""
    return funnel(load_table(spark, sf_dir, "events"))


def funnel(
    events: DataFrame, steps: tuple[str, str, str] = ("view", "click", "purchase")
) -> DataFrame:
    """Ordered funnel: a user converts a step only with an event
    STRICTLY AFTER their previous step's first event.

    The SQL idiom is three self-joins (the oracle); here the event
    stream collapses to one sorted per-user array and each step is a
    higher-order ``filter`` + ``get`` over it — ONE scan, ONE shuffle
    (user_id groupBy, partial agg), then a 4-counter global reduce.
    Step timestamps are materialized in successive selects so each
    lambda captures an attribute, not a re-evaluated expression (the
    repo-wide expression-reuse trap). ``F.get`` (0-based) returns NULL
    on an empty filter result under ANSI too — ``element_at`` would
    throw on the driver's default session."""
    e1, e2, e3 = steps
    ev = events.select("user_id", "ts", "event_type").filter(
        F.col("event_type").isin(*steps)
    )
    seq = ev.groupBy("user_id").agg(
        F.sort_array(F.collect_list(F.struct("ts", "event_type"))).alias("seq")
    )
    s1 = seq.select(
        "user_id",
        "seq",
        F.get(F.filter("seq", lambda s: s["event_type"] == e1), 0)["ts"].alias(
            "t1"
        ),
    )
    s2 = s1.select(
        "user_id",
        "seq",
        "t1",
        F.get(
            F.filter(
                "seq",
                lambda s: (s["event_type"] == e2) & (s["ts"] > F.col("t1")),
            ),
            0,
        )["ts"].alias("t2"),
    )
    s3 = s2.select(
        "user_id",
        "t1",
        "t2",
        F.get(
            F.filter(
                "seq",
                lambda s: (s["event_type"] == e3) & (s["ts"] > F.col("t2")),
            ),
            0,
        )["ts"].alias("t3"),
    )
    return s3.agg(
        F.count("*").alias("users_total"),
        F.count("t1").alias("n_view"),
        F.count("t2").alias("n_click_after_view"),
        F.count("t3").alias("n_purchase_after_click"),
    )


@register(
    "retention_cohorts",
    oracle="""
    WITH wks AS (SELECT user_id, CAST(date_trunc('week', ts) AS DATE) AS wk
                 FROM events),
    per_user AS (SELECT user_id, min(wk) AS cohort FROM wks GROUP BY user_id),
    act AS (SELECT DISTINCT user_id, wk FROM wks)
    SELECT p.cohort,
           CAST(date_diff('day', p.cohort, a.wk) / 7 AS INTEGER) AS week_n,
           count(*) AS active_users
    FROM act a JOIN per_user p ON a.user_id = p.user_id
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
    tags=("analytics", "events", "retention"),
)
def retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly retention triangle: users cohorted by the week of their
    first event, counted in each subsequent week they were active.

    ONE scan + ONE user_id shuffle: per-user state is (min week,
    collect_set of active weeks) — both partial-agg friendly — then the
    set explodes (bounded: #distinct weeks per user) into the tiny
    (cohort, week_n) reduce. The SQL idiom (the oracle) scans events
    twice and joins on user_id; at 100 TB that is a second full read
    plus a fact-fact shuffle this plan never does. week_n arithmetic is
    exact: both operands are Monday-truncated dates, so the day
    difference is always a multiple of 7 (Spark and DuckDB both
    truncate weeks to Monday)."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.date_trunc("week", "ts").cast("date").alias("wk")
    )
    per_user = ev.groupBy("user_id").agg(
        F.min("wk").alias("cohort"), F.collect_set("wk").alias("wks")
    )
    return (
        per_user.select("cohort", F.explode("wks").alias("wk"))
        .groupBy(
            "cohort",
            (F.datediff("wk", "cohort") / 7).cast("int").alias("week_n"),
        )
        .agg(F.count("*").alias("active_users"))
        .orderBy("cohort", "week_n")
    )
