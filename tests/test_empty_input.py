"""Zero-row input robustness (the r9 empty-input axis).

An engine run against 100 TB routinely sees EMPTY slices — an empty
date partition, a filter that matches nothing, a table freshly created
— and Hive returns empty (or NULL-aggregate) results there, never a
crash. The r9 sweep ran ALL registry entries against zero-row copies
of every table and found two classes of defect, both fixed and pinned
here:

* engine-side crashes: ANSI divide-by-zero on empty-derived
  denominators, ``first()[0]`` on an empty frame, VOID-typed empty
  literal arrays feeding array_min/max, element_at on empty arrays,
  numpy axis errors on empty Arrow batches, saveAsSequenceFile's
  first-record type inference, XML schema inference over a rowless
  directory;
* oracle-parity mismatches: printf rendering NULL as the string
  'null', sums needing coalesce to report a zero-count audit, profile
  rows emitted for key columns with no rows.

The one DOCUMENTED non-parity family is grouping sets: Spark (and
Hive, whose GroupByOperator replicates input rows per grouping set —
zero in, zero out) returns NO rows for CUBE/ROLLUP/GROUPING SETS over
empty input, while DuckDB/Postgres emit the () grand-total row. That
delta is pinned below as EXPECTED behavior, Hive side chosen.

Full-axis sweeps (all 362 entries vs DuckDB on degenerate tables):
    python tests/test_empty_input.py --make-empty  /tmp/sf_empty
    python tests/test_empty_input.py --make-single /tmp/sf_one
    python tests/test_empty_input.py --make-null   /tmp/sf_null
    python tests/test_empty_input.py --make-nan    /tmp/sf_nan
    SPARK_GRAFT_CHECK_SF=/tmp/sf_<axis> python tools/check.py
Expected: empty = green except the six GROUPING_SETS_DELTA entries;
single = green except the three adjudicated exceptions pinned below;
all-null (the r10 axis — 42 findings: NULL-geometry vectors, NULL
payloads/text, NULL event times, NULL join/group keys, DuckDB-vs-Hive
join/'' semantics) = green except ds_hierarchy_rank, the grouping-sets
delta reached via NULL join keys; nan/inf (the r10 STRETCH axis —
IEEE specials salted into every double column) = the 12
silent/one-sided divergences repaired plus the first finite()-adoption
wave of 8 loud-class flagships (REPAIRED_NAN, 20 entries) with the
remaining ~40 shared-loud-failure entries documented and
representatively pinned
(test_micro_fold_specials_fail_loudly_on_both_engines) — completing
the finite() adoption across that class is the staged r11+ plan (the
r10 witness window is now exactly full at 50 contract declarations).
"""

from __future__ import annotations

import os
import sys

import pytest

from hive_release_spark import testing

SF_SRC = "/root/testdata/sf0.001"

# Entries repaired by the r9 empty-input sweep — each must hash-match
# its DuckDB oracle on zero-row tables (the oracle defines the
# empty-input semantics: empty result sets for joins/rankings,
# NULL-valued aggregate rows for global aggregates, vacuously-true
# contract booleans).
REPAIRED = [
    "events_markov_stationary",
    "dq_business_rules",
    "timeseries_croston",
    "stats_power_two_proportions",
    "timeseries_theil_sen",
    "timeseries_holt_winters",
    "dq_key_skew_profile",
    "dq_column_profile",
    "dq_distribution_drift_psi",
    "agg_bloom_filter",
    "source_xml_roundtrip",
    "source_sequencefile_roundtrip",
    "emb_pca_project",
    "sim_ann_ivf",
    "sim_ann_pq",
    "emb_kmeans",
    "sim_cosine_topk_arrow",
    "emb_pca_contract",
]

# The documented Hive-faithful delta: these aggregate with
# CUBE/ROLLUP/GROUPING SETS, where Spark's zero-rows-in-zero-rows-out
# matches Hive's row-replication implementation and the DuckDB oracle
# emits the SQL-standard () grand-total row instead.
GROUPING_SETS_DELTA = [
    "agg_grouping_sets",
    "agg_rollup",
    "agg_cube",
    "agg_grouping_id",
    "ds_channel_rollup",
    "ds_hierarchy_rank",
]


# SINGLE-ROW axis (n=1 — the second sweep): degenerate-variance and
# degrees-of-freedom denominators go to zero differently than at n=0
# (the aggregate row EXISTS but its statistics are undefined), plus the
# k>n k-means clamp. Each repaired entry must hash-match its oracle on
# 1-row tables.
REPAIRED_SINGLE_ROW = [
    "events_anomaly_mad",
    "events_ab_cuped",
    "search_tfidf_cosine",
    "stats_chi_square",
    "stats_anova_oneway",
    "stats_spearman_corr",
    "stats_fdr_bh",
    "sample_stratified_neyman",
    "events_fano_factor",
    "ml_linear_regression",
    "ml_regression_calibration",
    "ml_regression_kfold_cv",
    "emb_kmeans",
    "timeseries_holt_winters",
    # r10: the sharper n_bins = min(10, non-null count) contract made
    # the histogram sketch exact at n=1 — un-pinned from the
    # adjudicated-exception list below
    "agg_histogram_numeric",
]


# ALL-NULL axis (r10 — the third sweep): same schemas, same row
# counts, every value NULL. Null join keys (inner joins emit nothing),
# null group keys (one NULL group), null-only aggregates, null text /
# vector / payload columns. Repaired entries must hash-match their
# oracle on the all-NULL tables; the full-axis expectation is
# 361/362 green + ds_hierarchy_rank pinned below.
REPAIRED_ALL_NULL = [
    "events_did_analysis",
    "agg_percentile_disc",
    "window_moving_median",
    "text_langid_ngram",
    "dedup_embedding_cosine",
    "dedup_semantic_cells",
    "sim_ann_lsh",
    "sim_ann_pq",
    "emb_kmeans",
    "emb_pca_project",
    "emb_pca_contract",
    "emb_normalize_quantize",
    "multimodal_features",
    "multimodal_payload_dedup",
    "multimodal_meta",
    "multimodal_frame_sample",
    "agg_histogram_numeric",
    "agg_collect",
    "fn_string",
    "events_top_paths",
    "dedup_span_chunks",
    "text_repetition_score",
    "agg_percentile_approx_contract",
    "pipeline_quality_ablation",
    "stream_tumbling",
    "stream_tumbling_live",
    "stream_sliding",
    "stream_session",
    "stream_session_dynamic",
    "stream_distinct_sketch",
    # canon-NaT-repair witnesses (testing.py fix, no kernel change):
    "events_anomaly_mad",
    "timeseries_ewma",
    "join_asof_orders",
]


def make_empty(dst: str) -> str:
    """Zero-row copies of every driver table, schemas preserved."""
    import pyarrow.parquet as pq

    os.makedirs(dst, exist_ok=True)
    for f in os.listdir(SF_SRC):
        if f.endswith(".parquet"):
            t = pq.read_table(os.path.join(SF_SRC, f))
            pq.write_table(t.slice(0, 0), os.path.join(dst, f))
    return dst


def make_all_null(dst: str) -> str:
    """All-NULL copies of every table: same schema, same row COUNT,
    every value NULL (the r10 third axis). Exercises null join keys
    (inner joins emit nothing, outer joins preserve), null group keys
    (one NULL group), null-only aggregates (NULL sums over non-zero
    counts), and null text/vector payloads — both engines see the SAME
    rows, so DuckDB parity is exactly defined."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(dst, exist_ok=True)
    for f in os.listdir(SF_SRC):
        if f.endswith(".parquet"):
            t = pq.read_table(os.path.join(SF_SRC, f))
            nulls = pa.table(
                [pa.nulls(t.num_rows, type=fld.type) for fld in t.schema],
                schema=t.schema,
            )
            pq.write_table(nulls, os.path.join(dst, f))
    return dst


def make_special_floats(dst: str) -> str:
    """Fourth axis (r10 stretch): NaN / +Inf / -Inf salted into every
    double column on a deterministic row-index grid (i%17 -> NaN,
    i%23 -> +Inf, i%29 -> -Inf, others untouched). Real 100 TB data
    carries IEEE specials from upstream division; both engines read
    the SAME parquet values, so parity is exactly defined. Non-float
    columns and row counts are untouched — most rows stay normal so
    the ordinary code paths still execute."""
    import math

    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(dst, exist_ok=True)
    for f in os.listdir(SF_SRC):
        if f.endswith(".parquet"):
            t = pq.read_table(os.path.join(SF_SRC, f))
            cols = []
            for fld in t.schema:
                col = t.column(fld.name)
                if str(fld.type) in ("double", "float"):
                    vals = col.to_pylist()
                    for i in range(len(vals)):
                        if vals[i] is None:
                            continue
                        if i % 17 == 0:
                            vals[i] = math.nan
                        elif i % 23 == 0:
                            vals[i] = math.inf
                        elif i % 29 == 0:
                            vals[i] = -math.inf
                    col = pa.array(vals, type=fld.type)
                cols.append(col)
            pq.write_table(pa.table(cols, schema=t.schema), os.path.join(dst, f))
    return dst


def make_single(dst: str) -> str:
    """First-row-only copies of every driver table (referential links
    between tables break, but Spark and the oracle see the SAME rows,
    so parity is still exactly defined)."""
    import pyarrow.parquet as pq

    os.makedirs(dst, exist_ok=True)
    for f in os.listdir(SF_SRC):
        if f.endswith(".parquet"):
            t = pq.read_table(os.path.join(SF_SRC, f))
            pq.write_table(t.slice(0, 1), os.path.join(dst, f))
    return dst


@pytest.fixture(scope="module")
def empty_sf(tmp_path_factory):
    return make_empty(str(tmp_path_factory.mktemp("sf_empty")))


@pytest.fixture(scope="module")
def empty_con(empty_sf):
    return testing.duckdb_con(empty_sf)


@pytest.mark.parametrize("name", REPAIRED)
def test_repaired_entry_matches_oracle_on_empty(spark, empty_sf, empty_con, name):
    from hive_release_spark.queries import REGISTRY

    entry = REGISTRY[name]
    ok, why = testing.compare_query(
        spark, empty_con, entry.fn, entry.oracle, empty_sf
    )
    assert ok, f"{name} on zero-row input: {why}"


@pytest.mark.parametrize("name", GROUPING_SETS_DELTA)
def test_grouping_sets_empty_delta_pinned(spark, empty_sf, empty_con, name):
    """Spark returns ZERO rows for grouping-set aggregates over empty
    input (Hive-faithful: the GroupByOperator replicates input rows per
    grouping set, so zero input rows produce zero output rows); the
    DuckDB oracle emits the SQL-standard () grand-total row. Pin BOTH
    sides so a semantic change in either engine surfaces here instead
    of silently flipping the documented delta."""
    from hive_release_spark.queries import REGISTRY

    entry = REGISTRY[name]
    assert entry.fn(spark, empty_sf).count() == 0, (
        f"{name}: Spark no longer returns 0 rows on empty grouping-set "
        "input — the Hive-faithful delta documented in COVERAGE.md "
        "changed underneath us"
    )
    n_oracle = len(empty_con.execute(entry.oracle).fetchall())
    assert n_oracle >= 1, (
        f"{name}: the DuckDB oracle now returns {n_oracle} rows on empty "
        "input — the documented delta no longer exists; promote the "
        "entry into the oracle-parity set"
    )


@pytest.fixture(scope="module")
def single_sf(tmp_path_factory):
    return make_single(str(tmp_path_factory.mktemp("sf_one")))


@pytest.fixture(scope="module")
def single_con(single_sf):
    return testing.duckdb_con(single_sf)


@pytest.mark.parametrize("name", REPAIRED_SINGLE_ROW)
def test_repaired_entry_matches_oracle_on_single_row(
    spark, single_sf, single_con, name
):
    from hive_release_spark.queries import REGISTRY

    entry = REGISTRY[name]
    ok, why = testing.compare_query(
        spark, single_con, entry.fn, entry.oracle, single_sf
    )
    assert ok, f"{name} on single-row input: {why}"


def test_single_row_adjudicated_exceptions(spark, single_sf, single_con):
    """The n=1 behaviors deliberately NOT converged, pinned so a
    change in either engine surfaces here:

    * emb_pca_project: a 1-vector corpus mean-centers to all-zeros and
      the quantized iterate collapses — Spark raises the documented
      degenerate-input ValueError (ADVICE r6-5) and DuckDB's replay
      errors on the NULL-laden list arithmetic; BOTH engines fail, in
      their own ways, which is the adjudicated contract for a data
      pathology (unlike n=0, where both return empty).
    * agg_percentile_approx_contract: a rank-error contract (observed
      fraction within 0.02 of the target rank) that is not a
      meaningful claim at n=1 (the fraction is exactly 1.0) — the
      entry runs fine; only the contract comparison diverges.
      (agg_histogram_numeric left this list in r10: its sharpened
      n_bins = min(10, non-null count) contract IS exact at n=1 and
      it now sits in REPAIRED_SINGLE_ROW.)
    """
    from hive_release_spark.llm.clustering import power_iteration_project
    from hive_release_spark.queries import REGISTRY

    emb = spark.read.parquet(os.path.join(single_sf, "embeddings.parquet"))
    with pytest.raises(ValueError, match="degenerate"):
        power_iteration_project(emb, n_iter=2, nq=5)
    import duckdb

    with pytest.raises(duckdb.Error):
        single_con.execute(REGISTRY["emb_pca_project"].oracle).fetchall()

    assert (
        REGISTRY["agg_percentile_approx_contract"].fn(spark, single_sf).count()
        >= 1
    )  # runs clean; only the rank-error booleans diverge from the oracle


def test_empty_arrow_batch_does_not_crash_pandas_kernel(spark, empty_sf):
    """The mapInPandas kernels must tolerate EMPTY Arrow batches — on a
    real cluster an empty partition hands the UDF an empty frame, so
    this is live-data robustness, not just the empty-table edge (the
    pca partial-moments kernel always guarded; the cosine kernel is
    pinned since the r9 sweep caught it)."""
    from hive_release_spark.queries import REGISTRY

    # 1-row corpus across 8 partitions -> at least 7 empty batches
    emb = (
        spark.read.parquet(os.path.join(SF_SRC, "embeddings.parquet"))
        .limit(1)
        .repartition(8)
    )
    emb.createOrReplaceTempView("_one_row_emb")
    import numpy as np

    from hive_release_spark.llm.clustering import pca_project

    assert pca_project(emb, k=1).count() == 1
    del np
    # and the registry entry end-to-end on the all-empty tables
    assert REGISTRY["sim_cosine_topk_arrow"].fn(spark, empty_sf).count() == 0


# NaN/Inf axis (r10 stretch — the fourth sweep): the 10 entries whose
# divergence was SILENT (wrong values, flipped contract booleans,
# 'Infinity'-vs-'inf' renderings), repaired with the finite() device
# (functions/numeric.py) and Hive-style special rendering in oracles.
# The ~45 entries where BOTH engines refuse loudly (ANSI CAST_OVERFLOW
# on the micro-fold device vs DuckDB's own cast/variance refusals) are
# the documented shared-failure class pinned below.
REPAIRED_NAN = [
    "agg_percentile",
    "agg_percentile_disc",
    "orders_monthly_percentiles",
    "agg_trimmed_stats",
    "window_exclude_current",
    "window_exclude_group_ties",
    "window_moving_median",
    "agg_histogram_numeric",
    "agg_percentile_approx_contract",
    "fn_gap_tier",
    "fn_union_type",
    "dq_column_profile",
    # wave 1 of the staged finite() adoption (same round, the 8 free
    # window slots): the variance/correlation flagship family + math
    # sums + arg_max cents key + applyInPandas z-score + the shared
    # daily-series helper
    "agg_stats",
    "agg_regr",
    "agg_corr_matrix",
    "fn_math",
    "agg_min_max_by",
    "ptf_apply_in_pandas_zscore",
    "timeseries_autocorr",
    "timeseries_cross_corr",
]


@pytest.fixture(scope="module")
def nan_sf(tmp_path_factory):
    return make_special_floats(str(tmp_path_factory.mktemp("sf_nan")))


@pytest.fixture(scope="module")
def nan_con(nan_sf):
    return testing.duckdb_con(nan_sf)


@pytest.mark.parametrize("name", REPAIRED_NAN)
def test_repaired_entry_matches_oracle_on_specials(spark, nan_sf, nan_con, name):
    from hive_release_spark.queries import REGISTRY

    entry = REGISTRY[name]
    ok, why = testing.compare_query(
        spark, nan_con, entry.fn, entry.oracle, nan_sf
    )
    assert ok, f"{name} on NaN/Inf input: {why}"


def test_frame_exclusion_all_special_neighborhood(spark, tmp_path):
    """Adversarial specials placement for the EXCLUDE-rewrite entries
    (r10 in-round review): a finite row whose ENTIRE excluded frame is
    NaN/Inf must get a NULL excluded sum — DuckDB's native EXCLUDE
    sums only NULLs there — not the 0.0 the sum-minus-current (or
    frame-minus-peer-group) cancellation would emit. The committed
    fixture's salt grid never produces this neighborhood, so it is
    pinned with a crafted one: one 8-row partition where row 4 is the
    only finite price among its neighbors."""
    import datetime
    import math
    import shutil

    import pyarrow as pa
    import pyarrow.parquet as pq

    dst = str(tmp_path / "sf_adv")
    shutil.copytree(SF_SRC, dst)
    orig = pq.read_table(os.path.join(SF_SRC, "lineitem.parquet"))
    nan = math.nan
    rows = {
        "l_orderkey": list(range(1, 9)),
        "l_partkey": [1] * 8,
        "l_suppkey": [0] * 8,
        "l_linenumber": [1] * 8,
        "l_quantity": [float(i) for i in range(1, 9)],
        "l_extendedprice": [nan, nan, nan, 5.0, nan, math.inf, nan, nan],
        "l_discount": [0.0] * 8,
        "l_tax": [0.0] * 8,
        "l_returnflag": ["N"] * 8,
        "l_linestatus": ["O"] * 8,
        "l_shipdate": [datetime.datetime(1997, 1, 1)] * 8,
    }
    pq.write_table(
        pa.table(
            [pa.array(rows[f.name], type=f.type) for f in orig.schema],
            schema=orig.schema,
        ),
        os.path.join(dst, "lineitem.parquet"),
    )
    con = testing.duckdb_con(dst)
    from hive_release_spark.queries import REGISTRY

    for name in ("window_exclude_current", "window_exclude_group_ties"):
        entry = REGISTRY[name]
        ok, why = testing.compare_query(
            spark, con, entry.fn, entry.oracle, dst
        )
        assert ok, f"{name} on all-special neighborhood: {why}"
    # the load-bearing cell: the lone finite row's excluded sum is NULL
    r = {
        row.l_orderkey: row.peer_sum
        for row in REGISTRY["window_exclude_current"].fn(spark, dst).collect()
    }
    assert r[4] is None and r[3] == 5.0


def test_micro_fold_specials_fail_loudly_on_both_engines(spark, nan_sf, nan_con):
    """The adjudicated contract for the exact-cents/micro-fold
    determinism device (floor(x*1e6+0.5)::BIGINT) on non-finite input,
    representative: timeseries_ewma.

    * Under the DRIVER's ANSI-on session, Spark refuses LOUDLY
      (CAST_OVERFLOW) — no silent garbage (the emb_pca_project
      degenerate-raise precedent).
    * Under the tuned ANSI-off (Hive-parity) session, Spark returns
      Hive's own answer for the cast — ``(long) Double.NaN == 0`` —
      i.e. Hive-faithful, not an error.
    * DuckDB refuses its double→INT64 cast in EITHER case, so the
      entry can never hash-green on this axis; the divergence is LOUD
      on the oracle side regardless.
    A change on any of the three arms re-opens the adjudication."""
    import duckdb

    from hive_release_spark.queries import REGISTRY

    entry = REGISTRY["timeseries_ewma"]
    prev = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "true")
    try:
        with pytest.raises(Exception, match="CAST_OVERFLOW|cannot be cast"):
            entry.fn(spark, nan_sf).collect()
    finally:
        spark.conf.set("spark.sql.ansi.enabled", prev)
    # Hive-parity arm: the cast silently degrades to Hive's 0
    assert entry.fn(spark, nan_sf).count() > 0
    with pytest.raises(duckdb.Error):
        nan_con.execute(entry.oracle).fetchall()


@pytest.fixture(scope="module")
def null_sf(tmp_path_factory):
    return make_all_null(str(tmp_path_factory.mktemp("sf_null")))


@pytest.fixture(scope="module")
def null_con(null_sf):
    return testing.duckdb_con(null_sf)


@pytest.mark.parametrize("name", REPAIRED_ALL_NULL)
def test_repaired_entry_matches_oracle_on_all_null(spark, null_sf, null_con, name):
    from hive_release_spark.queries import REGISTRY

    entry = REGISTRY[name]
    ok, why = testing.compare_query(
        spark, null_con, entry.fn, entry.oracle, null_sf
    )
    assert ok, f"{name} on all-NULL input: {why}"


def test_hierarchy_rank_all_null_delta_pinned(spark, null_sf, null_con):
    """ds_hierarchy_rank on the all-NULL axis is the grouping-sets
    family delta AGAIN, reached a different way: NULL join keys empty
    the inner joins, then ROLLUP over zero rows is zero-in-zero-out in
    Spark/Hive while DuckDB emits the () grand-total row. Pin both
    sides, same as the empty-axis pin above."""
    from hive_release_spark.queries import REGISTRY

    entry = REGISTRY["ds_hierarchy_rank"]
    assert entry.fn(spark, null_sf).count() == 0
    assert len(null_con.execute(entry.oracle).fetchall()) >= 1


def test_element_at_runtime_null_index_quirk(spark):
    """Spark quirk the pack_assets guard works around (r10 all-NULL
    axis): under ANSI mode — the DRIVER's default session config —
    element_at with a RUNTIME-null index returns the LAST element,
    while the constant-folded literal-NULL form returns NULL. (The
    project's tuned ANSI-off session returns NULL for both, so the
    quirk must be probed with ANSI explicitly ON; the guard is a
    no-op-equivalent under ANSI-off.) If the runtime assertion fails,
    Spark fixed the quirk — the guard in llm/multimodal.pack_assets
    becomes removable."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(None,)], "i BIGINT")
    arr = F.array(F.lit("a"), F.lit("b"), F.lit("c"))
    prev = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "true")
    try:
        runtime = df.select(
            F.element_at(arr, (F.col("i") % 3 + 1).cast("int")).alias("m")
        ).first()[0]
        folded = df.select(
            F.element_at(arr, F.lit(None).cast("int")).alias("m")
        ).first()[0]
    finally:
        spark.conf.set("spark.sql.ansi.enabled", prev)
    assert folded is None
    assert runtime == "c", (
        f"element_at(arr, runtime-NULL) now returns {runtime!r} under "
        "ANSI — Spark changed the quirk; revisit the pack_assets "
        "modality guard"
    )


def test_sequencefile_empty_roundtrip(spark, tmp_path):
    """A zero-row frame writes an empty table directory (Hive's own
    empty-table layout — saveAsSequenceFile's first-record type
    inference cannot run) and reads back as a zero-row typed frame."""
    from hive_release_spark.sources.formats import (
        read_sequencefile,
        write_sequencefile,
    )

    schema = "id INT, s STRING, arr ARRAY<INT>"
    df = spark.createDataFrame([], schema)
    p = str(tmp_path / "seq_zero")
    write_sequencefile(df, p)
    assert os.path.isdir(p)
    back = read_sequencefile(spark, p, schema)
    assert back.count() == 0
    assert [f.name for f in back.schema.fields] == ["id", "s", "arr"]
    # the empty branch is Hadoop-strict like saveAsSequenceFile: a
    # second write to the now-existing directory must fail, not
    # silently leave the previous run's data (ADVICE r9-1)
    with pytest.raises(FileExistsError, match="already exists"):
        write_sequencefile(df, p)


if __name__ == "__main__":
    if len(sys.argv) == 3 and sys.argv[1] == "--make-empty":
        print(make_empty(sys.argv[2]))
    elif len(sys.argv) == 3 and sys.argv[1] == "--make-single":
        print(make_single(sys.argv[2]))
    elif len(sys.argv) == 3 and sys.argv[1] == "--make-null":
        print(make_all_null(sys.argv[2]))
    elif len(sys.argv) == 3 and sys.argv[1] == "--make-nan":
        print(make_special_floats(sys.argv[2]))


def test_finite_helper_semantics(spark):
    """Unit pin for functions/numeric.finite — the single definition
    every adopted entry relies on: finite values pass through, NaN and
    +/-Inf become NULL, and NULL stays NULL (so wrapping an aggregate
    argument never disturbs genuine-NULL semantics)."""
    import math

    from hive_release_spark.functions.numeric import finite

    df = spark.createDataFrame(
        [(1.5,), (0.0,), (-2.5,), (math.nan,), (math.inf,), (-math.inf,), (None,)],
        "x DOUBLE",
    )
    got = [r[0] for r in df.select(finite("x").alias("f")).collect()]
    assert got == [1.5, 0.0, -2.5, None, None, None, None]
