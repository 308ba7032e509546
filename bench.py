"""Benchmark harness (driver contract, BASELINE.md B4).

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` (default 32).

Output contract (r5 — the r4 single-line report outgrew the driver's
stdout-tail window and came back ``"parsed": null``, so the perf gate
went machine-unverified): the FINAL stdout line is a COMPACT summary
JSON {"metric", "value" (total sec), "unit", "queries" (per-query
sec), "sf", "n_queries"} sized to survive any reasonable tail window;
the full detail (per-query min-of-3 AND median-of-3 — cross-round
comparisons read the medians, the r8 position-inflation lesson —
second-smallest-of-4 for the heavy tail, session-position offsets)
goes to ``BENCH_DETAIL.json`` next to this file and is ALSO printed
one line before the summary for judges reading the raw log.

Queries execute fully (noop sink — no driver-side collect cost), so the
timing covers scan → shuffle → agg/join/window, the same pipeline a
cluster would run.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from hive_release_spark.operators.cache import pipeline_scope  # noqa: E402
from hive_release_spark.queries import REGISTRY  # noqa: E402
from hive_release_spark.session import get_session  # noqa: E402

# Headline set: one per operator family that dominates runtime at scale.
HEADLINE = (
    "q1_pricing_summary",      # scan + hash agg
    "q3_shipping_priority",    # 3-way join + agg + top-k
    "q5_local_supplier_volume",  # 6-way snowflake join
    "agg_grouping_sets",       # Expand + agg
    "window_rows_frame",       # partitioned window, frames
    "fn_math",                 # expression-heavy scan
    "udtf_explode_wordcount",  # explode + agg
    "dedup_jaccard_pairs",     # inverted-index self-join
    "dedup_span_chunks",       # chunk-hash span dedup, persisted chunk frame
    "sim_cosine_topk",         # vector ops + window rank
    "dedup_minhash_lsh",       # signature + banded join
    "q18_large_orders",        # double agg + semi-join (join-heavy shape)
    "stream_session",          # session-window stateful shape (batch twin)
    "q6_forecast_revenue",     # pushdown-bound scan + global agg
    "text_tfidf_top_terms",    # corpus stats + broadcast join + window top-k
    "emb_label_centroids",     # vector posexplode + wide partial agg
    "q13_customer_distribution",  # outer join + double agg
    "q21_waiting_suppliers",   # decorrelated EXISTS/NOT-EXISTS, fact reuse
    "pipeline_dedup_quality",  # dedup + quality-gate pipeline slice
    "decontaminate_ngram",     # broadcast gram-set probe over the corpus
    "pack_sequences",          # per-shard window cumsum packing
    "funnel_conversion",       # per-user sorted-array HOF funnel
    "retention_cohorts",       # cohort triangle, collect_set explode
    "join_asof_orders",        # as-of join: tagged union + carry-forward window
    "sim_ann_ivf_bcast",       # IVF ANN, broadcast-centroid shape (new r4)
    "ds_time_bucket_counts",   # q88-style single-scan multi-bucket agg (new r4)
    "text_lm_score",           # bigram-LM train+score, persisted base (new r4)
    "pipeline_corpus_build",   # normalize→quality→dedup→report chain (new r4)
    "dedup_jaccard_prefix",    # prefix-filtered exact Jaccard (vs plain postings)
    "sim_ann_pq",              # product-quantization ADC ANN (new r4)
    "graph_pagerank",          # iterative-join class: 3 Pregel rounds (new r4)
    "events_rolling_active_users",  # sliding COUNT(DISTINCT): explode-vs-range-join (new r4)
    "bpe_train_merges",        # iterative vocab-frame agg + 1-row rule broadcasts (new r5)
    "sample_importance_dsir",  # persisted tokenize pass + broadcast LM score join (new r5)
    "ds_late_delivery_chain",  # q72 fact-fact shuffle + 4-dim broadcast chain (new r5)
    "events_ab_cuped",         # sufficient-statistics experimentation readout (new r5)
    "stats_ks_two_sample",     # collapsed-frame ECDF hypothesis test (new r5)
    "ml_linear_regression",    # one-scan sufficient-statistics model fit (new r5)
    "sim_ann_sq8",             # int8 scalar-quantized ANN, integer-dot shortlist (new r5)
    "ml_item_item_cf",         # basket-matrix cosine recommender (new r5)
)

# Rotating leg (r6, VERDICT r5 #6): the headline covers ~11% of the
# registry, so perf regressions elsewhere were invisible. Each round
# this tuple swaps to ~40 never-benched entries spread across §2
# families (same rotation idea as DRIVER_WINDOW in
# queries/__init__.py) — one timed median-of-3 per entry, stamped into
# BENCH_DETAIL.json["rotating"]; the final driver-parsed line carries
# the leg's total + count only (the per-query map would regrow the
# line past the stdout-tail budget, the r4 parsed:null lesson).
# The benched-set ledger is DATA, not comments (r8 — same promotion
# as the DRIVER_WINDOW rotation rule): past legs live in
# BENCHED_HISTORY, test_bench_contract asserts the current leg is
# disjoint from headline + every past leg, and never_benched() emits
# the next round's candidates in registry order — at rotation time,
# append the current ROTATING_LEG to BENCHED_HISTORY and take the
# first 40 of `python -c "import bench; print(bench.never_benched()[:40])"`.
BENCHED_HISTORY = {
    6: (
        "q8_market_share", "q9_product_profit",
        "q17_small_quantity_revenue", "q22_dormant_customers",
        "ds_spend_growth_pairs", "ds_worst_return_ratios",
        "ds_sales_deviation_rank", "agg_percentile", "agg_distinct",
        "agg_grouping_id", "window_range_interval",
        "window_running_distinct", "window_moving_median",
        "join_full_outer", "join_theta_residual",
        "dedup_embedding_cosine", "dedup_semantic_cells", "sim_ann_ivf",
        "emb_pca_project", "dedup_simhash_banded",
        "events_sessionize_ids", "customer_cohort_ltv",
        "events_top_paths", "orders_stl_decompose",
        "dq_distribution_drift_psi", "stats_spearman_corr",
        "stats_anova_oneway", "stats_randomization_test",
        "ml_boosted_stumps", "ml_knn_label_accuracy",
        "timeseries_holt_winters", "timeseries_autocorr",
        "join_range_bucketed", "graph_jaccard_neighbors",
        "stream_stream_full_join", "stream_watermark_late_drop",
        "sql_recursive_calendar", "udtf_stack", "fn_json",
        "dq_key_skew_profile",
    ),
    7: (
        "q2_min_cost_supplier", "q4_order_priority", "q10_returned_items",
        "q16_supplier_cnt", "q19_disjunctive_revenue",
        "ds_hierarchy_rank", "ds_week_over_week",
        "agg_rollup", "agg_pivot", "agg_trimmed_stats",
        "window_share_of_total", "window_groups_frame",
        "window_ignore_nulls",
        "join_asof_forward", "join_salted_skew", "join_unique",
        "setop_intersect_all", "sort_null_ordering",
        "sample_stratified_neyman",
        "fn_datetime", "fn_complex_types", "fn_hof_surface",
        "fn_try_family",
        "udtf_python", "ptf_matchpath", "script_transform",
        "stream_session_dynamic", "stream_stream_left_join",
        "stream_dedup_first",
        "dedup_exact", "dedup_connected_components",
        "dedup_sorted_neighborhood", "dedup_threshold_sweep",
        "pipeline_incremental_dedup", "pipeline_quality_ablation",
        "multimodal_features", "multimodal_frame_sample",
        "emb_kmeans", "emb_whitening",
        "search_bm25_rank",
    ),
    8: (
        "q7_volume_shipping", "q11_important_parts",
        "q12_shipmode_priority",
        "q14_promo_effect", "q15_top_supplier", "q20_excess_suppliers",
        "ds_cross_channel_customers", "ds_year_over_year_spend",
        "ds_topk_per_group",
        "agg_cube", "agg_hll_sketch", "agg_bloom_filter",
        "agg_corr_matrix",
        "window_ranking", "window_range_frame",
        "window_exclude_group_ties",
        "join_broadcast_part", "join_left_semi", "join_merge_hint",
        "join_asof_nearest",
        "subquery_in", "subquery_scalar_correlated",
        "setop_union",
        "topk_orders", "limit_offset_page",
        "fn_regex", "fn_variant_json", "fn_array_surface",
        "udtf_posexplode", "ptf_apply_in_pandas_zscore",
        "scan_filter_project",
        "stream_sliding", "stream_stream_join",
        "text_quality", "sim_cosine_topk_arrow", "dedup_record_linkage",
        "pipeline_neardedup_corpus",
        "events_survival_km", "timeseries_gap_fill",
        "stats_chi_square",
    ),
    9: (
    "agg_stats",
    "agg_collect",
    "sample_bucket",
    "distinct_rows",
    "setop_union_distinct",
    "setop_intersect",
    "setop_except",
    "setop_except_all",
    "agg_min_max_by",
    "join_left_outer",
    "join_right_outer",
    "join_left_anti",
    "join_cross",
    "join_pure_theta",
    "subquery_not_in",
    "window_lead_lag",
    "window_first_last",
    "window_exclude_current",
    "window_regr_slope",
    "fn_string",
    "fn_conditional",
    "fn_hash",
    "fn_mask",
    "fn_gap_tier",
    "fn_union_type",
    "udtf_explode_map",
    "udtf_inline",
    "fn_bitwise",
    "fn_map_surface",
    "agg_bool_family",
    "fn_trig",
    "fn_map_hof",
    "agg_filter_clause",
    "dedup_simhash",
    "sim_ann_lsh",
    "text_langid",
    "text_langid_ngram",
    "text_fingerprint",
    "text_ngrams_top",
    "multimodal_meta",
    ),
    10: (
    "dedup_containment_pairs",
    "user_state_scd2",
    "customer_interval_coverage",
    "sample_weighted",
    "orders_equidepth_histogram",
    "events_attribution_last_touch",
    "events_rolling_active_sketch",
    "funnel_conversion_window",
    "orders_trend_forecast",
    "events_longest_streak",
    "events_stickiness_dau_mau",
    "events_anomaly_mad",
    "dq_benford_first_digit",
    "events_changepoint_cusum",
    "customer_gini_revenue",
    "part_price_elasticity",
    "orders_pareto_frontier",
    "events_ab_uplift",
    "dq_reconciliation",
    "events_attribution_position",
    "dq_column_profile",
    "orders_abc_classification",
    "events_markov_stationary",
    "supplier_concentration_hhi",
    "dq_business_rules",
    "orders_ship_latency",
    "customer_segment_migration",
    "customer_repurchase_cycle",
    "orders_price_index",
    "events_did_analysis",
    "orders_abc_xyz_matrix",
    "sim_ann_binary",
    "emb_quality_report",
    "multimodal_payload_dedup",
    "stream_tumbling",
    "stream_tumbling_live",
    "stream_static_join",
    "stream_distinct_sketch",
    "agg_unpivot",
    "join_shuffle_hash_hint",
    ),
    11: (
    "fn_str_to_map",
    "fn_parse_url",
    "agg_histogram_numeric",
    "dq_checks",
    "agg_percentile_approx_contract",
    "agg_count_min_contract",
    "fn_sql_macro",
    "sql_pipe_syntax",
    "sql_lateral_alias",
    "sql_group_order_all",
    "sql_qualify_filter",
    "setop_union_by_name",
    "sql_values_inline",
    "sql_select_except",
    "sql_named_window",
    "source_xml_roundtrip",
    "source_sequencefile_roundtrip",
    "text_context_ngrams",
    "text_token_bpe_regex",
    "fn_string2",
    "fn_misc_surface",
    "fn_misc_xpath",
    "sample_fraction",
    "agg_hll_union",
    "agg_regr",
    "fn_numeric_repr",
    "fn_decimal_arith",
    "fn_datetime_misc",
    "agg_hll_intersect_estimate",
    "agg_mode_deterministic",
    "agg_listagg",
    "fn_collation_ci",
    "agg_percentile_disc",
    "text_normalize",
    "split_train_eval",
    "text_repetition_score",
    "text_pii_scrub",
    "emb_normalize_quantize",
    "corpus_token_stats",
    "corpus_zipf_fit",
    ),
    12: (
        "emb_pca_contract",
        "text_pmi_top_pairs",
        "dedup_graph_degrees",
        "corpus_length_histogram",
        "sim_hard_negatives",
        "emb_matryoshka_recall",
        "emb_cluster_separation",
        "corpus_heaps_fit",
        "sim_mmr_rerank",
        "sim_rrf_fusion",
        "text_chunk_sliding",
        "text_readability",
        "search_query_likelihood",
        "text_rake_phrases",
        "search_tfidf_cosine",
        "emb_mean_shift_drift",
        "domain_mix_resample",
        "shuffle_shard_assign",
        "sample_stratified",
        "vocab_coverage_cutoff",
        "source_overlap_matrix",
        "tokenize_word_ids",
        "sample_reservoir_group",
        "decontaminate_fuzzy",
        "search_eval_metrics",
        "sim_rocchio_expansion",
        "pack_efficiency_report",
        "tokenize_fertility",
        "text_source_divergence",
        "text_entropy_quality",
        "text_langid_confusion",
        "text_ttr_hapax",
        "text_script_profile",
        "ds_frequent_buyers",
        "ds_channel_rollup",
        "ds_returns_adjusted_spend",
        "ds_three_channel_ratio",
        "events_gap_stats",
        "customer_rfm_segments",
        "basket_part_affinity",
    ),
}


def never_benched() -> list:
    """Registry entries never timed by the headline or any rotating
    leg (past or current) — the candidate pool for the next leg, in
    registry order."""
    seen = set(HEADLINE) | set(ROTATING_LEG)
    for leg in BENCHED_HISTORY.values():
        seen |= set(leg)
    return [n for n in REGISTRY if n not in seen]


# r13 selection (VERDICT r12 "Next round" #4): ALL 42 remaining
# never-benched entries — the events/orders analytics tail, the graph
# statistics tier (triangles, clustering, Adamic-Adar,
# assortativity), the timeseries tail (EWMA, Theil-Sen, Holt,
# Croston, backtest, rolling/cross correlation), the stats tail
# (Mann-Whitney, subsample CI, power, FDR, Weibull, QQ, Fano, Tukey,
# Granger, Simpson) and the ml_* tier (naive Bayes, decision stump,
# Markov, basket rules, calibration, k-fold CV). Coverage after this
# leg: 362/362 — every registry entry benched at least once.
ROTATING_LEG = (
    "events_daily_anomaly",
    "orders_status_transitions",
    "supplier_pareto",
    "orders_backlog_curve",
    "events_hourly_seasonality",
    "orders_priority_mix_shift",
    "events_user_lifecycle",
    "region_nation_share",
    "part_type_hhi",
    "graph_triangles",
    "dedup_cluster_size_histogram",
    "graph_local_clustering",
    "graph_adamic_adar",
    "graph_assortativity",
    "rollup_multires",
    "orders_monthly_percentiles",
    "timeseries_rolling_corr",
    "timeseries_ewma",
    "timeseries_theil_sen",
    "timeseries_holt",
    "timeseries_backtest_naive",
    "timeseries_croston",
    "stats_mann_whitney",
    "timeseries_cross_corr",
    "stats_subsample_ci",
    "stats_power_two_proportions",
    "agg_approx_top_k_contract",
    "dq_freshness_lag",
    "retention_halflife_fit",
    "stats_fdr_bh",
    "stats_weibull_fit",
    "stats_qq_deciles",
    "events_fano_factor",
    "dq_outlier_tukey_fences",
    "stats_granger_lite",
    "stats_simpson_check",
    "ml_naive_bayes_langid",
    "ml_decision_stump",
    "ml_markov_next_event",
    "ml_basket_rules",
    "ml_regression_calibration",
    "ml_regression_kfold_cv",
)


def skew_leg(spark, sf_dir: str):
    """Measured skew-join story (VERDICT r6 #8 stretch, rebuilt r8 per
    VERDICT r7 #3/#7): a deliberately Zipf-style skewed join — the
    fact replicated 8x (explode, ~4.8M rows at sf0.1) then ~50% of
    rows remapped onto ONE supplier key by a deterministic xxhash64
    coin flip — timed three ways with dim broadcast DISABLED
    (mirroring the 100 TB regime where the dim outgrows the broadcast
    ceiling and the join must shuffle). The skewed fact is PERSISTED
    and materialized before any arm is timed (ADVICE r7-2), so the
    arms time the shuffle+join alone.

    Two structural defects in the r7 leg, found r8 by the new
    partition-row proxy, are fixed here — both are 100 TB lessons:

    1. **A single-mapper shuffle cannot be skew-split.** The r7 fact
       was one parquet file -> ONE scan task -> one shuffle mapper,
       and AQE splits a skewed reduce partition only at MAPPER
       boundaries — with one mapper there is nothing to split, at ANY
       threshold. The fact is now ``repartition(64)`` before persist
       (mirrors a real multi-file scan). Cluster lesson: a skewed
       join fed by a single/few-mapper stage (one giant file, a
       coalesce(1) upstream) is beyond AQE's reach.
    2. **Skew detection is compressed-BYTES-based and a constant-key
       hot partition compresses pathologically well.** Measured at
       sf0.1: the hot partition holds 2.45M rows vs the ~76k median
       (32x row skew) but its lz4 map-output bytes land under 2x the
       median — below the default 5x factor, so AQE never saw it
       (BENCH_r07's "aqe" arm was plain + overhead; the r7 prose
       claiming a salted win was wrong too, per the driver's own
       numbers). The aqe arm now lowers skewedPartitionFactor to 1.2
       + threshold 100k so the byte heuristic can see through the
       compression at bench scale. Cluster lesson: AQE protects
       shuffle BYTES; if deserialized row memory or per-row compute
       is the binding constraint, the byte heuristic under-fires on
       low-entropy hot keys — salt deterministically
       (operators/skew.py) when you know the key.

    With the mitigations actually engaged (this box, sf0.1,
    local[32]): plain ~2.5s / salted ~2.1s / aqe ~1.5s, and the
    row proxy shows the real story: max join-output partition rows
    plain ~2.45M (hot key in one task) / salted ~650k (8-salt
    scatter + hash collisions at 32 partitions) / aqe ~1.2M
    (split at mapper granularity by the advisory size). Wall-clock
    is box-noisy — read the proxy first; it is the quantity that
    becomes spill/OOM at 100x (240M rows in one task).

    - ``plain``: AQE skew split off -> the hot key lands in one task
      (the pathological straggler baseline);
    - ``aqe``: AQE skew split on, thresholds lowered as above;
    - ``salted``: the compile-time ``salted_join`` scatter over 8
      deterministic salts (operators/skew.py).

    Median-of-3 wall-clock per arm -> BENCH_DETAIL["skew"]; the
    untimed per-arm partition profile (max rows in one join-output
    partition + partition count, via spark_partition_id with AQE
    coalescing disabled so tiny bench partitions aren't merged) ->
    BENCH_DETAIL["skew_detail"] (VERDICT r7 #7).

    Returns (wall_clock_by_arm, partition_profile_by_arm)."""
    from pyspark.sql import functions as F

    from hive_release_spark.catalog import load_table
    from hive_release_spark.operators.skew import salted_join

    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_suppkey", "l_quantity")
        .withColumn("rep", F.explode(F.sequence(F.lit(1), F.lit(8))))
        .select(
            F.when(
                F.pmod(
                    F.xxhash64("l_orderkey", "l_linenumber", "rep"), F.lit(2)
                )
                == 0,
                F.lit(1),
            )
            .otherwise(F.col("l_suppkey"))
            .alias("l_suppkey"),
            "l_quantity",
        )
        # multi-mapper map side (docstring defect #1): one parquet
        # file scans as ONE task, and a single-mapper shuffle can
        # never be skew-split — spread the cache like a real
        # multi-file scan would be
        .repartition(64)
    )
    li = li.persist()
    li.count()  # materialize the cache outside the timed region
    supp = load_table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("l_suppkey"), "s_name"
    )

    def run_arm(build) -> float:
        t0 = time.time()
        (
            build()
            .groupBy("s_name")
            .agg(F.count("*").alias("n"), F.sum("l_quantity").alias("qty"))
            .write.format("noop")
            .mode("overwrite")
            .save()
        )
        return time.time() - t0

    def partition_profile(build) -> dict[str, int]:
        """Hot-partition memory proxy (VERDICT r7 #7): row count of the
        fattest partition at the JOIN OUTPUT (pre-agg), via
        spark_partition_id — the per-task memory a 100x run must hold.
        Untimed; runs under the same skew confs as the arm it profiles,
        but with AQE partition COALESCING off: at bench scale the whole
        join output is smaller than the 64 MB advisory and coalescing
        would merge every arm to one partition, erasing exactly the
        per-reduce-task distribution this proxy exists to show."""
        coalesce_key = "spark.sql.adaptive.coalescePartitions.enabled"
        saved_coalesce = conf.get(coalesce_key)
        conf.set(coalesce_key, "false")
        try:
            prof = (
                build()
                .select(F.spark_partition_id().alias("__pid"))
                .groupBy("__pid")
                .count()
                .agg(
                    F.max("count").alias("max_rows"),
                    F.count("*").alias("n_parts"),
                )
            )
            sizes = prof.collect()[0]
            plan = prof._jdf.queryExecution().executedPlan().toString()
        finally:
            conf.set(coalesce_key, saved_coalesce)
        return {
            "max_partition_rows": int(sizes["max_rows"]),
            "n_partitions": int(sizes["n_parts"]),
            "skew_split_fired": "skew=true" in plan,
        }

    conf = spark.conf
    saved = {
        k: conf.get(k)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.skewJoin.enabled",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
        )
    }
    out: dict[str, float] = {}
    detail: dict[str, dict[str, int]] = {}
    try:
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

        conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
        plain_arm = lambda: li.join(supp, "l_suppkey")  # noqa: E731
        salted_arm = lambda: salted_join(  # noqa: E731
            li, supp, on="l_suppkey", n_salts=8
        )
        out["plain"] = round(
            sorted(run_arm(plain_arm) for _ in range(3))[1], 3
        )
        detail["plain"] = partition_profile(plain_arm)
        out["salted"] = round(
            sorted(run_arm(salted_arm) for _ in range(3))[1], 3
        )
        detail["salted"] = partition_profile(salted_arm)

        conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
        # factor 1.2 + 100k threshold: the compressed-bytes heuristic
        # needs this to see the 32x ROW skew through the constant-key
        # compression (docstring defect #2; default factor 5 never
        # fires on this shape at any threshold)
        conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.2")
        conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "100k",
        )
        conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "256k")
        out["aqe"] = round(
            sorted(run_arm(plain_arm) for _ in range(3))[1], 3
        )
        detail["aqe"] = partition_profile(plain_arm)
    finally:
        for k, v in saved.items():
            conf.set(k, v)
        li.unpersist()
    return out, detail


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_session(
        app_name="hive_release_spark_bench",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    bench_t0 = time.time()

    def run(name: str) -> float:
        fn = REGISTRY[name].fn
        t0 = time.time()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        return time.time() - t0

    run("q1_pricing_summary")  # JVM/codegen warmup, untimed

    # min of THREE runs per query (r5, was 2): this VM's timing noise is
    # large (observed 3-10x swings) and min-of-2 failed to converge for
    # small queries late in a 32-query session — the r4 "drift" on
    # text_tfidf_top_terms / window_rows_frame / q3 reproduced under
    # min-of-2 but vanished under isolated min-of-4 (window_rows_frame
    # 0.99s benched vs 0.62s converged, BELOW its r3 number), naming the
    # cause as first-run/position inflation, not plan damage.
    # position_sec records each query's wall-clock offset from bench
    # start so cross-round deltas can be correlated with session
    # position (the +30% drift on small queries is position-correlated,
    # r2 verdict).
    per_query: dict[str, float] = {}
    median_headline: dict[str, float] = {}
    runs: dict[str, list[float]] = {}
    position: dict[str, float] = {}
    # Each entry's measurement runs inside pipeline_scope (r9, VERDICT
    # r8 #6 adoption): call-time persists are shared across the entry's
    # own repetitions (the cache-hit reruns min-of-3 has always
    # measured) but released — untimed, after the last rep — before the
    # NEXT entry runs.  Without the scope a 120-entry session
    # accumulates every entry's caches: executor storage fills, GC
    # pressure inflates late-session timings (the r8 uniform +16%
    # false-alarm shape), and Spark's CacheManager substitutes live
    # cached subtrees into later entries' plans, so what gets timed
    # stops being the clean-session plan the plan sweep asserts.
    for name in HEADLINE:
        position[name] = round(time.time() - bench_t0, 1)
        with pipeline_scope():
            runs[name] = [run(name), run(name), run(name)]
        per_query[name] = round(min(runs[name]), 3)
        # median-of-3 alongside the min (VERDICT r8 #5): round-over-
        # round comparison reads MEDIANS — r8 burned a 16% false alarm
        # on uniform position inflation that min-of-3 preserved but the
        # existing 5-query median calibration disproved; the median is
        # the noise-robust cross-round statistic, the min stays as the
        # best-case floor the per-query map has always carried.
        median_headline[name] = round(sorted(runs[name])[1], 3)

    # the 5 heaviest get a FOURTH repetition and a near-median report —
    # min-of-N on a noisy VM can understate a genuinely heavy query; the
    # second-smallest of 4 distinguishes a real plan regression from a
    # one-off scheduler stall.
    heavy5 = sorted(per_query, key=per_query.get, reverse=True)[:5]
    median5: dict[str, float] = {}
    for name in heavy5:
        with pipeline_scope():
            runs[name].append(run(name))
        median5[name] = round(sorted(runs[name])[1], 3)
        per_query[name] = round(min(runs[name]), 3)

    # rotating leg: median-of-3 per entry (kinder to the long tail than
    # min — a leg entry is benched once per several rounds, so a
    # one-off stall shouldn't be immortalized as its number)
    rotating: dict[str, float] = {}
    for name in ROTATING_LEG:
        with pipeline_scope():
            rotating[name] = round(sorted(run(name) for _ in range(3))[1], 3)
    rotating_total = round(sum(rotating.values()), 3)

    skew, skew_detail = skew_leg(spark, sf_dir)

    total = round(sum(per_query.values()), 3)
    median_total = round(sum(median_headline.values()), 3)
    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf
    detail = {
        "metric": "headline_queries_total_sec",
        "value": total,
        "unit": "sec",
        "queries": per_query,
        "median_headline": median_headline,
        "median_total_sec": median_total,
        "median_heavy5": median5,
        "position_sec": position,
        "rotating": rotating,
        "rotating_total_sec": rotating_total,
        "skew": skew,
        "skew_detail": skew_detail,
        "sf": sf_val,
    }
    detail_path = Path(__file__).resolve().parent / "BENCH_DETAIL.json"
    detail_path.write_text(json.dumps(detail, indent=1) + "\n")
    print(json.dumps(detail))
    # FINAL line = compact summary (driver-parsable: the r4 detail line
    # outgrew the driver's stdout tail and the gate recorded parsed:null;
    # per-query secs stay in, at 2 decimals and compact separators, the
    # diagnostics move to BENCH_DETAIL.json / the detail line above).
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_sec",
                "value": total,
                "unit": "sec",
                "queries": {k: round(v, 2) for k, v in per_query.items()},
                "median_total_sec": median_total,
                "sf": sf_val,
                "n_queries": len(per_query),
                "rotating_total_sec": rotating_total,
                "n_rotating": len(rotating),
                "skew": skew,
                "skew_max_rows": {
                    k: v["max_partition_rows"] for k, v in skew_detail.items()
                },
            },
            separators=(",", ":"),
        )
    )


if __name__ == "__main__":
    main()
