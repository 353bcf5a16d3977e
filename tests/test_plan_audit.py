"""Physical-plan assertions for headline queries: the scale contract
(broadcast dims, bounded shuffles, projection pruning, no Python in the hot
path) checked mechanically from the executed plan."""

from __future__ import annotations

from hackatonbigdata_spark.plans.audit import plan_stats, read_schema_columns
from hackatonbigdata_spark.registry import all_queries
from tests.conftest import SF_DIR

QUERIES = all_queries()


def test_flagship_broadcasts_dim_and_prunes_columns(spark):
    df = QUERIES["flagship_weekly_brand_demand"](spark, SF_DIR)
    s = plan_stats(df)
    assert s.broadcasts >= 1, "part dim should broadcast"
    assert s.shuffles <= 3, f"agg+window should need ≤3 shuffles, got {s.shuffles}"
    assert not s.has_python_udf
    for cols in read_schema_columns(df):
        # every scan must be pruned well below the full table width
        assert len(cols) <= 6, f"unpruned scan: {cols}"


def test_multiway_join_broadcasts_all_dims(spark):
    s = plan_stats(QUERIES["join_multiway_enrich"](spark, SF_DIR))
    assert s.broadcasts >= 3, "supplier/nation/region dims should all broadcast"


def test_heuristic_blend_bounded_shuffles(spark):
    s = plan_stats(QUERIES["heuristic_blend_forecast"](spark, SF_DIR))
    # 3 aggregate grains + rank + final join — must not grow beyond that
    assert s.shuffles <= 6, f"got {s.shuffles}"
    assert s.broadcasts >= 2


def test_series_kernels_are_the_only_python(spark):
    assert plan_stats(QUERIES["ewm_pandas_per_series"](spark, SF_DIR)).has_python_udf
    for name in ["agg_multistat_product", "window_rolling_stats", "ewm_daily_store"]:
        assert not plan_stats(QUERIES[name](spark, SF_DIR)).has_python_udf, name


def test_no_unpartitioned_windows_in_scale_paths(spark):
    """The r1 scale-killers (global percent_rank / cumulative-share / ntile /
    global-count windows) must stay rewritten: no Window node without a
    partition key in any fact-table-sized query.  Queries over bounded
    domains (25 brands, ~26 label buckets) are the only allowed
    exceptions."""
    from hackatonbigdata_spark.plans.audit import unpartitioned_windows

    for name in [
        "metric_abc_tiers",
        "heuristic_blend_forecast",
        "binning_quantile_ntile",
        "frequency_encoding",
        "flagship_weekly_brand_demand",
        "window_rolling_stats",
        "window_rolling_median_skew",
        "store_coldstart_fallback",
        "stacking_predictions_join",
        "residual_diagnostics_store",
        "join_asof_view_attribution",
        "text_tfidf_topterms",
        "window_rolling_multiscale",
        "customer_rfm_segments",
        "metric_wmape_weighted",
        "calibration_curve_bins",
        "join_range_price_band",
        "stream_late_data_policy",
        # round-4 additions: packing must stay per-shard, splits/contamination
        # and the new similarity/calibration paths must stay window-free or
        # keyed
        "seqpack_greedy_bins",
        "sample_stratified_split",
        "contamination_ngram_overlap",
        "embedding_quantize_int8",
        "similarity_ivf_kmeans",
        "similarity_pca_cosine",
        "calibration_isotonic",
        "io_upsert_roundtrip",
        "corpus_curation_pipeline",
        "text_unigram_logprob",
        "text_repetition_ratio",
    ]:
        assert unpartitioned_windows(QUERIES[name](spark, SF_DIR)) == 0, name


def test_new_pipeline_ops_stay_jvm_side(spark):
    """The round-4 pipeline operators are pure column math / joins — no
    Python UDF may appear in their plans (the kernels in series_kernels.py
    and the decode stub stay the only Python)."""
    for name in [
        "sample_stratified_split",
        "contamination_ngram_overlap",
        "embedding_quantize_int8",
        "seqpack_greedy_bins",
        "corpus_curation_pipeline",
        "text_unigram_logprob",
        "text_repetition_ratio",
    ]:
        assert not plan_stats(QUERIES[name](spark, SF_DIR)).has_python_udf, name


def test_contamination_broadcasts_benchmark_side(spark):
    s = plan_stats(QUERIES["contamination_ngram_overlap"](spark, SF_DIR))
    assert s.broadcasts >= 1, "the 2% benchmark shingle set should broadcast"


def test_round5_ops_stay_jvm_side_and_keyed(spark):
    """Round-5 operators: no Python UDF, and no unpartitioned window over
    fact-scale input.  feature_importance_topk's ranking window is exempt
    from the window check by design — it runs over ≤ #features rows (the
    schema, not the data); its aggregate stage must still be keyed."""
    from hackatonbigdata_spark.plans.audit import unpartitioned_windows

    for name in [
        "calibration_conformal",
        "calibration_temperature",
        "calibration_quantile_band",
        "calibration_subsample_uncertainty",
        "stacking_ridge_weights",
        "ensemble_dynamic_weights",
        "feature_importance_topk",
        "corpus_mixture_weights",
        "dedup_report_by_source",
        "agg_sketches_only",
        "cdc_scd2_user_state",
        "diag_skew_heavy_hitters",
        "sample_reservoir_per_group",
        "ann_recall_at_k",
        "text_dupgram_fraction",
        "ar2_yule_walker_sql",
        "croston_ses_sql",
        "dedup_incremental_vs_snapshot",
        "corpus_resample_ncopies",
    ]:
        assert not plan_stats(QUERIES[name](spark, SF_DIR)).has_python_udf, name
    # diag_skew_heavy_hitters is exempt from the window check by design: its
    # rank window runs over the already-limited top-5 rows (TakeOrdered
    # bounds the input), never over the key dimension.
    for name in [
        "calibration_conformal",
        "calibration_temperature",
        "calibration_quantile_band",
        "calibration_subsample_uncertainty",
        "stacking_ridge_weights",
        "ensemble_dynamic_weights",
        "corpus_mixture_weights",
        "dedup_report_by_source",
        "agg_sketches_only",
        "cdc_scd2_user_state",
        "sample_reservoir_per_group",
        "ann_recall_at_k",
        "text_dupgram_fraction",
        "ar2_yule_walker_sql",
        "croston_ses_sql",
        "dedup_incremental_vs_snapshot",
        "corpus_resample_ncopies",
    ]:
        assert unpartitioned_windows(QUERIES[name](spark, SF_DIR)) == 0, name


def test_round5b_ops_stay_jvm_side_and_keyed(spark):
    """Round-5b operators (sequence/graph/diff/LM/MAD): no Python UDF
    anywhere; windows keyed except PageRank's final ranking, which runs
    over the bounded node dimension (parts with ≥2 shared baskets), the
    same exemption as market_share_brand's global brand rank."""
    from hackatonbigdata_spark.plans.audit import unpartitioned_windows

    for name in [
        "seq_event_transitions",
        "interval_merge_coverage",
        "graph_pagerank_parts",
        "snapshot_table_diff",
        "text_bigram_logprob",
        "anomaly_mad_flags",
        "calibration_platt_exact",
        "encode_target_oof",
        "window_rolling_distinct",
        "time_weighted_avg",
        "attribution_multitouch_linear",
        "drift_psi_distribution",
        "drift_performance_periods",
        "window_rank_movers",
        "grouping_sets_custom",
        "eval_confusion_by_store",
        "eval_decile_lift",
        "ab_test_welch",
        "corr_spearman_store",
        "price_elasticity_brand",
        "ab_test_ks",
        "audit_benford_digits",
        "survival_km_signup_purchase",
        "seq_path_trigrams",
        "anomaly_poisson_spikes",
        "text_zipf_slope",
        "quantile_normalize_store",
        "io_schema_evolution",
        "ab_test_cuped",
        "cohort_ltv_curve",
        "window_cusum_changepoint",
        "postproc_topdown_reconcile",
        "io_incremental_rollup",
        "queue_backlog_lindley",
        "embedding_centroid_drift",
        "seasonal_strength_store",
        "concentration_gini_brand",
        "window_max_drawdown",
        "orders_ship_sla",
        "ab_test_mannwhitney",
        "alert_error_burnrate",
        "sample_weighted_aexpj",
    ]:
        assert not plan_stats(QUERIES[name](spark, SF_DIR)).has_python_udf, name
    for name in [
        "seq_event_transitions",
        "interval_merge_coverage",
        "snapshot_table_diff",
        "text_bigram_logprob",
        "anomaly_mad_flags",
        "encode_target_oof",
        "window_rolling_distinct",
        "time_weighted_avg",
        "attribution_multitouch_linear",
    ]:
        assert unpartitioned_windows(QUERIES[name](spark, SF_DIR)) == 0, name


def test_partitioned_read_prunes_partitions(spark):
    """io_partitioned_prune's read-back must carry the year predicate as a
    PartitionFilter (directory pruning), not a row-level filter."""
    df = QUERIES["io_partitioned_prune"](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    import re

    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "ship_year" in m.group(1), f"year predicate not pushed: {m}"


def test_bucketed_join_has_no_exchange(spark):
    """io_bucketed_join's whole point: after the bucketed write, the
    fact-fact sort-merge join must plan with ZERO exchanges."""
    QUERIES["io_bucketed_join"](spark, SF_DIR).collect()  # creates tables
    tag = SF_DIR.rstrip("/").rsplit("/", 1)[-1].replace(".", "_")
    li = spark.table(f"hb_li_bkt_{tag}")
    od = spark.table(f"hb_ord_bkt_{tag}")
    j = li.join(od, li.l_orderkey == od.o_orderkey)
    assert plan_stats(j).shuffles == 0


def test_salted_join_avoids_broadcast(spark):
    """join_salted_skew must execute the salted SHUFFLE path (zero
    broadcasts) or the demo proves nothing."""
    s = plan_stats(QUERIES["join_salted_skew"](spark, SF_DIR))
    assert s.broadcasts == 0
    assert not s.has_python_udf


def test_clustered_stats_prune_skips_files(spark):
    """io_clustered_stats_prune: after the range-clustered write, the
    half-year predicate must skip most of the 16 files."""
    from hackatonbigdata_spark.operators.io_queries import (
        _scratch,
        clustered_file_stats,
    )

    QUERIES["io_clustered_stats_prune"](spark, SF_DIR).collect()
    stats = clustered_file_stats(spark, _scratch(SF_DIR, "clustered_by_shipdate"))
    keep = [
        f for f, mn, mx in stats
        if str(mx)[:10] >= "1997-01-01" and str(mn)[:10] < "1997-07-01"
    ]
    assert len(stats) >= 8
    assert len(keep) <= len(stats) // 2, (len(keep), len(stats))
