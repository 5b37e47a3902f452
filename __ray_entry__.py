"""Driver contract (see SURVEY.md §2 for the operator inventory).

Ray is initialised by the driver before this module is imported; nothing
here (or in the ``engine`` package) calls ``ray.init()``/``ray.shutdown()``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable
from typing import Any

# Driver-side insurance: make the engine package resolve even if this
# module is loaded by file path (importlib spec) without the repo root on
# sys.path. Note: Ray WORKER processes inherit their module search path
# from the raylet started at ray.init — they find `engine` when the
# driver ran from the repo root (the normal case) or with the repo on
# PYTHONPATH at init time.
_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)


def entry() -> Any:
    """Flagship: language-ID + quality-filter + scrub pipeline on the
    sf0.001 ``documents`` table adapted to the corpus shape
    (repo, path, commit, lang, content)."""
    from engine.pipelines.quality import corpus_from_documents, quality_pipeline

    ds = corpus_from_documents("/root/testdata/sf0.001")
    out = quality_pipeline(
        ds,
        thresholds={
            # documents carry natural-language labels outside the code-langid
            # label set; disable the code-lang rules for this smoke run
            "known_langs": ("en", "de", "fr", "es", "zh"),
            "min_mismatch_conf": 2.0,  # conf is <=1 -> lang_mismatch off
        },
    )
    return out


# Driver-sweep ordering (the driver certifies a fixed-size window — 50 in
# rounds 1-3 — from the head of this tuple). Round-4 rotation, sized so a
# 50-slot window covers exactly blocks 1-6 below: (1) the 17 oracle-SQL
# queries the round-3 verdict flagged as never driver-certified (item 1's
# done-bar, incl. the §2 parity queries percentage_range_discount / M8 and
# ssn_mask_format_customer_name / M11), then (2-6) the session-8/7/6/5/4
# additions (17+4+13+3+1+12 = 50). Everything after — the spans /
# incremental / jpeg block, the session-9/10 distribution / reconciliation
# / profile additions, and the rows-only recerts — rotates to the round-5
# head (43 entries + 7 recert slots). Every oracle query is also
# re-checked against DuckDB on every pytest run
# (tests/test_queries_oracle.py), so a query outside the window is still
# continuously verified, just not driver-certified yet.
_SWEEP_FIRST = (
    # -- (1) never driver-swept oracle-SQL queries (round-3 verdict item 1) --
    "percentage_range_discount",
    "ssn_mask_format_customer_name",
    "top_sources_documents",
    "winsorize_clip_events",
    "asof_forward_events_orders",
    "weighted_sample_documents",
    "histogram_events_value",
    "conversion_latency_percentiles_events",
    "benford_first_digit_events",
    "share_of_total_events_by_type",
    "equidepth_histogram_events",
    "null_profile_orders",
    "customers_without_orders",
    "value_percentiles_cont_events",
    "fuzzy_name_pairs_customer",
    "fuzzy_name_pairs2_customer",
    "pivot_events_by_type",
    # -- (2) session-8 additions --
    "c4_line_filter_documents",
    "cc_luhn_pii_documents",
    "event_transition_counts_events",
    "term_cooccurrence_documents",
    # -- (3) session-7 additions: TPC-H Q5/Q7/Q8/Q9/Q21/Q11 shapes --
    "local_supplier_volume",
    "volume_shipping_nations",
    "market_share_nation",
    "widget_revenue_nations",
    "waiting_suppliers",
    "important_parts_value",
    "part_supplier_counts",
    "excess_share_suppliers",
    "grouped_percentiles_cont_events",
    "grouped_mad_outliers_events",
    "min_acctbal_supplier_per_part",
    "lead_lag_events_value",
    "cohort_retention_events",
    # -- session-6 additions: TPC-H Q13/Q19/Q22 shapes --
    "order_count_distribution",
    "disjunctive_revenue_part",
    "idle_high_balance_customers",
    # -- session-5 additions --
    "linestatus_priority_counts",
    # -- session-4 additions: Gopher-style quality rules, TPC-H
    # Q14/Q10/Q18/Q4/Q17 shapes, FIRST/LAST_VALUE window --
    "gopher_quality_documents",
    "promo_revenue_lineitem_part",
    "returned_items_top_customers",
    "large_volume_customers",
    "late_shipment_priority_orders",
    "small_quantity_revenue_part",
    "first_last_event_per_user",
    "winsorize_by_event_type",
    "running_customer_spend_orders",
    "value_ranks_events_per_user",
    "forecast_revenue_change",
    "top_supplier_revenue",
    # ---- 50-slot window boundary: round-5 rotation head below ----
    # -- session-11/12 additions (newest never-certified first): the
    # code-corpus screening pack, epoch shuffle, indentation/comment/
    # encoding screens (oracle-SQL) and the trained LR filter
    # (rows-only) --
    "code_screen_documents",
    "line_structure_by_lang",
    "url_email_leak_by_source",
    "license_header_docs_by_source",
    "epoch_shuffle_rank_documents",
    "indent_profile_by_lang",
    "comment_density_by_lang",
    "encoding_anomaly_documents",
    "nfc_debt_by_source",
    "mixture_weights_by_source",
    "keyword_stuffing_documents",
    "paragraph_dup_documents",
    "lr_quality_filter_corpus",
    "neardup_recall_corpus",
    # -- cross-doc repeated-span detection + incremental shard-vs-index
    # near-dedup (oracle: duplicate/strip_spans, shipping_priority;
    # rows-only: incremental_*, ingest_shard, jpeg decode) --
    "duplicate_spans_documents",
    "strip_spans_documents",
    "incremental_neardup_documents",
    "incremental_exact_dedup_documents",
    "ingest_shard_documents",
    "multimodal_jpeg_decode_features",
    "shipping_priority_orders",
    "corr_by_returnflag_lineitem",
    "join_key_skew_orders",
    # -- session-9 additions: rank-position windows + distribution stats --
    "percentile_position_events_per_user",
    "gini_value_events",
    "ks_ab_drift_events",
    "longest_daily_streak_events",
    # -- session-10 additions: reconciliation + distribution profiles --
    "order_total_reconciliation",
    "dayover_user_jaccard_events",
    "chi2_type_weekday_events",
    "simpson_diversity_events_per_user",
    "revenue_pareto_orders",
    "lag1_autocorr_daily_events",
    "normalized_name_dups_customer",
    "stickiness_dau_mau_events",
    "hourly_profile_events",
    "repeat_purchase_interval_orders",
    "anomalous_days_events",
    "user_lifespan_stats_events",
    "weekend_lift_events",
    "value_trend_by_event_type",
    "median_order_value_by_mktsegment",
    "duplicate_rate_by_source",
    "hhi_event_type_concentration",
    "cross_source_overlap_documents",
    "return_rate_by_ship_month",
    "discount_quantity_elasticity",
    "new_vs_returning_users_daily",
    "session_stats_events",
    "activity_gini_events_per_user",
    "reactivated_users_monthly",
    "price_stddev_by_brand_part",
    # -- rows-only queries (no oracle SQL): driver records a rows-only
    # check; first driver rows for the ones never swept --
    "langid_confusion_corpus",
    "perplexity_profile_corpus",
    "multimodal_decode_features",
    "multimodal_png_decode_features",
    "multimodal_audio_features",
    "kmeans_embeddings_clusters",
    "semdedup_embeddings",
    "ivf_knn_embeddings",
    "pq_knn_embeddings",
    "ivfpq_knn_embeddings",
    "approx_distinct_orderkeys",
    "approx_percentiles_events",
    "bloom_fk_prefilter_events_customer",
    # -- previously-certified queries, most-recently-certified last (r3
    # greens below, r1/r2 greens interleaved by the registry order) --
    "mode_event_type_per_user",
    "event_sequence_signature_events",
    "max_gap_events_per_user",
    "fd_check_lineitem_returnflag",
    "rolling_sum_events",
    "range_window_sum_events",
    "session_window_events",
    "tumbling_window_events",
    "hopping_window_events",
    "top_docs_per_lang",
    "ntile_quartiles_by_event_type",
    "grouped_percentiles_docs_by_lang",
    "asof_join_events_orders",
    "ntile_deciles_events",
    "value_drift_halves_events",
    "rolling_7day_users_events",
    "fuzzy_name_clusters_customer",
    "heavy_hitters_event_types",
    "weekly_rollup_events",
    "doc_embedding_label_stats",
    "balance_langs_documents",
    "daily_active_users_events",
    "retention_next_day_events",
    "sample_hash_topk_documents",
    "df_stopword_scrub_documents",
    "json_props_rollup_events",
    "outlier_mad_events",
    "revenue_by_nation",
    "corr_lineitem_qty_price",
    "users_per_event_type",
    "funnel_signup_purchase_events",
    "zscore_events_value",
    "rollup_events_grouping_sets",
    "tfidf_top_term_documents",
    "chunk_documents_tokens",
    "cumulative_new_users_events",
    "ngram_docfreq_documents",
    "pricing_summary_lineitem",
    "value_percentiles_events",
    "hierarchy_cycle_supplier",
    "validation_summary_chain",
    "explode_paragraphs_documents",
    "normalize_text_documents",
    "pack_documents_token_budget",
    "range_join_events_value_bands",
    "train_val_split_documents",
    "contamination_documents",
    "vocab_top_terms_documents",
    "repetition_stats_documents",
    "capped_sample_per_source",
)


def _reordered(d: dict) -> dict:
    head = {k: d[k] for k in _SWEEP_FIRST if k in d}
    head.update((k, v) for k, v in d.items() if k not in head)
    return head


def queries() -> dict[str, Callable[[str], Any]]:
    """One entry per implemented operator/pipeline from SURVEY.md §2."""
    from engine.queries import QUERIES
    import engine.queries_ext  # noqa: F401  (registers the extended set)

    return _reordered(dict(QUERIES))


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible query."""
    from engine.queries import ORACLE_SQL
    import engine.queries_ext  # noqa: F401

    return _reordered(dict(ORACLE_SQL))
