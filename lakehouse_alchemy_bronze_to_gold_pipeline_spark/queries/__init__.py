"""Driver-contract query registry.

``SPARK_QUERIES``: name -> callable(spark, sf_dir) -> DataFrame.
``ORACLE_SQL``:    name -> equivalent DuckDB SQL (omitted for ops that
                   are not SQL-expressible; the driver then records a
                   weaker rows-only check).

Every query exercises engine operators (SURVEY section 2) against the
driver's synthetic tables; aliases match between both sides because
the driver's comparator sorts columns by name before hashing.
"""

from .advanced import SPARK_QUERIES as _ADV_Q, ORACLE_SQL as _ADV_SQL
from .analytics import SPARK_QUERIES as _AN_Q, ORACLE_SQL as _AN_SQL
from .breadth import SPARK_QUERIES as _BR_Q, ORACLE_SQL as _BR_SQL
from .core import SPARK_QUERIES as _CORE_Q, ORACLE_SQL as _CORE_SQL
from .corpus import SPARK_QUERIES as _CP_Q, ORACLE_SQL as _CP_SQL
from .decision import SPARK_QUERIES as _DS_Q, ORACLE_SQL as _DS_SQL
from .digest import SPARK_QUERIES as _DG_Q, ORACLE_SQL as _DG_SQL
from .llm_ops import SPARK_QUERIES as _LLM_Q, ORACLE_SQL as _LLM_SQL
from .mlaudit import SPARK_QUERIES as _MA_Q, ORACLE_SQL as _MA_SQL

_ALL = {**_LLM_Q, **_CP_Q, **_CORE_Q, **_AN_Q, **_BR_Q, **_ADV_Q, **_DS_Q,
        **_DG_Q, **_MA_Q}

# The external correctness harness checks the FIRST 50 entries in
# dict order (of len(SPARK_QUERIES) total).  We (a) run ALL queries
# against their oracles locally every round and commit the result
# (tools/check_correctness.py -> LOCAL_CORRECTNESS_r{N}.md), and
# (b) order the registry so the driver's independent certification
# lands where it is most valuable: every entry with NO driver row in
# ANY prior round (union of CORRECTNESS_r01..r05 keys) comes first,
# then re-certifications of changed queries, then the stalest
# last-certified entries (r2, then r3).  tools/window_audit.py
# recomputes the never-certified set for the next rotation.
_PRIORITY = (
    # ---- r7 driver window (slots 1-50): mechanical staleness
    # rotation per the r6 verdict.  The 2 never-driver-certified
    # entries lead (added after the r6 window froze, both local-sweep
    # green at full float precision), then the oldest-certified pool
    # in (last-certified round, registry order): the 5 r2 entries,
    # the 35 r3 entries, and the first 8 of the r4 pool.  Computed by
    # sorted(names, key=(last_round, index)) over CORRECTNESS_r01..r06
    # — tools/window_audit.py reproduces the ordering.
    "props_variant_stats", "pipe_syntax_flag_stats",
    # r7 addition (never-certified, inserted INSIDE the window per
    # the policy below; displaces the r4 tail's pricing_summary to
    # the r8 queue): the oracle-backed recall-readout twin
    "ann_recall_exact_fixed",
    # r2-stale (slots 4-8)
    "customer_string_funcs", "event_date_spine", "order_metrics_melt",
    "orders_stratified_sample", "signup_purchase_funnel",
    # r3-stale (slots 9-43)
    "minhash_neardup_md5", "dedup_clusters", "dedup_keep_canonical",
    "embedding_lsh_topk", "domain_mix_sample", "doc_pack_chunks",
    "doc_repetition_filter", "filter_attrition_report",
    "embedding_dim_stats", "bm25_search", "dedup_documents_exact",
    "doc_chunking", "doc_fingerprint", "doc_quality_score",
    "embedding_ivf_topk", "embedding_quantize_int8", "embedding_topk",
    "eval_contamination", "knn_join", "lang_id_confusion",
    "minhash_neardup", "simhash_bits_md5", "simhash_fingerprints",
    "text_token_stats", "token_count_bpe", "embedding_neardup",
    "ngram_jaccard_query", "multimodal_frames", "multimodal_features",
    "multimodal_image_features", "multimodal_audio_features",
    "training_corpus_prep", "tfidf_top_terms", "vocab_top_terms",
    "terms_heavy_hitters",
    # r4-stale head (slots 44-50)
    "fact_sales", "dim_customer", "dim_part", "dq_violation_counts",
    "dq_failing_rows", "orphan_orders", "orders_with_big_items",
    # ---- 50-slot window boundary ----
    "pricing_summary",
    # r8 queue: the remaining 42 r4-certified entries, already in
    # rotation order — by end of r8 no entry should be older than r4
    # (r6 verdict task 4).  New queries added mid-round must be
    # inserted ABOVE this queue but INSIDE the window (displacing the
    # window's r4 tail down here) so a post-close driver artifact can
    # never strand a never-certified entry outside the window.
    "top_customers_per_segment", "revenue_rollup", "events_hourly",
    "events_json_kv", "sessionize_events", "session_conversion_daily",
    "dedup_events_keep_latest", "set_ops_customers",
    "customer_running_spend", "order_priority_cube",
    "returnflag_pivot", "segment_distinct_customers",
    "asof_latest_order", "scd1_upsert", "brand_supplier_hhi",
    "brand_cooccurrence_top", "order_backlog_daily",
    "user_retention_cohorts", "price_percentiles",
    "price_percentiles_approx", "revenue_grouping_sets",
    "events_band_join", "late_shipment_orders",
    "brand_small_quantity_revenue", "daily_activity",
    "customer_recent_spend", "top_unshipped_orders",
    "order_date_math", "token_array_ops", "orders_profile",
    "events_window_fn", "asia_nation_revenue", "embedding_top_pairs",
    "embedding_top_pairs_lsh", "embedding_neardup_lsh",
    "snapshot_diff_orders", "scd2_customer_history",
    "order_rank_functions", "price_histogram", "lineitem_moments",
    "user_activity_streaks", "lineitem_hash_sample",
)
assert set(_PRIORITY) <= set(_ALL), sorted(set(_PRIORITY) - set(_ALL))

SPARK_QUERIES = {k: _ALL[k] for k in _PRIORITY}
SPARK_QUERIES.update({k: v for k, v in _ALL.items() if k not in SPARK_QUERIES})

ORACLE_SQL = {**_LLM_SQL, **_CP_SQL, **_CORE_SQL, **_AN_SQL, **_BR_SQL,
              **_ADV_SQL, **_DS_SQL, **_DG_SQL, **_MA_SQL}

#: Exact small-sf correctness baselines kept ONLY as oracle
#: cross-checks for their bucketed/indexed scale twins: the O(n^2)
#: pair baselines behind ``embedding_top_pairs_lsh`` /
#: ``embedding_neardup_lsh``, and the exact-kNN-ground-truth recall
#: readouts (``ann_recall_report`` + its deterministic oracle twin)
#: whose component index paths are benched as their own entries.
#: The bench skips them: an exact corpus-wide scan is never the plan
#: we'd run at 100 TB, so timing it misrepresents the headline path.
BENCH_EXCLUDE = frozenset({
    "embedding_top_pairs", "embedding_neardup",
    "ann_recall_report", "ann_recall_exact_fixed",
})

__all__ = ["SPARK_QUERIES", "ORACLE_SQL", "BENCH_EXCLUDE"]
