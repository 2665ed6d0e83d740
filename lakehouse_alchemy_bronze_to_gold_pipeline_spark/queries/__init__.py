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
    # never driver-certified (r5 verdict's mandated r6 window, all
    # local-sweep green at FULL float precision): the 21 entries with
    # no driver row in any of r1..r5
    "sole_late_supplier", "pair_containment", "zipf_fit_report",
    "tokenizer_fertility", "ann_hubness_report_sampled",
    "weekly_stickiness", "bloom_semijoin_prune",
    "cms_bigram_accuracy", "weighted_reservoir_sample",
    "dow_seasonality", "ordered_funnel_3step",
    "brand_label_propagation", "reach_kmv_accuracy",
    "top_supplier_revenue", "nation_revenue_share",
    "doc_cleaning_report", "holt_revenue_forecast",
    "pit_feature_join", "ab_test_zscore",
    "daily_revenue_autocorr", "referential_integrity_sweep",
    # RE-certification: the r5 red cell, rewritten to exact integer
    # lerp statistics (cent-scaled BIGINT num/den) this round
    "gap_fill_interpolate",
    # never driver-certified, round-6 additions (slots 23-31) — all
    # local-sweep green at FULL float precision before queueing
    "mg_heavy_hitters_fixed", "simhash_accuracy",
    "embedding_whitening_fixed", "important_part_value",
    "customer_order_distribution", "supplier_part_breadth",
    "dormant_wealth_report", "matryoshka_overlap_report",
    "perplexity_bucket_report",
    # never driver-certified, round-6 continuation additions (slots
    # 32-42): the HLL register twin + the ten TPC-H decision shapes —
    # also full-precision green locally, so they enter the window NOW
    # rather than waiting a round (every never-certified entry must
    # sit inside the driver's first 50; tools/window_audit.py checks)
    "reach_hll_relational", "min_cost_supplier",
    "nation_volume_shipping", "nation_market_share",
    "product_profit_by_nation", "returned_revenue_customers",
    "shipping_delay_buckets", "promo_revenue_share",
    "large_order_customers", "bracket_disjunction_revenue",
    "excess_share_suppliers",
    # this session's additions (never driver-certified, full-precision
    # green locally before queueing): slots 43-50.  The registry now
    # holds MORE never-certified entries than the window has slots,
    # so the window is PACKED entirely with never-certified queries +
    # the one mandated re-cert (gap_fill) — the r2-stale certified
    # entries that used to fill the tail would waste driver slots and
    # move beyond the boundary instead.
    "quantile_digest_accuracy", "quantile_digest_grouped",
    "dsir_importance_report", "feature_drift_report",
    "revenue_anomaly_mad", "benford_digit_audit",
    "part_kcore_profile", "rolling_reach_hll",
    # ---- 50-slot window boundary ----
    # never-certified overflow leads the r7 rotation, then the
    # stalest-certified entries (r2, then r3)
    "props_variant_stats", "pipe_syntax_flag_stats",
    "customer_string_funcs", "event_date_spine", "order_metrics_melt",
    "orders_stratified_sample", "signup_purchase_funnel",
    "minhash_neardup_md5", "dedup_clusters", "dedup_keep_canonical",
    "embedding_lsh_topk", "domain_mix_sample", "doc_pack_chunks",
    "doc_repetition_filter", "filter_attrition_report",
    "embedding_dim_stats", "bm25_search", "dedup_documents_exact",
    "doc_chunking", "doc_fingerprint", "doc_quality_score",
    "embedding_ivf_topk", "embedding_quantize_int8", "embedding_topk",
    "eval_contamination", "knn_join", "lang_id_confusion",
    "minhash_neardup", "simhash_bits_md5", "simhash_fingerprints",
)
assert set(_PRIORITY) <= set(_ALL), sorted(set(_PRIORITY) - set(_ALL))

SPARK_QUERIES = {k: _ALL[k] for k in _PRIORITY}
SPARK_QUERIES.update({k: v for k, v in _ALL.items() if k not in SPARK_QUERIES})

ORACLE_SQL = {**_LLM_SQL, **_CP_SQL, **_CORE_SQL, **_AN_SQL, **_BR_SQL,
              **_ADV_SQL, **_DS_SQL, **_DG_SQL, **_MA_SQL}

#: O(n^2) correctness baselines kept ONLY as small-sf oracle
#: cross-checks for their LSH-bucketed scale twins
#: (``embedding_top_pairs_lsh`` / ``embedding_neardup_lsh``).  The
#: bench skips them: a cartesian self-join is never the plan we'd run
#: at 100 TB, so timing it misrepresents the engine's headline path.
BENCH_EXCLUDE = frozenset({"embedding_top_pairs", "embedding_neardup"})

__all__ = ["SPARK_QUERIES", "ORACLE_SQL", "BENCH_EXCLUDE"]
