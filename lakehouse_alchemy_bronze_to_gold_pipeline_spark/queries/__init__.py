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
from .llm_ops import SPARK_QUERIES as _LLM_Q, ORACLE_SQL as _LLM_SQL

_ALL = {**_LLM_Q, **_CP_Q, **_CORE_Q, **_AN_Q, **_BR_Q, **_ADV_Q}

# The external correctness harness checks the FIRST 50 entries in
# dict order (of len(SPARK_QUERIES) total).  We (a) run ALL queries
# against their oracles locally every round and commit the result
# (tools/check_correctness.py -> LOCAL_CORRECTNESS_r{N}.md), and
# (b) order the registry so the driver's independent certification
# lands where it is most valuable: every entry with NO driver row in
# ANY prior round (union of CORRECTNESS_r01..r04 keys) comes first,
# then llm_ops/corpus entries whose last row is two rounds old (r3),
# then the rest in family order.  tools/window_audit.py recomputes
# the never-certified set for the next rotation.
_PRIORITY = (
    # never driver-certified SINCE r4 (r4 llm_ops/corpus additions +
    # analytics entries the r4 window cut off) — the r4 verdict's
    # mandated certification set keeps its window slots; this
    # session's late additions queue AFTER it (see below)
    "feature_hash_embed", "join_size_estimate",
    "brand_random_walks", "conversion_latency", "rfm_segmentation",
    "event_sequence_prep", "label_noise_scan",
    "context_budget_report",
    "bpe_train_report", "ann_recall_report", "ngram_novelty",
    "bpe_merge_candidates",
    "media_triage_report", "embedding_whitening",
    "hard_negative_mining", "image_phash_dedup", "minhash_accuracy",
    "pmi_collocations", "semantic_dedup_fixed",
    "embedding_ivf_topk_fixed", "doc_classifier_score",
    "pii_redaction_report", "doc_unigram_logprob",
    "doc_bigram_logprob", "multimodal_codec_mix",
    "crossdoc_span_coverage", "embedding_covariance_stats",
    "embedding_kmeans_profile", "embedding_kmeans_profile_fixed",
    "embedding_pq_topk", "embedding_pq_topk_fixed",
    "source_weighted_median_quality", "source_dup_matrix",
    "corpus_train_val_split", "doc_weighted_sample",
    "temporal_split_leakage", "rolling_distinct_users",
    "gap_fill_interpolate", "nation_revenue_trend",
    "ewma_monthly_revenue", "segment_spend_gini", "brand_triangles",
    "event_transition_matrix", "key_skew_profile",
    "purchase_attribution", "brand_pagerank", "events_value_outliers",
    "user_reach_sketch", "quantile_binning",
    "customer_entity_resolution",
    # never driver-certified (added late in r5): all oracle-verified
    # in the local sweep; the first few land in this round's window,
    # the rest lead the r6 rotation
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
    # last certified in r3 (llm_ops/corpus rotation, due again)
    "minhash_neardup_md5", "dedup_clusters", "dedup_keep_canonical",
    "embedding_lsh_topk", "domain_mix_sample", "doc_pack_chunks",
    "doc_repetition_filter", "filter_attrition_report",
    "embedding_dim_stats",
)
assert set(_PRIORITY) <= set(_ALL), sorted(set(_PRIORITY) - set(_ALL))

SPARK_QUERIES = {k: _ALL[k] for k in _PRIORITY}
SPARK_QUERIES.update({k: v for k, v in _ALL.items() if k not in SPARK_QUERIES})

ORACLE_SQL = {**_LLM_SQL, **_CP_SQL, **_CORE_SQL, **_AN_SQL, **_BR_SQL,
              **_ADV_SQL}

#: O(n^2) correctness baselines kept ONLY as small-sf oracle
#: cross-checks for their LSH-bucketed scale twins
#: (``embedding_top_pairs_lsh`` / ``embedding_neardup_lsh``).  The
#: bench skips them: a cartesian self-join is never the plan we'd run
#: at 100 TB, so timing it misrepresents the engine's headline path.
BENCH_EXCLUDE = frozenset({"embedding_top_pairs", "embedding_neardup"})

__all__ = ["SPARK_QUERIES", "ORACLE_SQL", "BENCH_EXCLUDE"]
