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
from .privacy import SPARK_QUERIES as _PV_Q, ORACLE_SQL as _PV_SQL
from .recsys import SPARK_QUERIES as _RS_Q, ORACLE_SQL as _RS_SQL

_ALL = {**_LLM_Q, **_CP_Q, **_CORE_Q, **_AN_Q, **_BR_Q, **_ADV_Q, **_DS_Q,
        **_DG_Q, **_MA_Q, **_PV_Q, **_RS_Q}

# The external correctness harness checks the FIRST 50 entries in
# dict order (of len(SPARK_QUERIES) total).  We (a) run ALL queries
# against their oracles locally every round and commit the result
# (tools/check_correctness.py -> LOCAL_CORRECTNESS_r{N}.md), and
# (b) order the registry so the driver's independent certification
# lands where it is most valuable: never-certified ORACLE-BACKED
# entries first, then the stalest last-certified oracle-backed
# entries by sorted(names, key=(last_round, registry index)) over
# the committed CORRECTNESS_r* artifacts.  tools/window_audit.py
# reports the ground truth and tests/test_window_audit.py ASSERTS
# the committed window equals it (r10 verdict task 1: the r10
# rotation claimed a r7 floor while 40 entries were still
# r6-certified — the rule is now machine-checked, not narrated).
#
# r13 (r12-VERDICT item 4): entries WITHOUT a DuckDB oracle are
# excluded from the window — the driver cannot verify them at all
# (r12 spent a slot on ``embedding_fd_profile`` and got back
# ``err: no_oracle``, rows/schema/hash all null), so a no-oracle
# occupant is a wasted certification slot by construction.  Their
# correctness stays pinned by the local pytest suites
# (rows/shape/property checks) like every other non-SQL-expressible
# operator path.
_PRIORITY = (
    # ---- r13 driver window (slots 1-50): the complete remaining
    # r8-stale pool (9 entries), then the oldest r9-stale entries in
    # rotation order, then the two oldest r10 entries — window_audit
    # ground truth; retiring the r8 pool makes the post-r13 floor
    # genuinely r9
    "embedding_neardup_lsh", "snapshot_diff_orders",
    "scd2_customer_history", "order_rank_functions",
    "price_histogram", "lineitem_moments", "user_activity_streaks",
    "lineitem_hash_sample", "audience_overlap_kmv",
    "label_noise_scan", "context_budget_report", "ngram_novelty",
    "bpe_merge_candidates", "hard_negative_mining",
    "minhash_accuracy", "pmi_collocations", "semantic_dedup_fixed",
    "embedding_ivf_topk_fixed", "doc_classifier_score",
    "pii_redaction_report", "doc_unigram_logprob",
    "doc_bigram_logprob", "crossdoc_span_coverage",
    "embedding_covariance_stats", "embedding_kmeans_profile_fixed",
    "embedding_pq_topk_fixed", "source_weighted_median_quality",
    "source_dup_matrix", "mg_stream_topk_fixed",
    "corpus_train_val_split", "doc_weighted_sample",
    "brand_random_walks", "join_size_estimate",
    "temporal_split_leakage", "rolling_distinct_users",
    "nation_revenue_trend", "ewma_monthly_revenue",
    "segment_spend_gini", "brand_triangles",
    "event_transition_matrix", "key_skew_profile",
    "purchase_attribution", "brand_pagerank",
    "events_value_outliers", "conversion_latency",
    "rfm_segmentation", "quantile_binning",
    "customer_entity_resolution", "dsir_importance_report",
    "ann_recall_exact_fixed",
    # ---- 50-slot window boundary ----
    # r14 queue head: the remaining r10 pool (rotation order —
    # window_audit prints it).  Certification-period arithmetic
    # (r11 verdict task 7): 189 oracle-backed entries / 50 slots = a
    # ~3.8-round re-certification period at zero growth; the
    # full-registry local sweep (tools/check_correctness.py ->
    # LOCAL_CORRECTNESS_r{N}.md) runs every round and stays the
    # freshness backstop between driver certifications.  New queries
    # added mid-round must be inserted ABOVE this queue but INSIDE
    # the window (displacing the window's tail down here) so a
    # post-close driver artifact can never strand a never-certified
    # oracle-backed entry outside the window.
    "text_token_stats", "lang_id_confusion", "doc_fingerprint",
    "dedup_documents_exact", "doc_quality_score", "token_count_bpe",
)

assert set(_PRIORITY) <= set(_ALL), sorted(set(_PRIORITY) - set(_ALL))

SPARK_QUERIES = {k: _ALL[k] for k in _PRIORITY}
SPARK_QUERIES.update({k: v for k, v in _ALL.items() if k not in SPARK_QUERIES})

ORACLE_SQL = {**_LLM_SQL, **_CP_SQL, **_CORE_SQL, **_AN_SQL, **_BR_SQL,
              **_ADV_SQL, **_DS_SQL, **_DG_SQL, **_MA_SQL, **_PV_SQL,
              **_RS_SQL}

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
