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
# lands where it is most valuable: every entry with NO driver row in
# ANY prior round (union of CORRECTNESS_r01..r05 keys) comes first,
# then re-certifications of changed queries, then the stalest
# last-certified entries (r2, then r3).  tools/window_audit.py
# recomputes the never-certified set for the next rotation.
_PRIORITY = (
    # ---- r10 driver window (slots 1-50) ----
    # Ordering = never-certified first, then re-certifications of
    # queries whose OUTPUT changed this round, then sorted(names,
    # key=(last_round, registry index)) over CORRECTNESS_r01..r09 —
    # tools/window_audit.py reproduces it.
    # never-certified: the ALS pair, registered this round per the r9
    # verdict/queue annotation (built + hash-certified in-test in r9;
    # queries/recsys.py, tests/test_als.py)
    "als_rank1_fixed",
    "als_recommend_fixed",
    # never-certified (added this round): DP histogram release — the
    # generic dp.release() operator's first oracle-backed coverage,
    # full-public-domain buckets, parallel composition ledger
    "dp_histogram_release",
    # re-certification: output schema changed this round (r9 ADVICE —
    # audit_ prefixes + in-row mechanism marker), so the r9 driver row
    # no longer describes what the query releases
    "dp_revenue_release",
    # the r6-stale pool, complete (10 entries, rotation order): after
    # this window lands the post-r10 staleness floor is r7, as the r9
    # verdict mandates
    "dsir_importance_report", "mg_heavy_hitters_fixed",
    "simhash_accuracy", "embedding_whitening_fixed",
    "matryoshka_overlap_report", "perplexity_bucket_report",
    "part_kcore_profile", "rolling_reach_hll",
    "gap_fill_interpolate", "reach_hll_relational",
    # the r7-stale pool, first 36 in rotation order (14 r7 entries
    # remain beyond the boundary — they are the r11 queue head; the
    # floor mandate needs only the r6 pool retired this round)
    "ann_recall_exact_fixed", "text_token_stats", "lang_id_confusion",
    "doc_fingerprint", "dedup_documents_exact", "doc_quality_score",
    "token_count_bpe", "embedding_neardup", "ngram_jaccard_query",
    "embedding_topk", "knn_join", "minhash_neardup",
    "minhash_neardup_md5", "dedup_clusters", "dedup_keep_canonical",
    "simhash_fingerprints", "simhash_bits_md5", "embedding_lsh_topk",
    "embedding_ivf_topk", "multimodal_frames", "multimodal_features",
    "multimodal_image_features", "multimodal_audio_features",
    "training_corpus_prep", "doc_chunking", "tfidf_top_terms",
    "bm25_search", "vocab_top_terms", "eval_contamination",
    "embedding_quantize_int8", "terms_heavy_hitters",
    "doc_pack_chunks", "domain_mix_sample", "doc_repetition_filter",
    "filter_attrition_report", "embedding_dim_stats",
    # ---- 50-slot window boundary ----
    # r11 queue: the remaining 14 r7-certified entries in rotation
    # order, then the r8 pool.  New queries added mid-round must be
    # inserted ABOVE this queue but INSIDE the window (displacing the
    # window's tail down here) so a post-close driver artifact can
    # never strand a never-certified entry outside the window.
    "fact_sales", "dim_customer", "dim_part", "dq_violation_counts",
    "dq_failing_rows", "orphan_orders", "orders_with_big_items",
    "props_variant_stats", "pipe_syntax_flag_stats",
    "orders_stratified_sample", "customer_string_funcs",
    "signup_purchase_funnel", "event_date_spine", "order_metrics_melt",
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
