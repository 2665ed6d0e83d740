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
    # ---- r8 driver window (slots 1-50): the pre-queued rotation
    # promoted per the r7 verdict (task 1) — this retires the last
    # certification staleness: after this window lands, every
    # registry entry's newest driver row is r5+.  Ordering =
    # never-certified first, then sorted(names, key=(last_round,
    # registry index)) over CORRECTNESS_r01..r07 — tools/
    # window_audit.py reproduces it.
    # never-certified (added this round): the incremental-IVF and
    # incremental-PQ decomposition entries, each oracle-pinned to its
    # one-shot build (the PQ addition displaces the window's r5 tail
    # `ann_recall_report` to the r9 queue, per the insertion policy)
    "ivf_stream_topk_fixed", "pq_stream_topk_fixed",
    # never-certified (added this round): KMV set algebra — union /
    # intersection / Jaccard estimates between cohort sketches with
    # the exact accuracy readout alongside (displaces the window's
    # r5 tail `bpe_train_report` to the r9 queue head)
    "audience_overlap_kmv",
    # never-certified (added this round): Frequent Directions matrix
    # sketch spectral profile — rows-only (SVD has no SQL form), the
    # exact spectrum + FD bound ride in the output (displaces
    # `context_budget_report` to the r9 queue head)
    "embedding_fd_profile",
    # never-certified (added this round): Adamic-Adar link prediction
    # on the part co-purchase graph, customer-middled so the pair
    # fan-out is linear in customers (displaces `label_noise_scan`
    # to the r9 queue head)
    "copurchase_link_prediction",
    # r4-stale pool, complete (slots 2-44)
    "pricing_summary",
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
    # r5-stale head (slots 46-50): the five stalest remaining entries
    # in (last-certified round, registry order)
    "feature_hash_embed", "event_sequence_prep",
    # ---- 50-slot window boundary ----
    # r9 queue: the remaining r5-certified pool continues in rotation
    # order.  New queries added mid-round must be inserted ABOVE this
    # queue but INSIDE the window (displacing the window's r5 tail
    # down here) so a post-close driver artifact can never strand a
    # never-certified entry outside the window.
    "label_noise_scan", "context_budget_report", "bpe_train_report",
    "ann_recall_report",
    "ngram_novelty", "bpe_merge_candidates", "media_triage_report",
    "embedding_whitening",
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
