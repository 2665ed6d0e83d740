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
# lands where it is most valuable: never-certified entries first,
# then the stalest last-certified entries by
# sorted(names, key=(last_round, registry index)) over the committed
# CORRECTNESS_r* artifacts.  tools/window_audit.py reports the
# ground truth and tests/test_window_audit.py ASSERTS the committed
# window equals it (r10 verdict task 1: the r10 rotation claimed a
# r7 floor while 40 entries were still r6-certified — the rule is
# now machine-checked, not narrated).
_PRIORITY = (
    # ---- r12 driver window (slots 1-50) ----
    # never-certified (added this round): the streaming near-dup gate
    # certification (r11 verdict task 2 — the md5-family incremental
    # gate decomposed at rest, DuckDB replaying both passes) and the
    # Structured Streaming late-data/watermark semantics readout
    # (r11 verdict task 6 — drop-vs-accept rules replayed at rest,
    # real-stream parity pinned in tests/test_streaming_windows.py)
    # ... plus the float rank-k ALS production path readout (r11
    # verdict task 3 — tolerance-documented rounded ledger; the last
    # ALS surface without an independent check)
    "incremental_neardup_fixed",
    "watermark_late_events_fixed",
    "als_float_rank2_readout",
    # the COMPLETE remaining r7-stale pool (6 entries — window_audit
    # ground truth, registry rotation order): retiring these makes
    # the post-r12 floor genuinely r8
    "pipe_syntax_flag_stats", "orders_stratified_sample",
    "customer_string_funcs", "signup_purchase_funnel",
    "event_date_spine", "order_metrics_melt",
    # the oldest r8-stale entries (rotation order) fill the window
    "feature_hash_embed", "event_sequence_prep",
    "ivf_stream_topk_fixed", "embedding_fd_profile",
    "pq_stream_topk_fixed", "pricing_summary",
    "top_customers_per_segment", "revenue_rollup", "events_hourly",
    "events_json_kv", "sessionize_events", "session_conversion_daily",
    "dedup_events_keep_latest", "set_ops_customers",
    "customer_running_spend", "order_priority_cube",
    "returnflag_pivot", "segment_distinct_customers",
    "asof_latest_order", "scd1_upsert", "copurchase_link_prediction",
    "brand_supplier_hhi", "brand_cooccurrence_top",
    "order_backlog_daily", "user_retention_cohorts",
    "price_percentiles", "price_percentiles_approx",
    "revenue_grouping_sets", "events_band_join",
    "late_shipment_orders", "brand_small_quantity_revenue",
    "daily_activity", "customer_recent_spend", "top_unshipped_orders",
    "order_date_math", "token_array_ops", "orders_profile",
    "events_window_fn", "asia_nation_revenue", "embedding_top_pairs",
    "embedding_top_pairs_lsh",
    # ---- 50-slot window boundary ----
    "embedding_neardup_lsh", "snapshot_diff_orders",
    # r13 queue head: the remaining r8 pool (rotation order —
    # window_audit prints it).  Certification-period arithmetic
    # (r11 verdict task 7): 206 entries / 50 slots = a 4.1-round
    # re-certification period at zero growth; the full-registry local
    # sweep (tools/check_correctness.py -> LOCAL_CORRECTNESS_r{N}.md)
    # runs every round and stays the freshness backstop between
    # driver certifications.  New queries added mid-round must be
    # inserted ABOVE this queue but INSIDE the window (displacing the
    # window's tail down here) so a post-close driver artifact can
    # never strand a never-certified entry outside the window.
    "scd2_customer_history", "order_rank_functions",
    "price_histogram", "lineitem_moments", "user_activity_streaks",
    "lineitem_hash_sample", "audience_overlap_kmv",
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
