"""Per-round benchmark: run every registered query at the bench scale
factor and print ONE JSON line the driver records as BENCH_r{N}.json.

Queries are materialized through the ``noop`` sink so the full plan
executes (a bare ``count()`` would let Catalyst prune projections and
under-report work).

The recorder captures only a bounded tail of stdout, so the final line
must stay small: the full per-query breakdown goes to stderr and to a
timestamped ``bench_out/BENCH_DETAIL_*.json`` (gitignored), and
stdout's last line is a compact
``{"metric","value","unit","sf","n_queries"}`` object.

Env:
  SPARK_GRAFT_SF_DIR  parquet dir (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS    local parallelism (default 32)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from lakehouse_alchemy_bronze_to_gold_pipeline_spark.queries import (  # noqa: E402
    BENCH_EXCLUDE,
    SPARK_QUERIES,
)
from lakehouse_alchemy_bronze_to_gold_pipeline_spark.session import (  # noqa: E402
    get_spark,
)


def _source_fingerprint() -> str:
    """md5 over every package source file + the bench harness itself.

    The documented bench protocol is min-of-several-runs (box-noise
    and thermal throttling dominated r5's committed number: 238.6 s
    recorded vs 160.3 s clean — BENCH_NOTES_r05.md).  bench.py
    therefore min-merges per-query times across prior detail files,
    but ONLY runs produced by byte-identical source: the fingerprint
    pins that, independent of git HEAD (the driver snapshot-commits
    before its run, which moves HEAD without touching code)."""
    import hashlib

    root = os.path.dirname(os.path.abspath(__file__))
    h = hashlib.md5()
    paths = [os.path.join(root, "bench.py"),
             os.path.join(root, "__spark_entry__.py")]
    pkg = os.path.join(root, "lakehouse_alchemy_bronze_to_gold_pipeline_spark")
    for dirpath, _dirs, files in sorted(os.walk(pkg)):
        for f in sorted(files):
            if f.endswith(".py"):
                paths.append(os.path.join(dirpath, f))
    for p in paths:
        h.update(p.encode())
        with open(p, "rb") as fh:
            h.update(fh.read())
    return h.hexdigest()


#: Merge-series cap (BASELINE.md protocol): the headline is the
#: per-query min over at most this many runs — the current one plus
#: the most recent MERGE_CAP-1 same-fingerprint priors.  An unbounded
#: series only ratchets downward as runs accumulate (r7 merged 17
#: runs; raw 217 s vs merged 195 s), which makes round-over-round
#: numbers depend on how long each round benched.  A fixed cap keeps
#: the metric comparable; raw single-run totals ship beside it
#: (``this_run_total``).
MERGE_CAP = 8

#: Steal-window canary threshold (BASELINE.md protocol): a prior run
#: is DISCARDED from the merge series when its worst canary reading
#: exceeds this factor times the best canary in the candidate series
#: (current run included).  The canary is a fixed pure-python busy
#: loop timed before and after the sweep; host CPU steal inflates its
#: wall time roughly in proportion to the contamination (r8's stolen
#: middle series ran raws 242-278 s vs 213-225 s clean — ~15-25%
#: inflation — and was adjudicated by a human reading BENCH_NOTES;
#: this threshold mechanizes that adjudication).
CANARY_DISCARD_FACTOR = 1.5

#: busy-loop iterations — ~0.1 s on this box when uncontended; large
#: enough that scheduler jitter averages out, small enough to be free
CANARY_ITERS = 2_000_000


def _canary_loop(_=None) -> float:
    t0 = time.perf_counter()
    acc = 0
    for i in range(CANARY_ITERS):
        acc += i ^ (i >> 3)
    assert acc >= 0  # keep the loop un-eliminable
    return time.perf_counter() - t0


def _canary() -> float:
    """Median-of-3 wall seconds for the fixed busy loop.  Median, not
    min: the canary must SEE intermittent steal, which a min would
    hide."""
    return round(sorted(_canary_loop() for _ in range(3))[1], 4)


def _canary_mt(n: int) -> tuple[float, str | None]:
    """Median per-loop wall across n CONCURRENT busy loops — the
    many-core probe.  r9 measured a window where the single-thread
    canary read clean (0.137 vs 0.134 idle) while the 32-thread sweep
    ran ~30-40% slow (probe-replay evidence in BENCH_NOTES_r09): on a
    shared host, steal against the OTHER 31 cores is invisible to a
    1-thread probe.  Saturating every core makes the reading track
    what the sweep actually experiences.  Fork context: this must
    never re-import pyspark workers.

    Returns ``(reading, degraded)``: ``degraded`` is None on the real
    multi-core path and the failure description when the probe fell
    back to the 1-thread canary — the fallback must be VISIBLE in the
    bench output (r10 ADVICE: a silent fallback makes a permanently
    broken mt probe indistinguishable from a fork-limited host, and
    the mt canary is load-bearing for host-slow adjudication)."""
    import multiprocessing as mp

    # never fail the bench run over probe plumbing: get_context raises
    # ValueError where 'fork' is absent, Pool raises OSError when
    # fork-limited, and a worker exception resurfaces from pool.map as
    # its original type — ANY failure degrades to the 1-thread probe
    # (r9 ADVICE), but the degradation is recorded, not silent.
    try:
        if "fork" not in mp.get_all_start_methods():
            return _canary(), "no-fork-start-method"
        with mp.get_context("fork").Pool(n) as pool:
            res = pool.map(_canary_loop, range(n))
    except Exception as exc:
        return _canary(), f"mt-probe-failed: {exc!r}"
    return round(sorted(res)[len(res) // 2], 4), None


def _merge_prior_mins(
    out_dir: str,
    fingerprint: str,
    sf: float,
    times: dict[str, float],
    canary: dict | None = None,
    cpus: int | None = None,
) -> tuple[dict[str, float], int, int]:
    """Per-query min across the most recent MERGE_CAP-1 prior detail
    files with the SAME source fingerprint, sf, CORE COUNT, and query
    set, after dropping canary-contaminated priors.
    Returns (merged, n_runs_merged, n_canary_discarded).

    Only priors with a non-empty ``this_run`` participate: a legacy
    detail whose only payload is the already-merged ``queries`` map
    would re-inject every aged-out outlier into each merge, defeating
    the MERGE_CAP aging (r8 ADVICE).

    The ``cpus`` filter is r12-VERDICT item 2: detail files used not
    to record the core count, so a low-core scaling run silently
    min-merged against 32-core priors (97/204 of the r12 c8 run's
    "merged" values were byte-identical 32-core minima, making the
    driver's scaling block garbage).  Every detail now records
    ``cpus`` and only same-cpus priors merge; legacy files without
    the field never match a cpus-aware run."""
    import glob

    priors = []
    for path in sorted(glob.glob(os.path.join(out_dir, "BENCH_DETAIL_*.json"))):
        try:
            with open(path) as fh:
                d = json.load(fh)
        except (OSError, json.JSONDecodeError):
            continue
        run = d.get("this_run")
        if (
            d.get("fingerprint") != fingerprint
            or d.get("sf") != sf
            or d.get("cpus") != cpus
            or not run
            or set(run) != set(times)
        ):
            continue
        # r11 ADVICE: a DEGRADED mt probe fell back to the 1-thread
        # loop — systematically lower than a saturated reading and
        # blind to multi-core steal (the r9 failure mode).  Such a
        # reading must neither set the series' mt_best floor nor pass
        # the prior through the mt gate: drop it and let that run be
        # st-only gated.  New detail files already write null, but
        # r10/r11-era files recorded the degraded value alongside the
        # flag, so the flag is consulted here too.
        mt = (
            None
            if d.get("canary_mt_degraded")
            else d.get("canary_mt_worst")
        )
        priors.append((run, d.get("canary_worst"), mt))

    priors = priors[-(MERGE_CAP - 1):]
    # canary gate: the clean-box reference is the BEST canary in the
    # candidate series; anything > factor x that ran under steal.
    # BOTH probes gate independently — r9 caught a window where the
    # 1-thread probe read clean while the saturating probe (and the
    # sweep) ran ~35% slow, so a prior is contaminated if EITHER
    # reading blows its own series' floor.  Priors predating a probe
    # (no reading) are kept: the gate mechanizes future adjudication,
    # it does not retro-condemn.
    st_cur = canary if canary is None else canary.get("st")
    mt_cur = canary if canary is None else canary.get("mt")
    st_vals = [c for _, c, _ in priors if c is not None]
    mt_vals = [m for _, _, m in priors if m is not None]
    if st_cur is not None:
        st_vals.append(st_cur)
    if mt_cur is not None:
        mt_vals.append(mt_cur)
    st_best = min(st_vals) if st_vals else None
    mt_best = min(mt_vals) if mt_vals else None
    kept, n_discarded = [], 0
    for run, c, m in priors:
        hot_st = (
            st_best is not None
            and c is not None
            and c > CANARY_DISCARD_FACTOR * st_best
        )
        hot_mt = (
            mt_best is not None
            and m is not None
            and m > CANARY_DISCARD_FACTOR * mt_best
        )
        if hot_st or hot_mt:
            n_discarded += 1
            continue
        kept.append(run)

    merged = dict(times)
    n = 1
    for prior in kept:
        for k, v in prior.items():
            if v < merged[k]:
                merged[k] = v
        n += 1
    return merged, n, n_discarded


def main() -> None:
    # fingerprint the source BEFORE the sweep: it must describe the
    # code this process imported, not whatever is on disk ~4 minutes
    # later when the detail file is written
    fingerprint = _source_fingerprint()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    try:
        sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[1])
    except (IndexError, ValueError):
        sf = -1.0

    canary_pre = _canary()  # clean-box probe BEFORE the JVM exists
    # saturating probe, same moment
    canary_mt_pre, mt_degraded_pre = _canary_mt(cpus)

    spark = get_spark(
        "bench",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
        # keep stdout clean: console progress bars would push the final
        # JSON line out of the recorder's tail-capture window
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    # warm the executors/codegen so query 1 isn't charged JVM boot,
    # then run the flagship once at the smallest SF so the parquet
    # reader + join/agg codegen paths are compiled before timing.
    # The warm-up dir derives from SPARK_GRAFT_SF_DIR (smallest
    # sibling sf if present) so a relocated testdata root doesn't
    # silently skip the warm-up and re-attach ~4 s of first-call JIT
    # to whichever query runs first.
    warm_dir = os.path.join(os.path.dirname(sf_dir.rstrip("/")), "sf0.001")
    if not os.path.isdir(warm_dir):
        warm_dir = sf_dir
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    try:
        SPARK_QUERIES["fact_sales"](spark, warm_dir).write.format(
            "noop"
        ).mode("overwrite").save()
        # pre-fork the Python worker pool + Arrow channels so the
        # first mapInPandas query isn't charged session boot
        spark.range(cpus * 4).repartition(cpus).mapInPandas(
            lambda it: it, schema="id long"
        ).write.format("noop").mode("overwrite").save()
        # warm the higher-order-function codegen path (shingle/fold
        # expression shapes): measured ~4 s of first-call JIT that
        # would otherwise be charged to whichever text query runs
        # first — same policy as the join/agg warmup above
        from lakehouse_alchemy_bronze_to_gold_pipeline_spark.functions import (
            text as TX,
        )
        from lakehouse_alchemy_bronze_to_gold_pipeline_spark.queries.data import (
            load as _load,
        )
        import pyspark.sql.functions as F

        _load(spark, warm_dir, "documents").select(
            F.explode(TX.word_shingles(TX.nonempty_tokens("text"), 5))
        ).write.format("noop").mode("overwrite").save()
        # import the pure-python codec stack inside the (reused)
        # Python workers so the first image-decode query isn't
        # charged module import + numpy warm-up (measured ~0.7 s
        # landing on whichever multimodal query runs first)
        SPARK_QUERIES["multimodal_image_features"](
            spark, warm_dir
        ).write.format("noop").mode("overwrite").save()
    except Exception as exc:
        print(
            f"bench warm-up failed ({exc!r}); first-query timings "
            "will include one-time JIT cost",
            file=sys.stderr,
        )

    times: dict[str, float] = {}
    for name, fn in SPARK_QUERIES.items():
        if name in BENCH_EXCLUDE:  # O(n^2) oracle baselines; LSH twins run
            continue
        t0 = time.time()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        times[name] = round(time.time() - t0, 3)
        # queries persist intermediates (doc-term relations etc.);
        # drop them OUTSIDE the timed section so one query's caches
        # neither serve nor pressure the next (single-session sweep
        # would otherwise accumulate storage for the session lifetime)
        spark.catalog.clearCache()

    # second pass over the slowest tail, min-merged: a transient CPU
    # contention spike lands disproportionately on whichever heavy
    # query it overlaps (r5: 238.6 s throttled vs 160.3 s clean run
    # of IDENTICAL code), and one bounded re-measure inside the same
    # session removes most of that noise even when this is the only
    # invocation that ever runs (the cross-run min-merge below needs
    # a second invocation to help).  The first few REGISTRY-ORDER
    # queries join the retry set: the driver-window rotation moves a
    # different head to the front each round, and whatever runs first
    # absorbs the session's residual first-use codegen (measured r7:
    # props_variant_stats 1.5-2.2 s cold at slot 1 vs ~0.7 s warm —
    # the VARIANT expression path is not covered by the warm-up
    # above); by retry time the session is fully warm, so the min is
    # the query's cost, not the session's.
    retry = set(sorted(times, key=times.get)[-15:])
    retry |= set(list(times)[:5])
    for name in (n for n in SPARK_QUERIES if n in set(retry)):
        t0 = time.time()
        SPARK_QUERIES[name](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        times[name] = min(times[name], round(time.time() - t0, 3))
        spark.catalog.clearCache()

    spark.stop()
    canary_post = _canary()  # post-sweep probe, JVM gone
    canary_mt_post, mt_degraded_post = _canary_mt(cpus)
    canary_worst = max(canary_pre, canary_post)
    canary_mt_worst = max(canary_mt_pre, canary_mt_post)
    # r10 ADVICE: surface mt-probe degradation instead of silently
    # adjudicating host health with the weaker 1-thread reading.
    # r11 ADVICE: a degraded reading is also EXCLUDED from the mt
    # gate — canary_mt_worst is recorded as null (raw value kept in
    # canary_mt_degraded_reading) and the current run contributes no
    # mt to _merge_prior_mins, which then st-only gates this run.
    canary_mt_degraded = mt_degraded_pre or mt_degraded_post
    canary_mt_gate = None if canary_mt_degraded else canary_mt_worst
    # per-run file under a gitignored dir: successive runs don't
    # clobber each other and the detail can't be committed by accident
    out_dir = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "bench_out"
    )
    os.makedirs(out_dir, exist_ok=True)
    merged, n_runs, n_discarded = _merge_prior_mins(
        out_dir, fingerprint, sf, times,
        {"st": canary_worst, "mt": canary_mt_gate},
        cpus=cpus,
    )
    detail = {
        "metric": "total_query_wall_sec",
        "value": round(sum(merged.values()), 3),
        "unit": "sec",
        "queries": merged,     # per-query min over same-source runs
        "this_run": times,     # this run's raw timings
        "this_run_total": round(sum(times.values()), 3),
        "runs_merged": n_runs,
        "canary_pre": canary_pre,
        "canary_post": canary_post,
        "canary_worst": canary_worst,
        "canary_mt_pre": canary_mt_pre,
        "canary_mt_post": canary_mt_post,
        "canary_mt_worst": canary_mt_gate,
        "canary_mt_degraded": canary_mt_degraded,
        # raw fallback reading, kept out of the gate field so a
        # 1-thread number can never masquerade as a saturated one
        **(
            {"canary_mt_degraded_reading": canary_mt_worst}
            if canary_mt_degraded
            else {}
        ),
        "canary_discarded_priors": n_discarded,
        "fingerprint": fingerprint,
        "sf": sf,
        "cpus": cpus,
    }
    detail_path = os.path.join(
        out_dir, time.strftime("BENCH_DETAIL_%Y%m%dT%H%M%S.json")
    )
    with open(detail_path, "w") as fh:
        json.dump(detail, fh, indent=1, sort_keys=True)
    print(json.dumps(detail["queries"], sort_keys=True), file=sys.stderr)
    summary = {
        "metric": "total_query_wall_sec",
        "value": detail["value"],
        "unit": "sec",
        "sf": sf,
        "cpus": cpus,
        "n_queries": len(merged),
        "runs_merged": n_runs,
        "this_run_total": detail["this_run_total"],
        "canary_worst": canary_worst,
        "canary_mt_worst": canary_mt_gate,
        "canary_discarded_priors": n_discarded,
        **(
            {
                "canary_mt_degraded": canary_mt_degraded,
                "canary_mt_degraded_reading": canary_mt_worst,
            }
            if canary_mt_degraded
            else {}
        ),
        "detail": os.path.relpath(
            detail_path, os.path.dirname(os.path.abspath(__file__))
        ),
    }
    # ONE authoritative merged figure per round (r8 verdict): the
    # newest summary always overwrites BENCH_LATEST.json, and the
    # round notes quote THAT file — never an intermediate snapshot.
    with open(os.path.join(out_dir, "BENCH_LATEST.json"), "w") as fh:
        json.dump(summary, fh, indent=1, sort_keys=True)
    # the compact summary is the LAST stdout line so a bounded tail
    # capture always retains a parseable JSON object
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
