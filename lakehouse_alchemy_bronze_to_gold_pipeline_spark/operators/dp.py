"""Differentially-private aggregate release (clip + Laplace).

The mechanism a training-data pipeline uses to publish corpus
statistics (per-source counts, per-cohort revenue, contributor
tallies) without exposing any single contributor: bound each unit's
contribution (clip), aggregate exactly, then add Laplace noise with
scale b = sensitivity / epsilon (Dwork et al., "Calibrating Noise to
Sensitivity in Private Data Analysis", TCC 2006).  Engine extension:
the reference pipeline publishes gold aggregates with no privacy
layer (``reference/README.md`` gold overview).

Determinism is the design center, for two reasons:

* **Idempotent retries.** At 1000 executors, speculative execution
  and stage retries re-run tasks; noise drawn from RNG state would
  differ per attempt, making the released table depend on which
  attempt won.  Here noise is a pure function of the group key —
  ``noise(key) = table[md5(tag ':' key) first byte]`` — so every
  retry, re-shard, and re-run releases the identical value (the
  repo's standard md5 idiom, ``doc_weighted_sample``).
* **Cross-engine replay.** The inverse-CDF table is materialized
  ONCE in Python and embedded as shared integer literals in both the
  Spark plan and the DuckDB oracle, so the release hashes bit-for-bit
  (the Benford ppm-literal precedent, ``queries/mlaudit.py``) — no
  ln() runs inside either engine at query time.

The price of determinism is stated honestly: a 256-bucket quantized
Laplace with a public per-key seed is an AUDIT/REPLAY form — it
certifies mechanism plumbing (clipping, sensitivity accounting,
noise magnitude) and keeps the epsilon ledger, but a production
release against an adaptive adversary must swap the md5 bucket for a
cryptographically-secure draw (and would then lose the exact oracle,
keeping the clipping/accounting paths unchanged).  Quantization
itself is benign: bucket-midpoint noise differs from the continuous
draw by at most one 1/256-quantile step.

Scale: clipping is one narrow projection after the per-unit
aggregate; noise is O(groups) literal lookups; the noise table is
256 BIGINTs folded into the plan — nothing shuffles beyond the two
aggregates the exact query already pays.
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "MECHANISM",
    "laplace_noise_table",
    "noise_bucket",
    "noise_value",
    "noise_bucket_sql",
    "noise_value_sql",
    "release",
]

#: machine-visible mechanism marker (r9 ADVICE): every release built
#: on this module carries mechanism='deterministic-audit' in-row so a
#: consumer can never mistake the md5-bucketed replay form for a real
#: CSPRNG Laplace release.  A production swap-in would set its own
#: marker (e.g. 'laplace') alongside the CSPRNG draw.
MECHANISM = "deterministic-audit"

#: bucket count: one md5 byte — enough that the quantized mechanism's
#: max CDF gap is 1/256, few enough that both engines fold the table
#: as a literal
N_BUCKETS = 256


def laplace_noise_table(b_scale: float) -> tuple[int, ...]:
    """Integer Laplace(0, b) noise per bucket: the inverse CDF at
    each bucket midpoint p=(i+0.5)/256, rounded to the release's
    integer unit (cents, counts).  Antisymmetric by construction —
    ``table[i] == -table[255-i]`` (midpoints pair to p + p' = 1 and
    round-half-even is odd) — so the quantized mechanism is exactly
    unbiased."""
    out = []
    for i in range(N_BUCKETS):
        p = (i + 0.5) / N_BUCKETS
        if p < 0.5:
            x = b_scale * math.log(2.0 * p)
        else:
            x = -b_scale * math.log(2.0 * (1.0 - p))
        out.append(round(x))
    return tuple(out)


def noise_bucket(tag: str, key: Column) -> Column:
    """Deterministic bucket 0..255 for a group key: first byte of
    md5(tag ':' key).  The tag domain-separates releases — the sum
    and count releases over the same key draw independent buckets."""
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(tag + ":"), key.cast("string"))), 1, 2),
        16,
        10,
    ).cast("int")


def noise_value(table: tuple[int, ...], tag: str, key: Column) -> Column:
    """The noise itself: literal-table lookup at the key's bucket."""
    return F.element_at(
        F.array(*[F.lit(int(v)) for v in table]),
        noise_bucket(tag, key) + F.lit(1),
    ).cast("bigint")


def noise_bucket_sql(tag: str, key_sql: str) -> str:
    """DuckDB twin of :func:`noise_bucket` (no conv(): hex digits via
    the strpos idiom, ``SQL_DOC_WEIGHTED_SAMPLE``)."""
    h = f"md5(concat('{tag}', ':', CAST({key_sql} AS VARCHAR)))"
    return (
        f"(16 * (strpos('0123456789abcdef', substr({h}, 1, 1)) - 1)"
        f" + strpos('0123456789abcdef', substr({h}, 2, 1)) - 1)"
    )


def noise_value_sql(table: tuple[int, ...], tag: str, key_sql: str) -> str:
    """DuckDB twin of :func:`noise_value`: the SAME literal list,
    1-based-indexed at the key's bucket."""
    lits = ", ".join(str(int(v)) for v in table)
    return f"CAST(([{lits}])[{noise_bucket_sql(tag, key_sql)} + 1] AS BIGINT)"


def release(df, key_col: str, specs) -> "DataFrame":  # noqa: F821
    """DP-release an exact aggregate table: for each ``(value_col,
    sensitivity, eps_ppm)`` spec append ``{col}_noise`` and
    ``{col}_released`` (BIGINT), plus the sequential-composition
    ``eps_total_ppm`` ledger column.

    This is the readout half of DP-at-scale: maintain EXACT partial
    aggregates incrementally (streaming/rollup.py — noise must never
    be folded into mergeable state, or merging would sum noise draws)
    and add calibrated noise only at publication.  Because the noise
    is a pure function of ``(tag, key)``, releasing the same table
    twice — or releasing the incrementally-maintained table vs a
    one-shot batch aggregate — publishes identical values
    (tests/test_dp_stream.py pins both).

    ``key_col`` must stringify deterministically: use tz-free keys
    (bigint ids, ISO dates, the repo's ``ts_us`` microseconds), not
    session-timezone-dependent TIMESTAMP casts.

    The output keeps the exact ``col`` and ``{col}_noise`` beside the
    released value — the AUDIT form (mechanism marker in-row); a
    production publication projects only ``{col}_released`` + the
    ledger into the released view and leaves the exact columns in a
    restricted audit view."""
    out = df
    total = 0
    for col, sens, eps_ppm in specs:
        table = laplace_noise_table(sens / (eps_ppm / 1e6))
        nz = noise_value(table, f"dp:{col}", F.col(key_col))
        out = out.withColumn(f"{col}_noise", nz).withColumn(
            f"{col}_released", (F.col(col) + nz).cast("bigint")
        )
        total += eps_ppm
    return out.withColumn(
        "eps_total_ppm", F.lit(int(total)).cast("bigint")
    ).withColumn("mechanism", F.lit(MECHANISM))
