"""Sampling and frequency-sketch operators.

Two sampling paths with different contracts:

- :func:`hash_stratified_sample` — DETERMINISTIC sampling by a
  portable multiplicative hash (MINSTD constants) on a key column:
  the same row set on any engine, any partitioning, any run — so the
  sample itself is oracle-checkable, and at 100 TB a re-run (or a
  different engine auditing the pipeline) selects the identical
  corpus subset. This is the reproducible-training-subset primitive.
- ``DataFrame.sampleBy`` (seeded Bernoulli per stratum) — Spark's
  built-in; statistically cleaner but its row set depends on
  partition layout, so it is NOT cross-engine reproducible; use when
  only the distribution matters, not row identity. Covered by
  tolerance tests, deliberately not registered as a driver query.

Frequency sketch: :func:`freq_items` wraps ``df.stat.freqItems``
(Karp-Shenker-Papadimitriou single-pass heavy hitters): one scan, no
shuffle of raw rows, O(1/support) state per partition — the guarantee
is NO FALSE NEGATIVES (every item with frequency > support·n
appears); false positives are possible and expected. The exact
counterpart (full groupBy count, one shuffle) exists as
q39_term_frequency / q15_value_counts.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# MINSTD / Lehmer generator constants: portable 31-bit arithmetic —
# (key % P) * A stays < P*A ≈ 4.8e13, far inside BIGINT range at any
# scale factor (a 2^32-style multiplier would overflow int64 once
# keys pass ~3.5e9).
_P = 1_000_000_007
_A = 48_271


def hash_bucket(key: Column, buckets: int = 100) -> Column:
    """Deterministic bucket in [0, buckets) from a BIGINT key —
    identical arithmetic is expressible in ANSI SQL:
    ``((key % P) * A) % P % buckets``."""
    return ((key % _P) * _A) % _P % buckets


def hash_stratified_sample(
    df: DataFrame,
    key: str,
    stratum: str,
    rates_pct: dict[str, int],
) -> DataFrame:
    """Keep a per-stratum percentage of rows, chosen by deterministic
    key hash: row survives iff ``hash_bucket(key) < rates_pct[stratum]``.
    Strata missing from ``rates_pct`` are dropped (rate 0). No shuffle
    at all — the filter is embarrassingly parallel and pushes past
    column pruning into the scan."""
    bucket = hash_bucket(F.col(key))
    rate = None
    for value, pct in sorted(rates_pct.items()):
        cond = F.when(F.col(stratum) == value, F.lit(pct))
        rate = cond if rate is None else rate.when(
            F.col(stratum) == value, F.lit(pct)
        )
    rate = rate.otherwise(F.lit(0)) if rate is not None else F.lit(0)
    return df.filter(bucket < rate)


def freq_items(df: DataFrame, cols: list[str], support: float) -> DataFrame:
    """Single-pass heavy-hitter candidates per column (arrays in one
    row). Superset guarantee only — callers must count-verify
    candidates if exact frequencies are needed (see
    tests/test_sampling.py)."""
    return df.stat.freqItems(cols, support)
