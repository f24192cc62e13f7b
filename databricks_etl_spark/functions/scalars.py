"""Scalar function surface (SURVEY.md §2.8 F1–F12).

The reference's scalar usage is dates + casts + `when` buckets. Two
engine-wide policies live here:

1. **``as_of_date`` instead of ``current_date()``** (F6): the
   reference's ``datediff(current_date(), ...)`` (``transform.py:
   144,155``) is nondeterministic; every derived-feature operator takes
   an explicit ``as_of_date`` so results are reproducible and
   oracle-checkable.
2. **Decimal-stable float aggregates**: double summation is
   order-dependent, so cross-engine value-hash comparison of
   ``SUM(double)`` is flaky. ``decimal_sum`` casts each term to
   ``DECIMAL(28,6)`` (exact, associative) before summing and returns a
   double — both Spark and ANSI-SQL oracles compute the identical
   value regardless of row order or partitioning. At 100 TB this is
   also the *right* semantics for money columns.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MONEY = "decimal(28,6)"


def decimal_sum(expr: Column | str, alias: str | None = None) -> Column:
    """Order-independent SUM over a double expression (exact decimal)."""
    c = F.col(expr) if isinstance(expr, str) else expr
    out = F.sum(c.cast(MONEY)).cast("double")
    return out.alias(alias) if alias else out


def decimal_avg(expr: Column | str, alias: str | None = None) -> Column:
    """Order-independent AVG: exact decimal sum / count, as double."""
    c = F.col(expr) if isinstance(expr, str) else expr
    out = F.sum(c.cast(MONEY)).cast("double") / F.count(c)
    return out.alias(alias) if alias else out


def gap_exceeds(ts: Column | str, prev: Column | str, seconds: int) -> Column:
    """Exact "strictly more than ``seconds`` elapsed between ``prev`` and
    ``ts``" — the sessionization split predicate.

    Computed as ``ts > prev + INTERVAL seconds`` so it is
    microsecond-exact on TIMESTAMP and TIMESTAMP_NTZ alike and matches a
    DuckDB ``ts - lag(ts) > INTERVAL ...`` oracle bit-for-bit. Never
    cast a timestamp to double for this: TIMESTAMP_NTZ→DOUBLE is an
    illegal cast in Spark 4 (broke q80 in round 2), and
    ``unix_timestamp()`` floors to whole seconds, which disagrees with
    an exact interval comparison for gaps in (N, N+1). NULL when
    ``prev`` is NULL (guard with ``isNull()`` at the call site).
    """
    t = F.col(ts) if isinstance(ts, str) else ts
    p = F.col(prev) if isinstance(prev, str) else prev
    return t > p + F.make_interval(secs=F.lit(seconds))


def epoch_seconds(col: Column | str) -> Column:
    """Whole-second epoch (BIGINT) of a timestamp column —
    ``unix_timestamp``, which FLOORS sub-second precision; pair with a
    DuckDB ``CAST(floor(epoch(ts)) AS BIGINT)`` oracle. For gap/order
    *comparisons* use :func:`gap_exceeds` (exact) instead."""
    return F.unix_timestamp(col)


def day_diff(later: Column | str, earlier: Column | str) -> Column:
    """F7 ``datediff`` (``transform.py:144,155,179``)."""
    return F.datediff(F.to_date(later), F.to_date(earlier))


def years_since(date_col: Column | str, as_of_date: str) -> Column:
    """Age in whole years at ``as_of_date`` (replaces
    ``year(current_date()) - year(birth_dt)``, ``transform.py:93-98``)."""
    return F.year(F.lit(as_of_date).cast("date")) - F.year(F.to_date(date_col))


def latest_of(*cols: Column | str) -> Column:
    """F8 row-wise max of date columns, null-skipping
    (``greatest(c1..c5)``, ``transform.py:155``)."""
    return F.greatest(*[F.to_date(c) for c in cols])


def normalize_cast(col: Column | str, dtype: str) -> Column:
    """F9 cast-with-NULL-on-malformed (``pre_analysis.py:225,246``...).

    ``try_cast`` yields NULL for unparseable strings regardless of the
    session's ANSI setting (Spark 4 defaults ANSI on, where plain
    ``cast`` throws); this wrapper names the policy so call sites read
    as ingest normalization.
    """
    c = F.col(col) if isinstance(col, str) else col
    return c.try_cast(dtype)
