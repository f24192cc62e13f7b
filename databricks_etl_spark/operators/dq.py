"""Declarative data-quality expectation suite (deequ / Great-
Expectations shape) — the operator library behind q188_dq_expectations.

The reference profiles ad hoc (isnull/distinct counts scattered through
``pre_process.py`` — SURVEY.md §2 A9–A11); production pipelines instead
declare a CONSTRAINT SUITE and gate ingestion on one report. Each check
here compiles to a conditional aggregate, so an arbitrary number of
checks over one table FUSE into a single map-combinable pass (the A9
fusion rule); only referential checks add a join. Verdicts are integer
comparisons — never float equality.

Scale: one scan per table regardless of check count; the report is
|checks| rows. At 100 TB the scan dominates and adding a check adds a
column to the aggregate, not a pass over the data.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Check:
    """One expectation: ``metric = satisfied/total`` must equal 1.

    Either ``satisfied`` (a boolean Column; NULL counts as violation
    so a check can't pass by being undefined) or ``distinct_col``
    (uniqueness: count-distinct must equal count) — not both.
    """

    name: str
    satisfied: Column | None = None
    distinct_col: str | None = None

    def agg(self) -> Column:
        if self.distinct_col is not None:
            return F.count_distinct(F.col(self.distinct_col)).alias(
                f"__ok_{self.name}"
            )
        return F.count_if(F.coalesce(self.satisfied, F.lit(False))).alias(
            f"__ok_{self.name}"
        )


def not_null(col: str, name: str | None = None) -> Check:
    return Check(name or f"{col}_complete", F.col(col).isNotNull())


def unique(col: str, name: str | None = None) -> Check:
    return Check(name or f"{col}_unique", distinct_col=col)


def in_range(col: str, lo, hi, name: str | None = None) -> Check:
    return Check(name or f"{col}_in_range", (F.col(col) >= lo) & (F.col(col) <= hi))


def in_domain(col: str, values: list, name: str | None = None) -> Check:
    return Check(name or f"{col}_in_domain", F.col(col).isin(values))


def matches(col: str, pattern: str, name: str | None = None) -> Check:
    return Check(name or f"{col}_matches", F.col(col).rlike(pattern))


def expect(df: DataFrame, table: str, checks: list[Check]) -> DataFrame:
    """Compile a check suite into ONE fused aggregate pass.

    Returns (tbl, check_name, metric, passed): metric is the satisfied
    fraction rounded to 6 dp, passed is the exact integer verdict
    ``n > 0 AND n_ok == n`` — an EMPTY table fails every check (metric
    NULL, passed false), so a zero-row ingestion can never green-light
    the gate silently. Uniqueness checks ride the same pass as
    count-distinct aggregates.
    """
    row = df.agg(F.count(F.lit(1)).alias("__n"), *[c.agg() for c in checks])
    # Pivot the 1-row aggregate into |checks| report rows by exploding
    # an array of structs — NOT a union of per-check selects: each
    # union branch would re-execute the aggregate (and therefore
    # re-scan the table) because the branches are non-identical
    # subplans Spark cannot dedupe. The explode keeps one scan total.
    cells = [
        F.struct(
            F.lit(c.name).alias("check_name"),
            F.round(
                F.try_divide(
                    F.col(f"__ok_{c.name}").cast("double"), F.col("__n")
                ),
                6,
            ).alias("metric"),
            (
                (F.col("__n") > 0) & (F.col(f"__ok_{c.name}") == F.col("__n"))
            ).alias("passed"),
        )
        for c in checks
    ]
    return row.select(F.explode(F.array(*cells)).alias("__c")).select(
        F.lit(table).alias("tbl"), F.col("__c.*")
    )


def expect_references(
    child: DataFrame,
    child_col: str,
    parent: DataFrame,
    parent_col: str,
    table: str,
    name: str | None = None,
) -> DataFrame:
    """Referential-integrity check: every child key resolves in the
    parent. One anti-join (broadcastable when the parent key set is
    small) + one 1-row aggregate; reports the resolved fraction.

    NULL-key policy (NOT IN semantics): a NULL child key is NOT an
    orphan — it is excluded from the anti-join, exactly as SQL's
    ``child_col NOT IN (SELECT parent_col ...)`` never returns a
    NULL-keyed row. NULL-key *completeness* is a separate
    :func:`not_null` check, not this one's job. The denominator stays
    the full child row count, so metric = resolved fraction of ALL
    rows. An empty child table reports passed false (metric NULL)."""
    n = child.agg(F.count(F.lit(1)).alias("__n"))
    orphans = child.filter(child[child_col].isNotNull()).join(
        parent.select(parent_col),
        child[child_col] == parent[parent_col],
        "left_anti",
    ).agg(F.count(F.lit(1)).alias("__orphans"))
    return n.crossJoin(orphans).select(  # two 1-row aggregates
        F.lit(table).alias("tbl"),
        F.lit(name or f"{child_col}_references").alias("check_name"),
        F.round(
            1.0
            - F.try_divide(F.col("__orphans").cast("double"), F.col("__n")),
            6,
        ).alias("metric"),
        ((F.col("__n") > 0) & (F.col("__orphans") == 0)).alias("passed"),
    )
