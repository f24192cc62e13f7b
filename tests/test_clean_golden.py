"""Pipeline-level golden tests (SURVEY.md §5.2-3): the EP2 cleaning
rules applied to fixtures with one planted violation per rule —
exactly the planted rows must be removed/repaired. Also exercises the
multiline/escape CSV ingest (S2) and NULL-on-malformed normalization.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from databricks_etl_spark.operators import clean as C
from databricks_etl_spark.operators.features import featurize_onboarding
from databricks_etl_spark.sources.normalize import normalize
from databricks_etl_spark.sources.readers import read_csv_table
from databricks_etl_spark.sources.schemas import REFERENCE_INGEST, REFERENCE_NORMALIZED

from tests import reference_fixtures as FX


@pytest.fixture(scope="module")
def tables(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("reffix")
    paths = FX.write_fixtures(str(d))
    out = {}
    for name, path in paths.items():
        raw = read_csv_table(spark, path, REFERENCE_INGEST[name])
        out[name] = normalize(raw, REFERENCE_NORMALIZED[name])
    return out


def test_multiline_csv_and_malformed_casts(tables):
    users = tables["lk_users"]
    rows = {r["user_id"]: r for r in users.collect()}
    assert "\n" in rows["MLB3"]["address"]  # embedded newline survived (S2)
    assert rows["MLB10"]["rubro"] is None  # NULL-on-malformed (F9)
    assert rows["MLB1"]["rubro"] == 3.0


def test_clean_onboarding_golden(tables):
    cleaned = C.clean_onboarding(
        tables["lk_onboarding"], tables["bt_users_transactions"]
    )
    rows = {r["user_id"]: r for r in cleaned.collect()}
    assert set(rows) == FX.EXPECTED_SURVIVORS
    # deterministic dedup survivor
    for uid, serial in FX.EXPECTED_DEDUP_SERIAL.items():
        assert rows[uid]["serial_onboarding"] == serial
    # habito NULL imputed to 0
    assert rows["MLB3"]["habito"] == 0
    # R7 repair: flag reset + date nulled; count joined in
    for uid in FX.EXPECTED_R7_REPAIRED:
        assert rows[uid]["activacion"] == 0
        assert rows[uid]["activacion_dt"] is None
        assert rows[uid]["transaction_count"] == 0
    # untouched active user keeps its flag and count
    assert rows["MLB1"]["activacion"] == 1
    assert rows["MLB1"]["transaction_count"] == 3
    # pruned column gone, rename applied
    assert "Unnamed: 0" not in cleaned.columns
    assert "serial_onboarding" in cleaned.columns


def test_clean_idempotent(tables):
    """clean ∘ clean = clean (SURVEY.md §5.2-4)."""
    once = C.clean_onboarding(tables["lk_onboarding"], tables["bt_users_transactions"])
    # feed the cleaned output back through the rule chain only
    twice = once
    for rule in C.onboarding_rules():
        twice = rule.apply(twice)
    twice = C.r7_repair(twice)
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))


def test_rule_audit_matches_planted(tables):
    onb = tables["lk_onboarding"]
    matched = {
        name: {r["user_id"] for r in df.collect()}
        for name, df in C.audit(onb).items()
    }
    assert matched["R1_habito_flag_date_mismatch"] == {"MLB4"}
    assert matched["R2_null_first_login"] == {"MLB5"}
    assert matched["R3_habito_without_activacion"] == {"MLB6"}
    assert matched["R4_activacion_before_setup"] == {"MLB7"}
    assert matched["R5_activacion_without_setup"] == {"MLB8"}
    assert matched["R6_return_before_first_login"] == {"MLB9"}


def test_clean_csv_sink_roundtrip(tables, spark, tmp_path):
    """EP2's terminal step (``pre_process.py:304-306``): cleaned table →
    CSV sink → re-read+normalize gives back the same rows."""
    from databricks_etl_spark.sources.normalize import normalize
    from databricks_etl_spark.sources.readers import read_csv_table
    from databricks_etl_spark.sources.writers import write_csv
    from pyspark.sql import types as T

    cleaned = C.clean_onboarding(
        tables["lk_onboarding"], tables["bt_users_transactions"]
    )
    out = str(tmp_path / "cleaned_onb")
    write_csv(cleaned, out)
    raw = read_csv_table(spark, out, multi_line=False)
    back = normalize(raw, T.StructType(cleaned.schema.fields))
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, cleaned.collect()))


def test_featurize_publish_partitioned(tables, spark, tmp_path):
    """EP3's terminal step (``transform.py:260`` JDBC → here parquet):
    published mart partitioned by a derived column, partition-prunable
    on read."""
    import os

    from databricks_etl_spark.sources.writers import write_parquet

    users = C.clean_users(tables["lk_users"])
    cleaned = C.clean_onboarding(
        tables["lk_onboarding"], tables["bt_users_transactions"]
    )
    feats = featurize_onboarding(users, cleaned, as_of_date="2024-06-01")
    out = str(tmp_path / "mart")
    write_parquet(feats, out, partition_by=["age_group"])
    assert any(e.startswith("age_group=") for e in os.listdir(out))
    back = spark.read.parquet(out)
    assert back.count() == feats.count()
    assert set(back.columns) == set(feats.columns)


def test_observation_metrics_free_telemetry(tables):
    """Observation metrics ride the first action — no extra jobs
    (SURVEY.md §4.1 fix for the reference's count-per-step)."""
    obs: dict = {}
    out = C.clean_onboarding(
        tables["lk_onboarding"], tables["bt_users_transactions"], observations=obs
    )
    out.collect()
    assert obs["rows_in"].get["n"] == 12  # post full-row dedup input
    assert obs["rows_out"].get["n"] == len(FX.EXPECTED_SURVIVORS)
    # MLB1×3 + MLB2 + MLB3 + MLB11 (bad-date row still counts as a txn)
    assert obs["rows_out"].get["total_transactions"] == 6


def test_clean_users_and_featurize(tables):
    users = C.clean_users(tables["lk_users"])
    assert users.count() == 5  # exact-dup row removed
    cleaned = C.clean_onboarding(
        tables["lk_onboarding"], tables["bt_users_transactions"]
    )
    feats = featurize_onboarding(users, cleaned, as_of_date="2024-06-01")
    rows = {r["user_id"]: r for r in feats.collect()}
    # inner join: only users present in both
    assert set(rows) == {"MLB1", "MLB2", "MLB3", "MLB10", "MLB11"}
    assert rows["MLB1"]["age_group"] == "26-40"  # born 1990, as-of 2024
    assert rows["MLB11"]["age_group"] == "60+"  # born 1940
    assert rows["MLB1"]["is_seller"] == 1 and rows["MLB2"]["is_seller"] == 0
    assert rows["MLB11"]["drop"] == 1 and rows["MLB1"]["drop"] == 0
    assert rows["MLB1"]["days_since_first_login"] == 152  # 2024-01-01 → 06-01
    assert rows["MLB1"]["no_events"] == 0 and rows["MLB10"]["no_events"] == 1
