"""The session factory's scale-critical configuration is a contract,
not a default: AQE (runtime broadcast switch + skew split) replaced
every hard broadcast hint on data-scaled relations in round 5, so a
silent config drift would reintroduce the at-scale OOM class the sweep
removed. Locked here."""

from __future__ import annotations


def test_scale_critical_session_confs(spark):
    conf = spark.conf
    assert conf.get("spark.sql.adaptive.enabled") == "true"
    assert conf.get("spark.sql.adaptive.skewJoin.enabled") == "true"
    assert conf.get("spark.sql.adaptive.coalescePartitions.enabled") == "true"
    # the threshold AQE uses where the old hard hints were removed
    assert int(conf.get("spark.sql.autoBroadcastJoinThreshold")) == 64 * 1024 * 1024
    # oracle-comparability contracts
    assert conf.get("spark.sql.session.timeZone") == "UTC"
    assert conf.get("spark.sql.ansi.enabled", "true") == "true"
    assert conf.get("spark.sql.execution.arrow.pyspark.enabled") == "true"
