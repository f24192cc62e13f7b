"""Sinks (SURVEY.md §2.1 S7–S8).

CSV sink mirrors the reference's overwrite-mode header write
(``pre_process.py:304-306``); parquet is the engine-preferred sink;
JDBC mirrors ``transform.py:260`` (works against any JDBC URL whose
driver jar is on the classpath — stubbed-friendly for local runs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_csv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Overwrite-mode CSV directory write with header (S7)."""
    df.write.csv(path, header=True, mode=mode)


def write_parquet(
    df: DataFrame, path: str, mode: str = "overwrite", partition_by: list[str] | None = None
) -> None:
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_jdbc(df: DataFrame, url: str, table: str, mode: str = "overwrite", **options) -> None:
    """JDBC table sink (S8, ``transform.py:260``).

    Executor-parallel writes; pass ``numPartitions``/``batchsize`` in
    ``options`` to bound connection fan-out on a large cluster.
    """
    df.write.options(**options).jdbc(url=url, table=table, mode=mode)
