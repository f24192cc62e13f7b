"""Pandas UDFs (SURVEY.md §2.10 surface).

NOTE: no ``from __future__ import annotations`` here — pandas_udf
infers the UDF kind from *evaluated* type hints; postponed (string)
annotations break the inference.
"""

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql.pandas.functions import pandas_udf


def make_embed_udf(dim: int = 16):
    """Deterministic fake text-embedding (md5 feature hashing into
    ``dim`` buckets, L2-normalized), Arrow-batched. A real deployment
    swaps the body for a model call; the plumbing is the production
    shape."""

    @pandas_udf("array<float>")
    def _embed(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            v = np.zeros(dim, dtype=np.float64)
            for tok in (t or "").lower().split():
                h = int(hashlib.md5(tok.encode()).hexdigest()[:8], 16)
                v[h % dim] += 1.0
            n = np.linalg.norm(v)
            out.append((v / n if n else v).astype(np.float32))
        return pd.Series(out)

    return _embed


def make_broadcast_lookup_udf(spark, mapping: dict, default: str = "UNKNOWN"):
    """Broadcast-variable lookup inside an Arrow-batched pandas UDF.

    ``mapping`` is shipped to every executor ONCE via
    ``sc.broadcast`` (not re-pickled per task closure) and read from
    ``bc.value`` inside the UDF — the pattern for per-executor
    read-only state (vocabulary, label map, small model weights).

    A plain key lookup like this should be a broadcast JOIN in
    production (and the paired oracle checks exactly that); the UDF
    exists to pin the broadcast-state plumbing the embed/decode UDFs
    rely on, where the Python side is irreplaceable.
    """
    bc = spark.sparkContext.broadcast(mapping)

    @pandas_udf("string")
    def _lookup(keys: pd.Series) -> pd.Series:
        m = bc.value  # one deserialization per executor, not per row
        return keys.map(lambda k: m.get(k, default))

    return _lookup
