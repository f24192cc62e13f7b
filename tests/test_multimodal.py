"""Multimodal plumbing tests: binary column + metadata correctness,
mapInPandas decode batching (schema, determinism), 1→N frame
expansion arithmetic."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from databricks_etl_spark.operators import multimodal as MM
from databricks_etl_spark.sources.readers import read_table


def test_binary_metadata_matches_python(spark, smoke_sf_dir):
    d = read_table(spark, smoke_sf_dir, "documents").filter(F.col("doc_id") < 20)
    out = MM.attach_binary(d).select("doc_id", "text", "payload", "meta").collect()
    for r in out:
        raw = r["text"].encode("utf-8")
        assert bytes(r["payload"]) == raw
        assert r["meta"]["n_bytes"] == len(raw)
        assert r["meta"]["sha256"] == hashlib.sha256(raw).hexdigest()


def test_bmp_roundtrip_pure_python():
    """encode_bmp → decode_bmp recovers dimensions and exact channel
    means, including the padded-row widths (w % 4 != 0) where a stride
    bug would skew every mean."""
    for doc_id in (0, 1, 5, 17, 38, 199):
        w, h = MM.bmp_dims(doc_id)
        data = MM.encode_bmp(w, h, lambda x, y: MM.bmp_pixel(doc_id, x, y))
        width, height, channels, mr, mg, mb = MM.decode_bmp(data)
        assert (width, height, channels) == (w, h, 3)
        n = w * h
        er = sum(MM.bmp_pixel(doc_id, x, y)[0] for x in range(w) for y in range(h)) / n
        eg = sum(MM.bmp_pixel(doc_id, x, y)[1] for x in range(w) for y in range(h)) / n
        eb = sum(MM.bmp_pixel(doc_id, x, y)[2] for x in range(w) for y in range(h)) / n
        assert (mr, mg, mb) == (er, eg, eb)


def test_decode_bmp_rejects_non_bmp():
    import pytest

    with pytest.raises(ValueError):
        MM.decode_bmp(b"not an image at all, just text bytes......")


def test_decode_features_schema_and_determinism(spark, smoke_sf_dir):
    d = read_table(spark, smoke_sf_dir, "documents").filter(F.col("doc_id") < 50)
    payloads = MM.generate_bmp_payloads(d)
    out = MM.decode_features(payloads)
    assert out.columns == [
        "doc_id", "n_bytes", "width", "height", "channels",
        "mean_r", "mean_g", "mean_b",
    ]
    rows1 = sorted(map(tuple, out.collect()))
    rows2 = sorted(
        map(tuple, MM.decode_features(MM.generate_bmp_payloads(d)).collect())
    )
    assert rows1 == rows2  # deterministic codec
    assert len(rows1) == 50
    for r in rows1:
        w, h = MM.bmp_dims(r[0])
        assert (r[2], r[3], r[4]) == (w, h, 3)
        assert 0.0 <= r[5] <= 255.0


def test_frame_sample_expansion(spark, smoke_sf_dir):
    d = read_table(spark, smoke_sf_dir, "documents").filter(F.col("doc_id") < 10)
    out = MM.frame_sample(MM.attach_binary(d), every_n_bytes=100)
    got = out.groupBy("doc_id").count().collect()
    sizes = {r["doc_id"]: r["n_chars"] for r in d.select("doc_id", "n_chars").collect()}
    for r in got:
        expected = max(1, -(-sizes[r["doc_id"]] // 100))  # ceil(n/100)
        assert r["count"] == expected


def test_wav_codec_roundtrip_and_quarantine(spark):
    """The audio lane's codec contract: (1) encode_wav emits a file the
    stdlib wave module opens with identical frame/rate metadata;
    (2) decode_wav returns exact integer features; (3) corrupt and
    NULL payloads quarantine by NULL without killing the stage."""
    import io
    import wave as stdwave

    from databricks_etl_spark.operators import multimodal as MM

    p = MM.encode_wav(MM.wav_n_samples(9), lambda i: MM.wav_sample(9, i))
    w = stdwave.open(io.BytesIO(p))
    assert (w.getnframes(), w.getframerate(), w.getsampwidth(), w.getnchannels()) == (
        MM.wav_n_samples(9), 8000, 2, 1
    )
    n, rate, sabs, ssq = MM.decode_wav(p)
    samples = [MM.wav_sample(9, i) for i in range(MM.wav_n_samples(9))]
    assert (n, rate) == (len(samples), 8000)
    assert sabs == sum(abs(s) for s in samples)
    assert ssq == sum(s * s for s in samples)

    df = spark.createDataFrame(
        [
            (1, bytearray(p)),
            (2, bytearray(b"RIFFgarbage")),
            (3, None),
        ],
        "doc_id long, payload binary",
    )
    rows = {r.doc_id: r for r in MM.audio_features(df).collect()}
    assert rows[1].n_samples == n and rows[1].sum_sq == ssq
    assert rows[2].n_samples is None and rows[2].n_bytes == 11
    assert rows[3].n_samples is None and rows[3].n_bytes is None


def test_ahash_invariants_and_quarantine(spark):
    """aHash contract: 16-bit range, exact clone payloads hash equal,
    corrupt/NULL payloads quarantine to NULL ahash."""
    from databricks_etl_spark.operators import multimodal as MM

    v1 = MM.encode_bmp(8, 6, lambda x, y: MM.bmp_pixel(3, x, y))
    v2 = MM.encode_bmp(8, 6, lambda x, y: MM.bmp_pixel(3, x, y))
    other = MM.encode_bmp(8, 6, lambda x, y: MM.bmp_pixel(99, x, y))
    df = spark.createDataFrame(
        [
            (1, bytearray(v1)),
            (2, bytearray(v2)),
            (3, bytearray(other)),
            (4, bytearray(b"NOTABMP")),
            (5, None),
        ],
        "doc_id long, payload binary",
    )
    rows = {r.doc_id: r.ahash for r in MM.image_ahash(df).collect()}
    assert rows[1] == rows[2]  # clones collide
    assert 0 <= rows[1] <= 0xFFFF and 0 <= rows[3] <= 0xFFFF
    assert rows[4] is None and rows[5] is None
