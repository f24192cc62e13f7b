"""Multimodal columns (north-star extension, SURVEY.md §2.12):
image/audio/video as opaque ``binary`` columns + typed metadata, with
decode / feature-extract / frame-sample as Arrow-batched
``mapInPandas`` operators.

The decode lane is REAL: a pure-Python (stdlib ``struct`` + numpy)
parser for uncompressed 24-bit BMP — headers, BGR channel order,
bottom-up row storage, 4-byte row padding — so the container needs no
codec libraries, and the extracted width/height/channel-means are
cross-engine checkable (q57's DuckDB oracle recomputes them from the
generator's closed form). A production deployment swaps
:func:`decode_bmp` for a JPEG/PNG codec; every surrounding piece —
schema, partition-parallel Arrow batching, UDF signatures, binary
handling — is the production shape.

Scale notes: binary payloads ride in the same parquet row-groups;
``spark.sql.files.maxPartitionBytes`` bounds per-task memory;
mapInPandas streams Arrow batches, never materializing a partition.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def attach_binary(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Simulate a multimodal ingest: payload as ``binary`` + typed
    metadata (size, sha256, declared modality). JVM-side only."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return df.withColumn("payload", payload).withColumn(
        "meta",
        F.struct(
            F.octet_length(F.col(text_col)).alias("n_bytes"),
            F.sha2(payload, 256).alias("sha256"),
            F.lit("image/fake").alias("content_type"),
        ),
    )


_DECODE_SCHEMA = (
    "doc_id long, n_bytes long, width int, height int, channels int, "
    "mean_r double, mean_g double, mean_b double"
)


def bmp_dims(doc_id: int) -> tuple[int, int]:
    """Deterministic per-document image dimensions for the synthetic
    ingest (closed form so the DuckDB oracle can recompute them)."""
    return 4 + doc_id % 13, 4 + doc_id % 7


def bmp_pixel(doc_id: int, x: int, y: int) -> tuple[int, int, int]:
    """Deterministic (r, g, b) for pixel (x, y) of document
    ``doc_id`` — the same closed form q57's oracle evaluates in SQL."""
    return (
        (doc_id + 7 * x + 13 * y) % 256,
        (2 * doc_id + 5 * x + 11 * y) % 256,
        (3 * doc_id + 3 * x + 17 * y) % 256,
    )


def encode_bmp(width: int, height: int, pixel_fn) -> bytes:
    """Pure-Python uncompressed 24-bit BMP writer (BITMAPFILEHEADER +
    BITMAPINFOHEADER, BI_RGB): pixels stored bottom-up, BGR byte
    order, rows padded to 4 bytes — the format every BMP reader
    expects, so the decoder below is exercised against a REAL file
    layout, not a private convention."""
    row_bytes = width * 3
    pad = (4 - row_bytes % 4) % 4
    img_size = (row_bytes + pad) * height
    off = 14 + 40
    header = struct.pack("<2sIHHI", b"BM", off + img_size, 0, 0, off)
    info = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, img_size, 2835, 2835, 0, 0
    )
    rows = []
    for y in reversed(range(height)):  # bottom-up storage
        row = bytearray()
        for x in range(width):
            r, g, b = pixel_fn(x, y)
            row += bytes((b, g, r))  # BGR on disk
        row += b"\x00" * pad
        rows.append(bytes(row))
    return header + info + b"".join(rows)


def decode_bmp(data: bytes) -> tuple[int, int, int, float, float, float]:
    """Decode an uncompressed 24-bit BMP and return (width, height,
    channels, mean_r, mean_g, mean_b). Channel means are exact-integer
    sums divided once at the end, so they are bit-equal to any other
    engine's integer-arithmetic evaluation of the same pixels.

    Raises ``ValueError`` on non-BMP or unsupported encodings (the
    honest capability gate: only BI_RGB 24-bit is implemented).

    Parsing delegates to :func:`bmp_pixel_array` — ONE copy of the
    header/stride/flip layout logic, so the feature lane and the
    perceptual-hash lane can never drift on the same payload."""
    rows = bmp_pixel_array(data)  # (h, w, 3) RGB
    height, width, _ = rows.shape
    sums = rows.reshape(-1, 3).astype(np.int64).sum(axis=0)  # R, G, B
    n = width * height
    return width, height, 3, sums[0] / n, sums[1] / n, sums[2] / n


def generate_bmp_payloads(df: DataFrame) -> DataFrame:
    """Synthetic multimodal ingest: one real BMP payload per document,
    dimensions and pixels closed-form in ``doc_id`` (so an external
    oracle can verify the decode lane without a codec). mapInPandas —
    payload construction is a codec concern, the sanctioned Python
    lane."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                w, h = bmp_dims(d)
                payloads.append(encode_bmp(w, h, lambda x, y: bmp_pixel(d, x, y)))
            yield pd.DataFrame({"doc_id": pdf["doc_id"].values, "payload": payloads})

    return df.select("doc_id").mapInPandas(op, "doc_id long, payload binary")


def decode_features(df: DataFrame) -> DataFrame:
    """Decode + feature-extract over the binary column via
    ``mapInPandas`` (Arrow batch iterator — the per-partition custom
    operator shape; no row-at-a-time Python). The decoder is the real
    BMP parser above; swap :func:`decode_bmp` for a JPEG/PNG codec in
    a full deployment."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        nulls = (None,) * 6

        def safe(p):
            # quarantine-by-NULL: one corrupt OR NULL payload in a
            # 100 TB multimodal corpus must NOT kill the stage — it
            # reports NULL features (n_bytes stays populated for
            # non-NULL payloads) and the caller counts/filters NULL
            # widths, mirroring the q230 hygiene pattern for
            # embeddings. The bytes() conversion lives INSIDE the try
            # so a NULL payload (p is None → TypeError) is quarantined
            # like corrupt bytes instead of failing the Arrow batch.
            try:
                return decode_bmp(bytes(p))
            except Exception:
                return nulls

        for pdf in batches:
            feats = [safe(p) for p in pdf["payload"]]
            out = pd.DataFrame(
                feats,
                columns=["width", "height", "channels", "mean_r", "mean_g", "mean_b"],
            )
            out.insert(
                0, "n_bytes", [len(p) if p is not None else None for p in pdf["payload"]]
            )
            out.insert(0, "doc_id", pdf["doc_id"].values)
            yield out

    return df.select("doc_id", "payload").mapInPandas(op, _DECODE_SCHEMA)


def decode_features_arrow(df: DataFrame) -> DataFrame:
    """:func:`decode_features`'s ``mapInArrow`` twin: the same decoder
    over raw ``pyarrow.RecordBatch``es — no pandas materialization
    between Arrow transport and the codec, the shape a binary-heavy
    multimodal scan wants at 100 TB (pandas conversion would copy
    every payload into Python objects TWICE). Output schema and
    quarantine-by-NULL semantics are byte-identical to the pandas
    lane; q432 registers it with q57's oracle, so the Arrow-native
    path is itself hash-proven."""
    import pyarrow as pa

    def op(batches):
        nulls = (None,) * 6

        def safe(p):
            try:
                return decode_bmp(bytes(p))
            except Exception:
                return nulls

        target = pa.schema(
            [
                pa.field("doc_id", pa.int64()),
                pa.field("n_bytes", pa.int64()),
                pa.field("width", pa.int32()),
                pa.field("height", pa.int32()),
                pa.field("channels", pa.int32()),
                pa.field("mean_r", pa.float64()),
                pa.field("mean_g", pa.float64()),
                pa.field("mean_b", pa.float64()),
            ]
        )
        for batch in batches:
            doc_ids = batch.column("doc_id").to_pylist()
            payloads = batch.column("payload").to_pylist()
            feats = [safe(p) for p in payloads]
            cols = {
                "doc_id": doc_ids,
                "n_bytes": [
                    len(p) if p is not None else None for p in payloads
                ],
                "width": [f[0] for f in feats],
                "height": [f[1] for f in feats],
                "channels": [f[2] for f in feats],
                "mean_r": [f[3] for f in feats],
                "mean_g": [f[4] for f in feats],
                "mean_b": [f[5] for f in feats],
            }
            yield pa.RecordBatch.from_pydict(cols, schema=target)

    return df.select("doc_id", "payload").mapInArrow(op, _DECODE_SCHEMA)


def frame_sample(df: DataFrame, every_n_bytes: int = 1024) -> DataFrame:
    """'Video frame sampling' stub: emit one row per sampled offset of
    each payload — demonstrates the 1→N mapInPandas expansion shape
    (a real frame sampler yields one row per decoded frame)."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                for off in range(0, max(1, len(payload)), every_n_bytes):
                    chunk = payload[off : off + every_n_bytes]
                    rows.append((doc_id, off, len(chunk), sum(chunk) % 256))
            yield pd.DataFrame(
                rows, columns=["doc_id", "frame_offset", "frame_bytes", "frame_checksum"]
            )

    return df.select("doc_id", "payload").mapInPandas(
        op, "doc_id long, frame_offset long, frame_bytes long, frame_checksum int"
    )


# ---------------------------------------------------------------------------
# Audio lane: real RIFF/WAVE PCM16 codec (the audio leg of the
# multimodal mandate, same architecture as the BMP image lane)
# ---------------------------------------------------------------------------

_WAV_RATE = 8000


def wav_n_samples(doc_id: int) -> int:
    """Deterministic per-document sample count (closed form for the
    oracle)."""
    return 32 + doc_id % 97


def wav_sample(doc_id: int, i: int) -> int:
    """Deterministic signed 16-bit PCM sample i of document ``doc_id``
    — the same closed form q277's oracle evaluates in SQL."""
    return ((doc_id * 131 + i * 7919) % 65536) - 32768


def encode_wav(n_samples: int, sample_fn, rate: int = _WAV_RATE) -> bytes:
    """Pure-Python RIFF/WAVE writer: canonical 44-byte header (PCM
    format chunk: audio_format=1, mono, 16-bit little-endian) + the
    sample data chunk — a file any audio tool opens."""
    data = b"".join(
        struct.pack("<h", sample_fn(i)) for i in range(n_samples)
    )
    byte_rate = rate * 2
    hdr = (
        b"RIFF"
        + struct.pack("<I", 36 + len(data))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<IHHIIHH", 16, 1, 1, rate, byte_rate, 2, 16)
        + b"data"
        + struct.pack("<I", len(data))
    )
    return hdr + data


def decode_wav(payload: bytes) -> tuple[int, int, int, int]:
    """Pure-Python RIFF/WAVE PCM16 parser: validates the RIFF/WAVE
    magic and the PCM format chunk, walks to the data chunk, and
    returns (n_samples, sample_rate, sum_abs, sum_sq) — integer
    aggregate features, exactly recomputable by an external oracle.
    Raises on anything malformed (the quarantine wrapper catches).

    Validation and sample extraction delegate to
    :func:`wav_pcm16_array` — ONE copy of the RIFF layout logic, so
    the feature lane and the fingerprint lane can never drift."""
    samples = wav_pcm16_array(payload)
    rate = struct.unpack("<I", payload[24:28])[0]
    return (
        int(samples.size),
        int(rate),
        int(np.abs(samples).sum()),
        int((samples * samples).sum()),
    )


_AUDIO_SCHEMA = (
    "doc_id long, n_bytes long, n_samples long, sample_rate long, "
    "sum_abs long, sum_sq long"
)


def generate_wav_payloads(df: DataFrame) -> DataFrame:
    """One real WAV payload per document, samples closed-form in
    ``doc_id`` (oracle-recomputable without a codec)."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                payloads.append(
                    encode_wav(wav_n_samples(d), lambda i: wav_sample(d, i))
                )
            yield pd.DataFrame({"doc_id": pdf["doc_id"].values, "payload": payloads})

    return df.select("doc_id").mapInPandas(op, "doc_id long, payload binary")


def audio_features(df: DataFrame) -> DataFrame:
    """Decode + feature-extract over WAV payloads via ``mapInPandas``,
    with the same quarantine-by-NULL contract as the image lane: a
    corrupt or NULL payload reports NULL features (n_bytes stays
    populated for non-NULL payloads) and never kills the stage."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        nulls = (None,) * 4

        def safe(p):
            try:
                return decode_wav(bytes(p))
            except Exception:
                return nulls

        for pdf in batches:
            feats = [safe(p) for p in pdf["payload"]]
            out = pd.DataFrame(
                feats, columns=["n_samples", "sample_rate", "sum_abs", "sum_sq"]
            )
            out.insert(
                0,
                "n_bytes",
                [len(p) if p is not None else None for p in pdf["payload"]],
            )
            out.insert(0, "doc_id", pdf["doc_id"].values)
            yield out

    return df.select("doc_id", "payload").mapInPandas(op, _AUDIO_SCHEMA)


def bmp_pixel_array(data: bytes) -> "np.ndarray":
    """(height, width, 3) uint8 RGB pixel array from a BI_RGB 24-bit
    BMP — the raw-pixel sibling of :func:`decode_bmp` for operators
    that need spatial structure (perceptual hashing), not just means."""
    if data[:2] != b"BM":
        raise ValueError("not a BMP payload")
    off = struct.unpack_from("<I", data, 10)[0]
    _, width, height, _, bpp, comp = struct.unpack_from("<IiiHHI", data, 14)
    if bpp != 24 or comp != 0:
        raise ValueError(f"unsupported BMP encoding (bpp={bpp}, compression={comp})")
    bottom_up = height > 0
    height = abs(height)
    row_bytes = width * 3
    stride = row_bytes + (4 - row_bytes % 4) % 4
    raw = np.frombuffer(data, dtype=np.uint8, count=stride * height, offset=off)
    rows = raw.reshape(height, stride)[:, :row_bytes].reshape(height, width, 3)
    if bottom_up:
        rows = rows[::-1]
    return rows[..., ::-1]  # BGR on disk -> RGB


def ahash16(data: bytes) -> int:
    """16-bit average-hash of a BMP: the image is partitioned into a
    4×4 block grid (block of pixel (x, y) is (x·4//w, y·4//h)), and
    bit (by·4 + bx) is set iff the block's mean gray (r+g+b) STRICTLY
    exceeds the image mean. All comparisons are exact integer
    cross-products (bsum·icnt > isum·bcnt) — no float division — so
    an arithmetic oracle reproduces the hash bit-for-bit."""
    px = bmp_pixel_array(data).astype(np.int64)
    h, w, _ = px.shape
    gray = px.sum(axis=2)
    ys = (np.arange(h) * 4) // h
    xs = (np.arange(w) * 4) // w
    isum = int(gray.sum())
    icnt = h * w
    val = 0
    for by in range(4):
        rowsel = gray[ys == by]
        for bx in range(4):
            block = rowsel[:, xs == bx]
            if int(block.sum()) * icnt > isum * int(block.size):
                val |= 1 << (by * 4 + bx)
    return val


def image_ahash(df: DataFrame) -> DataFrame:
    """Perceptual-hash extraction over the binary column: decode each
    BMP and emit its 16-bit aHash (corrupt/NULL payloads quarantine to
    NULL, same policy as :func:`decode_features`). The downstream
    dedup is an equi-join on the hash — the image analog of the text
    lanes' fingerprint bucketing."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def safe(p):
            if p is None:
                return None
            try:
                return ahash16(bytes(p))
            except (ValueError, struct.error, IndexError):
                return None

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "ahash": pd.array(
                        [safe(p) for p in pdf["payload"]], dtype="Int64"
                    ),
                }
            )

    return df.select("doc_id", "payload").mapInPandas(op, "doc_id long, ahash long")


def wav_pcm16_array(payload: bytes) -> "np.ndarray":
    """int64 sample array from a RIFF/WAVE PCM16 payload — the
    raw-sample sibling of :func:`decode_wav` for operators needing
    temporal structure (fingerprinting). Same validation and
    failure contract."""
    if len(payload) < 44 or payload[0:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    fmt_id, audio_format, channels = payload[12:16], *struct.unpack(
        "<HH", payload[20:24]
    )
    if fmt_id != b"fmt " or audio_format != 1 or channels != 1:
        raise ValueError("unsupported WAV format")
    bits = struct.unpack("<H", payload[34:36])[0]
    if bits != 16 or payload[36:40] != b"data":
        raise ValueError("unsupported WAV layout")
    n_bytes = struct.unpack("<I", payload[40:44])[0]
    raw = payload[44 : 44 + n_bytes]
    if len(raw) != n_bytes or n_bytes % 2 != 0:
        raise ValueError("truncated WAV data chunk")
    return np.frombuffer(raw, dtype="<i2").astype(np.int64)


def audio_fingerprint16(payload: bytes) -> int:
    """15-bit energy-contour fingerprint of a PCM16 clip: samples are
    partitioned into 16 equal frames (frame of sample i is i·16//n),
    and bit f (0..14) is set iff frame f+1's energy (Σ s²) STRICTLY
    exceeds frame f's — the sign-of-energy-delta construction
    (chromaprint's core idea reduced to one band). Pure integer
    comparisons, so an arithmetic oracle reproduces it exactly."""
    s = wav_pcm16_array(payload)
    n = s.size
    if n < 16:
        raise ValueError("clip too short to fingerprint")
    frames = (np.arange(n) * 16) // n
    energy = np.zeros(16, dtype=np.int64)
    np.add.at(energy, frames, s * s)
    val = 0
    for f in range(15):
        if energy[f + 1] > energy[f]:
            val |= 1 << f
    return val


def audio_fingerprints(df: DataFrame) -> DataFrame:
    """Fingerprint extraction over WAV payloads via ``mapInPandas``,
    quarantining corrupt/NULL payloads to NULL — the audio analog of
    :func:`image_ahash`; dedup downstream is an equi-join on the
    fingerprint."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def safe(p):
            if p is None:
                return None
            try:
                return audio_fingerprint16(bytes(p))
            except (ValueError, struct.error, IndexError):
                return None

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "afp": pd.array(
                        [safe(p) for p in pdf["payload"]], dtype="Int64"
                    ),
                }
            )

    return df.select("doc_id", "payload").mapInPandas(op, "doc_id long, afp long")
