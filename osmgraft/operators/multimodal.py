"""Multimodal columns: images/audio as opaque `binary` payloads with
typed metadata, decoded/feature-extracted through mapInPandas.

The container has no image/audio libraries, so two tiers coexist:
(1) a deterministic fake format ("FIMG"/"FAUD" headers, documented
below) exercising the Spark-side plumbing — binary schema, Arrow
batch shape, mapInPandas signatures, partition behavior; and
(2) REAL decoders for the formats pure numpy/stdlib can fully
express — uncompressed 24-bit BMP (decode_bmp), RIFF/WAVE 16-bit
PCM (decode_wav), and baseline grayscale JPEG (the vendored T.81
codec in operators/jpeg.py — genuine Huffman entropy coding, round
5), with genuine synthesized files and byte-level corner tests.
`decode_image_real` routes BMP and baseline-gray JPEG natively and
falls back to Pillow (import-gated) for the rest (color/progressive
JPEG, PNG); `resample_audio_real` stays gated on
soundfile/librosa.

Fake payload format (pure function of doc_id, reproducible in SQL):

    image (doc_id even):
        b"FIMG" + width:uint32be + height:uint32be + filler
        width  = 16 + (doc_id * 7)  % 240
        height = 16 + (doc_id * 13) % 240
    audio (doc_id odd):
        b"FAUD" + rate:uint32be + samples:uint32be + filler
        rate    = 8000 + (doc_id % 5) * 8000
        samples = 1000 + (doc_id * 31) % 50000
    filler = (doc_id % 32) bytes of (doc_id % 256)

Scale note: payloads ride through the pipeline as opaque binary —
Parquet stores them untouched, Arrow transfers them zero-copy into
the pandas batches, and only the decode stage touches the bytes.
Partitioning/pruning keys (doc_id, kind) stay in ordinary columns
so Catalyst never materializes payloads for metadata-only queries.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("kind", StringType(), False),
        StructField("payload", BinaryType(), False),
    ]
)


def _payload(doc_id: int) -> tuple[str, bytes]:
    filler = bytes([doc_id % 256]) * (doc_id % 32)
    if doc_id % 2 == 0:
        w = 16 + (doc_id * 7) % 240
        h = 16 + (doc_id * 13) % 240
        return "image", b"FIMG" + struct.pack(">II", w, h) + filler
    rate = 8000 + (doc_id % 5) * 8000
    samples = 1000 + (doc_id * 31) % 50000
    return "audio", b"FAUD" + struct.pack(">II", rate, samples) + filler


def synth_media(spark: SparkSession, n: int,
                partitions: int | None = None) -> DataFrame:
    """Deterministic media table via mapInPandas over spark.range —
    distributed synthesis, no driver materialization. Partition
    count scales with n: tiny inputs get few partitions so we don't
    spawn a full fleet of Python workers for a handful of rows."""
    if partitions is None:
        partitions = max(
            2,
            min(
                spark.sparkContext.defaultParallelism, n // 20_000 + 1
            ),
        )
    rng = spark.range(0, n, 1, partitions)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            ids = b["id"].tolist()
            kinds, payloads = [], []
            for i in ids:
                k, p = _payload(int(i))
                kinds.append(k)
                payloads.append(p)
            yield pd.DataFrame(
                {"doc_id": ids, "kind": kinds, "payload": payloads}
            )

    return rng.mapInPandas(gen, MEDIA_SCHEMA)


META_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("kind", StringType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("sample_rate", IntegerType(), True),
        StructField("n_samples", IntegerType(), True),
        StructField("n_bytes", LongType(), False),
    ]
)


def decode_metadata(media: DataFrame) -> DataFrame:
    """Arrow-batched header decode: binary payload -> typed metadata.
    This is the plumbing a real decoder (PIL.Image.open /
    soundfile.info) would plug into — swap the header parse for the
    library call; batch shape and schema stay identical."""

    def dec(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            out = {
                "doc_id": b["doc_id"],
                "kind": b["kind"],
                "width": pd.array([None] * len(b), dtype="Int32"),
                "height": pd.array([None] * len(b), dtype="Int32"),
                "sample_rate": pd.array([None] * len(b), dtype="Int32"),
                "n_samples": pd.array([None] * len(b), dtype="Int32"),
                "n_bytes": b["payload"].map(len).astype("int64"),
            }
            df = pd.DataFrame(out)
            payloads = b["payload"]
            magic = payloads.map(lambda p: p[:4])
            img = magic == b"FIMG"
            aud = magic == b"FAUD"
            df.loc[img, "width"] = [
                struct.unpack(">I", p[4:8])[0] for p in payloads[img]
            ]
            df.loc[img, "height"] = [
                struct.unpack(">I", p[8:12])[0] for p in payloads[img]
            ]
            df.loc[aud, "sample_rate"] = [
                struct.unpack(">I", p[4:8])[0] for p in payloads[aud]
            ]
            df.loc[aud, "n_samples"] = [
                struct.unpack(">I", p[8:12])[0] for p in payloads[aud]
            ]
            yield df

    return media.mapInPandas(dec, META_SCHEMA)


def media_features(meta: DataFrame) -> DataFrame:
    """Post-decode feature projection — pure Catalyst over the typed
    metadata (aspect bucket, duration), never touching payloads."""
    return meta.select(
        "doc_id",
        "kind",
        F.when(
            F.col("kind") == "image",
            (F.col("width") * 10000).cast("long")
            / F.col("height").cast("long"),
        ).alias("aspect_e4"),
        F.when(
            F.col("kind") == "audio",
            F.col("n_samples").cast("double") / F.col("sample_rate"),
        ).alias("duration_s"),
        "n_bytes",
    )


# ----------------------------------------------------------------
# real-decoder stubs (library-gated)
# ----------------------------------------------------------------


def decode_image_real(payload: bytes):
    """Real image decode. Uncompressed 24-bit BMP and baseline
    grayscale JPEG decode natively (decode_bmp below and the
    vendored pure-numpy T.81 codec in operators/jpeg.py — both
    tested in this environment); remaining compressed formats
    (color/progressive JPEG, PNG, ...) require Pillow and raise
    NotImplementedError where it is absent."""
    if payload[:2] == b"BM":
        return decode_bmp(payload)
    if payload[:2] == b"\xff\xd8":
        from .jpeg import decode_jpeg_gray

        try:
            return decode_jpeg_gray(payload)
        except ValueError:
            pass  # outside the vendored scope -> Pillow fallback
    try:
        from PIL import Image  # type: ignore
    except ImportError as e:  # pragma: no cover
        raise NotImplementedError(
            "Pillow not available in this environment; BMP and "
            "baseline grayscale JPEG decode natively (decode_bmp, "
            "operators/jpeg.decode_jpeg_gray)"
        ) from e
    import io

    return Image.open(io.BytesIO(payload))  # pragma: no cover


def resample_audio_real(payload: bytes, rate: int):
    """Real audio resample — requires soundfile/librosa (absent)."""
    raise NotImplementedError(
        "audio libraries not available; metadata decode uses the "
        "deterministic FAUD fake (see module docstring)"
    )


def resize_images(
    media: DataFrame, max_dim: int = 64
) -> DataFrame:
    """Batched image resize plumbing: FIMG payloads whose longest
    side exceeds `max_dim` get aspect-preserving integer-scaled
    dimensions (new = old * max_dim div longest, floor, min 1);
    smaller images and non-images pass through untouched. The fake
    format makes "resize" a header rewrite; a real path swaps the
    body transform for PIL.Image.thumbnail — batch shape, binary
    schema, and pass-through semantics stay identical.

    Map-only mapInPandas: payloads stream through Arrow once, no
    shuffle, and column pruning still protects metadata-only
    readers downstream."""

    def rz(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            out = []
            for p in b["payload"]:
                if p[:4] != b"FIMG":
                    out.append(p)
                    continue
                w, h = struct.unpack(">II", p[4:12])
                m = max(w, h)
                if m <= max_dim:
                    out.append(p)
                    continue
                nw = max(1, w * max_dim // m)
                nh = max(1, h * max_dim // m)
                out.append(
                    b"FIMG" + struct.pack(">II", nw, nh) + p[12:]
                )
            yield pd.DataFrame(
                {
                    "doc_id": b["doc_id"],
                    "kind": b["kind"],
                    "payload": out,
                }
            )

    return media.mapInPandas(rz, MEDIA_SCHEMA)


AHASH_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("ahash_hi", LongType(), False),
        StructField("ahash_lo", LongType(), False),
    ]
)


def image_ahash(media: DataFrame, grid: int = 8) -> DataFrame:
    """Perceptual average-hash over image payloads: decode ->
    grid x grid luma sample -> mean threshold -> one bit per cell,
    packed into two int32-range longs (hi = bits 32..63, lo =
    0..31) so no engine ever touches the sign bit. Non-image rows
    are dropped.

    This is the textbook aHash pipeline (resize to 8x8, mean,
    threshold); with the deterministic FIMG fake the "luma" of
    sample cell (x, y) is (sx*31 + sy*17 + sx*sy) % 256 at
    sx = x*w div 8, sy = y*h div 8 — a pure function of the
    decoded dimensions, so the DuckDB oracle can recompute the
    bits from doc_id arithmetic without ever seeing a payload.
    Swapping the luma formula for a real decode (PIL -> grayscale
    -> 8x8 thumbnail) changes nothing else: batch shape, schema,
    bit packing, and every downstream consumer stay identical.

    Map-only mapInPandas over Arrow batches; numpy-vectorized per
    batch (no per-pixel Python)."""
    import numpy as np

    g2 = grid * grid

    def ah(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        xs, ys = np.meshgrid(
            np.arange(grid, dtype=np.int64),
            np.arange(grid, dtype=np.int64),
            indexing="xy",
        )
        fx = xs.ravel()  # idx = y*grid + x ordering
        fy = ys.ravel()
        for b in batches:
            ids, his, los = [], [], []
            for did, p in zip(b["doc_id"], b["payload"]):
                if p[:4] != b"FIMG":
                    continue
                w, h = struct.unpack(">II", p[4:12])
                sx = fx * w // grid
                sy = fy * h // grid
                v = (sx * 31 + sy * 17 + sx * sy) % 256
                mean = int(v.sum()) // g2
                bits = (v > mean).astype(np.int64)
                idx = fy * grid + fx
                lo = int(np.sum(bits[idx < 32] << idx[idx < 32]))
                hi = int(
                    np.sum(bits[idx >= 32] << (idx[idx >= 32] - 32))
                )
                ids.append(did)
                his.append(hi)
                los.append(lo)
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "ahash_hi": pd.Series(his, dtype="int64"),
                    "ahash_lo": pd.Series(los, dtype="int64"),
                }
            )

    return media.mapInPandas(ah, AHASH_SCHEMA)


def ahash_neardup_pairs(
    hashes: DataFrame, max_hamming: int = 6
) -> DataFrame:
    """Hamming-ball near-duplicate pairs over aHash values via
    banded LSH: the 64 bits split into four 16-bit bands used as
    the CANDIDATE generator (bucket join on (band_idx, band_val) —
    never all-pairs), then an exact bit_count verify. By
    pigeonhole a pair within Hamming distance d <= 3 always shares
    a band (3 differing bits cannot touch all 4 bands), so recall
    is exact there; for 4 <= d <= max_hamming recall is the
    standard banded-LSH partial recall. The REPORTED set is
    exactly "pairs sharing >= 1 band AND hamming <= max_hamming" —
    a deterministic contract the DuckDB oracle mirrors
    bit-for-bit. Scale shape identical to the text SimHash path
    (operators/dedup.py simhash_neardup)."""
    b = hashes.select(
        "doc_id",
        "ahash_hi",
        "ahash_lo",
        F.array(
            F.col("ahash_lo") % 65536,
            F.shiftright("ahash_lo", 16),
            F.col("ahash_hi") % 65536,
            F.shiftright("ahash_hi", 16),
        ).alias("bands"),
    ).select(
        "doc_id",
        "ahash_hi",
        "ahash_lo",
        F.posexplode("bands").alias("band_idx", "band_val"),
    )
    left = b.select(
        F.col("doc_id").alias("doc_a"),
        F.col("ahash_hi").alias("hi_a"),
        F.col("ahash_lo").alias("lo_a"),
        "band_idx",
        "band_val",
    )
    right = b.select(
        F.col("doc_id").alias("doc_b"),
        F.col("ahash_hi").alias("hi_b"),
        F.col("ahash_lo").alias("lo_b"),
        "band_idx",
        "band_val",
    )
    cand = (
        left.join(right, ["band_idx", "band_val"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "hi_a", "lo_a", "hi_b", "lo_b")
        .distinct()
    )
    ham = (
        F.bit_count(F.col("hi_a").bitwiseXOR(F.col("hi_b")))
        + F.bit_count(F.col("lo_a").bitwiseXOR(F.col("lo_b")))
    ).cast("long")
    return (
        cand.withColumn("hamming", ham)
        .where(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )


VIDEO_SCHEMA = MEDIA_SCHEMA

FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("frame_idx", IntegerType(), False),
        StructField("frame", BinaryType(), False),
    ]
)


def _video_payload(doc_id: int) -> bytes:
    """Fake video: b"FVID" + n_frames:u32be + frame_len:u32be +
    n_frames frames of frame_len bytes; frame i is filled with
    byte (doc_id + i) % 256. Pure function of doc_id (the SQL
    oracle recomputes frame lengths and fill bytes
    arithmetically)."""
    n_frames = 4 + (doc_id * 3) % 28
    frame_len = 8 + doc_id % 16
    body = b"".join(
        bytes([(doc_id + i) % 256]) * frame_len
        for i in range(n_frames)
    )
    return (
        b"FVID" + struct.pack(">II", n_frames, frame_len) + body
    )


def synth_video(
    spark: SparkSession, n: int, partitions: int | None = None
) -> DataFrame:
    """Deterministic video table (same distributed synthesis shape
    as synth_media)."""
    if partitions is None:
        partitions = max(
            2,
            min(
                spark.sparkContext.defaultParallelism,
                n // 20_000 + 1,
            ),
        )
    rng = spark.range(0, n, 1, partitions)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            ids = b["id"].tolist()
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "kind": ["video"] * len(ids),
                    "payload": [
                        _video_payload(int(i)) for i in ids
                    ],
                }
            )

    return rng.mapInPandas(gen, VIDEO_SCHEMA)


def sample_frames(
    video: DataFrame, every_n: int = 4
) -> DataFrame:
    """Frame sampling plumbing: one video row fans out to rows for
    frames 0, every_n, 2*every_n, ... — the one-to-many Arrow batch
    shape a pyav/ffmpeg keyframe sampler plugs into (swap the
    header-math slicing for the codec call; the explode contract is
    the transferable part).

    Map-only: each input batch yields one output batch of sampled
    frames; no shuffle, and the fan-out factor is bounded by
    n_frames/every_n so batch memory stays proportional to input
    payload size."""

    def smp(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            ids, idxs, frames = [], [], []
            for did, p in zip(b["doc_id"], b["payload"]):
                if p[:4] != b"FVID":
                    continue
                n_frames, frame_len = struct.unpack(">II", p[4:12])
                for i in range(0, n_frames, every_n):
                    off = 12 + i * frame_len
                    ids.append(did)
                    idxs.append(i)
                    frames.append(p[off:off + frame_len])
            yield pd.DataFrame(
                {
                    "doc_id": pd.array(ids, dtype="int64"),
                    "frame_idx": pd.array(idxs, dtype="int32"),
                    "frame": frames,
                }
            )

    return video.mapInPandas(smp, FRAME_SCHEMA)


# ----------------------------------------------------------------
# REAL format decoders — pure numpy/stdlib, no external libraries
# ----------------------------------------------------------------
# Uncompressed 24-bit BMP and 16-bit PCM WAV are completely
# specified formats decodable with struct + numpy alone, so these
# paths are REAL decoders over REAL files (any standard viewer can
# open the synthesized payloads), not header fakes: decode_bmp
# honors the data offset, bottom-up vs top-down row order, and the
# 4-byte row padding; decode_wav walks RIFF chunks (fmt can be
# separated from data by other chunks — the synthesizer plants a
# LIST chunk between them so the walk is exercised, not assumed).
# Formats that genuinely need external codecs (JPEG/PNG/FLAC) still
# route through the library-gated hooks above.


def _bmp_payload(doc_id: int) -> bytes:
    """A real uncompressed 24-bit bottom-up BMP whose pixel values
    are a pure function of (doc_id, x, y) — so a SQL oracle can
    recompute any pixel statistic arithmetically:
        B = (x*3  + y*7  + doc_id)   % 256
        G = (x*5  + y*11 + doc_id*2) % 256
        R = (x*13 + y*17 + doc_id*3) % 256
        w = 4 + (doc_id*7) % 29,  h = 4 + (doc_id*13) % 23
    (y is the TOP-DOWN pixel row; the file stores rows bottom-up
    as the BMP spec requires for positive biHeight)."""
    import numpy as np

    w = 4 + (doc_id * 7) % 29
    h = 4 + (doc_id * 13) % 23
    x = np.arange(w, dtype=np.int64)
    y = np.arange(h, dtype=np.int64)
    X, Y = np.meshgrid(x, y)  # (h, w), Y = top-down row
    img = np.stack(
        [
            (X * 3 + Y * 7 + doc_id) % 256,
            (X * 5 + Y * 11 + doc_id * 2) % 256,
            (X * 13 + Y * 17 + doc_id * 3) % 256,
        ],
        axis=-1,
    ).astype(np.uint8)  # BGR
    stride = (3 * w + 3) // 4 * 4
    buf = np.zeros((h, stride), np.uint8)
    buf[:, : 3 * w] = img.reshape(h, 3 * w)
    pix = buf[::-1].tobytes()  # bottom-up storage order
    off = 14 + 40
    hdr = (
        b"BM"
        + struct.pack("<IHHI", off + len(pix), 0, 0, off)
        + struct.pack(
            "<IiiHHIIiiII",
            40, w, h, 1, 24, 0, len(pix), 2835, 2835, 0, 0,
        )
    )
    return hdr + pix


def decode_bmp(payload: bytes):
    """Decode an uncompressed 24-bit BMP into an (h, w, 3) uint8
    BGR array in TOP-DOWN row order. Handles both bottom-up
    (biHeight > 0) and top-down (biHeight < 0) files, arbitrary
    pixel-data offsets, and padded row strides. Raises ValueError
    on anything that is not plain 24-bit BI_RGB."""
    import numpy as np

    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    (data_off,) = struct.unpack_from("<I", payload, 10)
    w, h_raw = struct.unpack_from("<ii", payload, 18)
    _planes, bpp = struct.unpack_from("<HH", payload, 26)
    (comp,) = struct.unpack_from("<I", payload, 30)
    if bpp != 24 or comp != 0:
        raise ValueError(f"unsupported BMP: {bpp}bpp compression={comp}")
    top_down = h_raw < 0
    h = -h_raw if top_down else h_raw
    stride = (3 * w + 3) // 4 * 4
    arr = (
        np.frombuffer(payload, np.uint8, stride * h, data_off)
        .reshape(h, stride)[:, : 3 * w]
        .reshape(h, w, 3)
    )
    return arr if top_down else arr[::-1]


def synth_bmp(spark: SparkSession, n: int,
              partitions: int | None = None) -> DataFrame:
    """Deterministic table of real BMP files for even doc_ids
    (same distributed mapInPandas synthesis shape as synth_media)."""
    if partitions is None:
        partitions = max(
            2,
            min(spark.sparkContext.defaultParallelism, n // 20_000 + 1),
        )
    rng = spark.range(0, n, 1, partitions).where(F.col("id") % 2 == 0)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            ids = b["id"].tolist()
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "kind": ["image"] * len(ids),
                    "payload": [_bmp_payload(int(i)) for i in ids],
                }
            )

    return rng.mapInPandas(gen, MEDIA_SCHEMA)


BMP_STATS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("width", LongType(), False),
        StructField("height", LongType(), False),
        StructField("sum_b", LongType(), False),
        StructField("sum_g", LongType(), False),
        StructField("sum_r", LongType(), False),
    ]
)


def bmp_channel_stats(media: DataFrame) -> DataFrame:
    """REAL image decode + per-channel statistics: each BMP payload
    is decoded by decode_bmp (full header/stride/row-order
    handling) and reduced to exact integer channel sums — the
    feature-extraction stage of a multimodal pipeline with the
    decode step genuinely executed, not faked. Map-only
    mapInPandas; per-image work is numpy-vectorized."""
    import numpy as np

    def st(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            ids, ws, hs, sb, sg, sr = [], [], [], [], [], []
            for did, p in zip(b["doc_id"], b["payload"]):
                if p[:2] != b"BM":
                    continue
                a = decode_bmp(p).astype(np.int64)
                h, w = a.shape[0], a.shape[1]
                ids.append(did)
                ws.append(w)
                hs.append(h)
                sb.append(int(a[:, :, 0].sum()))
                sg.append(int(a[:, :, 1].sum()))
                sr.append(int(a[:, :, 2].sum()))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "width": pd.Series(ws, dtype="int64"),
                    "height": pd.Series(hs, dtype="int64"),
                    "sum_b": pd.Series(sb, dtype="int64"),
                    "sum_g": pd.Series(sg, dtype="int64"),
                    "sum_r": pd.Series(sr, dtype="int64"),
                }
            )

    return media.mapInPandas(st, BMP_STATS_SCHEMA)


def _wav_payload(doc_id: int) -> bytes:
    """A real RIFF/WAVE file: PCM (format 1), mono, 16-bit, with a
    LIST/INFO chunk deliberately placed between fmt and data so
    decoders must actually walk chunks. Samples are a pure function
    of (doc_id, i):
        s[i] = ((doc_id*7 + i*13) % 2001) - 1000
        rate = 8000 + (doc_id % 4) * 4000
        n    = 200 + (doc_id * 31) % 800
    """
    import numpy as np

    rate = 8000 + (doc_id % 4) * 4000
    n = 200 + (doc_id * 31) % 800
    i = np.arange(n, dtype=np.int64)
    samples = ((doc_id * 7 + i * 13) % 2001 - 1000).astype("<i2")
    data = samples.tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"LIST" + struct.pack("<I", 4) + b"INFO"
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(payload: bytes):
    """Decode a mono 16-bit PCM WAV by walking RIFF chunks (word-
    aligned advance, unknown chunks skipped). Returns
    (sample_rate, int16 numpy array). Raises ValueError for
    non-PCM / non-mono / non-16-bit content."""
    import numpy as np

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, rate, samples = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos:pos + 4]
        (sz,) = struct.unpack_from("<I", payload, pos + 4)
        body = payload[pos + 8:pos + 8 + sz]
        if cid == b"fmt ":
            afmt, n_ch, rate, _br, _ba, bits = struct.unpack_from(
                "<HHIIHH", body, 0
            )
            if afmt != 1 or n_ch != 1 or bits != 16:
                raise ValueError(
                    f"unsupported WAV: fmt={afmt} ch={n_ch} bits={bits}"
                )
        elif cid == b"data":
            samples = np.frombuffer(body, "<i2")
        pos += 8 + sz + (sz & 1)  # RIFF chunks are word-aligned
    if rate is None or samples is None:
        raise ValueError("missing fmt or data chunk")
    return rate, samples


def synth_wav(spark: SparkSession, n: int,
              partitions: int | None = None) -> DataFrame:
    """Deterministic table of real WAV files for odd doc_ids."""
    if partitions is None:
        partitions = max(
            2,
            min(spark.sparkContext.defaultParallelism, n // 20_000 + 1),
        )
    rng = spark.range(0, n, 1, partitions).where(F.col("id") % 2 == 1)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            ids = b["id"].tolist()
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "kind": ["audio"] * len(ids),
                    "payload": [_wav_payload(int(i)) for i in ids],
                }
            )

    return rng.mapInPandas(gen, MEDIA_SCHEMA)


WAV_STATS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("sample_rate", LongType(), False),
        StructField("n_samples", LongType(), False),
        StructField("peak", LongType(), False),
        StructField("sum_abs", LongType(), False),
        StructField("sum_sq", LongType(), False),
    ]
)


def wav_pcm_stats(media: DataFrame) -> DataFrame:
    """REAL audio decode + exact integer signal statistics (peak,
    L1 energy, L2 energy) over RIFF/WAVE PCM payloads — the audio
    twin of bmp_channel_stats. Map-only mapInPandas."""
    import numpy as np

    def st(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            ids, rates, ns, pk, sa, sq = [], [], [], [], [], []
            for did, p in zip(b["doc_id"], b["payload"]):
                if p[:4] != b"RIFF":
                    continue
                rate, s = decode_wav(p)
                s64 = s.astype(np.int64)
                ids.append(did)
                rates.append(rate)
                ns.append(len(s))
                pk.append(int(np.abs(s64).max()) if len(s) else 0)
                sa.append(int(np.abs(s64).sum()))
                sq.append(int((s64 * s64).sum()))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "sample_rate": pd.Series(rates, dtype="int64"),
                    "n_samples": pd.Series(ns, dtype="int64"),
                    "peak": pd.Series(pk, dtype="int64"),
                    "sum_abs": pd.Series(sa, dtype="int64"),
                    "sum_sq": pd.Series(sq, dtype="int64"),
                }
            )

    return media.mapInPandas(st, WAV_STATS_SCHEMA)


def bmp_ahash(media: DataFrame, grid: int = 8) -> DataFrame:
    """REAL perceptual average-hash: the full decode -> grayscale
    -> pool -> threshold pipeline over genuine BMP bytes (contrast
    image_ahash above, which hashes the FIMG header fake).
    Per image: decode_bmp -> integer luma l = r*299 + g*587 + b*114
    (x1000 scale, no rounding loss) -> grid x grid BLOCK-AVERAGE
    pooling, where pixel (x, y) belongs to block
    (x*grid div w, y*grid div h) and the block value is
    sum(l) div n_pixels -> global mean = sum(block) div grid^2 ->
    bit = block > mean, packed exactly like image_ahash (hi = bits
    32..63, lo = 0..31; the sign bit is never touched). Every step
    is integer arithmetic, so the DuckDB oracle reproduces the hash
    bit-for-bit from the pixel planting formula. Map-only
    mapInPandas; per-image work is numpy (bincount over block
    indices, no per-pixel Python)."""
    import numpy as np

    g2 = grid * grid

    def ah(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            ids, his, los = [], [], []
            for did, p in zip(b["doc_id"], b["payload"]):
                if p[:2] != b"BM":
                    continue
                a = decode_bmp(p).astype(np.int64)  # (h, w, 3) BGR
                h, w = a.shape[0], a.shape[1]
                luma = (
                    a[:, :, 2] * 299 + a[:, :, 1] * 587
                    + a[:, :, 0] * 114
                )
                ys = np.arange(h) * grid // h
                xs = np.arange(w) * grid // w
                blk = (ys[:, None] * grid + xs[None, :]).ravel()
                sums = np.bincount(blk, luma.ravel(), minlength=g2)
                cnts = np.bincount(blk, minlength=g2)
                # an image narrower/shorter than the grid leaves
                # some blocks empty (sum 0, count 0): clamp the
                # divisor so they contribute value 0 / bit 0, the
                # same as their absence from the oracle's GROUP BY
                vals = sums.astype(np.int64) // np.maximum(cnts, 1)
                mean = int(vals.sum()) // g2
                bits = (vals > mean).astype(np.int64)
                idx = np.arange(g2)
                lo = int(np.sum(bits[idx < 32] << idx[idx < 32]))
                hi = int(
                    np.sum(bits[idx >= 32] << (idx[idx >= 32] - 32))
                )
                ids.append(did)
                his.append(hi)
                los.append(lo)
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "ahash_hi": pd.Series(his, dtype="int64"),
                    "ahash_lo": pd.Series(los, dtype="int64"),
                }
            )

    return media.mapInPandas(ah, AHASH_SCHEMA)


# ---------------------------------------------------------------
# Baseline JPEG (vendored pure-numpy codec, operators/jpeg.py):
# genuine entropy-coded lossy files whose DECODED pixels still have
# an integer closed form, because every 8x8 block is constant — the
# DCT then has only a DC coefficient and the quantize/dequantize
# round trip collapses to min(l + l % 2, 255) per block (see the
# jpeg.py module docstring for the derivation). The oracle checks
# decoded-pixel statistics arithmetically while the payload bytes
# in between went through real Huffman coding.
# ---------------------------------------------------------------


def _jpeg_payload(doc_id: int) -> bytes:
    """A real baseline JFIF grayscale file of 8x8-constant blocks:
        blocks_w = 2 + doc_id % 5,  blocks_h = 2 + (doc_id*3) % 4
        level(bx, by) = (bx*31 + by*53 + doc_id*11) % 256
    Mirrored literally in the q235 oracle."""
    import numpy as np

    from .jpeg import encode_jpeg_gray

    bw = 2 + doc_id % 5
    bh = 2 + (doc_id * 3) % 4
    img = np.zeros((bh * 8, bw * 8), np.uint8)
    for by in range(bh):
        for bx in range(bw):
            lvl = (bx * 31 + by * 53 + doc_id * 11) % 256
            img[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = lvl
    return encode_jpeg_gray(img)


def synth_jpeg(spark: SparkSession, n: int,
               partitions: int | None = None) -> DataFrame:
    """Deterministic table of real baseline JPEG files for doc_ids
    % 3 == 0 (same distributed synthesis shape as synth_bmp)."""
    if partitions is None:
        partitions = max(
            2,
            min(spark.sparkContext.defaultParallelism, n // 20_000 + 1),
        )
    rng = spark.range(0, n, 1, partitions).where(F.col("id") % 3 == 0)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            ids = b["id"].tolist()
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "kind": ["image"] * len(ids),
                    "payload": [_jpeg_payload(int(i)) for i in ids],
                }
            )

    return rng.mapInPandas(gen, MEDIA_SCHEMA)


JPEG_STATS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("width", LongType(), False),
        StructField("height", LongType(), False),
        StructField("sum_px", LongType(), False),
        StructField("min_px", LongType(), False),
        StructField("max_px", LongType(), False),
    ]
)


def jpeg_gray_stats(media: DataFrame) -> DataFrame:
    """REAL lossy-image decode + pixel statistics: each payload
    goes through the full vendored baseline decoder (segment walk,
    Huffman entropy decode, dezigzag, dequantize, IDCT) and is
    reduced to exact integer pixel stats. Map-only mapInPandas."""
    import numpy as np

    from .jpeg import decode_jpeg_gray

    def st(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            ids, ws, hs, sm, mn, mx = [], [], [], [], [], []
            for did, p in zip(b["doc_id"], b["payload"]):
                if p[:2] != b"\xff\xd8":
                    continue
                a = decode_jpeg_gray(p).astype(np.int64)
                ids.append(did)
                hs.append(a.shape[0])
                ws.append(a.shape[1])
                sm.append(int(a.sum()))
                mn.append(int(a.min()))
                mx.append(int(a.max()))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "width": pd.Series(ws, dtype="int64"),
                    "height": pd.Series(hs, dtype="int64"),
                    "sum_px": pd.Series(sm, dtype="int64"),
                    "min_px": pd.Series(mn, dtype="int64"),
                    "max_px": pd.Series(mx, dtype="int64"),
                }
            )

    return media.mapInPandas(st, JPEG_STATS_SCHEMA)
