"""Multimodal columns: images/audio as opaque `binary` payloads with
typed metadata, decoded/feature-extracted through mapInPandas.

The container has no image/audio libraries, so the DECODE step is a
deterministic fake format ("FIMG"/"FAUD" headers, documented below);
the Spark-side plumbing — binary schema, Arrow batch shape,
mapInPandas signatures, partition behavior — is real and tested.
The real-decoder entry points (`decode_image_real`,
`resample_audio_real`) are stubbed behind import-guards and raise
NotImplementedError when Pillow/soundfile are absent.

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
    """Real image decode — requires Pillow (absent in this
    container). The mapInPandas harness above is the production
    shape; this is the per-payload hook."""
    try:
        from PIL import Image  # type: ignore
    except ImportError as e:  # pragma: no cover
        raise NotImplementedError(
            "Pillow not available in this environment; decode uses "
            "the deterministic FIMG fake (see module docstring)"
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
