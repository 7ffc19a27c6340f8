"""Multimodal columns: opaque ``binary`` payloads + typed metadata.

Training-data pipelines carry images/audio/video next to text. The
Spark-side plumbing here is real and tested — schema, partition-safe
batch iteration, Arrow batch shapes, deterministic synthetic payloads —
while the actual codec work (JPEG decode, resampling, frame extraction)
is STUBBED behind ``_decode_*`` seams because no media libraries exist
in this environment: each stub either raises NotImplementedError
(strict mode) or produces a deterministic fake derived from the bytes
(test mode), so the distributed machinery is exercised end-to-end.

Layout convention (one row per asset):

    asset_id   long
    kind       string   ('image' | 'audio' | 'video')
    media      binary   (opaque payload)
    meta       map<string,string> (width/height/sample_rate/...)

All processing is ``mapInPandas`` (Arrow-batched); nothing here loops
rows on the driver.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    FloatType,
    LongType,
    StringType,
    StructField,
    StructType,
)

FEATURE_DIM = 16

FEATURE_SCHEMA = StructType([
    StructField("asset_id", LongType(), False),
    StructField("kind", StringType(), False),
    StructField("n_bytes", LongType(), False),
    StructField("sha256", StringType(), False),
    StructField("feature", ArrayType(FloatType()), True),
])


class MediaDecodeUnavailable(NotImplementedError):
    """Raised in strict mode: no media codec libraries in this env."""


def _decode_stub(payload: bytes, kind: str, strict: bool) -> list[float]:
    """STUB decode/feature-extract seam.

    Real deployment: replace with PIL/torchvision/librosa/ffmpeg calls
    inside this same batch kernel. Here: deterministic fake features
    (first FEATURE_DIM bytes of sha256, scaled) so tests can assert
    exact values and the Arrow plumbing is fully exercised.
    """
    if strict:
        raise MediaDecodeUnavailable(
            f"no codec for kind={kind!r} in this environment"
        )
    h = hashlib.sha256(payload).digest()
    return [b / 255.0 for b in h[:FEATURE_DIM]]


def extract_features(assets: DataFrame, strict: bool = False) -> DataFrame:
    """(asset_id, kind, media) -> per-asset feature vector + integrity
    columns, via Arrow-batched mapInPandas."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            feats, shas, sizes = [], [], []
            for payload, kind in zip(b["media"], b["kind"]):
                payload = bytes(payload) if payload is not None else b""
                shas.append(hashlib.sha256(payload).hexdigest())
                sizes.append(len(payload))
                feats.append(_decode_stub(payload, kind, strict))
            yield pd.DataFrame({
                "asset_id": b["asset_id"],
                "kind": b["kind"],
                "n_bytes": sizes,
                "sha256": shas,
                "feature": feats,
            })

    return assets.select("asset_id", "kind", "media").mapInPandas(
        kernel, FEATURE_SCHEMA
    )


FRAME_SCHEMA = StructType([
    StructField("asset_id", LongType(), False),
    StructField("frame_idx", LongType(), False),
    StructField("pts", DoubleType(), False),
    StructField("frame", BinaryType(), True),
])

RESIZE_SCHEMA = StructType([
    StructField("asset_id", LongType(), False),
    StructField("kind", StringType(), False),
    StructField("media", BinaryType(), True),
    StructField("width", LongType(), False),
    StructField("height", LongType(), False),
])


def sample_frames(assets: DataFrame, frame_bytes: int = 32,
                  every: int = 3, fps: float = 30.0,
                  strict: bool = False) -> DataFrame:
    """Frame sampling plumbing: ONE input row -> MANY output rows
    inside the Arrow batch kernel (the shape a real ffmpeg-backed
    sampler needs — per-asset fan-out without exploding on the
    driver). The STUB 'demuxer' treats the payload as consecutive
    ``frame_bytes``-sized full frames (trailing partial dropped) and
    emits every ``every``-th with its presentation timestamp
    ``frame_idx / fps``. Real deployment: replace the slicing with an
    ffmpeg/pyav call in this same kernel; schema, fan-out, and
    partitioning stay as tested.

    Scale note: output volume = input x (frames kept / asset), and
    mapInPandas preserves the input partitioning — at 100 TB,
    repartition the asset table by total payload bytes (or lower
    spark.sql.files.maxPartitionBytes) BEFORE sampling so the
    fanned-out partitions still fit executor memory."""
    if every < 1 or frame_bytes < 1:
        raise ValueError("every and frame_bytes must be >= 1")

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            ids, idxs, pts, frames = [], [], [], []
            for asset_id, payload in zip(b["asset_id"], b["media"]):
                if strict:
                    raise MediaDecodeUnavailable(
                        "no demuxer in this environment")
                payload = bytes(payload) if payload is not None else b""
                n_frames = len(payload) // frame_bytes
                for i in range(0, n_frames, every):
                    ids.append(asset_id)
                    idxs.append(i)
                    pts.append(round(i / fps, 6))
                    frames.append(
                        payload[i * frame_bytes:(i + 1) * frame_bytes])
            yield pd.DataFrame({
                "asset_id": pd.Series(ids, dtype="int64"),
                "frame_idx": pd.Series(idxs, dtype="int64"),
                "pts": pd.Series(pts, dtype="float64"),
                "frame": pd.Series(frames, dtype="object"),
            })

    return assets.select("asset_id", "media").mapInPandas(
        kernel, FRAME_SCHEMA
    )


def resize_media(assets: DataFrame, width: int, height: int,
                 strict: bool = False) -> DataFrame:
    """Resize plumbing: per-asset payload rewrite + typed size
    metadata, Arrow-batched. The STUB 'resampler' emits a
    deterministic ``width*height*3``-byte payload (the target RGB
    buffer size) derived from sha256(payload || 'WxH') so tests can
    assert exact bytes; a real deployment swaps in PIL/torchvision
    inside the same kernel."""
    target = width * height * 3
    if target <= 0:
        raise ValueError("width/height must be positive")

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            out = []
            for payload in b["media"]:
                if strict:
                    raise MediaDecodeUnavailable(
                        "no resampler in this environment")
                payload = bytes(payload) if payload is not None else b""
                seed = hashlib.sha256(
                    payload + f"{width}x{height}".encode()).digest()
                out.append((seed * (target // len(seed) + 1))[:target])
            yield pd.DataFrame({
                "asset_id": b["asset_id"],
                "kind": b["kind"],
                "media": pd.Series(out, dtype="object"),
                "width": pd.Series([width] * len(out), dtype="int64"),
                "height": pd.Series([height] * len(out), dtype="int64"),
            })

    return assets.select("asset_id", "kind", "media").mapInPandas(
        kernel, RESIZE_SCHEMA
    )


PHASH_SCHEMA = StructType([
    StructField("asset_id", LongType(), False),
    StructField("frame_idx", LongType(), False),
    StructField("phash", LongType(), False),
])

PHASH_WINDOWS = 8  # 8 x 4-bit nibbles -> 32-bit signature


def frame_phash(frames: DataFrame, frame_bytes: int = 32,
                strict: bool = False) -> DataFrame:
    """Perceptual-hash plumbing over sampled frames (round 5): the
    frame-level analog of the text dedup ladder's SimHash. Real pHash
    is DCT-over-decoded-pixels — codec territory, so the STUB kernel
    computes a deterministic locality-preserving fake from the raw
    bytes instead: the frame splits into PHASH_WINDOWS equal windows
    and nibble_i = (sum of window i's bytes) mod 16, packed little-
    nibble-first into a 32-bit signature. A single changed byte
    perturbs exactly one window => Hamming distance <= 4, so
    near-identical frames land near each other — the property the
    downstream Hamming blocking exploits, same as a real pHash. Swap
    the window-sum for a DCT inside this same kernel in a real
    deployment; schema and partitioning stay as tested.

    Arrow-batched mapInPandas, partition-preserving — at 100 TB the
    repartition-by-payload-bytes rule from sample_frames applies
    upstream; this stage adds one long per row."""
    if frame_bytes % PHASH_WINDOWS:
        raise ValueError("frame_bytes must divide into PHASH_WINDOWS")
    width = frame_bytes // PHASH_WINDOWS

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            hashes = []
            for payload in b["frame"]:
                if strict:
                    raise MediaDecodeUnavailable(
                        "no pixel decoder in this environment")
                payload = bytes(payload) if payload is not None else b""
                h = 0
                for i in range(PHASH_WINDOWS):
                    win = payload[i * width:(i + 1) * width]
                    h |= (sum(win) % 16) << (4 * i)
                hashes.append(h)
            yield pd.DataFrame({
                "asset_id": b["asset_id"],
                "frame_idx": b["frame_idx"],
                "phash": pd.Series(hashes, dtype="int64"),
            })

    return frames.select("asset_id", "frame_idx", "frame").mapInPandas(
        kernel, PHASH_SCHEMA
    )


def frame_near_dup(hashed: DataFrame, max_hamming: int = 3,
                   blocks: int = 4) -> DataFrame:
    """Frame-level near-duplicate pairs: pigeonhole Hamming blocking
    over the 32-bit frame signatures (EXACT for max_hamming < blocks —
    any pair within the distance shares at least one exact chunk), the
    same banded equi-join as ops.dedup.simhash_near_pairs, never
    all-pairs. Frames key as fid = asset_id * 2^20 + frame_idx (one
    long, frame_idx < 2^20 by the sampler's fan-out bound).

    Returns (fid, fid2, hamming), fid < fid2."""
    from prosearch_spark.ops.dedup import simhash_near_pairs

    sig = hashed.select(
        (F.col("asset_id") * F.lit(1 << 20) + F.col("frame_idx"))
        .alias("doc_id"),
        F.col("phash").alias("simhash"),
    )
    pairs = simhash_near_pairs(sig, max_hamming=max_hamming, bits=32,
                               blocks=blocks)
    return pairs.select(F.col("doc_id").alias("fid"),
                        F.col("doc_id2").alias("fid2"), "hamming")


def synth_assets(spark: SparkSession, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic synthetic media table (payload = seeded sha256
    bytes repeated; kind round-robins image/audio/video)."""
    kinds = ["image", "audio", "video"]
    df = (
        spark.range(n)
        .withColumn("kind", F.expr(
            "array('image','audio','video')[pmod(id, 3)]"
        ))
        .withColumn(
            "media",
            F.repeat(F.unbase64(F.base64(F.sha2(
                F.concat(F.lit(f"asset:{seed}:"), F.col("id")), 256
            ).cast("binary"))), 4).cast("binary"),
        )
        .withColumn(
            "meta",
            F.create_map(
                F.lit("width"), F.lit("64"),
                F.lit("height"), F.lit("64"),
            ),
        )
        .select(F.col("id").alias("asset_id"), "kind", "media", "meta")
    )
    return df
