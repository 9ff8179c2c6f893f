"""Multimodal column handling: image/audio/video as opaque binary + metadata.

A 100 TB training-data pipeline carries media as binary payload columns with
typed metadata structs; decode/feature/resize/frame-sample run as
Arrow-batched Python over ``mapInPandas`` — the Spark-side plumbing (schemas,
batch iteration, partition sizing, multi-row yield) is the real, tested part.

The codec layer is STUBBED: this container ships no PIL/cv2/ffmpeg, so
``_decode_*`` try the real library and fall back to a DETERMINISTIC FAKE
decoder (seeded from the payload bytes) with the same array shapes a real
decoder would produce. Swapping in real codecs changes only those two
functions — every schema, UDF signature, and plan stays identical.

Scale notes:
- payloads never pass through a Python row loop — Arrow moves them
  batch-wise; ``maxRecordsPerBatch`` bounds executor memory per batch;
- feature extraction is a narrow map (no shuffle); only the optional
  repartition before it redistributes decode work;
- frame sampling yields multiple rows per input inside the same task —
  the explode happens executor-side, not via a join.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Schema: one row per media object. Metadata is a typed struct — readable by
# Catalyst (filter/prune on metadata.* without touching payload bytes).
# ---------------------------------------------------------------------------

MEDIA_METADATA = T.StructType(
    [
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("duration_s", T.DoubleType()),
        T.StructField("codec", T.StringType()),
    ]
)

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("payload", T.BinaryType()),
        T.StructField("metadata", MEDIA_METADATA),
    ]
)


def gen_media(spark: SparkSession, n_rows: int = 300, seed: int = 42) -> DataFrame:
    """Deterministic synthetic media corpus. Payload = repeated sha256 blocks
    keyed by (seed, id) — opaque bytes with stable content, like real files
    but reproducible. Metadata domains are realistic (small images, short
    clips)."""
    r = [F.rand(seed + k) for k in range(5)]
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.floor(r[0] * 3) + 1).cast("int"),
    )
    payload = F.sha2(F.concat(F.lit(f"media:{seed}:"), F.col("id")), 256).cast("binary")
    # pad payload to a few hundred bytes (repeat) so batches are non-trivial
    payload = F.concat(*[payload] * 8)
    width = (F.floor(r[1] * 8) * 16 + 32).cast("int")  # 32..144 px, /16
    height = (F.floor(r[2] * 8) * 16 + 32).cast("int")
    meta = F.struct(
        F.when(kind != "audio", width).alias("width"),
        F.when(kind != "audio", height).alias("height"),
        F.when(kind == "image", F.lit(3)).otherwise(F.lit(None).cast("int")).alias("channels"),
        F.when(kind == "audio", F.lit(16000)).otherwise(F.lit(None).cast("int")).alias("sample_rate"),
        F.when(kind != "image", F.round(r[3] * 9.9 + 0.1, 2))
        .otherwise(F.lit(None).cast("double"))
        .alias("duration_s"),
        F.element_at(
            F.array(F.lit("raw"), F.lit("jpeg-stub"), F.lit("pcm-stub"), F.lit("h264-stub")),
            (F.floor(r[4] * 4) + 1).cast("int"),
        ).alias("codec"),
    )
    return spark.range(n_rows).select(
        F.col("id").alias("media_id"), kind.alias("kind"), payload.alias("payload"), meta.alias("metadata")
    )


# ---------------------------------------------------------------------------
# Stubbed codec layer — swap these two for PIL / soundfile / pyav in a real
# deployment. The fakes are pure functions of (payload, shape): deterministic.
# ---------------------------------------------------------------------------


def _rng_from_bytes(payload: bytes) -> np.random.Generator:
    digest = hashlib.sha256(payload).digest()
    return np.random.default_rng(int.from_bytes(digest[:8], "big"))


def _decode_image_bytes(payload: bytes, width: int, height: int, channels: int) -> np.ndarray:
    """STUB decode → uint8 HxWxC array. Real impl: PIL.Image.open(BytesIO)."""
    try:  # pragma: no cover - library absent in this container
        import PIL.Image  # noqa: F401

        raise NotImplementedError(
            "real image decode not wired; remove the fake below when enabling PIL"
        )
    except ImportError:
        pass
    rng = _rng_from_bytes(payload)
    return rng.integers(0, 256, size=(height, width, channels), dtype=np.uint8)


def _decode_audio_bytes(payload: bytes, sample_rate: int, duration_s: float) -> np.ndarray:
    """STUB decode → float32 mono waveform in [-1, 1]. Real impl: soundfile."""
    try:  # pragma: no cover
        import soundfile  # noqa: F401

        raise NotImplementedError("real audio decode not wired")
    except ImportError:
        pass
    rng = _rng_from_bytes(payload)
    n = max(1, int(sample_rate * duration_s))
    return (rng.random(n, dtype=np.float32) * 2.0 - 1.0).astype(np.float32)


# ---------------------------------------------------------------------------
# Operators (mapInPandas — Arrow batches in, Arrow batches out)
# ---------------------------------------------------------------------------

IMAGE_STATS_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("mean_rgb", T.ArrayType(T.DoubleType())),
        T.StructField("std_gray", T.DoubleType()),
        T.StructField("phash", T.StringType()),
    ]
)


def decode_image_stats(media: DataFrame, partitions: int | None = None) -> DataFrame:
    """Decode images and emit per-channel means + a 64-bit perceptual-hash
    style fingerprint (mean-threshold on an 8x8 downsample of the gray
    channel — the classic aHash)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "mean_rgb": [], "std_gray": [], "phash": []}
            for row in pdf.itertuples(index=False):
                m = row.metadata
                arr = _decode_image_bytes(
                    bytes(row.payload), int(m["width"]), int(m["height"]), int(m["channels"])
                )
                gray = arr.mean(axis=2)
                # 8x8 block-mean downsample -> aHash bits
                h, w = gray.shape
                ys = np.linspace(0, h, 9, dtype=int)
                xs = np.linspace(0, w, 9, dtype=int)
                small = np.array(
                    [
                        [gray[ys[i] : ys[i + 1], xs[j] : xs[j + 1]].mean() for j in range(8)]
                        for i in range(8)
                    ]
                )
                bits = (small > small.mean()).flatten()
                out["media_id"].append(row.media_id)
                out["mean_rgb"].append([float(arr[..., c].mean()) for c in range(arr.shape[2])])
                out["std_gray"].append(float(gray.std()))
                out["phash"].append(np.packbits(bits).tobytes().hex())
            yield pd.DataFrame(out)

    imgs = media.filter(F.col("kind") == "image")
    if partitions:
        imgs = imgs.repartition(partitions)  # spread decode work
    return imgs.mapInPandas(run, IMAGE_STATS_SCHEMA)


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("metadata", MEDIA_METADATA),
    ]
)


def image_resize(media: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Resize via nearest-neighbor on the decoded array, re-encoded as raw
    bytes (stub 'codec': raw). Metadata struct is rebuilt to the new shape —
    downstream sees a consistent (payload, metadata) pair."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "payload": [], "metadata": []}
            for row in pdf.itertuples(index=False):
                m = row.metadata
                arr = _decode_image_bytes(
                    bytes(row.payload), int(m["width"]), int(m["height"]), int(m["channels"])
                )
                yi = (np.arange(out_h) * arr.shape[0] // out_h).astype(int)
                xi = (np.arange(out_w) * arr.shape[1] // out_w).astype(int)
                resized = arr[yi][:, xi]
                out["media_id"].append(row.media_id)
                out["payload"].append(resized.tobytes())
                out["metadata"].append(
                    {
                        "width": out_w,
                        "height": out_h,
                        "channels": int(m["channels"]),
                        "sample_rate": None,
                        "duration_s": None,
                        "codec": "raw",
                    }
                )
            yield pd.DataFrame(out)

    return media.filter(F.col("kind") == "image").mapInPandas(run, RESIZE_SCHEMA)


AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("rms", T.DoubleType()),
        T.StructField("peak", T.DoubleType()),
    ]
)


def audio_features(media: DataFrame) -> DataFrame:
    """Waveform-level features (sample count, RMS, peak) from decoded audio."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "n_samples": [], "rms": [], "peak": []}
            for row in pdf.itertuples(index=False):
                m = row.metadata
                wave = _decode_audio_bytes(
                    bytes(row.payload), int(m["sample_rate"]), float(m["duration_s"])
                )
                out["media_id"].append(row.media_id)
                out["n_samples"].append(len(wave))
                out["rms"].append(float(np.sqrt((wave.astype(np.float64) ** 2).mean())))
                out["peak"].append(float(np.abs(wave).max()))
            yield pd.DataFrame(out)

    return media.filter(F.col("kind") == "audio").mapInPandas(run, AUDIO_FEATURES_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_ts_s", T.DoubleType()),
        T.StructField("frame_payload", T.BinaryType()),
    ]
)


def video_sample_frames(media: DataFrame, every_s: float = 1.0) -> DataFrame:
    """Sample one frame every ``every_s`` seconds from each video — the
    1-to-N case: each input row yields ceil(duration/every_s) output rows
    from inside the same task (no join/explode shuffle). Frame bytes are
    stub-decoded deterministically per (payload, frame_idx)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "frame_idx": [], "frame_ts_s": [], "frame_payload": []}
            for row in pdf.itertuples(index=False):
                m = row.metadata
                dur = float(m["duration_s"])
                w, h = int(m["width"]), int(m["height"])
                n_frames = max(1, int(dur / every_s))
                for i in range(n_frames):
                    frame = _decode_image_bytes(
                        bytes(row.payload) + i.to_bytes(4, "big"), w, h, 3
                    )
                    out["media_id"].append(row.media_id)
                    out["frame_idx"].append(i)
                    out["frame_ts_s"].append(round(i * every_s, 3))
                    out["frame_payload"].append(frame.tobytes())
            yield pd.DataFrame(out)

    return media.filter(F.col("kind") == "video").mapInPandas(run, FRAME_SCHEMA)
