"""Multimodal column handling: image/audio/video as opaque binary + metadata.

A 100 TB training-data pipeline carries media as binary payload columns with
typed metadata structs; decode/feature/resize/frame-sample run as
Arrow-batched Python over ``mapInPandas`` — the Spark-side plumbing (schemas,
batch iteration, partition sizing, multi-row yield) is the real, tested part.

Codec layer status (round 5): REAL for every image format in the corpus —
24-bit BMP (``struct``), 8-bit truecolor PNG (``zlib`` inflate + all five
scanline filters), baseline sequential JPEG (stdlib+numpy huffman/DCT,
``jpeg.py``) — for WAV audio (16-bit PCM via ``wave``; 8-bit G.711 µ-law
decoded manually, format tag 7), and for MJPEG-AVI video (RIFF container
walk + per-frame JPEG, ``avi.py``), dispatched on the payload's magic
bytes (``BM`` / ``\\x89PNG`` / ``\\xff\\xd8`` / ``RIFF..WAVE`` /
``RIFF..AVI``). Only inter-frame video codecs
(H.264/...) and perceptual audio (MP3/AAC) still fall back to a
DETERMINISTIC FAKE decoder (seeded from the payload bytes, same array
shapes a real decoder would produce) because this container ships no
ffmpeg. Swapping in real codecs there changes only the ``_decode_*``
fallbacks — every schema, UDF signature, and plan stays identical.

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
import io
import struct
import wave as _wave
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .adpcm import IMA_ADPCM_TAG, decode_wav_adpcm
from .avi import decode_avi_mjpeg, is_avi
from .gif import GIF_MAGICS, decode_gif
from .jpeg import JPEG_SIG, decode_jpeg
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
    clips).

    Randomness is md5-derived per (seed, stream, id) — NOT ``F.rand(seed)``,
    whose draws depend on the range's partition split and therefore on
    ``defaultParallelism``: the same call must yield identical rows on
    local[8], local[32], and a 1000-executor cluster (the catalog's
    multimodal census relies on this for its driver check)."""

    def u01(k: int):
        h = F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit(f"media:{seed}:{k}:"), F.col("id").cast("string")
                    ).cast("binary")
                ),
                1,
                8,
            ),
            16,
            10,
        )
        return h.cast("double") / F.lit(4294967296.0)

    r = [u01(k) for k in range(5)]
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
# Codec layer. Real stdlib codecs for uncompressed formats (24-bit BMP,
# PCM WAV) dispatched by magic bytes; deterministic fakes for compressed
# formats (no PIL/cv2/ffmpeg in this container — swap the fallbacks there).
# ---------------------------------------------------------------------------


def encode_bmp(arr: np.ndarray) -> bytes:
    """HxWx3 uint8 RGB → 24-bit uncompressed BMP (BI_RGB). Rows are stored
    bottom-up in BGR order with 4-byte padding, per the format spec."""
    h, w, c = arr.shape
    if c != 3 or arr.dtype != np.uint8:
        raise ValueError("encode_bmp expects HxWx3 uint8")
    row_size = (w * 3 + 3) & ~3
    img_size = row_size * h
    header = struct.pack("<2sIHHI", b"BM", 54 + img_size, 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size, 2835, 2835, 0, 0)
    rows = []
    for y in range(h - 1, -1, -1):  # bottom-up
        row = arr[y, :, ::-1].tobytes()  # RGB → BGR
        rows.append(row + b"\x00" * (row_size - w * 3))
    return header + info + b"".join(rows)


def _decode_bmp(payload: bytes) -> np.ndarray:
    """24-bit uncompressed BMP → uint8 HxWx3 RGB. Header fields are
    attacker-controlled: dimensions and the pixel offset are validated
    against the actual payload BEFORE any allocation (a mutated width
    would otherwise be a memory bomb, and truncation a raw struct.error)."""
    if payload[:2] != b"BM" or len(payload) < 54:
        raise ValueError("not a BMP payload (or truncated header)")
    offset = struct.unpack_from("<I", payload, 10)[0]
    _, w, h, _, bpp, comp = struct.unpack_from("<IiiHHI", payload, 14)
    if bpp != 24 or comp != 0:
        raise ValueError(f"only 24-bit BI_RGB BMP supported (bpp={bpp}, comp={comp})")
    bottom_up = h > 0
    h = abs(h)
    if w <= 0 or h == 0:
        raise ValueError(f"malformed BMP: bad dimensions {w}x{h}")
    row_size = (w * 3 + 3) & ~3
    if offset < 54 or offset + row_size * h > len(payload):
        raise ValueError(
            f"malformed BMP: pixel data ({row_size * h} bytes at {offset}) "
            f"exceeds payload ({len(payload)} bytes)"
        )
    out = np.empty((h, w, 3), dtype=np.uint8)
    for i in range(h):
        row = np.frombuffer(payload, dtype=np.uint8, count=w * 3, offset=offset + i * row_size)
        y = h - 1 - i if bottom_up else i
        out[y] = row.reshape(w, 3)[:, ::-1]  # BGR → RGB
    return out


def encode_wav(wave_f32: np.ndarray, sample_rate: int) -> bytes:
    """float32 mono waveform in [-1, 1] → 16-bit PCM WAV (stdlib wave)."""
    ints = np.clip(np.round(wave_f32.astype(np.float64) * 32767.0), -32768, 32767).astype(
        np.int16
    )
    buf = io.BytesIO()
    with _wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(ints.tobytes())
    return buf.getvalue()


def _linear_to_mulaw(samples: np.ndarray) -> np.ndarray:
    """int16 PCM → G.711 µ-law bytes (the public ITU-T G.711 segment
    encoding: bias 132, 3-bit exponent from the MSB position, 4-bit
    mantissa, one's-complement output)."""
    x = samples.astype(np.int32)
    sign = np.where(x < 0, 0x80, 0)
    mag = np.minimum(np.abs(x), 32635) + 132
    exponent = (np.floor(np.log2(mag)) - 7).astype(np.int32)
    mantissa = (mag >> (exponent + 3)) & 0x0F
    return (~(sign | (exponent << 4) | mantissa) & 0xFF).astype(np.uint8)


def _mulaw_to_linear(u: np.ndarray) -> np.ndarray:
    """G.711 µ-law bytes → int16 PCM (exact inverse of the segment code)."""
    u = (~u.astype(np.int32)) & 0xFF
    sign = u & 0x80
    exponent = (u >> 4) & 0x07
    mantissa = u & 0x0F
    mag = (((mantissa << 3) + 132) << exponent) - 132
    return np.where(sign, -mag, mag).astype(np.int16)


def encode_wav_mulaw(wave_f32: np.ndarray, sample_rate: int) -> bytes:
    """float32 mono waveform in [-1, 1] → 8-bit G.711 µ-law WAV (format
    tag 7). stdlib ``wave`` writes PCM only, so the RIFF is assembled by
    hand — fmt(tag=7, 8-bit) + the fact chunk non-PCM formats require +
    data."""
    ints = np.clip(np.round(wave_f32.astype(np.float64) * 32767.0), -32768, 32767).astype(
        np.int16
    )
    data = _linear_to_mulaw(ints).tobytes()
    fmt = struct.pack("<HHIIHH", 7, 1, sample_rate, sample_rate, 1, 8)
    fact = struct.pack("<I", len(ints))
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"fact" + struct.pack("<I", len(fact)) + fact
        + b"data" + struct.pack("<I", len(data)) + data + (b"\x00" if len(data) % 2 else b"")
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _decode_wav_mulaw(payload: bytes) -> tuple[np.ndarray, int]:
    """µ-law WAV → (float32 mono waveform in [-1, 1], sample_rate)."""
    pos, end = 12, len(payload)
    sample_rate, channels, data = None, 1, None
    while pos + 8 <= end:
        fourcc = payload[pos : pos + 4]
        size = struct.unpack_from("<I", payload, pos + 4)[0]
        if pos + 8 + size > end:
            # declared chunk size overruns the buffer — fail here with a
            # container-level error, not deep inside frombuffer (ADVICE r5)
            raise ValueError(
                f"malformed WAV: chunk {fourcc!r} declares {size} bytes, "
                f"{end - pos - 8} remain"
            )
        if fourcc == b"fmt ":
            if size < 8:
                raise ValueError("malformed WAV: fmt chunk too short")
            tag, channels, sample_rate = struct.unpack_from("<HHI", payload, pos + 8)
            if tag != 7:
                raise ValueError(f"not a mu-law WAV (format tag {tag})")
        elif fourcc == b"data":
            data = np.frombuffer(payload, dtype=np.uint8, count=size, offset=pos + 8)
        pos += 8 + size + (size % 2)
    if sample_rate is None or data is None:
        raise ValueError("malformed WAV: missing fmt or data chunk")
    pcm = _mulaw_to_linear(data).astype(np.float32)
    if channels > 1:
        pcm = pcm.reshape(-1, channels).mean(axis=1)
    return (pcm / 32768.0).astype(np.float32), int(sample_rate)


def _wav_format_tag(payload: bytes) -> int | None:
    """Audio format tag from a RIFF/WAVE payload's fmt chunk (None if absent)."""
    pos, end = 12, len(payload)
    while pos + 8 <= end:
        size = struct.unpack_from("<I", payload, pos + 4)[0]
        if payload[pos : pos + 4] == b"fmt ":
            if size < 2 or pos + 10 > end:
                return None
            return struct.unpack_from("<H", payload, pos + 8)[0]
        if pos + 8 + size > end:
            return None  # overrunning chunk: not a well-formed WAV, no tag
        pos += 8 + size + (size % 2)
    return None


PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNG_BPP = 3  # bytes per pixel (8-bit RGB, color type 2)


def _png_chunk(typ: bytes, data: bytes) -> bytes:
    import zlib

    return (
        struct.pack(">I", len(data))
        + typ
        + data
        + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
    )


def _paeth(a: int, b: int, c: int) -> int:
    """PNG Paeth predictor (spec §9.4): pick the neighbor (left a, up b,
    up-left c) closest to the linear estimate a + b - c."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def encode_png(arr: np.ndarray, filter_type: int = 0) -> bytes:
    """HxWx3 uint8 RGB → 8-bit truecolor PNG (stdlib zlib, no PIL).

    ``filter_type`` applies one of the five PNG scanline filters (0 None,
    1 Sub, 2 Up, 3 Average, 4 Paeth) to every row — mainly so the decoder's
    filter reconstruction is testable against real encoded bytes."""
    import zlib

    h, w, c = arr.shape
    if c != 3 or arr.dtype != np.uint8:
        raise ValueError("encode_png expects HxWx3 uint8")
    if filter_type not in (0, 1, 2, 3, 4):
        raise ValueError(f"unknown PNG filter {filter_type}")
    raw = bytearray()
    prev = np.zeros(w * _PNG_BPP, dtype=np.uint8)
    for y in range(h):
        row = arr[y].reshape(-1)
        a = np.concatenate([np.zeros(_PNG_BPP, dtype=np.uint8), row[:-_PNG_BPP]])
        b = prev
        cc = np.concatenate([np.zeros(_PNG_BPP, dtype=np.uint8), prev[:-_PNG_BPP]])
        if filter_type == 0:
            filt = row
        elif filter_type == 1:
            filt = row - a
        elif filter_type == 2:
            filt = row - b
        elif filter_type == 3:
            filt = row - ((a.astype(np.uint16) + b.astype(np.uint16)) // 2).astype(np.uint8)
        else:
            pred = np.array(
                [_paeth(int(a[i]), int(b[i]), int(cc[i])) for i in range(len(row))],
                dtype=np.uint8,
            )
            filt = row - pred
        raw.append(filter_type)
        raw.extend(filt.astype(np.uint8).tobytes())
        prev = row
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)  # 8-bit RGB, no interlace
    return (
        PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + _png_chunk(b"IEND", b"")
    )


def _decode_png(payload: bytes) -> np.ndarray:
    """8-bit truecolor PNG → uint8 HxWx3 RGB. Stdlib zlib inflate + full
    reconstruction of the five scanline filters (None/Sub/Up/Average/
    Paeth, spec §9); multiple IDAT chunks are concatenated per spec.
    Palette/alpha/16-bit/interlaced variants raise — this codec covers the
    truecolor subset the pipeline emits."""
    import zlib

    if payload[:8] != PNG_SIG:
        raise ValueError("not a PNG payload")
    pos = 8
    w = h = None
    idat = bytearray()
    while pos + 8 <= len(payload):
        (length,) = struct.unpack_from(">I", payload, pos)
        typ = payload[pos + 4 : pos + 8]
        if pos + 12 + length > len(payload):
            raise ValueError(
                f"malformed PNG: chunk {typ!r} declares {length} bytes, "
                f"{len(payload) - pos - 12} remain"
            )
        data = payload[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + type + data + crc
        if typ == b"IHDR":
            if length < 13:
                raise ValueError("malformed PNG: IHDR shorter than 13 bytes")
            w, h, depth, color, comp, filt, interlace = struct.unpack_from(">IIBBBBB", data, 0)
            if (depth, color, comp, filt, interlace) != (8, 2, 0, 0, 0):
                raise ValueError(
                    f"only 8-bit truecolor non-interlaced PNG supported "
                    f"(depth={depth}, color={color}, interlace={interlace})"
                )
        elif typ == b"IDAT":
            idat.extend(data)
        elif typ == b"IEND":
            break
    if w is None:
        raise ValueError("PNG missing IHDR")
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as exc:
        raise ValueError(f"malformed PNG: IDAT inflate failed ({exc})") from exc
    stride = w * _PNG_BPP
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG scanline data length mismatch")
    out = np.zeros((h, stride), dtype=np.uint8)
    for y in range(h):
        ft = raw[y * (stride + 1)]
        line = bytearray(raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)])
        prev = out[y - 1] if y > 0 else np.zeros(stride, dtype=np.uint8)
        if ft == 0:
            rec = np.frombuffer(bytes(line), dtype=np.uint8).copy()
        elif ft == 2:
            rec = (np.frombuffer(bytes(line), dtype=np.uint8) + prev).astype(np.uint8)
        else:
            # Sub/Average/Paeth depend on already-reconstructed bytes of
            # the same row — sequential by definition.
            rec = np.zeros(stride, dtype=np.uint8)
            for x in range(stride):
                left = int(rec[x - _PNG_BPP]) if x >= _PNG_BPP else 0
                up = int(prev[x])
                ul = int(prev[x - _PNG_BPP]) if x >= _PNG_BPP else 0
                if ft == 1:
                    pred = left
                elif ft == 3:
                    pred = (left + up) // 2
                elif ft == 4:
                    pred = _paeth(left, up, ul)
                else:
                    raise ValueError(f"unknown PNG filter byte {ft}")
                rec[x] = (line[x] + pred) & 0xFF
        out[y] = rec
    return out.reshape(h, w, _PNG_BPP)


def _decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """PCM WAV → (float32 mono waveform in [-1, 1], sample_rate). Multi-
    channel input is downmixed by per-frame mean."""
    with _wave.open(io.BytesIO(payload)) as w:
        sr = w.getframerate()
        ch = w.getnchannels()
        width = w.getsampwidth()
        raw = w.readframes(w.getnframes())
    if width != 2:
        raise ValueError(f"only 16-bit PCM supported (sampwidth={width})")
    data = np.frombuffer(raw, dtype=np.int16).astype(np.float32)
    if ch > 1:
        data = data.reshape(-1, ch).mean(axis=1)
    return (data / 32768.0).astype(np.float32), sr


def _rng_from_bytes(payload: bytes) -> np.random.Generator:
    digest = hashlib.sha256(payload).digest()
    return np.random.default_rng(int.from_bytes(digest[:8], "big"))


def _decode_image_bytes(payload: bytes, width: int, height: int, channels: int) -> np.ndarray:
    """Image payload → uint8 HxWxC. REAL decode for BMP (magic ``BM``),
    PNG (magic ``\\x89PNG``, stdlib zlib), baseline JPEG (magic
    ``\\xff\\xd8``, stdlib+numpy huffman/IDCT — see ``jpeg.py``), and GIF
    (magic ``GIF8``, real LZW — see ``gif.py``); anything without a
    recognized magic falls back to the deterministic fake."""
    if payload[:2] == b"BM":
        return _decode_bmp(payload)
    if payload[:8] == PNG_SIG:
        return _decode_png(payload)
    if payload[:2] == JPEG_SIG:
        out = decode_jpeg(payload)
        if out.ndim == 2:  # grayscale → replicate to the channel axis
            out = np.stack([out] * 3, axis=-1)
        return out
    if payload[:6] in GIF_MAGICS:
        return decode_gif(payload)
    rng = _rng_from_bytes(payload)
    return rng.integers(0, 256, size=(height, width, channels), dtype=np.uint8)


def _decode_audio_bytes(payload: bytes, sample_rate: int, duration_s: float) -> np.ndarray:
    """Audio payload → float32 mono waveform in [-1, 1]. REAL decode for
    RIFF/WAVE containers — 16-bit PCM (stdlib ``wave``), 8-bit G.711
    µ-law (format tag 7, decoded manually since ``wave`` is PCM-only),
    and 4-bit IMA ADPCM (format tag 17 — see ``adpcm.py``); perceptual
    codecs (MP3/AAC) fall back to the deterministic fake (no
    soundfile/ffmpeg in this container)."""
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        tag = _wav_format_tag(payload)
        if tag == 7:
            data, _ = _decode_wav_mulaw(payload)
            return data
        if tag == IMA_ADPCM_TAG:
            data, _ = decode_wav_adpcm(payload)
            return data
        data, _ = _decode_wav(payload)
        return data
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


def duplicate_image_groups(media: DataFrame, partitions: int | None = None) -> DataFrame:
    """Perceptual image dedup — the training-data op the aHash exists for:
    decode (real codecs via magic dispatch), fingerprint, and group; rows
    whose 64-bit aHash collides form a duplicate family (re-encodes and
    pixel-identical copies land together; near-dups within small Hamming
    distance need the banded-LSH treatment the text family uses). Output:
    one row per family with >1 member — (phash, n_images, media_ids
    sorted) — the removal worklist.

    Scale shape: decode is Arrow mapInPandas (payloads never shuffle
    twice); only (media_id, phash) pairs shuffle into the partial-agg
    groupBy; family membership lists are bounded by family size."""
    stats = decode_image_stats(media, partitions).select("media_id", "phash")
    return (
        stats.groupBy("phash")
        .agg(
            F.count(F.lit(1)).alias("n_images"),
            F.array_sort(F.collect_list("media_id")).alias("media_ids"),
        )
        .filter(F.col("n_images") > 1)
    )


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
    from inside the same task (no join/explode shuffle). MJPEG-AVI payloads
    (RIFF magic) are REALLY decoded — container walk + per-frame baseline
    JPEG, see avi.py — with duration taken from the container's own
    fps/frame-count; other codecs (H.264/...) remain stub-decoded
    deterministically per (payload, frame_idx)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "frame_idx": [], "frame_ts_s": [], "frame_payload": []}
            for row in pdf.itertuples(index=False):
                m = row.metadata
                payload = bytes(row.payload)
                if is_avi(payload):
                    frames, fps = decode_avi_mjpeg(payload)
                    dur = len(frames) / fps
                    n_samples = max(1, int(dur / every_s))
                    for i in range(n_samples):
                        src = min(int(round(i * every_s * fps)), len(frames) - 1)
                        out["media_id"].append(row.media_id)
                        out["frame_idx"].append(i)
                        out["frame_ts_s"].append(round(i * every_s, 3))
                        out["frame_payload"].append(frames[src].tobytes())
                    continue
                dur = float(m["duration_s"])
                w, h = int(m["width"]), int(m["height"])
                n_frames = max(1, int(dur / every_s))
                for i in range(n_frames):
                    frame = _decode_image_bytes(
                        payload + i.to_bytes(4, "big"), w, h, 3
                    )
                    out["media_id"].append(row.media_id)
                    out["frame_idx"].append(i)
                    out["frame_ts_s"].append(round(i * every_s, 3))
                    out["frame_payload"].append(frame.tobytes())
            yield pd.DataFrame(out)

    return media.filter(F.col("kind") == "video").mapInPandas(run, FRAME_SCHEMA)
