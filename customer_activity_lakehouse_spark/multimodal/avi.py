"""Minimal MJPEG-in-AVI video container — stdlib ``struct`` over jpeg.py.

Removes the video fake the way BMP/PNG/JPEG removed the image fakes: an
actual, spec-conforming container (RIFF 'AVI ' per the public msdn/OpenDML
layout) whose frames are baseline JPEGs from :mod:`.jpeg` — so video decode
here is REAL end-to-end with zero external deps. Motion-JPEG is the one
mainstream video codec that is per-frame JPEG (no inter-frame prediction),
which is exactly what makes it stdlib-expressible; H.264 and friends stay
out of reach without ffmpeg and keep the deterministic fake.

Writer emits: RIFF('AVI ' LIST('hdrl' avih LIST('strl' strh strf))
LIST('movi' '00dc'×N)). Reader walks the chunk tree generically (any extra
LISTs/'idx1'/JUNK chunks are skipped), takes fps from avih's
dwMicroSecPerFrame, and decodes every '00dc'/'00db' frame chunk.
"""

from __future__ import annotations

import struct

import numpy as np

from .jpeg import decode_jpeg, encode_jpeg

AVI_SIG_RIFF = b"RIFF"
AVI_SIG_TYPE = b"AVI "


def _chunk(fourcc: bytes, body: bytes) -> bytes:
    pad = b"\x00" if len(body) % 2 else b""  # RIFF chunks are word-aligned
    return fourcc + struct.pack("<I", len(body)) + body + pad


def _list(list_type: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", list_type + body)


def encode_avi_mjpeg(frames: list[np.ndarray], fps: int = 10, quality: int = 90) -> bytes:
    """uint8 HxWx3 frames (all same shape) → MJPEG AVI bytes."""
    if not frames:
        raise ValueError("encode_avi_mjpeg needs at least one frame")
    h, w = frames[0].shape[:2]
    if any(f.shape[:2] != (h, w) for f in frames):
        raise ValueError("all frames must share one resolution")
    jpegs = [encode_jpeg(f, quality=quality) for f in frames]
    max_jpeg = max(len(j) for j in jpegs)

    avih = struct.pack(
        "<14I",
        1_000_000 // fps,  # dwMicroSecPerFrame
        max_jpeg * fps,  # dwMaxBytesPerSec (rough)
        0,  # dwPaddingGranularity
        0,  # dwFlags (no idx1 index is written, so HASINDEX stays unset)
        len(jpegs),  # dwTotalFrames
        0,  # dwInitialFrames
        1,  # dwStreams
        max_jpeg,  # dwSuggestedBufferSize
        w,
        h,
        0, 0, 0, 0,  # dwReserved
    )
    strh = (
        b"vids"
        + b"MJPG"
        + struct.pack(
            "<IHHIIIIIIII4h",
            0,  # dwFlags
            0, 0,  # wPriority, wLanguage
            0,  # dwInitialFrames
            1, fps,  # dwScale, dwRate → fps
            0,  # dwStart
            len(jpegs),  # dwLength in frames
            max_jpeg,  # dwSuggestedBufferSize
            0xFFFFFFFF,  # dwQuality (default)
            0,  # dwSampleSize (varies per frame)
            0, 0, int(w), int(h),  # rcFrame
        )
    )
    strf = struct.pack("<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG", w * h * 3, 0, 0, 0, 0)
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih) + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )
    movi = _list(b"movi", b"".join(_chunk(b"00dc", j) for j in jpegs))
    riff_body = AVI_SIG_TYPE + hdrl + movi
    return AVI_SIG_RIFF + struct.pack("<I", len(riff_body)) + riff_body


def is_avi(payload: bytes) -> bool:
    return payload[:4] == AVI_SIG_RIFF and payload[8:12] == AVI_SIG_TYPE


def decode_avi_mjpeg(payload: bytes) -> tuple[list[np.ndarray], float]:
    """MJPEG AVI bytes → (frames as uint8 HxWx3, fps)."""
    if not is_avi(payload):
        raise ValueError("not an AVI (missing RIFF/AVI signature)")
    fps = 0.0
    frames: list[np.ndarray] = []

    def walk(data: bytes, pos: int, end: int) -> None:
        nonlocal fps
        while pos + 8 <= end:
            fourcc = data[pos : pos + 4]
            size = struct.unpack_from("<I", data, pos + 4)[0]
            body_start = pos + 8
            body_end = body_start + size
            # Never trust a declared chunk size past the enclosing buffer: a
            # malformed payload would otherwise silently truncate the slice
            # or fail deep inside decode_jpeg/struct (ADVICE r5).
            if body_end > end:
                raise ValueError(
                    f"malformed AVI: chunk {fourcc!r} at {pos} declares {size} "
                    f"bytes, {end - body_start} remain in its parent"
                )
            if fourcc == b"LIST":
                if size < 4:
                    raise ValueError(f"malformed AVI: LIST at {pos} too short for a type")
                walk(data, body_start + 4, body_end)  # skip the list type
            elif fourcc == b"avih":
                if size < 4:
                    raise ValueError("malformed AVI: avih chunk too short")
                micro_per_frame = struct.unpack_from("<I", data, body_start)[0]
                if micro_per_frame:
                    fps = 1_000_000 / micro_per_frame
            elif fourcc[2:4] in (b"dc", b"db"):  # compressed / uncompressed frame
                frames.append(decode_jpeg(data[body_start:body_end]))
            pos = body_end + (size % 2)  # word alignment

    walk(payload, 12, min(struct.unpack_from("<I", payload, 4)[0] + 8, len(payload)))
    if not frames:
        raise ValueError("AVI contains no video frame chunks")
    return frames, fps or 1.0
