"""IMA ADPCM WAV codec (format tag 0x11) — stdlib ``struct`` + numpy.

Continues the real-audio-codec program (16-bit PCM via ``wave``, G.711
µ-law r5): IMA/DVI ADPCM is the classic 4:1 compressed WAV flavor and is
pure table-driven integer arithmetic — no psychoacoustics, no entropy
coder — so it is fully stdlib-expressible. Only the perceptual codecs
(MP3/AAC) remain out of reach without ffmpeg. Public spec: IMA Digital
Audio Focus/Technical Working Group "Recommended Practices for Enhancing
Digital Audio Compatibility" rev 3.00 (1992), as carried in RIFF/WAVE
format tag 17 (mono here; block = 4-byte state header + 4-bit nibbles,
low nibble first).

Lossy by design: 4 bits/sample with an adaptive step. Roundtrip tests
bound the reconstruction error on smooth signals; the decoder raises
clean ``ValueError`` on truncated/malformed containers (same contract as
jpeg/avi/gif/µ-law).
"""

from __future__ import annotations

import struct

import numpy as np

IMA_ADPCM_TAG = 0x11

_STEP_TABLE = np.array(
    [
        7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
        41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
        190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
        724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
        2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
        6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
        16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
    ],
    dtype=np.int32,
)
_INDEX_TABLE = np.array([-1, -1, -1, -1, 2, 4, 6, 8, -1, -1, -1, -1, 2, 4, 6, 8], dtype=np.int32)

BLOCK_ALIGN = 512  # bytes per block; mono → 1 + (512-4)*2 = 1017 samples


def _samples_per_block(block_align: int) -> int:
    return 1 + (block_align - 4) * 2


def _encode_nibble(sample: int, predictor: int, step: int) -> int:
    """One IMA quantization step: 4-bit code for (sample - predictor)."""
    diff = sample - predictor
    code = 0
    if diff < 0:
        code = 8
        diff = -diff
    if diff >= step:
        code |= 4
        diff -= step
    if diff >= step >> 1:
        code |= 2
        diff -= step >> 1
    if diff >= step >> 2:
        code |= 1
    return code


def _decode_step(code: int, predictor: int, index: int) -> tuple[int, int]:
    """Reference IMA reconstruction: returns (new predictor, new index)."""
    step = int(_STEP_TABLE[index])
    delta = step >> 3
    if code & 1:
        delta += step >> 2
    if code & 2:
        delta += step >> 1
    if code & 4:
        delta += step
    if code & 8:
        delta = -delta
    predictor = max(-32768, min(32767, predictor + delta))
    index = max(0, min(88, index + int(_INDEX_TABLE[code])))
    return predictor, index


def encode_wav_adpcm(wave_f32: np.ndarray, sample_rate: int) -> bytes:
    """float32 mono waveform in [-1, 1] → IMA ADPCM WAV (format tag 17)."""
    pcm = np.clip(np.round(wave_f32.astype(np.float64) * 32767.0), -32768, 32767).astype(int)
    spb = _samples_per_block(BLOCK_ALIGN)
    blocks = bytearray()
    index = 0
    for start in range(0, len(pcm), spb):
        chunk = pcm[start : start + spb]
        predictor = int(chunk[0])
        blocks += struct.pack("<hBB", predictor, index, 0)
        nibbles: list[int] = []
        for sample in chunk[1:]:
            step = int(_STEP_TABLE[index])
            code = _encode_nibble(int(sample), predictor, step)
            predictor, index = _decode_step(code, predictor, index)
            nibbles.append(code)
        # every block is a full block_align on disk (the spec's layout); a
        # short final chunk pads with zero nibbles and the fact chunk's
        # sample count truncates the decoded tail
        nibbles.extend([0] * ((BLOCK_ALIGN - 4) * 2 - len(nibbles)))
        pairs = np.asarray(nibbles, dtype=np.uint8).reshape(-1, 2)
        blocks += (pairs[:, 0] | (pairs[:, 1] << 4)).astype(np.uint8).tobytes()
    fmt = struct.pack(
        "<HHIIHHHH",
        IMA_ADPCM_TAG,
        1,
        sample_rate,
        (sample_rate * BLOCK_ALIGN + spb - 1) // spb,  # avg bytes/sec, informational
        BLOCK_ALIGN,
        4,  # bits per sample
        2,  # cbSize of the extra field
        spb,  # wSamplesPerBlock
    )
    fact = struct.pack("<I", len(pcm))
    data = bytes(blocks)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"fact" + struct.pack("<I", len(fact)) + fact
        + b"data" + struct.pack("<I", len(data)) + data + (b"\x00" if len(data) % 2 else b"")
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav_adpcm(payload: bytes) -> tuple[np.ndarray, int]:
    """IMA ADPCM WAV → (float32 mono waveform in [-1, 1], sample_rate)."""
    pos, end = 12, len(payload)
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    sample_rate = block_align = spb = None
    n_samples = None
    data = None
    while pos + 8 <= end:
        fourcc = payload[pos : pos + 4]
        size = struct.unpack_from("<I", payload, pos + 4)[0]
        if pos + 8 + size > end:
            raise ValueError(
                f"malformed WAV: chunk {fourcc!r} declares {size} bytes, "
                f"{end - pos - 8} remain"
            )
        if fourcc == b"fmt ":
            if size < 2:
                raise ValueError("malformed WAV: fmt chunk too short")
            tag = struct.unpack_from("<H", payload, pos + 8)[0]
            if tag != IMA_ADPCM_TAG:
                raise ValueError(f"not an IMA ADPCM WAV (format tag {tag})")
            if size < 20:
                raise ValueError("malformed WAV: ADPCM fmt chunk too short")
            tag, channels, sample_rate, _bps, block_align, bits, _cb, spb = struct.unpack_from(
                "<HHIIHHHH", payload, pos + 8
            )
            if channels != 1:
                raise ValueError("only mono IMA ADPCM is supported")
            if bits != 4:
                raise ValueError(f"malformed IMA ADPCM: {bits} bits per sample")
            if block_align < 5 or spb != _samples_per_block(block_align):
                raise ValueError(
                    f"malformed IMA ADPCM: block_align={block_align}, samples_per_block={spb}"
                )
        elif fourcc == b"fact":
            if size >= 4:
                n_samples = struct.unpack_from("<I", payload, pos + 8)[0]
        elif fourcc == b"data":
            data = payload[pos + 8 : pos + 8 + size]
        pos += 8 + size + (size % 2)
    if sample_rate is None or data is None:
        raise ValueError("malformed WAV: missing fmt or data chunk")
    if len(data) % block_align:
        raise ValueError(
            f"truncated IMA ADPCM: {len(data)} data bytes not a multiple of "
            f"block_align {block_align}"
        )
    out: list[int] = []
    for b0 in range(0, len(data), block_align):
        predictor, index, _ = struct.unpack_from("<hBB", data, b0)
        if index > 88:
            raise ValueError(f"malformed IMA ADPCM: step index {index}")
        out.append(predictor)
        body = np.frombuffer(data, dtype=np.uint8, count=block_align - 4, offset=b0 + 4)
        for byte in body.tolist():
            for code in (byte & 0xF, byte >> 4):
                predictor, index = _decode_step(code, predictor, index)
                out.append(predictor)
    if n_samples is not None:
        if n_samples > len(out):
            raise ValueError(
                f"truncated IMA ADPCM: fact declares {n_samples} samples, decoded {len(out)}"
            )
        out = out[:n_samples]
    pcm = np.asarray(out, dtype=np.float32) / 32768.0
    return pcm.astype(np.float32), int(sample_rate)
