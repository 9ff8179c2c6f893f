"""GIF87a/89a codec — stdlib ``struct`` + numpy, no PIL.

Continues the real-codec program (BMP r3, PNG r4, JPEG/µ-law/MJPEG r5)
with the one remaining stdlib-expressible image format: GIF's LZW is pure
algorithmic work (variable-width codes, 12-bit cap, clear/EOI), no
external entropy library needed. Public spec: CompuServe "GRAPHICS
INTERCHANGE FORMAT (sm) Version 89a" (1990); the LZW variant is the
standard GIF flavor (initial width = min_code_size + 1, codes grow at
table sizes 2^w, CLEAR resets, max code 0xFFF).

- **Encoder** (:func:`encode_gif`): 8-bit palette image. If the input's
  unique colors fit 256 the palette is EXACT (lossless roundtrip);
  otherwise colors quantize to a fixed 3-3-2-bit RGB cube (deterministic,
  error bounded by the cube spacing). Optional interlace writes the four
  GIF passes (rows 0/8, 4/8, 2/4, 1/2).
- **Decoder** (:func:`decode_gif`): header + logical screen descriptor,
  global/local color tables, extension-block skipping, full LZW decode
  (including the KwKwK case and deferred clears), interlace reassembly.
  Returns the FIRST frame as uint8 HxWx3. Malformed input — truncated
  sub-blocks, codes beyond the table, missing trailer — raises a clean
  ``ValueError`` (same contract the r5 ADVICE fixes established for
  jpeg.py/avi.py).
"""

from __future__ import annotations

import struct

import numpy as np

GIF_MAGICS = (b"GIF87a", b"GIF89a")
_MAX_CODE = 0xFFF  # 12-bit LZW cap


# ---------------------------------------------------------------------------
# LZW (GIF variant)
# ---------------------------------------------------------------------------


def _lzw_compress(indices: np.ndarray, min_code_size: int) -> bytes:
    """GIF LZW: emits a bitstream of variable-width codes, LSB-first."""
    clear = 1 << min_code_size
    eoi = clear + 1
    next_code = eoi + 1
    width = min_code_size + 1
    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}

    out_bits: list[tuple[int, int]] = [(clear, width)]
    prefix = b""
    for sym in indices.tolist():
        trial = prefix + bytes([sym])
        if trial in table:
            prefix = trial
            continue
        out_bits.append((table[prefix], width))
        if next_code <= _MAX_CODE:
            table[trial] = next_code
            # width grows when the NEXT code to assign no longer fits
            if next_code == (1 << width) and width < 12:
                width += 1
            next_code += 1
        else:
            out_bits.append((clear, width))
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            width = min_code_size + 1
        prefix = bytes([sym])
    if prefix:
        out_bits.append((table[prefix], width))
    out_bits.append((eoi, width))

    acc = 0
    nbits = 0
    data = bytearray()
    for code, w in out_bits:
        acc |= code << nbits
        nbits += w
        while nbits >= 8:
            data.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
    if nbits:
        data.append(acc & 0xFF)
    return bytes(data)


def _lzw_decompress(data: bytes, min_code_size: int, n_expected: int) -> np.ndarray:
    """Decode a GIF LZW stream to exactly ``n_expected`` palette indices."""
    clear = 1 << min_code_size
    eoi = clear + 1
    width = min_code_size + 1
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    out = bytearray()
    acc = 0
    nbits = 0
    pos = 0
    prev: bytes | None = None
    while True:
        while nbits < width:
            if pos >= len(data):
                raise ValueError("truncated GIF: LZW stream ended before EOI")
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            if code >= len(table):
                raise ValueError("malformed GIF: first code not in initial table")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            if len(table) <= _MAX_CODE:
                table.append(prev + entry[:1])
        elif code == len(table) and len(table) <= _MAX_CODE:
            entry = prev + prev[:1]  # the KwKwK case
            table.append(entry)
        else:
            raise ValueError(f"malformed GIF: LZW code {code} beyond table")
        out += entry
        prev = entry
        # width grows when the next assignable code would overflow it
        if len(table) == (1 << width) and width < 12:
            width += 1
        if len(out) >= n_expected:
            break
    if len(out) < n_expected:
        raise ValueError(
            f"truncated GIF: {len(out)} of {n_expected} pixels decoded"
        )
    return np.frombuffer(bytes(out[:n_expected]), dtype=np.uint8)


# ---------------------------------------------------------------------------
# Palette
# ---------------------------------------------------------------------------


def _palettize(arr: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(palette[N,3] uint8, indices[H*W] uint8). Exact when the image has
    ≤256 unique colors; otherwise the fixed 3-3-2 RGB cube."""
    h, w, _ = arr.shape
    flat = arr.reshape(-1, 3)
    colors, inverse = np.unique(flat, axis=0, return_inverse=True)
    if len(colors) <= 256:
        return colors.astype(np.uint8), inverse.astype(np.uint8)
    idx = (
        (flat[:, 0] >> 5).astype(np.uint16) << 5
        | (flat[:, 1] >> 5).astype(np.uint16) << 2
        | (flat[:, 2] >> 6).astype(np.uint16)
    )
    r = np.arange(256, dtype=np.uint16)
    palette = np.stack(
        [
            ((r >> 5) & 0x7) * 255 // 7,
            ((r >> 2) & 0x7) * 255 // 7,
            (r & 0x3) * 255 // 3,
        ],
        axis=1,
    ).astype(np.uint8)
    return palette, idx.astype(np.uint8)


_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _interlace_order(height: int) -> np.ndarray:
    rows = []
    for start, step in _INTERLACE_PASSES:
        rows.extend(range(start, height, step))
    return np.asarray(rows)


# ---------------------------------------------------------------------------
# Encode
# ---------------------------------------------------------------------------


def encode_gif(arr: np.ndarray, interlace: bool = False) -> bytes:
    """uint8 HxWx3 → single-frame GIF89a with a global color table."""
    if arr.ndim != 3 or arr.shape[2] != 3 or arr.dtype != np.uint8:
        raise ValueError("encode_gif expects uint8 HxWx3")
    h, w, _ = arr.shape
    palette, indices = _palettize(arr)
    # global color table size must be a power of two ≥ 2
    bits = max(1, int(len(palette) - 1).bit_length())
    table = np.zeros((1 << bits, 3), dtype=np.uint8)
    table[: len(palette)] = palette
    min_code_size = max(2, bits)

    if interlace:
        indices = indices.reshape(h, w)[_interlace_order(h)].reshape(-1)

    out = bytearray()
    out += b"GIF89a"
    out += struct.pack("<HHBBB", w, h, 0x80 | ((bits - 1) << 4) | (bits - 1), 0, 0)
    out += table.tobytes()
    out += struct.pack("<BHHHHB", 0x2C, 0, 0, w, h, 0x40 if interlace else 0)
    out.append(min_code_size)
    lzw = _lzw_compress(indices, min_code_size)
    for i in range(0, len(lzw), 255):
        block = lzw[i : i + 255]
        out.append(len(block))
        out += block
    out.append(0)  # block terminator
    out.append(0x3B)  # trailer
    return bytes(out)


# ---------------------------------------------------------------------------
# Decode
# ---------------------------------------------------------------------------


def _read(buf: bytes, pos: int, n: int) -> bytes:
    if pos + n > len(buf):
        raise ValueError("truncated GIF: unexpected end of data")
    return buf[pos : pos + n]


def _skip_subblocks(buf: bytes, pos: int) -> int:
    while True:
        n = _read(buf, pos, 1)[0]
        pos += 1
        if n == 0:
            return pos
        _read(buf, pos, n)
        pos += n


def decode_gif(payload: bytes) -> np.ndarray:
    """First frame of a GIF87a/89a payload as uint8 HxWx3."""
    if payload[:6] not in GIF_MAGICS:
        raise ValueError("not a GIF payload")
    sw, sh, flags, _bg, _ar = struct.unpack("<HHBBB", _read(payload, 6, 7))
    pos = 13
    global_table: np.ndarray | None = None
    if flags & 0x80:
        n = 2 << (flags & 0x7)
        global_table = np.frombuffer(_read(payload, pos, 3 * n), dtype=np.uint8).reshape(n, 3)
        pos += 3 * n
    while True:
        marker = _read(payload, pos, 1)[0]
        pos += 1
        if marker == 0x3B:
            raise ValueError("malformed GIF: trailer before any image frame")
        if marker == 0x21:  # extension: label byte + sub-blocks
            pos += 1
            pos = _skip_subblocks(payload, pos)
            continue
        if marker != 0x2C:
            raise ValueError(f"malformed GIF: unexpected block 0x{marker:02x}")
        left, top, w, h, iflags = struct.unpack("<HHHHB", _read(payload, pos, 9))
        pos += 9
        if w == 0 or h == 0 or left + w > sw or top + h > sh:
            raise ValueError("malformed GIF: frame exceeds logical screen")
        table = global_table
        if iflags & 0x80:
            n = 2 << (iflags & 0x7)
            table = np.frombuffer(_read(payload, pos, 3 * n), dtype=np.uint8).reshape(n, 3)
            pos += 3 * n
        if table is None:
            raise ValueError("malformed GIF: no color table for frame")
        min_code_size = _read(payload, pos, 1)[0]
        pos += 1
        if not 2 <= min_code_size <= 11:
            raise ValueError(f"malformed GIF: LZW min code size {min_code_size}")
        chunks = bytearray()
        while True:
            n = _read(payload, pos, 1)[0]
            pos += 1
            if n == 0:
                break
            chunks += _read(payload, pos, n)
            pos += n
        indices = _lzw_decompress(bytes(chunks), min_code_size, w * h)
        if indices.max(initial=0) >= len(table):
            raise ValueError("malformed GIF: pixel index beyond color table")
        img = table[indices].reshape(h, w, 3)
        if iflags & 0x40:
            out = np.empty_like(img)
            out[_interlace_order(h)] = img
            img = out
        return img
