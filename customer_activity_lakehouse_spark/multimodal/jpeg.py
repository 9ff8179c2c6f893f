"""Baseline sequential JPEG codec — stdlib ``struct`` + numpy, no PIL/cv2.

Removes the last image-format fake from the multimodal layer the way BMP
(round 3) and PNG (round 4) were removed. Implements the public ITU-T T.81
/ JFIF baseline subset:

- **Encoder** (:func:`encode_jpeg`): grayscale or RGB (YCbCr, 4:4:4 — no
  chroma subsampling), 8x8 DCT via an orthonormal matrix product,
  Annex-K-style quantization tables scaled by ``quality``, and FLAT
  canonical Huffman tables (every DC symbol 4 bits, every AC symbol
  8 bits). Flat tables are deliberately suboptimal-but-trivially-correct:
  the tables actually used are embedded in the DHT segments, so any
  spec-conforming decoder reads them canonically; nothing depends on
  reproducing the Annex K optimal code lengths from memory.
- **Decoder** (:func:`decode_jpeg`): reads DQT/DHT/SOF0/SOS/DRI from the
  stream (tables always come from the file, never hardcoded — real-world
  baseline files decode too, not just our own), arbitrary sampling
  factors with nearest-neighbor chroma upsampling, restart markers, and
  0xFF00 byte unstuffing. Progressive (SOF2) and arithmetic coding are
  rejected loudly.

Everything is deterministic; roundtrip error is bounded by quantization
only (tests assert a tight bound on smooth images at high quality).
"""

from __future__ import annotations

import struct

import numpy as np

JPEG_SIG = b"\xff\xd8"


def _zigzag() -> np.ndarray:
    """The standard 64-entry zigzag scan, generated (not transcribed):
    anti-diagonals in order; odd diagonals walk down-left (row ascending),
    even diagonals up-right."""
    order = []
    for s in range(15):
        diag = [(i, s - i) for i in range(8) if 0 <= s - i < 8]
        if s % 2 == 0:
            diag.reverse()
        order.extend(diag)
    return np.array([r * 8 + c for r, c in order], dtype=np.int64)


ZIGZAG = _zigzag()
UNZIGZAG = np.argsort(ZIGZAG)

# Annex K example quantization tables (the de-facto standard ones; any
# table would roundtrip — these give sane quality/size and are what DQT
# carries into the file).
QUANT_LUMA = np.array(
    [
        [16, 11, 10, 16, 24, 40, 51, 61],
        [12, 12, 14, 19, 26, 58, 60, 55],
        [14, 13, 16, 24, 40, 57, 69, 56],
        [14, 17, 22, 29, 51, 87, 80, 62],
        [18, 22, 37, 56, 68, 109, 103, 77],
        [24, 35, 55, 64, 81, 104, 113, 92],
        [49, 64, 78, 87, 103, 121, 120, 101],
        [72, 92, 95, 98, 112, 100, 103, 99],
    ],
    dtype=np.float64,
)
QUANT_CHROMA = np.array(
    [
        [17, 18, 24, 47, 99, 99, 99, 99],
        [18, 21, 26, 66, 99, 99, 99, 99],
        [24, 26, 56, 99, 99, 99, 99, 99],
        [47, 66, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
    ],
    dtype=np.float64,
)


def _scaled_quant(table: np.ndarray, quality: int) -> np.ndarray:
    quality = min(100, max(1, quality))
    scale = 5000 / quality if quality < 50 else 200 - 2 * quality
    q = np.floor((table * scale + 50) / 100)
    return np.clip(q, 1, 255).astype(np.int64)


def _dct_matrix() -> np.ndarray:
    n = np.arange(8)
    k = n.reshape(-1, 1)
    m = 0.5 * np.cos((2 * n + 1) * k * np.pi / 16)
    m[0] *= 1 / np.sqrt(2)
    return m  # orthonormal: coeffs = M @ block @ M.T ; block = M.T @ C @ M


_DCT_M = _dct_matrix()

# Flat canonical Huffman tables: all 12 DC categories at 4 bits, all 162
# AC (run,size) symbols at 8 bits. Canonical code of symbol i at uniform
# length L is simply i; the all-ones code stays unused (12 < 15, 162 < 255).
DC_SYMBOLS = list(range(12))
AC_SYMBOLS = [0x00, 0xF0] + [
    (run << 4) | size for run in range(16) for size in range(1, 11)
]
DC_LEN = 4
AC_LEN = 8


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, length: int) -> None:
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.nbits -= 8
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.out.append(0x00)
        self.acc &= (1 << self.nbits) - 1

    def align(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1-bits per spec

    def raw(self, b: bytes) -> None:
        """Append marker bytes verbatim (markers are never stuffed)."""
        assert self.nbits == 0, "emit markers only at byte boundaries"
        self.out += b

    def flush(self) -> bytes:
        self.align()
        return bytes(self.out)


def _category(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length() if v < 0 else 0


def _amplitude(v: int, size: int) -> int:
    return v if v >= 0 else v + (1 << size) - 1


_DC_CODE = {sym: i for i, sym in enumerate(DC_SYMBOLS)}
_AC_CODE = {sym: i for i, sym in enumerate(AC_SYMBOLS)}


def _blocks_of(plane: np.ndarray) -> np.ndarray:
    """HxW float plane (H, W multiples of 8) → (n, 8, 8) blocks in MCU
    raster order."""
    h, w = plane.shape
    return (
        plane.reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    )


def _write_block(writer: _BitWriter, row: np.ndarray, pred: int) -> int:
    """Entropy-code one zigzagged quantized block; returns the new DC pred."""
    dc = int(row[0])
    diff = dc - pred
    size = _category(diff)
    writer.write(_DC_CODE[size], DC_LEN)
    if size:
        writer.write(_amplitude(diff, size), size)
    run = 0
    ac = row[1:]
    last_nz = np.nonzero(ac)[0]
    end = last_nz[-1] + 1 if len(last_nz) else 0
    for v in ac[:end]:
        v = int(v)
        if v == 0:
            run += 1
            continue
        while run >= 16:
            writer.write(_AC_CODE[0xF0], AC_LEN)  # ZRL
            run -= 16
        size = _category(v)
        writer.write(_AC_CODE[(run << 4) | size], AC_LEN)
        writer.write(_amplitude(v, size), size)
        run = 0
    if end < 63:
        writer.write(_AC_CODE[0x00], AC_LEN)  # EOB
    return dc


def _dht_segment(tc: int, th: int, symbols: list[int], length: int) -> bytes:
    counts = [0] * 16
    counts[length - 1] = len(symbols)
    body = bytes([tc << 4 | th]) + bytes(counts) + bytes(symbols)
    return b"\xff\xc4" + struct.pack(">H", len(body) + 2) + body


def _dqt_segment(tq: int, quant: np.ndarray) -> bytes:
    body = bytes([tq]) + bytes(int(v) for v in quant.flatten()[ZIGZAG])
    return b"\xff\xdb" + struct.pack(">H", len(body) + 2) + body


def encode_jpeg(arr: np.ndarray, quality: int = 90, restart_interval: int = 0) -> bytes:
    """uint8 HxW (grayscale) or HxWx3 (RGB) → baseline JFIF bytes (4:4:4).

    ``restart_interval`` > 0 emits a DRI segment and RSTn markers every N
    MCUs (what a parallel encoder would produce — and the decoder-path
    coverage for them)."""
    if arr.dtype != np.uint8 or arr.ndim not in (2, 3):
        raise ValueError("encode_jpeg expects uint8 HxW or HxWx3")
    gray = arr.ndim == 2
    h, w = arr.shape[:2]
    pad_h, pad_w = (-h) % 8, (-w) % 8
    arr_f = arr.astype(np.float64)
    if gray:
        planes = [arr_f]
    else:
        r, g, b = arr_f[..., 0], arr_f[..., 1], arr_f[..., 2]
        planes = [
            0.299 * r + 0.587 * g + 0.114 * b,
            -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
            0.5 * r - 0.418688 * g - 0.081312 * b + 128.0,
        ]
    planes = [np.pad(p, ((0, pad_h), (0, pad_w)), mode="edge") for p in planes]

    q_luma = _scaled_quant(QUANT_LUMA, quality)
    q_chroma = _scaled_quant(QUANT_CHROMA, quality)

    out = bytearray(JPEG_SIG)
    jfif = b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    out += b"\xff\xe0" + struct.pack(">H", len(jfif) + 2) + jfif
    out += _dqt_segment(0, q_luma)
    if not gray:
        out += _dqt_segment(1, q_chroma)
    ncomp = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for cid in range(1, ncomp + 1):
        tq = 0 if cid == 1 else 1
        sof += bytes([cid, 0x11, tq])  # h=v=1 (4:4:4)
    out += b"\xff\xc0" + struct.pack(">H", len(sof) + 2) + sof
    out += _dht_segment(0, 0, DC_SYMBOLS, DC_LEN)
    out += _dht_segment(1, 0, AC_SYMBOLS, AC_LEN)
    if not gray:
        out += _dht_segment(0, 1, DC_SYMBOLS, DC_LEN)
        out += _dht_segment(1, 1, AC_SYMBOLS, AC_LEN)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    sos = bytes([ncomp])
    for cid in range(1, ncomp + 1):
        tbl = 0 if cid == 1 else 1
        sos += bytes([cid, tbl << 4 | tbl])
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos

    # 4:4:4 with h=v=1: the MCU is one block per component, interleaved —
    # encode block b of comp 0, then comp 1, then comp 2, repeat, with a
    # separate DC predictor per component (grayscale degenerates to the
    # single-component loop).
    writer = _BitWriter()
    quants = [q_luma] + [q_chroma] * (ncomp - 1)
    zzs = []
    for plane, qt in zip(planes, quants):
        coeffs = np.einsum("kn,bnm,lm->bkl", _DCT_M, _blocks_of(plane) - 128.0, _DCT_M)
        zzs.append(np.round(coeffs / qt).astype(np.int64).reshape(-1, 64)[:, ZIGZAG])
    preds = [0] * ncomp
    n_mcus = zzs[0].shape[0]
    for bidx in range(n_mcus):
        for ci in range(ncomp):
            preds[ci] = _write_block(writer, zzs[ci][bidx], preds[ci])
        if (
            restart_interval
            and (bidx + 1) % restart_interval == 0
            and bidx + 1 < n_mcus
        ):
            writer.align()
            writer.raw(bytes([0xFF, 0xD0 + ((bidx + 1) // restart_interval - 1) % 8]))
            preds = [0] * ncomp
    out += writer.flush()
    out += b"\xff\xd9"
    return bytes(out)


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------


class _BitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00 unstuffing;
    stops at any non-RST marker (leaves it for the segment parser)."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        if self.pos >= len(self.data):
            raise ValueError("truncated JPEG: entropy data ends mid-stream")
        b = self.data[self.pos]
        if b == 0xFF:
            if self.pos + 1 >= len(self.data):
                raise ValueError("truncated JPEG: dangling 0xFF at end of entropy data")
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7:  # RSTn handled by caller via align()
                raise _RestartMarker()
            else:
                raise EOFError("hit marker inside entropy data")
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def align_past_rst(self) -> None:
        """Discard partial byte and consume the RSTn marker (tolerating
        spec-legal 0xFF fill bytes before it, T.81 B.1.1.2)."""
        self.acc = 0
        self.nbits = 0
        while self.pos + 1 < len(self.data) and self.data[self.pos : self.pos + 2] == b"\xff\xff":
            self.pos += 1
        if self.pos + 1 >= len(self.data):
            raise ValueError("truncated JPEG: expected RST marker, hit end of data")
        if not (self.data[self.pos] == 0xFF and 0xD0 <= self.data[self.pos + 1] <= 0xD7):
            raise ValueError(
                f"malformed JPEG: expected RST marker at {self.pos}, found "
                f"0x{self.data[self.pos]:02X}{self.data[self.pos + 1]:02X}"
            )
        self.pos += 2


class _RestartMarker(Exception):
    pass


class _HuffTable:
    """Canonical reconstruction from a DHT segment (per T.81 Annex C)."""

    def __init__(self, counts: list[int], symbols: list[int]) -> None:
        self.lookup: dict[tuple[int, int], int] = {}
        code = 0
        it = iter(symbols)
        for length in range(1, 17):
            for _ in range(counts[length - 1]):
                self.lookup[(length, code)] = next(it)
                code += 1
            code <<= 1

    def decode(self, reader: _BitReader) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | reader.read_bit()
            sym = self.lookup.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code in entropy stream")


def _extend(v: int, size: int) -> int:
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline JFIF bytes → uint8 HxWx3 RGB (grayscale files replicate to
    3 channels is NOT done — they return HxW). Tables are read from the
    stream; sampling factors are honored with nearest-neighbor upsampling."""
    if payload[:2] != JPEG_SIG:
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    quants: dict[int, np.ndarray] = {}
    huffs: dict[tuple[int, int], _HuffTable] = {}
    sof = None
    restart_interval = 0
    while pos < len(payload):
        if payload[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}")
        # spec-legal 0xFF fill bytes may pad before any marker (T.81 B.1.1.2)
        while pos + 1 < len(payload) and payload[pos + 1] == 0xFF:
            pos += 1
        if pos + 1 >= len(payload):
            raise ValueError("truncated JPEG: dangling 0xFF at end of stream")
        marker = payload[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01, *range(0xD0, 0xD8)):  # standalone
            continue
        if pos + 2 > len(payload):
            raise ValueError("truncated JPEG: marker segment length missing")
        seg_len = struct.unpack_from(">H", payload, pos)[0]
        if seg_len < 2 or pos + seg_len > len(payload):
            raise ValueError(
                f"malformed JPEG: segment 0xFF{marker:02X} declares {seg_len} bytes, "
                f"{len(payload) - pos} remain"
            )
        body = payload[pos + 2 : pos + seg_len]
        if marker == 0xDB:  # DQT (possibly multiple tables per segment)
            off = 0
            while off < len(body):
                pq, tq = body[off] >> 4, body[off] & 0xF
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported (baseline)")
                if off + 65 > len(body):
                    raise ValueError("malformed JPEG: DQT segment shorter than declared")
                tbl = np.zeros(64, dtype=np.int64)
                tbl[ZIGZAG] = np.frombuffer(body, np.uint8, 64, off + 1)
                quants[tq] = tbl.reshape(8, 8)
                off += 65
        elif marker == 0xC4:  # DHT
            off = 0
            while off < len(body):
                tc, th = body[off] >> 4, body[off] & 0xF
                counts = list(body[off + 1 : off + 17])
                n = sum(counts)
                if len(counts) < 16 or off + 17 + n > len(body):
                    raise ValueError("malformed JPEG: DHT segment shorter than declared")
                syms = list(body[off + 17 : off + 17 + n])
                huffs[(tc, th)] = _HuffTable(counts, syms)
                off += 17 + n
        elif marker == 0xC0:  # SOF0 baseline
            if len(body) < 6:
                raise ValueError("malformed JPEG: SOF0 segment too short")
            precision, h, w, ncomp = struct.unpack_from(">BHHB", body, 0)
            if precision != 8:
                raise ValueError("only 8-bit precision supported")
            if len(body) < 6 + 3 * ncomp:
                raise ValueError("malformed JPEG: SOF0 component list truncated")
            if h == 0 or w == 0 or ncomp == 0:
                raise ValueError(f"malformed JPEG: SOF0 declares {w}x{h}, {ncomp} components")
            comps = []
            for i in range(ncomp):
                cid, hv, tq = body[6 + 3 * i : 9 + 3 * i]
                hs, vs = hv >> 4, hv & 0xF
                if not (1 <= hs <= 4 and 1 <= vs <= 4):
                    raise ValueError(f"malformed JPEG: sampling factors {hs}x{vs}")
                comps.append({"id": cid, "h": hs, "v": vs, "tq": tq})
            sof = {"h": h, "w": w, "comps": comps}
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            raise ValueError(
                f"unsupported SOF marker 0xFF{marker:02X} — baseline sequential only"
            )
        elif marker == 0xDD:  # DRI
            if len(body) < 2:
                raise ValueError("malformed JPEG: DRI segment too short")
            restart_interval = struct.unpack_from(">H", body, 0)[0]
        elif marker == 0xDA:  # SOS — entropy data follows
            if sof is None:
                raise ValueError("SOS before SOF0")
            if len(body) < 1 or len(body) < 1 + 2 * body[0]:
                raise ValueError("malformed JPEG: SOS component list truncated")
            ns = body[0]
            scan_tables = {}
            for i in range(ns):
                cid, tbls = body[1 + 2 * i], body[2 + 2 * i]
                scan_tables[cid] = (tbls >> 4, tbls & 0xF)
            pos += seg_len
            return _decode_scan(
                payload, pos, sof, scan_tables, quants, huffs, restart_interval
            )
        pos += seg_len
    raise ValueError("no SOS segment found")


def _decode_scan(data, pos, sof, scan_tables, quants, huffs, restart_interval):
    comps = sof["comps"]
    h, w = sof["h"], sof["w"]
    # every table referenced by the scan must exist — direct dict lookups
    # inside the MCU loop would otherwise surface corrupt ids as KeyError
    for c in comps:
        if c["id"] not in scan_tables:
            raise ValueError(f"malformed JPEG: SOS names no tables for component {c['id']}")
        dc_t, ac_t = scan_tables[c["id"]]
        missing = [k for k in ((0, dc_t), (1, ac_t)) if k not in huffs]
        if missing or c["tq"] not in quants:
            raise ValueError(
                f"malformed JPEG: scan references undefined tables "
                f"(huffman {missing}, quant {c['tq'] if c['tq'] not in quants else ''})"
            )
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    n_mcus = mcus_x * mcus_y

    # per-component coefficient planes (in blocks)
    planes = []
    for c in comps:
        bw, bh = mcus_x * c["h"], mcus_y * c["v"]
        planes.append(np.zeros((bh * 8, bw * 8), dtype=np.float64))

    reader = _BitReader(data, pos)
    preds = [0] * len(comps)
    mcu = 0
    while mcu < n_mcus:
        try:
            my, mx = divmod(mcu, mcus_x)
            for ci, c in enumerate(comps):
                dc_t, ac_t = scan_tables[c["id"]]
                dc_table, ac_table = huffs[(0, dc_t)], huffs[(1, ac_t)]
                quant = quants[c["tq"]]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        zz = np.zeros(64, dtype=np.int64)
                        size = dc_table.decode(reader)
                        diff = _extend(reader.read_bits(size), size) if size else 0
                        preds[ci] += diff
                        if abs(preds[ci]) > (1 << 31):
                            # corrupt DC diffs accumulate without bound; a
                            # raw int64 overflow in the numpy store is not a
                            # decode error message anyone can act on
                            raise ValueError("malformed JPEG: DC predictor overflow")
                        zz[0] = preds[ci]
                        k = 1
                        while k < 64:
                            sym = ac_table.decode(reader)
                            if sym == 0x00:  # EOB
                                break
                            if sym == 0xF0:  # ZRL
                                k += 16
                                continue
                            run, size = sym >> 4, sym & 0xF
                            k += run
                            if k > 63:
                                raise ValueError("AC run past block end")
                            zz[k] = _extend(reader.read_bits(size), size)
                            k += 1
                        coeff = np.zeros(64, dtype=np.float64)
                        coeff[ZIGZAG] = zz * quant.flatten()[ZIGZAG]
                        block = _DCT_M.T @ coeff.reshape(8, 8) @ _DCT_M + 128.0
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        planes[ci][y0 : y0 + 8, x0 : x0 + 8] = block
            mcu += 1
            if restart_interval and mcu % restart_interval == 0 and mcu < n_mcus:
                reader.align_past_rst()
                preds = [0] * len(comps)
        except _RestartMarker:
            # restart marker arrived (tolerate encoders that emit it even
            # when our counter disagrees): realign and reset predictors.
            # align_past_rst makes 2+ bytes of progress or raises ValueError,
            # so this loop cannot walk past EOF (ADVICE r5).
            reader.align_past_rst()
            preds = [0] * len(comps)
        except EOFError as exc:
            # a non-RST marker inside entropy data before all MCUs decoded
            raise ValueError(f"malformed JPEG: {exc} at MCU {mcu}/{n_mcus}") from exc

    # upsample each component to full resolution and crop
    full = []
    for ci, c in enumerate(comps):
        p = planes[ci]
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
        full.append(p[:h, :w])

    if len(comps) == 1:
        return np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)
