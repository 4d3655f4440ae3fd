"""Baseline JPEG (ITU T.81 / JFIF) codec in pure numpy — no codec library.

Joins PPM, PNG and PCM-WAV as a REAL decoder behind the multimodal
kernel slot (functions/multimodal.py): the sandbox has no PIL/libvips,
and the point of the slot is that the decode kernel is swappable — this
module proves the slot with the hardest of the three image formats
rather than a stub. Everything here is public-spec knowledge: baseline
sequential DCT, Annex K quantization/Huffman tables, JFIF YCbCr.

Decoder (`decode_jpeg`): baseline sequential (SOF0) only — 8-bit,
grayscale or 3-component YCbCr with any sampling factors up to 2x2
(4:4:4, 4:2:2, 4:2:0), interleaved single scan, restart markers
honored. Progressive (SOF2) and arithmetic coding return None (caller
falls back), as does anything malformed.

Encoder (`encode_jpeg`): baseline, quality-scaled Annex K tables,
standard Annex K Huffman tables, 4:4:4 or 4:2:0. Exists so tests can
manufacture fixtures without any external tool; it is NOT the
production write path (training pipelines read images, they don't
write them).

Performance posture: the entropy decode is a Python bit loop — fine for
the thumbnails this slot sees in tests and honest about what it is; the
block math (dequantize, IDCT, color transform) is vectorized numpy over
all blocks at once. A deployment with real codec libraries swaps this
kernel and nothing above it changes.
"""

from __future__ import annotations

import numpy as np

# ----------------------------------------------------------- constants

ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
])

# Annex K.1 / K.2 reference quantization tables (natural order via zigzag)
K_LUMA_Q = np.array([
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99,
])
K_CHROMA_Q = np.array([
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
])

# Annex K.3 standard Huffman tables: (bits[1..16], huffval)
K_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
K_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
K_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
        0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
        0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
        0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
        0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
        0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
        0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
        0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
        0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
K_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
        0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
        0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
        0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
        0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
        0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
        0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
        0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
        0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
        0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
        0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)

# orthonormal 8-point DCT-II matrix: forward blocks are C @ X @ C.T,
# inverse is C.T @ Y @ C — one precomputed matrix serves both directions
_C = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _C[_k, _n] = np.cos(np.pi * (2 * _n + 1) * _k / 16.0)
_C *= np.sqrt(2.0 / 8.0)
_C[0, :] *= 1.0 / np.sqrt(2.0)


def _idct_blocks(blocks: np.ndarray) -> np.ndarray:
    """(n, 8, 8) dequantized coefficient blocks -> spatial samples."""
    return np.einsum("ki,nkl,lj->nij", _C, blocks, _C, optimize=True)


def _fdct_blocks(blocks: np.ndarray) -> np.ndarray:
    return np.einsum("ik,nkl,jl->nij", _C, blocks, _C, optimize=True)


# ----------------------------------------------------------- decoder


class _BitReader:
    """Entropy-segment bit reader with 0xFF00 byte-unstuffing; stops at
    any real marker and records it (restart handling needs RSTn)."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.bitbuf = 0
        self.nbits = 0
        self.marker: int | None = None

    def _fill(self) -> None:
        while self.nbits <= 24:
            if self.marker is not None or self.pos >= len(self.data):
                # feed zeros past the end/marker (spec: pad bits)
                self.bitbuf = (self.bitbuf << 8) & 0xFFFFFFFF
                self.nbits += 8
                continue
            b = self.data[self.pos]
            if b == 0xFF:
                nxt = self.data[self.pos + 1] if self.pos + 1 < len(self.data) else 0xD9
                if nxt == 0x00:
                    self.pos += 2  # stuffed literal 0xFF
                else:
                    self.marker = nxt  # real marker: stop consuming
                    self.bitbuf = (self.bitbuf << 8) & 0xFFFFFFFF
                    self.nbits += 8
                    continue
            else:
                self.pos += 1
            self.bitbuf = ((self.bitbuf << 8) | b) & 0xFFFFFFFF
            self.nbits += 8

    def get(self, n: int) -> int:
        if n == 0:
            return 0
        if self.nbits < n:
            self._fill()
        self.nbits -= n
        return (self.bitbuf >> self.nbits) & ((1 << n) - 1)

    def align_restart(self) -> bool:
        """Consume a pending RSTn marker at a restart boundary; returns
        True if one was consumed (DC predictors must reset). The reader's
        lookahead may not have pulled the marker yet, so scan past any
        unpulled pad bytes (including a stuffed 0xFF00 all-ones pad)."""
        self.bitbuf = 0
        self.nbits = 0
        if self.marker is None:
            while self.pos + 1 < len(self.data):
                if self.data[self.pos] != 0xFF:
                    self.pos += 1  # pad remnant not yet pulled
                    continue
                if self.data[self.pos + 1] == 0x00:
                    self.pos += 2  # stuffed all-ones pad byte
                    continue
                self.marker = self.data[self.pos + 1]
                break
        if self.marker is not None and 0xD0 <= self.marker <= 0xD7:
            self.pos += 2  # skip 0xFF RSTn
            self.marker = None
            return True
        return False


def _build_huff(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """Canonical Huffman: {(length, code) -> symbol}."""
    table: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _huff_decode(br: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.get(1)
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code")


def _extend(v: int, t: int) -> int:
    """T.81 F.12 EXTEND: map t-bit magnitude to signed value."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def decode_jpeg(b: bytes) -> np.ndarray | None:
    """Baseline JFIF bytes -> (h, w, 3) uint8 RGB (grayscale replicated),
    or None if not a decodable baseline JPEG."""
    try:
        return _decode_jpeg_strict(b)
    except Exception:
        return None


def _decode_jpeg_strict(b: bytes) -> np.ndarray | None:
    if len(b) < 4 or b[0] != 0xFF or b[1] != 0xD8:
        return None
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    restart_interval = 0
    frame = None
    pos = 2
    while pos + 4 <= len(b):
        if b[pos] != 0xFF:
            return None
        marker = b[pos + 1]
        if marker == 0xD9:  # EOI before SOS: nothing to decode
            return None
        seg_len = int.from_bytes(b[pos + 2 : pos + 4], "big")
        seg = b[pos + 4 : pos + 2 + seg_len]
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 0x0F
                i += 1
                if pq == 0:
                    qt[tq] = np.frombuffer(seg[i : i + 64], dtype=np.uint8).astype(np.int32)
                    i += 64
                else:
                    qt[tq] = np.frombuffer(seg[i : i + 128], dtype=">u2").astype(np.int32)
                    i += 128
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 0x0F
                bits = list(seg[i + 1 : i + 17])
                n = sum(bits)
                vals = list(seg[i + 17 : i + 17 + n])
                (huff_dc if tc == 0 else huff_ac)[th] = _build_huff(bits, vals)
                i += 17 + n
        elif marker == 0xC0:  # SOF0 baseline
            h = int.from_bytes(seg[1:3], "big")
            w = int.from_bytes(seg[3:5], "big")
            ncomp = seg[5]
            comps = []
            for c in range(ncomp):
                cid, hv, tqi = seg[6 + 3 * c], seg[7 + 3 * c], seg[8 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tqi})
            frame = {"h": h, "w": w, "comps": comps}
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            return None  # non-baseline frame types
        elif marker == 0xDD:  # DRI
            restart_interval = int.from_bytes(seg[0:2], "big")
        elif marker == 0xDA:  # SOS
            if frame is None:
                return None
            ns = seg[0]
            scan = []
            for c in range(ns):
                cs, tbl = seg[1 + 2 * c], seg[2 + 2 * c]
                comp = next(x for x in frame["comps"] if x["id"] == cs)
                scan.append((comp, tbl >> 4, tbl & 0x0F))
            data_start = pos + 2 + seg_len
            return _decode_scan(
                b, data_start, frame, scan, qt, huff_dc, huff_ac, restart_interval
            )
        pos += 2 + seg_len
    return None


def _decode_scan(b, pos, frame, scan, qt, huff_dc, huff_ac, restart_interval):
    h, w = frame["h"], frame["w"]
    comps = [s[0] for s in scan]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    # per-component coefficient planes in block units
    planes = {}
    for c in comps:
        bw, bh = mcus_x * c["h"], mcus_y * c["v"]
        planes[c["id"]] = np.zeros((bh * bw, 8, 8), dtype=np.int32)
    br = _BitReader(b, pos)
    pred = {c["id"]: 0 for c in comps}
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                if br.align_restart():
                    pred = {c["id"]: 0 for c in comps}
            for comp, tdc, tac in scan:
                for by in range(comp["v"]):
                    for bx in range(comp["h"]):
                        blk = _decode_block(br, huff_dc[tdc], huff_ac[tac])
                        blk[0] += pred[comp["id"]]
                        pred[comp["id"]] = blk[0]
                        deq = blk * qt[comp["tq"]]
                        nat = np.zeros(64, dtype=np.int32)
                        nat[ZIGZAG] = deq
                        bw = mcus_x * comp["h"]
                        idx = (my * comp["v"] + by) * bw + (mx * comp["h"] + bx)
                        planes[comp["id"]][idx] = nat.reshape(8, 8)
            mcu_count += 1
    # vectorized IDCT + reassembly per component
    out_planes = []
    for comp in comps:
        bw, bh = mcus_x * comp["h"], mcus_y * comp["v"]
        spat = _idct_blocks(planes[comp["id"]].astype(np.float64)) + 128.0
        grid = spat.reshape(bh, bw, 8, 8).transpose(0, 2, 1, 3).reshape(bh * 8, bw * 8)
        # upsample to full resolution by sampling-factor replication
        ry, rx = vmax // comp["v"], hmax // comp["h"]
        if ry > 1 or rx > 1:
            grid = np.repeat(np.repeat(grid, ry, axis=0), rx, axis=1)
        out_planes.append(grid[:h, :w])
    if len(out_planes) == 1:
        g = np.clip(out_planes[0], 0, 255)
        return np.dstack([g, g, g]).astype(np.uint8)
    y, cb, cr = out_planes[0], out_planes[1] - 128.0, out_planes[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    bl = y + 1.772 * cb
    return np.clip(np.dstack([r, g, bl]), 0, 255).astype(np.uint8)


def _decode_block(br: _BitReader, dc_tbl, ac_tbl) -> np.ndarray:
    """One 8x8 block in zigzag order (DC is the raw DIFF; caller adds the
    predictor)."""
    blk = np.zeros(64, dtype=np.int32)
    t = _huff_decode(br, dc_tbl)
    blk[0] = _extend(br.get(t), t)
    k = 1
    while k < 64:
        rs = _huff_decode(br, ac_tbl)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:  # ZRL: sixteen zeros
                k += 16
                continue
            break  # EOB
        k += r
        if k > 63:
            raise ValueError("AC run past block end")
        blk[k] = _extend(br.get(s), s)
        k += 1
    return blk


# ----------------------------------------------------------- encoder


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.buf = 0
        self.n = 0

    def put(self, value: int, nbits: int) -> None:
        for i in range(nbits - 1, -1, -1):
            self.buf = (self.buf << 1) | ((value >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.buf)
                if self.buf == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.buf = 0
                self.n = 0

    def flush(self) -> None:
        if self.n:
            self.buf <<= 8 - self.n
            self.buf |= (1 << (8 - self.n)) - 1  # pad with 1-bits (spec)
            self.out.append(self.buf)
            if self.buf == 0xFF:
                self.out.append(0x00)
            self.buf = 0
            self.n = 0


def _encode_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length), canonical order."""
    table: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return table


def _magnitude(v: int) -> tuple[int, int]:
    """signed value -> (category t, t-bit code)."""
    t = int(v).bit_length() if v >= 0 else int(-v).bit_length()
    if v < 0:
        v = v + (1 << t) - 1
    return t, v


def _quality_scale(q: np.ndarray, quality: int) -> np.ndarray:
    quality = min(100, max(1, quality))
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    out = (q * s + 50) // 100
    return np.clip(out, 1, 255).astype(np.int32)


def encode_jpeg(
    img: np.ndarray,
    quality: int = 90,
    subsample: bool = False,
    restart_interval: int = 0,
) -> bytes:
    """(h, w, 3) uint8 RGB -> baseline JFIF bytes (4:4:4, or 4:2:0 with
    ``subsample=True``; ``restart_interval`` emits DRI + RSTn markers
    every N MCUs — exists to exercise the decoder's restart path)."""
    h, w, _ = img.shape
    rgb = img.astype(np.float64)
    y = 0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2]
    cb = -0.168736 * rgb[..., 0] - 0.331264 * rgb[..., 1] + 0.5 * rgb[..., 2] + 128.0
    cr = 0.5 * rgb[..., 0] - 0.418688 * rgb[..., 1] - 0.081312 * rgb[..., 2] + 128.0
    if subsample:
        # 2x2 box-average chroma; pad odd dims by edge replication first
        cb_p = np.pad(cb, ((0, h % 2), (0, w % 2)), mode="edge")
        cr_p = np.pad(cr, ((0, h % 2), (0, w % 2)), mode="edge")
        cb_s = cb_p.reshape(cb_p.shape[0] // 2, 2, cb_p.shape[1] // 2, 2).mean(axis=(1, 3))
        cr_s = cr_p.reshape(cr_p.shape[0] // 2, 2, cr_p.shape[1] // 2, 2).mean(axis=(1, 3))
        planes = [(y, 2, 2, 0), (cb_s, 1, 1, 1), (cr_s, 1, 1, 1)]
    else:
        planes = [(y, 1, 1, 0), (cb, 1, 1, 1), (cr, 1, 1, 1)]
    qtab = {0: _quality_scale(K_LUMA_Q, quality), 1: _quality_scale(K_CHROMA_Q, quality)}
    hmax = max(p[1] for p in planes)
    vmax = max(p[2] for p in planes)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))

    # per-plane quantized zigzag blocks, in MCU-interleaved order
    blocks: list[list[np.ndarray]] = []
    for plane, ch, cv, tq in planes:
        bw, bh = mcus_x * ch, mcus_y * cv
        padded = np.full((bh * 8, bw * 8), 128.0)
        padded[: plane.shape[0], : plane.shape[1]] = plane
        # edge-replicate the padding so block boundaries don't ring
        padded[plane.shape[0]:, : plane.shape[1]] = plane[-1:, :]
        padded[:, plane.shape[1]:] = padded[:, plane.shape[1] - 1 : plane.shape[1]]
        blk = (
            padded.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
            - 128.0
        )
        coeff = _fdct_blocks(blk)
        # Annex K tables are natural (row-major) order: quantize in the
        # natural domain, then zigzag each block for entropy coding
        qz = np.round(coeff / qtab[tq].reshape(8, 8)).astype(np.int32)
        blocks.append([qz[i].ravel()[ZIGZAG] for i in range(qz.shape[0])])

    dc_codes = {0: _encode_codes(*K_DC_LUMA), 1: _encode_codes(*K_DC_CHROMA)}
    ac_codes = {0: _encode_codes(*K_AC_LUMA), 1: _encode_codes(*K_AC_CHROMA)}

    bwtr = _BitWriter()
    pred = [0, 0, 0]
    mcu_i = 0
    rst_i = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_i and mcu_i % restart_interval == 0:
                bwtr.flush()
                bwtr.out += bytes([0xFF, 0xD0 + (rst_i % 8)])
                rst_i += 1
                pred = [0, 0, 0]
            mcu_i += 1
            for ci, (plane, ch, cv, tq) in enumerate(planes):
                bw = mcus_x * ch
                for by in range(cv):
                    for bx in range(ch):
                        idx = (my * cv + by) * bw + (mx * ch + bx)
                        zz = blocks[ci][idx]
                        dtab, atab = dc_codes[tq], ac_codes[tq]
                        diff = int(zz[0]) - pred[ci]
                        pred[ci] = int(zz[0])
                        t, code = _magnitude(diff)
                        c, ln = dtab[t]
                        bwtr.put(c, ln)
                        bwtr.put(code, t)
                        run = 0
                        last_nz = np.nonzero(zz[1:])[0]
                        last = last_nz[-1] + 1 if len(last_nz) else 0
                        for k in range(1, last + 1):
                            v = int(zz[k])
                            if v == 0:
                                run += 1
                                continue
                            while run > 15:
                                c, ln = atab[0xF0]
                                bwtr.put(c, ln)
                                run -= 16
                            t, code = _magnitude(v)
                            c, ln = atab[(run << 4) | t]
                            bwtr.put(c, ln)
                            bwtr.put(code, t)
                            run = 0
                        if last < 63:
                            c, ln = atab[0x00]
                            bwtr.put(c, ln)
    bwtr.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return bytes([0xFF, marker]) + (len(payload) + 2).to_bytes(2, "big") + payload

    out = bytearray(b"\xff\xd8")
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    # DQT payload is ZIGZAG order per spec; qtab is natural order
    out += seg(0xDB, bytes([0x00]) + bytes(qtab[0][ZIGZAG].tolist()))
    out += seg(0xDB, bytes([0x01]) + bytes(qtab[1][ZIGZAG].tolist()))
    if restart_interval:
        out += seg(0xDD, restart_interval.to_bytes(2, "big"))
    sof = bytearray([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") + bytes([3])
    for cid, (plane, ch, cv, tq) in enumerate(planes, start=1):
        sof += bytes([cid, (ch << 4) | cv, tq])
    out += seg(0xC0, bytes(sof))
    for tc, th, (bits, vals) in [
        (0, 0, K_DC_LUMA), (1, 0, K_AC_LUMA), (0, 1, K_DC_CHROMA), (1, 1, K_AC_CHROMA),
    ]:
        out += seg(0xC4, bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals))
    sos = bytearray([3])
    for cid, (plane, ch, cv, tq) in enumerate(planes, start=1):
        sos += bytes([cid, (tq << 4) | tq])  # dc/ac table id == component class
    sos += bytes([0, 63, 0])
    out += seg(0xDA, bytes(sos))
    out += bwtr.out
    out += b"\xff\xd9"
    return bytes(out)
