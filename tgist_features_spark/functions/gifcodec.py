"""Pure-Python/numpy GIF codec (GIF87a/GIF89a) — no codec library.

Same posture as the sibling PNG/JPEG/WAV codecs (environment forces
zero-dependency: no PIL/libvips in the sandbox): an independent
implementation of the PUBLIC specification (CompuServe GIF89a, 1990-07;
LZW per the spec's variable-code-width variant), used by the multimodal
feature extractors so GIF payloads decode for REAL.

Coverage: logical screen + global/local color tables, interlaced and
non-interlaced frames, 2..256-color palettes, extension-block skipping
(a Graphic Control Extension's transparency index is ignored — the
feature path wants pixel statistics, and the first frame has no prior
frame to show through). Decodes the FIRST image block (the animation
case reduces to frame one for thumbnail/intensity features; full
animation compositing is out of scope, documented). Anything
malformed returns None — the dispatch falls through to the stub.

The LZW inner loop is per-code Python: fine for the thumbnail-scale
payloads the feature path sees (the batch level is where the engine
parallelizes — mapInPandas hands each worker whole batches).
"""

from __future__ import annotations

import struct

import numpy as np

_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _lzw_decode(data: bytes, min_code_size: int, n_expected: int) -> list[int] | None:
    """Variable-width LZW per the GIF spec: clear = 2^mcs, end = clear+1,
    table codes grow the width up to 12 bits."""
    clear = 1 << min_code_size
    end = clear + 1
    out: list[int] = []
    # bit reader, LSB-first within each byte
    bitpos = 0
    nbits = len(data) * 8

    def read_code(width: int) -> int | None:
        nonlocal bitpos
        if bitpos + width > nbits:
            return None
        byte_i, bit_i = divmod(bitpos, 8)
        val = 0
        got = 0
        while got < width:
            take = min(8 - bit_i, width - got)
            val |= ((data[byte_i] >> bit_i) & ((1 << take) - 1)) << got
            got += take
            byte_i += 1
            bit_i = 0
        bitpos += width
        return val

    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    width = min_code_size + 1
    prev: bytes | None = None
    while True:
        code = read_code(width)
        if code is None:
            break
        if code == clear:
            table = table[: clear + 2]
            width = min_code_size + 1
            prev = None
            continue
        if code == end:
            break
        if code < len(table):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]
        else:
            return None  # corrupt stream
        out.extend(entry)
        if prev is not None:
            table.append(prev + entry[:1])
            if len(table) == (1 << width) and width < 12:
                width += 1
        prev = entry
        if len(out) >= n_expected:
            break
    return out if len(out) >= n_expected else None


def decode_gif(b: bytes) -> np.ndarray | None:
    """GIF bytes -> (h, w, 3) uint8 of the first frame, or None."""
    if len(b) < 13 or b[:6] not in (b"GIF87a", b"GIF89a"):
        return None
    try:
        _sw, _sh, packed, _bg, _ar = struct.unpack("<HHBBB", b[6:13])
        pos = 13
        gct = None
        if packed & 0x80:
            n = 2 << (packed & 0x07)
            gct = np.frombuffer(b[pos : pos + 3 * n], dtype=np.uint8)
            if gct.size != 3 * n:
                return None
            gct = gct.reshape(n, 3)
            pos += 3 * n
        while pos < len(b):
            block = b[pos]
            if block == 0x21:  # extension: label + sub-blocks, skip
                pos += 2
                while pos < len(b) and b[pos] != 0:
                    pos += 1 + b[pos]
                pos += 1
            elif block == 0x2C:  # image descriptor
                _l, _t, w, h, ip = struct.unpack("<HHHHB", b[pos + 1 : pos + 10])
                pos += 10
                ct = gct
                if ip & 0x80:
                    n = 2 << (ip & 0x07)
                    ct = np.frombuffer(
                        b[pos : pos + 3 * n], dtype=np.uint8
                    ).reshape(n, 3)
                    pos += 3 * n
                if ct is None or w == 0 or h == 0:
                    return None
                mcs = b[pos]
                pos += 1
                if not (2 <= mcs <= 8):
                    return None
                chunks = []
                while pos < len(b) and b[pos] != 0:
                    ln = b[pos]
                    chunks.append(b[pos + 1 : pos + 1 + ln])
                    pos += 1 + ln
                idx = _lzw_decode(b"".join(chunks), mcs, w * h)
                if idx is None:
                    return None
                arr = np.array(idx[: w * h], dtype=np.int64).reshape(h, w)
                if arr.max() >= ct.shape[0]:
                    return None
                if ip & 0x40:  # interlaced: rows arrive in 4 passes
                    order = [
                        r
                        for start, step in _INTERLACE_PASSES
                        for r in range(start, h, step)
                    ]
                    out = np.empty_like(arr)
                    out[order] = arr
                    arr = out
                return ct[arr]
            elif block == 0x3B:  # trailer
                return None
            else:
                return None
    except (struct.error, ValueError, IndexError):
        return None
    return None


def _lzw_encode(indices: list[int], min_code_size: int) -> bytes:
    """Real LZW compression (dict-based), clear emitted up-front and on
    table overflow at 4096 codes — the spec's canonical behavior."""
    clear = 1 << min_code_size
    end = clear + 1
    out_bits: list[tuple[int, int]] = []  # (code, width)
    width = min_code_size + 1
    table = {bytes([i]): i for i in range(clear)}
    next_code = clear + 2
    out_bits.append((clear, width))
    prev = b""
    for sym in indices:
        cur = prev + bytes([sym])
        if cur in table:
            prev = cur
            continue
        out_bits.append((table[prev], width))
        table[cur] = next_code
        next_code += 1
        if next_code - 1 == (1 << width) and width < 12:
            width += 1
        if next_code == 4096:
            out_bits.append((clear, width))
            width = min_code_size + 1
            table = {bytes([i]): i for i in range(clear)}
            next_code = clear + 2
        prev = bytes([sym])
    if prev:
        out_bits.append((table[prev], width))
    out_bits.append((end, width))
    # pack LSB-first
    acc = 0
    nacc = 0
    out = bytearray()
    for code, cw in out_bits:
        acc |= code << nacc
        nacc += cw
        while nacc >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nacc -= 8
    if nacc:
        out.append(acc & 0xFF)
    return bytes(out)


def encode_gif(
    indices: np.ndarray, palette: np.ndarray, interlace: bool = False
) -> bytes:
    """(h, w) uint8 index image + (n, 3) uint8 palette -> GIF89a bytes
    (single frame, global color table, real LZW). Test/oracle face of
    the decoder — roundtrip is pinned in pytest."""
    h, w = indices.shape
    n = int(palette.shape[0])
    bits = max(1, (n - 1).bit_length())
    size_field = bits - 1
    table_n = 1 << bits
    pal = np.zeros((table_n, 3), dtype=np.uint8)
    pal[:n] = palette
    mcs = max(2, bits)
    rows = indices
    flags = 0x80 | size_field
    ip = 0x40 if interlace else 0x00
    if interlace:
        order = [
            r for start, step in _INTERLACE_PASSES for r in range(start, h, step)
        ]
        rows = indices[order]
    body = _lzw_encode([int(x) for x in rows.ravel()], mcs)
    out = bytearray()
    out += b"GIF89a"
    out += struct.pack("<HHBBB", w, h, flags, 0, 0)
    out += pal.tobytes()
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, ip)
    out.append(mcs)
    for i in range(0, len(body), 255):
        chunk = body[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"
    return bytes(out)
