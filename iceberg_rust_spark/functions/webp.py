"""WebP (RIFF container + VP8L lossless bitstream, public Google specs).

Implemented from the published "WebP Container Specification" and "WebP
Lossless Bitstream Specification":

- webp_dimensions: REAL for all three container flavors — VP8L (lossless
  header), VP8 (lossy key-frame header), VP8X (extended canvas size).
- decode_webp / decode_vp8l: full VP8L lossless pixel decode — prefix
  codes (simple + code-length-coded), meta prefix groups, color cache,
  LZ77 backward references incl. the 2D neighbor distance map, and all
  four transforms (predictor, color, subtract-green, color-indexing with
  sub-byte packing), applied in reverse order.
- encode_webp_lossless: minimal literal-only VP8L encoder (canonical
  per-channel prefix codes, no transforms) — the fixture twin; its output
  decodes in any compliant reader.

Lossy VP8: vp8_keyframe_info is a REAL parse of the key-frame first
partition through the quantizer indices — RFC 6386 boolean entropy decoder
plus every header field that needs NO probability tables (dims/scale,
color space, segmentation incl. quantizer/filter deltas and segment tree
probs, loop filter, partition count, all six quant indices). Pixel decode
stays out of scope with a precise boundary: the token layer requires the
RFC's ~2 KB of default/update probability constants
(coeff_update_probs[4][8][3][11], default coeff probs, kf_bmode[10][10][9])
which are unavailable in this offline container, and reproducing them from
memory risks a silently-desynced arithmetic decoder — strictly worse than
the marked stub fallback callers keep (ValueError -> stub histogram).
"""

from __future__ import annotations

import struct
from typing import List, Optional, Tuple

import numpy as np


# --------------------------------------------------------------- container

def _webp_chunks(b: bytes):
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WEBP":
        raise ValueError("not a WebP file")
    pos, n = 12, len(b)
    while pos + 8 <= n:
        cid = b[pos:pos + 4]
        (ln,) = struct.unpack("<I", b[pos + 4:pos + 8])
        yield cid, b[pos + 8:pos + 8 + ln]
        pos += 8 + ln + (ln & 1)        # chunks are 2-byte aligned


def webp_dimensions(data: bytes) -> Tuple[int, int]:
    """(width, height) from any WebP flavor — header parse only."""
    b = bytes(data)
    for cid, body in _webp_chunks(b):
        if cid == b"VP8X" and len(body) >= 10:
            w = 1 + int.from_bytes(body[4:7], "little")
            h = 1 + int.from_bytes(body[7:10], "little")
            return w, h
        if cid == b"VP8L" and len(body) >= 5:
            if body[0] != 0x2F:
                raise ValueError("bad VP8L signature")
            bits = int.from_bytes(body[1:5], "little")
            return (bits & 0x3FFF) + 1, ((bits >> 14) & 0x3FFF) + 1
        if cid == b"VP8 " and len(body) >= 10:
            # lossy key frame: 3-byte frame tag, 3-byte start code, dims
            if body[3:6] != b"\x9d\x01\x2a":
                raise ValueError("bad VP8 start code")
            w, h = struct.unpack("<HH", body[6:10])
            return w & 0x3FFF, h & 0x3FFF
    raise ValueError("no VP8/VP8L/VP8X chunk")


# --------------------------------------------------------------- bit reader

class _LSBReader:
    """VP8L bit reading: LSB-first within each byte."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.bit = 0

    def read_bit(self) -> int:
        if self.pos >= len(self.data):
            raise ValueError("VP8L stream exhausted")
        v = (self.data[self.pos] >> self.bit) & 1
        self.bit += 1
        if self.bit == 8:
            self.bit = 0
            self.pos += 1
        return v

    def read_bits(self, n: int) -> int:
        v = 0
        for i in range(n):
            v |= self.read_bit() << i
        return v


# ------------------------------------------------------------- prefix codes

def _canonical_codes(lengths: List[int]) -> dict:
    """RFC1951-style canonical codes -> {(len, code): symbol}; VP8L prefix
    codes are read MSB-of-code-first like deflate."""
    max_len = max(lengths) if lengths else 0
    bl_count = [0] * (max_len + 1)
    for ln in lengths:
        if ln:
            bl_count[ln] += 1
    code = 0
    next_code = [0] * (max_len + 1)
    for ln in range(1, max_len + 1):
        code = (code + bl_count[ln - 1]) << 1
        next_code[ln] = code
    table = {}
    for sym, ln in enumerate(lengths):
        if ln:
            table[(ln, next_code[ln])] = sym
            next_code[ln] += 1
    return table


class _PrefixCode:
    def __init__(self, table: dict, single: Optional[int] = None):
        self.table = table
        self.single = single            # 0-bit code: one symbol, no reads

    def read(self, r: "_LSBReader") -> int:
        if self.single is not None:
            return self.single
        code, ln = 0, 0
        while ln < 15:
            code = (code << 1) | r.read_bit()
            ln += 1
            sym = self.table.get((ln, code))
            if sym is not None:
                return sym
        raise ValueError("invalid VP8L prefix code")


_CL_ORDER = [17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15]


def _read_prefix_code(r: "_LSBReader", alphabet: int) -> _PrefixCode:
    if r.read_bit():                    # simple code: 1-2 symbols
        n_sym = r.read_bit() + 1
        if r.read_bit():
            sym0 = r.read_bits(8)
        else:
            sym0 = r.read_bit()
        if n_sym == 1:
            return _PrefixCode({}, single=sym0)
        sym1 = r.read_bits(8)
        return _PrefixCode({(1, 0): sym0, (1, 1): sym1})
    n_cl = 4 + r.read_bits(4)
    cl_lengths = [0] * 19
    for i in range(n_cl):
        cl_lengths[_CL_ORDER[i]] = r.read_bits(3)
    cl_nz = [ln for ln in cl_lengths if ln]
    if len(cl_nz) == 1:
        # a single-symbol code-length code decodes with ZERO bits (libwebp
        # BuildHuffmanTable's single-symbol path) — a 1-bit canonical table
        # here would desync on compliant encoder output such as "all 256
        # literals share one length"
        cl_code = _PrefixCode({}, single=cl_lengths.index(cl_nz[0]))
    else:
        cl_code = _PrefixCode(_canonical_codes(cl_lengths))
    if r.read_bit():                    # explicit max symbol
        length_nbits = 2 + 2 * r.read_bits(3)
        max_symbol = 2 + r.read_bits(length_nbits)
    else:
        max_symbol = alphabet
    lengths = [0] * alphabet
    prev = 8
    i = 0
    while i < alphabet and max_symbol > 0:
        max_symbol -= 1
        s = cl_code.read(r)
        if s < 16:
            lengths[i] = s
            i += 1
            if s:
                prev = s
        elif s == 16:
            rep = 3 + r.read_bits(2)
            for _ in range(rep):
                if i < alphabet:
                    lengths[i] = prev
                    i += 1
        elif s == 17:
            i += 3 + r.read_bits(3)
        else:
            i += 11 + r.read_bits(7)
    nz = [ln for ln in lengths if ln]
    if len(nz) == 1:
        return _PrefixCode({}, single=lengths.index(nz[0]))
    return _PrefixCode(_canonical_codes(lengths))


# --------------------------------------------------------------- LZ77 bits

def _lz77_value(r: "_LSBReader", prefix_sym: int) -> int:
    """Length/distance prefix decoding (spec 4.2.2): symbol -> value."""
    if prefix_sym < 4:
        return prefix_sym + 1
    extra = (prefix_sym - 2) >> 1
    offset = (2 + (prefix_sym & 1)) << extra
    return offset + r.read_bits(extra) + 1


def _distance_map() -> List[Tuple[int, int]]:
    """The 120-entry 2D neighbor map (spec 4.2.2): (dx, dy) offsets sorted
    by squared distance, then |dx|, then sign — codes 1..120 address the
    nearest pixels above/left; the spec's table follows exactly this
    order ((0,1),(1,0),(1,1),(-1,1),(0,2),(2,0),(1,2),(-1,2),...)."""
    cands = [(dx, 0) for dx in range(1, 9)]
    cands += [(dx, dy) for dy in range(1, 9) for dx in range(-8, 9)]
    cands.sort(key=lambda p: (p[0] * p[0] + p[1] * p[1], abs(p[0]),
                              p[0] < 0))
    return cands[:120]


_DIST_MAP = _distance_map()


# ----------------------------------------------------------- image decoding

_G, _R, _B, _A = 0, 1, 2, 3            # channel order inside pixel tuples


def _hash_pixel(px: Tuple[int, int, int, int], bits: int) -> int:
    argb = (px[_A] << 24) | (px[_R] << 16) | (px[_G] << 8) | px[_B]
    return ((0x1E35A7BD * argb) & 0xFFFFFFFF) >> (32 - bits)


def _read_entropy_image(r: "_LSBReader", w: int, h: int,
                        is_main: bool) -> np.ndarray:
    """Spatially-coded image -> (h, w, 4) uint8 [g, r, b, a]."""
    cache_bits = 0
    cache = None
    meta = None
    huffman_bits = 0
    # bit order per the spec / libwebp DecodeImageStream: color-cache
    # flag first, then the meta-prefix flag (inside the code reading)
    if r.read_bit():                    # color cache
        cache_bits = r.read_bits(4)
        if not 1 <= cache_bits <= 11:
            raise ValueError("bad color cache size")
        cache = [(0, 0, 0, 0)] * (1 << cache_bits)
    if is_main and r.read_bit():        # meta prefix codes
        huffman_bits = 2 + r.read_bits(3)
        mw = (w + (1 << huffman_bits) - 1) >> huffman_bits
        mh = (h + (1 << huffman_bits) - 1) >> huffman_bits
        meta = _read_entropy_image(r, mw, mh, False)
    n_groups = 1
    if meta is not None:
        n_groups = int((meta[:, :, _R].astype(np.int64) << 8
                        | meta[:, :, _G]).max()) + 1
    groups = []
    n_green = 256 + 24 + (1 << cache_bits if cache_bits else 0)
    for _ in range(n_groups):
        groups.append((_read_prefix_code(r, n_green),
                       _read_prefix_code(r, 256),
                       _read_prefix_code(r, 256),
                       _read_prefix_code(r, 256),
                       _read_prefix_code(r, 40)))
    out = np.zeros((h * w, 4), dtype=np.uint8)
    pos = 0
    npix = h * w
    while pos < npix:
        if meta is not None:
            x, y = pos % w, pos // w
            m = meta[y >> huffman_bits, x >> huffman_bits]
            g_code, r_code, b_code, a_code, d_code = groups[
                (int(m[_R]) << 8) | int(m[_G])]
        else:
            g_code, r_code, b_code, a_code, d_code = groups[0]
        s = g_code.read(r)
        if s < 256:                     # literal: G then R, B, A
            px = (s, r_code.read(r), b_code.read(r), a_code.read(r))
            out[pos] = px
            pos += 1
        elif s < 280:                   # LZ77 backward reference
            length = _lz77_value(r, s - 256)
            d_sym = d_code.read(r)
            d_val = _lz77_value(r, d_sym)
            if d_val > 120:
                dist = d_val - 120
            else:
                dx, dy = _DIST_MAP[d_val - 1]
                dist = dy * w + dx
                if dist < 1:
                    dist = 1
            if dist > pos or pos + length > npix:
                raise ValueError("VP8L backward reference out of range")
            for i in range(length):
                out[pos + i] = out[pos + i - dist]
            if cache is not None:
                for i in range(length):
                    px = tuple(int(v) for v in out[pos + i])
                    cache[_hash_pixel(px, cache_bits)] = px
            pos += length
            continue
        else:                           # color cache hit
            if cache is None:
                raise ValueError("cache symbol without color cache")
            px = cache[s - 280]
            out[pos] = px
            pos += 1
        if cache is not None:
            cache[_hash_pixel(tuple(int(v) for v in out[pos - 1]),
                              cache_bits)] = tuple(int(v)
                                                   for v in out[pos - 1])
    return out.reshape(h, w, 4)


# ----------------------------------------------------------- transforms

def _avg2(a, b):
    return (a.astype(np.int32) + b.astype(np.int32)) >> 1


def _predict(mode: int, L, T, TL, TR):
    if mode == 0:
        return np.array([0, 0, 0, 255], dtype=np.int32)   # g r b a
    if mode == 1:
        return L
    if mode == 2:
        return T
    if mode == 3:
        return TR
    if mode == 4:
        return TL
    if mode == 5:
        return _avg2(_avg2(L, TR), T)
    if mode == 6:
        return _avg2(L, TL)
    if mode == 7:
        return _avg2(L, T)
    if mode == 8:
        return _avg2(TL, T)
    if mode == 9:
        return _avg2(T, TR)
    if mode == 10:
        return _avg2(_avg2(L, TL), _avg2(T, TR))
    if mode == 11:                      # Select
        p = L.astype(np.int32) + T.astype(np.int32) - TL.astype(np.int32)
        pl = np.abs(p - L).sum()
        pt = np.abs(p - T).sum()
        return L if pl < pt else T
    if mode == 12:                      # ClampAddSubtractFull
        v = L.astype(np.int32) + T.astype(np.int32) - TL.astype(np.int32)
        return np.clip(v, 0, 255)
    if mode == 13:                      # ClampAddSubtractHalf
        avg = _avg2(L, T)
        v = avg + ((avg - TL.astype(np.int32)) >> 1)
        return np.clip(v, 0, 255)
    raise ValueError(f"bad predictor mode {mode}")


def _apply_predictor_inverse(px: np.ndarray, pred_img: np.ndarray,
                             size_bits: int) -> np.ndarray:
    h, w, _ = px.shape
    out = px.astype(np.int32)
    for y in range(h):
        for x in range(w):
            if x == 0 and y == 0:
                pred = np.array([0, 0, 0, 255], dtype=np.int32)
            elif y == 0:
                pred = out[0, x - 1]
            elif x == 0:
                pred = out[y - 1, 0]
            else:
                mode = int(pred_img[y >> size_bits, x >> size_bits, _G])
                L = out[y, x - 1]
                T = out[y - 1, x]
                TL = out[y - 1, x - 1]
                # rightmost column: libwebp's contiguous row buffer makes
                # top[x+1] the CURRENT row's first (already decoded) pixel
                TR = out[y - 1, x + 1] if x + 1 < w else out[y, 0]
                pred = _predict(mode, L, T, TL, TR)
            out[y, x] = (out[y, x] + pred) & 0xFF
    return out.astype(np.uint8)


def _cdelta(t: int, c: int) -> int:
    """Color-transform delta: signed multiply of two int8, high byte."""
    t8 = t - 256 if t >= 128 else t
    c8 = c - 256 if c >= 128 else c
    return (t8 * c8) >> 5


def _apply_color_inverse(px: np.ndarray, ct_img: np.ndarray,
                         size_bits: int) -> np.ndarray:
    h, w, _ = px.shape
    out = px.astype(np.int32)
    for y in range(h):
        for x in range(w):
            el = ct_img[y >> size_bits, x >> size_bits]
            g2r, g2b, r2b = int(el[_B]), int(el[_G]), int(el[_R])
            g = int(out[y, x, _G])
            r = (int(out[y, x, _R]) + _cdelta(g2r, g)) & 0xFF
            b = (int(out[y, x, _B]) + _cdelta(g2b, g)
                 + _cdelta(r2b, r)) & 0xFF
            out[y, x, _R] = r
            out[y, x, _B] = b
    return out.astype(np.uint8)


def decode_vp8l(body: bytes) -> np.ndarray:
    """VP8L chunk payload -> (h, w, 4) uint8 RGBA."""
    if not body or body[0] != 0x2F:
        raise ValueError("bad VP8L signature")
    r = _LSBReader(body[1:])
    w = r.read_bits(14) + 1
    h = r.read_bits(14) + 1
    r.read_bit()                        # alpha-is-used hint
    if r.read_bits(3) != 0:
        raise ValueError("unknown VP8L version")

    transforms = []                     # applied in reverse order at the end
    read_w = w
    while r.read_bit():
        ttype = r.read_bits(2)
        if ttype in (0, 1):             # predictor / color transform
            size_bits = r.read_bits(3) + 2
            tw = (read_w + (1 << size_bits) - 1) >> size_bits
            th = (h + (1 << size_bits) - 1) >> size_bits
            sub = _read_entropy_image(r, tw, th, False)
            transforms.append((ttype, size_bits, sub))
        elif ttype == 2:                # subtract green
            transforms.append((2, 0, None))
        else:                           # color indexing
            n_colors = r.read_bits(8) + 1
            pal_deltas = _read_entropy_image(r, n_colors, 1, False)[0]
            palette = np.cumsum(pal_deltas.astype(np.int64),
                                axis=0).astype(np.int64) & 0xFF
            if n_colors <= 2:
                pack_bits = 3
            elif n_colors <= 4:
                pack_bits = 2
            elif n_colors <= 16:
                pack_bits = 1
            else:
                pack_bits = 0
            transforms.append((3, pack_bits, palette.astype(np.uint8)))
            read_w = (read_w + (1 << pack_bits) - 1) >> pack_bits

    px = _read_entropy_image(r, read_w, h, True)

    for ttype, arg, sub in reversed(transforms):
        if ttype == 3:                  # color indexing: unpack + lookup
            pack_bits = arg
            palette = sub
            if pack_bits:
                per = 1 << pack_bits
                width_bits = 8 >> pack_bits
                mask = (1 << width_bits) - 1
                idx = np.zeros((h, px.shape[1] * per), dtype=np.int64)
                g = px[:, :, _G].astype(np.int64)
                for i in range(per):
                    idx[:, i::per] = (g >> (i * width_bits)) & mask
                idx = idx[:, :w]
            else:
                idx = px[:, :, _G].astype(np.int64)[:, :w]
            idx = np.clip(idx, 0, len(palette) - 1)
            px = palette[idx]
        elif ttype == 2:                # add green back to r and b
            g = px[:, :, _G].astype(np.int32)
            px = px.copy()
            px[:, :, _R] = ((px[:, :, _R] + g) & 0xFF).astype(np.uint8)
            px[:, :, _B] = ((px[:, :, _B] + g) & 0xFF).astype(np.uint8)
        elif ttype == 1:
            px = _apply_color_inverse(px, sub, arg)
        else:
            px = _apply_predictor_inverse(px, sub, arg)

    rgba = np.stack([px[:, :, _R], px[:, :, _G], px[:, :, _B],
                     px[:, :, _A]], axis=2)
    return rgba


def decode_webp(data: bytes) -> np.ndarray:
    """WebP bytes -> (h, w, 3) RGB (alpha dropped) for lossless files;
    ValueError for lossy VP8 (full intra codec — out of scope here)."""
    for cid, body in _webp_chunks(bytes(data)):
        if cid == b"VP8L":
            return decode_vp8l(body)[:, :, :3]
        if cid == b"VP8 ":
            raise ValueError("lossy VP8 decode unsupported")
    raise ValueError("no decodable WebP chunk")


# --------------------------------------------------------------- encoder

class _LSBWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, n: int) -> None:
        self.acc |= (value & ((1 << n) - 1)) << self.nbits
        self.nbits += n
        while self.nbits >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def flush(self) -> bytes:
        if self.nbits:
            self.out.append(self.acc & 0xFF)
        return bytes(self.out)


def _huffman_lengths(freqs: List[int], max_len: int = 15) -> List[int]:
    """Code lengths from frequencies (package-merge-free simple Huffman;
    the fixture images here never get near the depth limit)."""
    import heapq
    live = [(f, i) for i, f in enumerate(freqs) if f]
    if not live:
        return [0] * len(freqs)
    if len(live) == 1:
        out = [0] * len(freqs)
        out[live[0][1]] = 1
        return out
    heap = [(f, [i]) for f, i in live]
    heapq.heapify(heap)
    depth = [0] * len(freqs)
    while len(heap) > 1:
        fa, syms_a = heapq.heappop(heap)
        fb, syms_b = heapq.heappop(heap)
        for s in syms_a + syms_b:
            depth[s] += 1
        heapq.heappush(heap, (fa + fb, syms_a + syms_b))
    if max(depth) > max_len:
        raise ValueError("huffman depth overflow")
    return depth


def _write_code_lengths(wtr: "_LSBWriter", lengths: List[int]) -> None:
    """Normal-code header: code-length code + symbol lengths, no RLE."""
    nz = [ln for ln in lengths if ln]
    if len(nz) == 1:
        sym = lengths.index(nz[0])
        wtr.write(1, 1)                 # simple code
        wtr.write(0, 1)                 # one symbol
        if sym < 2:
            wtr.write(0, 1)
            wtr.write(sym, 1)
        else:
            wtr.write(1, 1)
            wtr.write(sym, 8)
        return
    wtr.write(0, 1)                     # normal code
    cl_freq = [0] * 19
    for ln in lengths:
        cl_freq[ln] += 1
    cl_lengths = _huffman_lengths(cl_freq, 7)
    order_pos = {s: i for i, s in enumerate(_CL_ORDER)}
    n_cl = max(order_pos[s] for s, ln in enumerate(cl_lengths) if ln) + 1
    n_cl = max(n_cl, 4)
    wtr.write(n_cl - 4, 4)
    for i in range(n_cl):
        wtr.write(cl_lengths[_CL_ORDER[i]], 3)
    cl_codes = {}
    if sum(1 for ln in cl_lengths if ln) > 1:
        for (ln, code), sym in _canonical_codes(cl_lengths).items():
            cl_codes[sym] = (code, ln)
    # else: single-symbol CL code (every symbol shares one length) —
    # compliant readers consume ZERO bits per symbol length, so emit none
    wtr.write(0, 1)                     # no explicit max symbol
    for ln in lengths:
        entry = cl_codes.get(ln)
        if entry is None:
            continue                    # zero-bit single-symbol CL code
        code, cl = entry
        # prefix codes are written MSB-first (deflate convention)
        for b in range(cl - 1, -1, -1):
            wtr.write((code >> b) & 1, 1)


def encode_webp_lossless(px: np.ndarray) -> bytes:
    """uint8 (h, w, 3|4) or (h, w) -> lossless WebP (VP8L, literal-only,
    per-channel canonical prefix codes, no transforms)."""
    a = np.asarray(px, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    if a.shape[2] == 1:
        a = a.repeat(3, axis=2)
    h, w = a.shape[:2]
    if a.shape[2] == 3:
        alpha = np.full((h, w, 1), 255, dtype=np.uint8)
        a = np.concatenate([a, alpha], axis=2)
    wtr = _LSBWriter()
    wtr.write(w - 1, 14)
    wtr.write(h - 1, 14)
    wtr.write(1 if (a[:, :, 3] != 255).any() else 0, 1)
    wtr.write(0, 3)                     # version
    wtr.write(0, 1)                     # no more transforms
    wtr.write(0, 1)                     # no color cache
    wtr.write(0, 1)                     # no meta prefix codes

    chans = {"g": a[:, :, 1].reshape(-1), "r": a[:, :, 0].reshape(-1),
             "b": a[:, :, 2].reshape(-1), "a": a[:, :, 3].reshape(-1)}
    codes = {}
    for name, alphabet in (("g", 256 + 24), ("r", 256), ("b", 256),
                           ("a", 256)):
        freq = [0] * alphabet
        for v in chans[name]:
            freq[int(v)] += 1
        lengths = _huffman_lengths(freq)
        _write_code_lengths(wtr, lengths)
        if sum(1 for ln in lengths if ln) == 1:
            codes[name] = {}            # single-symbol code: zero bits/pixel
        else:
            codes[name] = {sym: (code, ln) for (ln, code), sym
                           in _canonical_codes(lengths).items()}
    # distance code: unused — a single-symbol simple code
    wtr.write(1, 1)
    wtr.write(0, 1)
    wtr.write(0, 1)
    wtr.write(0, 1)

    def put(tab, sym):
        entry = tab.get(int(sym))
        if entry is None:               # single-symbol code: zero bits
            return
        code, ln = entry
        for b in range(ln - 1, -1, -1):
            wtr.write((code >> b) & 1, 1)

    for g, rr, bb, aa in zip(chans["g"], chans["r"], chans["b"],
                             chans["a"]):
        put(codes["g"], g)
        put(codes["r"], rr)
        put(codes["b"], bb)
        put(codes["a"], aa)
    body = b"\x2F" + wtr.flush()
    chunk = b"VP8L" + struct.pack("<I", len(body)) + body
    if len(body) & 1:
        chunk += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk



# ------------------------------------------------- VP8 (lossy) header layer

class _VP8BoolDecoder:
    """RFC 6386 section 7 boolean entropy decoder — the table-free core.
    Every VP8 header field below decodes with explicit probabilities
    (literals at prob 128), so no spec probability tables are involved."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 2
        self.value = ((data[0] << 8) | data[1]) if len(data) >= 2 else 0
        self.range = 255
        self.bit_count = 0

    def read(self, prob: int) -> int:
        split = 1 + (((self.range - 1) * prob) >> 8)
        big_split = split << 8
        if self.value >= big_split:
            ret = 1
            self.range -= split
            self.value -= big_split
        else:
            ret = 0
            self.range = split
        while self.range < 128:
            self.value <<= 1
            self.range <<= 1
            self.bit_count += 1
            if self.bit_count == 8:
                self.bit_count = 0
                nxt = self.data[self.pos] if self.pos < len(self.data) else 0
                self.value |= nxt
                self.pos += 1
        return ret

    def literal(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read(128)
        return v

    def signed(self, n: int) -> int:
        v = self.literal(n)
        return -v if self.read(128) else v


class _VP8BoolEncoder:
    """Encoder twin (RFC 6386 section 8, carry-propagating) — builds the
    golden first partitions that pin the decoder's arithmetic in tests."""

    def __init__(self):
        self.range = 255
        self.bottom = 0
        self.bit_count = 24
        self.out = bytearray()

    def _carry(self) -> None:
        i = len(self.out) - 1
        while i >= 0 and self.out[i] == 0xFF:
            self.out[i] = 0
            i -= 1
        if i >= 0:
            self.out[i] += 1

    def write(self, prob: int, boolean: int) -> None:
        split = 1 + (((self.range - 1) * prob) >> 8)
        if boolean:
            self.bottom += split
            self.range -= split
        else:
            self.range = split
        while self.range < 128:
            self.range <<= 1
            if self.bottom & (1 << 31):
                self._carry()
            self.bottom = (self.bottom << 1) & 0xFFFFFFFF
            self.bit_count -= 1
            if self.bit_count == 0:
                self.out.append((self.bottom >> 24) & 0xFF)
                self.bottom &= (1 << 24) - 1
                self.bit_count = 8

    def literal(self, value: int, n: int) -> None:
        for i in range(n - 1, -1, -1):
            self.write(128, (value >> i) & 1)

    def signed(self, value: int, n: int) -> None:
        self.literal(abs(value), n)
        self.write(128, 1 if value < 0 else 0)

    def flush(self) -> bytes:
        # libvpx vp8_stop_encode: 32 zero bools drain the low register;
        # decoders never read past their last field, so the padding is inert
        for _ in range(32):
            self.write(128, 0)
        return bytes(self.out)


def vp8_keyframe_info(data: bytes) -> dict:
    """REAL parse of a lossy-WebP / raw-VP8 KEY FRAME's first partition
    through the quantizer indices (RFC 6386 sections 9.1-9.6) — every
    field decodable without the spec's probability tables: frame tag,
    scaled dims, color space, segmentation (modes, quantizer / loop-filter
    deltas, segment tree probs), loop filter, DCT partition count, and all
    six quantizer indices. Raises ValueError on non-keyframes / bad magic.

    ``data`` may be a full WebP container or a bare VP8 frame payload."""
    b = bytes(data)
    if b[:4] == b"RIFF":
        body = None
        for cid, chunk in _webp_chunks(b):
            if cid == b"VP8 ":
                body = chunk
                break
        if body is None:
            raise ValueError("no VP8 chunk in WebP container")
    else:
        body = b
    if len(body) < 10:
        raise ValueError("VP8 frame too short")
    tag = body[0] | (body[1] << 8) | (body[2] << 16)
    if tag & 1:
        raise ValueError("not a VP8 key frame")
    version = (tag >> 1) & 7
    show_frame = (tag >> 4) & 1
    first_part_size = tag >> 5
    if body[3:6] != b"\x9d\x01\x2a":
        raise ValueError("bad VP8 start code")
    w_raw, h_raw = struct.unpack("<HH", body[6:10])
    info = {
        "version": version, "show_frame": bool(show_frame),
        "first_partition_size": first_part_size,
        "width": w_raw & 0x3FFF, "horizontal_scale": w_raw >> 14,
        "height": h_raw & 0x3FFF, "vertical_scale": h_raw >> 14,
    }
    part = body[10:10 + first_part_size]
    if len(part) < first_part_size:
        raise ValueError("truncated VP8 first partition")
    d = _VP8BoolDecoder(part)
    info["color_space"] = d.literal(1)
    info["clamping_type"] = d.literal(1)

    seg = {"enabled": bool(d.literal(1))}
    if seg["enabled"]:
        update_map = d.literal(1)
        update_data = d.literal(1)
        if update_data:
            seg["abs_values"] = bool(d.literal(1))
            seg["quantizer_deltas"] = [
                d.signed(7) if d.literal(1) else 0 for _ in range(4)]
            seg["loop_filter_deltas"] = [
                d.signed(6) if d.literal(1) else 0 for _ in range(4)]
        if update_map:
            seg["tree_probs"] = [
                d.literal(8) if d.literal(1) else 255 for _ in range(3)]
    info["segmentation"] = seg

    info["filter_type"] = d.literal(1)
    info["filter_level"] = d.literal(6)
    info["sharpness_level"] = d.literal(3)
    if d.literal(1):                        # loop filter adjustments enabled
        if d.literal(1):                    # deltas updated this frame
            info["ref_lf_deltas"] = [
                d.signed(6) if d.literal(1) else 0 for _ in range(4)]
            info["mode_lf_deltas"] = [
                d.signed(6) if d.literal(1) else 0 for _ in range(4)]

    info["dct_partition_count"] = 1 << d.literal(2)
    info["y_ac_qi"] = d.literal(7)
    info["y_dc_delta"] = d.signed(4) if d.literal(1) else 0
    info["y2_dc_delta"] = d.signed(4) if d.literal(1) else 0
    info["y2_ac_delta"] = d.signed(4) if d.literal(1) else 0
    info["uv_dc_delta"] = d.signed(4) if d.literal(1) else 0
    info["uv_ac_delta"] = d.signed(4) if d.literal(1) else 0
    # the next fields (refresh_entropy_probs, then the token probability
    # update flags) require coeff_update_probs[4][8][3][11] to stay in
    # sync — the documented boundary of the table-free parse
    return info


def encode_vp8_keyframe_header(width: int, height: int,
                               y_ac_qi: int = 32,
                               filter_level: int = 12,
                               segmentation_quant_deltas=None) -> bytes:
    """Minimal VP8 key-frame HEADER bytes (frame tag + start code + dims +
    a first partition holding the table-free fields) — the fixture twin of
    vp8_keyframe_info, for tests and synthetic media rows. The result is a
    spec-layout header, not a decodable picture: the first partition ends
    at the quantizer/refresh fields (no macroblock data follows)."""
    e = _VP8BoolEncoder()
    e.literal(0, 1)                         # color space
    e.literal(0, 1)                         # clamping
    if segmentation_quant_deltas is None:
        e.literal(0, 1)                     # segmentation disabled
    else:
        e.literal(1, 1)                     # enabled
        e.literal(0, 1)                     # no map update
        e.literal(1, 1)                     # feature data update
        e.literal(1, 1)                     # absolute values
        for q in segmentation_quant_deltas:
            e.literal(1, 1)
            e.signed(q, 7)
        for _ in range(4):
            e.literal(0, 1)                 # no loop-filter deltas
    e.literal(0, 1)                         # filter type
    e.literal(filter_level, 6)
    e.literal(0, 3)                         # sharpness
    e.literal(0, 1)                         # no lf adjustments
    e.literal(0, 2)                         # one DCT partition
    e.literal(y_ac_qi, 7)
    for _ in range(5):
        e.literal(0, 1)                     # no quantizer deltas
    e.literal(1, 1)                         # refresh entropy probs
    part = e.flush()
    tag = (0 << 0) | (0 << 1) | (1 << 4) | (len(part) << 5)
    return (bytes([tag & 0xFF, (tag >> 8) & 0xFF, (tag >> 16) & 0xFF])
            + b"\x9d\x01\x2a"
            + struct.pack("<HH", width & 0x3FFF, height & 0x3FFF)
            + part)
