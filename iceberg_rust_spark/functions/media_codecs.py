"""Pure-stdlib media codecs backing the multimodal operators.

No external image/audio libraries exist in this environment; these kernels
are implemented from the public specs with stdlib + numpy only:

- PNG (ISO/IEC 15948): full pixel decode — chunk walk, IDAT zlib inflate,
  per-scanline unfilter (None/Sub/Up/Average/Paeth), palette expansion —
  plus a minimal encoder (filter 0 + zlib). 8-bit depth, non-interlaced;
  Adam7/16-bit raise ValueError (callers fall back to their marked stubs).
- JPEG (ITU-T T.81): baseline AND progressive decode, baseline +
  progressive encode — see the JPEG section comment below.
- WAV/RIFF PCM (public RIFF/WAVE layout): fmt/data chunk walk via struct,
  8/16-bit PCM to numpy, linear-interpolation resampling, re-encode.
- MP4 (ISO-BMFF, functions/isobmff.py) and AVI (RIFF) frame demux.

These run inside Arrow-batched mapInPandas kernels (operators/multimodal.py)
— per-batch numpy, never per-row Python in the hot loop beyond the
per-image/per-clip codec work itself.
"""

from __future__ import annotations

import struct
import zlib
from typing import List, Optional, Tuple

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes -> uint8 pixel array of shape (h, w, channels).

    Supports bit depth 8, color types 0 (gray), 2 (RGB), 3 (palette ->
    expanded to RGB), 4 (gray+alpha), 6 (RGBA), non-interlaced. Raises
    ValueError for anything else (callers stub-fallback)."""
    b = bytes(data)
    if b[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos, n = 8, len(b)
    w = h = depth = color = interlace = None
    idat = bytearray()
    palette = None
    while pos + 8 <= n:
        (length,) = struct.unpack(">I", b[pos:pos + 4])
        ctype = b[pos + 4:pos + 8]
        data_start = pos + 8
        if data_start + length > n:
            raise ValueError("truncated chunk")
        chunk = b[data_start:data_start + length]
        if ctype == b"IHDR":
            w, h, depth, color, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", chunk)
        elif ctype == b"PLTE":
            palette = np.frombuffer(chunk, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat += chunk
        elif ctype == b"IEND":
            break
        pos = data_start + length + 4  # skip CRC
    if w is None:
        raise ValueError("no IHDR")
    if depth != 8 or interlace != 0 or color not in _CHANNELS:
        raise ValueError(
            f"unsupported PNG (depth={depth} color={color} "
            f"interlace={interlace})")
    ch = _CHANNELS[color]
    raw = zlib.decompress(bytes(idat))
    stride = w * ch
    if len(raw) != h * (stride + 1):
        raise ValueError("bad IDAT length")
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        row_start = y * (stride + 1)
        ftype = raw[row_start]
        line = np.frombuffer(
            raw[row_start + 1:row_start + 1 + stride],
            dtype=np.uint8).astype(np.int32)
        if ftype == 0:          # None
            cur = line
        elif ftype == 2:        # Up — fully vectorized
            cur = (line + prev) & 0xFF
        else:                   # Sub/Average/Paeth carry a left dependency
            cur = np.empty(stride, dtype=np.int32)
            for x in range(stride):
                left = cur[x - ch] if x >= ch else 0
                up = prev[x]
                ul = prev[x - ch] if x >= ch else 0
                if ftype == 1:      # Sub
                    pred = left
                elif ftype == 3:    # Average
                    pred = (left + up) >> 1
                elif ftype == 4:    # Paeth
                    pred = _paeth(left, up, ul)
                else:
                    raise ValueError(f"bad filter type {ftype}")
                cur[x] = (line[x] + pred) & 0xFF
        out[y] = cur.astype(np.uint8)
        prev = cur
    px = out.reshape(h, w, ch)
    if color == 3:
        if palette is None:
            raise ValueError("palette image without PLTE")
        px = palette[px[:, :, 0]]
    return px


def encode_png(px: np.ndarray) -> bytes:
    """uint8 array (h, w) or (h, w, {1,2,3,4}) -> PNG bytes (filter 0)."""
    a = np.asarray(px, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, ch = a.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    raw = bytearray()
    for y in range(h):
        raw.append(0)
        raw += a[y].tobytes()

    def chunk(ctype: bytes, payload: bytes) -> bytes:
        crc = zlib.crc32(ctype + payload) & 0xFFFFFFFF
        return struct.pack(">I", len(payload)) + ctype + payload \
            + struct.pack(">I", crc)

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (_PNG_SIG + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(bytes(raw), 6))
            + chunk(b"IEND", b""))


def resize_nearest(px: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resize of (h, w, c) to (height, width, c): pure
    numpy index gather (the standard sample-at-pixel-center mapping)."""
    h, w = px.shape[:2]
    ys = np.minimum(((np.arange(height) + 0.5) * h / height).astype(int), h - 1)
    xs = np.minimum(((np.arange(width) + 0.5) * w / width).astype(int), w - 1)
    return px[ys[:, None], xs[None, :]]


def grayscale(px: np.ndarray) -> np.ndarray:
    """(h, w, c) uint8 -> (h, w) float luminance (ITU-R BT.601 weights for
    RGB/RGBA; channel 0 for gray/gray+alpha)."""
    if px.shape[2] >= 3:
        return (0.299 * px[:, :, 0] + 0.587 * px[:, :, 1]
                + 0.114 * px[:, :, 2])
    return px[:, :, 0].astype(np.float64)


def parse_wav(data: bytes) -> Tuple[int, int, np.ndarray]:
    """WAV bytes -> (sample_rate, channels, samples) where samples is an
    int16 array of shape (frames, channels). PCM 8/16-bit only."""
    b = bytes(data)
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos, n = 12, len(b)
    rate = channels = bits = None
    frames = None
    while pos + 8 <= n:
        cid = b[pos:pos + 4]
        (clen,) = struct.unpack("<I", b[pos + 4:pos + 8])
        body = b[pos + 8:pos + 8 + clen]
        if cid == b"fmt ":
            fmt, channels, rate = struct.unpack("<HHI", body[:8])
            bits = struct.unpack("<H", body[14:16])[0]
            if fmt != 1:
                raise ValueError(f"non-PCM WAV (format {fmt})")
        elif cid == b"data":
            if bits == 16:
                frames = np.frombuffer(
                    body[:clen - (clen % 2)], dtype="<i2").astype(np.int16)
            elif bits == 8:
                frames = (np.frombuffer(body, dtype=np.uint8)
                          .astype(np.int16) - 128) * 256
            else:
                raise ValueError(f"unsupported bit depth {bits}")
        pos += 8 + clen + (clen % 2)  # chunks are word-aligned
    if rate is None or frames is None:
        raise ValueError("missing fmt/data chunk")
    usable = len(frames) - (len(frames) % channels)
    return int(rate), int(channels), frames[:usable].reshape(-1, channels)


def encode_wav(rate: int, samples: np.ndarray) -> bytes:
    """(frames, channels) int16 -> 16-bit PCM WAV bytes."""
    a = np.asarray(samples, dtype="<i2")
    if a.ndim == 1:
        a = a[:, None]
    channels = a.shape[1]
    data = a.tobytes()
    fmt = struct.pack("<HHIIHH", 1, channels, rate, rate * channels * 2,
                      channels * 2, 16)
    body = (b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def extract_avi_frames(data: bytes, every_n: int = 1):
    """AVI (RIFF) bytes -> [(frame_no, encoded_frame_bytes)] for every Nth
    video frame — the public Microsoft 'AVI RIFF File Reference' layout:
    LIST/hdrl stream headers name the video stream, LIST/movi holds one
    '##dc'/'##db' chunk per frame (word-aligned), so frame boundaries come
    straight from the container with zero codec work. 'rec ' groups are
    recursed. Sibling of the MP4 demux in isobmff.py."""
    b = bytes(data)
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI file")

    def chunks(start: int, end: int):
        pos = start
        while pos + 8 <= end:
            cid = b[pos:pos + 4]
            (clen,) = struct.unpack("<I", b[pos + 4:pos + 8])
            if pos + 8 + clen > end:
                raise ValueError("truncated AVI chunk")
            yield cid, pos + 8, pos + 8 + clen
            pos += 8 + clen + (clen % 2)

    # find the video stream's index from the hdrl stream list order
    video_stream, stream_idx = None, 0
    movi: Optional[Tuple[int, int]] = None
    for cid, s, e in chunks(12, len(b)):
        if cid != b"LIST":
            continue
        ltype = b[s:s + 4]
        if ltype == b"hdrl":
            for cid2, s2, e2 in chunks(s + 4, e):
                if cid2 == b"LIST" and b[s2:s2 + 4] == b"strl":
                    for cid3, s3, e3 in chunks(s2 + 4, e2):
                        if cid3 == b"strh":
                            if b[s3:s3 + 4] == b"vids" and video_stream is None:
                                video_stream = stream_idx
                            stream_idx += 1
                            break
        elif ltype == b"movi":
            movi = (s + 4, e)
    if movi is None:
        raise ValueError("AVI without movi list")
    prefix = f"{video_stream or 0:02d}".encode()

    frames: List[bytes] = []

    def walk(start: int, end: int) -> None:
        for cid, s, e in chunks(start, end):
            if cid == b"LIST" and b[s:s + 4] == b"rec ":
                walk(s + 4, e)
            elif cid[:2] == prefix and cid[2:4] in (b"dc", b"db"):
                frames.append(b[s:e])

    walk(*movi)
    return [(i, f) for i, f in enumerate(frames)][::max(1, every_n)]


def encode_avi(frames: List[bytes], fps: int = 10, width: int = 64,
               height: int = 64) -> bytes:
    """Build a minimal valid single-video-stream AVI holding ``frames`` as
    '00dc' chunks, with a correct idx1 index — gives extract_avi_frames
    non-circular structural coverage and the operators a second real
    container fixture next to encode_mp4."""
    if not frames:
        raise ValueError("need at least one frame")

    def chunk(cid: bytes, payload: bytes) -> bytes:
        return (cid + struct.pack("<I", len(payload)) + payload
                + (b"\x00" if len(payload) % 2 else b""))

    def lst(ltype: bytes, payload: bytes) -> bytes:
        return chunk(b"LIST", ltype + payload)

    n = len(frames)
    max_size = max(len(f) for f in frames)
    avih = struct.pack("<14I", 1_000_000 // fps, max_size * fps, 0,
                       0x10,                    # AVIF_HASINDEX
                       n, 0, 1, max_size, width, height, 0, 0, 0, 0)
    strh = (b"vids" + bytes(4)                  # handler unset: raw payload
            + struct.pack("<IHHIIIIIIIi", 0, 0, 0, 0, 1, fps, 0, n,
                          max_size, 0, 0)
            + struct.pack("<4h", 0, 0, width, height))
    strf = struct.pack("<IiiHH4sIiiII", 40, width, height, 1, 24, b"\x00" * 4,
                       width * height * 3, 0, 0, 0, 0)
    hdrl = lst(b"hdrl", chunk(b"avih", avih)
               + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))

    movi_payload = b"movi"
    idx_entries = []
    for f in frames:
        # idx1 offsets are measured from the 'movi' fourcc position
        # (first chunk lands at offset 4)
        idx_entries.append((len(movi_payload), len(f)))
        movi_payload += chunk(b"00dc", f)
    movi = chunk(b"LIST", movi_payload)
    idx1 = chunk(b"idx1", b"".join(
        b"00dc" + struct.pack("<III", 0x10, off, size)
        for off, size in idx_entries))
    body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(body)) + body


def resample_linear(samples: np.ndarray, rate_in: int,
                    rate_out: int) -> np.ndarray:
    """Linear-interpolation resample of (frames, channels) int16 from
    rate_in to rate_out (np.interp per channel on the time grid)."""
    a = np.asarray(samples)
    if a.ndim == 1:
        a = a[:, None]
    n_in = a.shape[0]
    if n_in == 0 or rate_in == rate_out:
        return a.astype(np.int16)
    n_out = max(1, int(round(n_in * rate_out / rate_in)))
    t_in = np.arange(n_in, dtype=np.float64) / rate_in
    t_out = np.arange(n_out, dtype=np.float64) / rate_out
    out = np.stack([np.interp(t_out, t_in, a[:, c].astype(np.float64))
                    for c in range(a.shape[1])], axis=1)
    return np.clip(np.rint(out), -32768, 32767).astype(np.int16)


# ---------------------------------------------------------------------------
# JPEG (ITU-T T.81, public spec), Huffman coding. Decoder handles 8-bit
# baseline (SOF0/1: any JFIF chroma subsampling, restart intervals) and
# progressive (SOF2, Annex G: spectral selection + successive approximation,
# EOB runs, per-scan table redefinition, restart intervals); arithmetic /
# lossless / 12-bit variants raise ValueError and callers keep their marked
# stub fallback. Encoders emit baseline (4:4:4 or 4:2:0, Annex-K example
# tables quality-scaled by the public IJG formula) and progressive 4:4:4
# (classic web scan script; a flat custom AC table carries the EOBn symbols
# Annex-K tables lack). Entropy coding is per-symbol Python (images here are
# small fixtures); the IDCT/DCT/color math is batched numpy over all blocks.
# ---------------------------------------------------------------------------

_ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63], dtype=np.int64)

# Annex K example quantization tables (raster order)
_Q_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99], dtype=np.int64)
_Q_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99], dtype=np.int64)

# Annex K typical Huffman tables: (BITS counts for lengths 1..16, HUFFVAL)
_DC_LUMA_BITS = bytes([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0])
_DC_LUMA_VALS = bytes(range(12))
_DC_CHROMA_BITS = bytes([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0])
_DC_CHROMA_VALS = bytes(range(12))
_AC_LUMA_BITS = bytes([0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D])
_AC_LUMA_VALS = bytes([
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA])
_AC_CHROMA_BITS = bytes([0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77])
_AC_CHROMA_VALS = bytes([
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA])


def _dct_basis() -> np.ndarray:
    """8x8 orthonormal DCT-II basis C: forward DCT = C @ B @ C.T,
    inverse = C.T @ B @ C."""
    x = np.arange(8)
    u = x[:, None]
    c = np.cos((2 * x[None, :] + 1) * u * np.pi / 16) / 2.0
    c[0, :] *= 1 / np.sqrt(2)
    return c


_DCT_C = _dct_basis()


def _huff_decode_table(bits: bytes, vals: bytes) -> dict:
    """Canonical Huffman: {(length, code): symbol}."""
    table, code, k = {}, 0, 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            table[(ln, code)] = vals[k]
            k += 1
            code += 1
        code <<= 1
    return table


def _huff_encode_table(bits: bytes, vals: bytes) -> dict:
    """Canonical Huffman: {symbol: (code, length)}."""
    table, code, k = {}, 0, 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            table[vals[k]] = (code, ln)
            k += 1
            code += 1
        code <<= 1
    return table


class _BitReader:
    """MSB-first reader over unstuffed entropy-coded bytes."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.bit = 0

    def read_bit(self) -> int:
        if self.pos >= len(self.data):
            raise ValueError("entropy data exhausted")
        b = (self.data[self.pos] >> (7 - self.bit)) & 1
        self.bit += 1
        if self.bit == 8:
            self.bit = 0
            self.pos += 1
        return b

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def read_symbol(self, table: dict) -> int:
        code, ln = 0, 0
        while ln < 16:
            code = (code << 1) | self.read_bit()
            ln += 1
            sym = table.get((ln, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code")


def _extend(v: int, size: int) -> int:
    """T.81 EXTEND: map the `size`-bit magnitude bits to a signed value."""
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def _entropy_segments(b: bytes, j: int):
    """Entropy-coded data starting at ``j``: unstuff FF00, split at RSTn,
    skip FF fill bytes; stop at any real marker. Returns (segments,
    index_of_next_marker)."""
    n = len(b)
    segments = []
    cur = bytearray()
    while j < n:
        if b[j] == 0xFF and j + 1 < n:
            m = b[j + 1]
            if m == 0x00:
                cur.append(0xFF)
                j += 2
                continue
            if 0xD0 <= m <= 0xD7:               # RSTn
                segments.append(bytes(cur))
                cur = bytearray()
                j += 2
                continue
            if m == 0xFF:                       # fill byte
                j += 1
                continue
            break                               # real marker (EOI/SOS/DHT/..)
        cur.append(b[j])
        j += 1
    segments.append(bytes(cur))
    return segments, j


def _block_baseline(reader: "_BitReader", coef: np.ndarray, pred: int,
                    dc_tab: dict, ac_tab: dict) -> int:
    """Sequential full-block decode (T.81 F.2.2); returns new DC pred."""
    s = reader.read_symbol(dc_tab)
    pred += _extend(reader.read_bits(s), s)
    coef[0] = pred
    k = 1
    while k < 64:
        rs = reader.read_symbol(ac_tab)
        r, s = rs >> 4, rs & 0xF
        if s == 0:
            if r == 15:                         # ZRL
                k += 16
                continue
            break                               # EOB
        k += r
        if k > 63:
            raise ValueError("AC run past block end")
        coef[k] = _extend(reader.read_bits(s), s)
        k += 1
    return pred


def _block_ac_first(reader: "_BitReader", coef: np.ndarray, ss: int, se: int,
                    al: int, ac_tab: dict, eobrun: int) -> int:
    """Progressive AC first pass for one block (T.81 G.1.2.2 / libjpeg
    decode_mcu_AC_first); returns the updated EOB run."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = reader.read_symbol(ac_tab)
        r, s = rs >> 4, rs & 0xF
        if s:
            k += r
            if k > se:
                raise ValueError("AC run past band end")
            coef[k] = _extend(reader.read_bits(s), s) << al
            k += 1
        else:
            if r != 15:                         # EOBn
                eobrun = (1 << r) - 1
                if r:
                    eobrun += reader.read_bits(r)
                break
            k += 16                             # ZRL
    return eobrun


def _block_ac_refine(reader: "_BitReader", coef: np.ndarray, ss: int,
                     se: int, al: int, ac_tab: dict, eobrun: int) -> int:
    """Progressive AC refinement for one block (T.81 G.1.2.3 / libjpeg
    decode_mcu_AC_refine): newly significant coefficients arrive as
    (run,1) symbols; every nonzero-history coefficient passed over eats
    one correction bit. Returns the updated EOB run."""
    p1 = 1 << al
    m1 = -p1
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = reader.read_symbol(ac_tab)
            r, s = rs >> 4, rs & 0xF
            val = 0
            if s == 0:
                if r != 15:                     # EOBn: rest of band below
                    eobrun = 1 << r
                    if r:
                        eobrun += reader.read_bits(r)
                    break
                # r == 15: ZRL — skip 16 zero-history coefficients
            else:
                if s != 1:
                    raise ValueError("refinement scan with size > 1")
                val = p1 if reader.read_bit() else m1
            while k <= se:
                c = int(coef[k])
                if c != 0:
                    if reader.read_bit():
                        if (c & p1) == 0:       # not corrected this pass yet
                            coef[k] = c + (p1 if c >= 0 else m1)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if val and k <= se:
                coef[k] = val
            k += 1
    if eobrun > 0:
        # whole-band EOB: correction bits for remaining history coeffs
        while k <= se:
            c = int(coef[k])
            if c != 0 and reader.read_bit():
                if (c & p1) == 0:
                    coef[k] = c + (p1 if c >= 0 else m1)
            k += 1
        eobrun -= 1
    return eobrun


def decode_jpeg(data: bytes) -> np.ndarray:
    """JPEG bytes -> uint8 pixels (h, w, 3) RGB, or (h, w, 1) for
    grayscale. Handles 8-bit baseline (SOF0/1) AND progressive (SOF2,
    T.81 Annex G: spectral selection + successive approximation, EOB
    runs, restart intervals). ValueError on arithmetic/lossless/12-bit
    variants."""
    b = bytes(data)
    if b[:2] != b"\xFF\xD8":
        raise ValueError("not a JPEG")
    qtables: dict = {}
    dc_tabs: dict = {}
    ac_tabs: dict = {}
    comps = None       # [(cid, h, v, tq)]
    w = h = None
    restart_interval = 0
    progressive = False
    planes = None
    geom = None        # (hmax, vmax, mcus_x, mcus_y, comp_blocks)
    i = 2
    n = len(b)
    while i + 2 <= n:
        if b[i] != 0xFF:
            raise ValueError("marker expected")
        marker = b[i + 1]
        if marker == 0xFF:                      # fill byte
            i += 1
            continue
        if marker == 0xD9:
            break
        seg_len = struct.unpack(">H", b[i + 2:i + 4])[0]
        seg = b[i + 4:i + 2 + seg_len]
        if marker == 0xDB:                      # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0xF
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                tbl = np.frombuffer(seg[p + 1:p + 65], dtype=np.uint8) \
                    .astype(np.int64)
                raster = np.empty(64, dtype=np.int64)
                raster[_ZIGZAG] = tbl           # stored in zigzag order
                qtables[tq] = raster
                p += 65
        elif marker == 0xC4:                    # DHT (may redefine mid-file)
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0xF
                bits = seg[p + 1:p + 17]
                cnt = sum(bits)
                vals = seg[p + 17:p + 17 + cnt]
                tab = _huff_decode_table(bits, vals)
                (dc_tabs if tc == 0 else ac_tabs)[th] = tab
                p += 17 + cnt
        elif marker in (0xC0, 0xC1, 0xC2):      # SOF0/1 baseline, SOF2 prog
            progressive = marker == 0xC2
            prec = seg[0]
            if prec != 8:
                raise ValueError(f"{prec}-bit JPEG unsupported")
            h, w = struct.unpack(">HH", seg[1:5])
            nc = seg[5]
            comps = []
            for ci in range(nc):
                cid = seg[6 + 3 * ci]
                hv = seg[7 + 3 * ci]
                comps.append((cid, hv >> 4, hv & 0xF, seg[8 + 3 * ci]))
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise ValueError("arithmetic/lossless JPEG unsupported")
        elif marker == 0xDD:                    # DRI
            restart_interval = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDA:                    # SOS: decode one scan
            if comps is None:
                raise ValueError("SOS before SOF")
            if planes is None:
                hmax = max(c[1] for c in comps)
                vmax = max(c[2] for c in comps)
                mcus_x = (w + 8 * hmax - 1) // (8 * hmax)
                mcus_y = (h + 8 * vmax - 1) // (8 * vmax)
                planes = []
                comp_blocks = []                # non-interleaved grid sizes
                for cid, ch_, cv, tq in comps:
                    planes.append(np.zeros((mcus_y * cv, mcus_x * ch_, 64),
                                           dtype=np.int64))
                    cw = (w * ch_ + hmax - 1) // hmax
                    chh = (h * cv + vmax - 1) // vmax
                    comp_blocks.append(((chh + 7) // 8, (cw + 7) // 8))
                geom = (hmax, vmax, mcus_x, mcus_y, comp_blocks)
            ns = seg[0]
            scan = []
            for si in range(ns):
                cs = seg[1 + 2 * si]
                tt = seg[2 + 2 * si]
                scan.append((cs, tt >> 4, tt & 0xF))
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            ahal = seg[3 + 2 * ns]
            ah, al = ahal >> 4, ahal & 0xF
            segments, i = _entropy_segments(b, i + 2 + seg_len)
            _decode_scan(planes, segments, comps, scan, ss, se, ah, al,
                         dc_tabs, ac_tabs, restart_interval, geom,
                         progressive)
            continue
        i += 2 + seg_len
    if planes is None:
        raise ValueError("missing SOF/SOS")

    hmax, vmax = geom[0], geom[1]
    # dequantize + inverse zigzag + batched IDCT per component
    out_planes = []
    for ci, (cid, ch_, cv, tq) in enumerate(comps):
        q = qtables[tq]
        zz = planes[ci].reshape(-1, 64)
        raster = np.zeros_like(zz)
        raster[:, _ZIGZAG] = zz                 # de-zigzag BEFORE dequant:
        blocks = raster * q[np.newaxis, :]      # q is raster-ordered
        bmat = blocks.reshape(-1, 8, 8).astype(np.float64)
        pix = np.einsum("ux,nuv,vy->nxy", _DCT_C, bmat, _DCT_C) + 128.0
        by_, bx_ = planes[ci].shape[:2]
        plane = pix.reshape(by_, bx_, 8, 8).transpose(0, 2, 1, 3) \
            .reshape(by_ * 8, bx_ * 8)
        # upsample to full MCU-grid resolution, crop to (h, w)
        plane = np.repeat(np.repeat(plane, vmax // cv, axis=0),
                          hmax // ch_, axis=1)
        out_planes.append(plane[:h, :w])
    pix = np.stack(out_planes, axis=2)
    if pix.shape[2] == 1:
        return np.clip(np.rint(pix), 0, 255).astype(np.uint8)
    if pix.shape[2] != 3:
        raise ValueError(f"{pix.shape[2]}-component JPEG unsupported")
    y, cb, cr = pix[:, :, 0], pix[:, :, 1] - 128.0, pix[:, :, 2] - 128.0
    rgb = np.stack([y + 1.402 * cr,
                    y - 0.344136 * cb - 0.714136 * cr,
                    y + 1.772 * cb], axis=2)
    return np.clip(np.rint(rgb), 0, 255).astype(np.uint8)


def _decode_scan(planes, segments, comps, scan, ss, se, ah, al,
                 dc_tabs, ac_tabs, restart_interval, geom,
                 progressive) -> None:
    """Decode one scan's entropy data into the coefficient planes.

    Sequential scans carry full blocks; progressive scans dispatch on
    (spectral band, successive-approximation stage) per T.81 G.1.2.
    Interleaved scans walk the MCU grid; single-component scans walk the
    component's own block grid (non-interleaved, T.81 A.2.2)."""
    hmax, vmax, mcus_x, mcus_y, comp_blocks = geom
    if progressive:
        # T.81 G.1.1.1: a DC scan is exactly the 0..0 band; AC scans carry
        # one component. A "baseline-shaped" scan inside SOF2 is malformed.
        if ss == 0 and se != 0:
            raise ValueError("invalid progressive scan band (Ss=0, Se!=0)")
        if ss > 0 and len(scan) != 1:
            raise ValueError("interleaved progressive AC scan")
    scan_by_comp = {cs: (td, ta) for cs, td, ta in scan}
    scan_cis = [ci for ci, c in enumerate(comps) if c[0] in scan_by_comp]
    if len(scan_cis) != len(scan):
        raise ValueError("scan references unknown component")
    interleaved = len(scan) > 1

    seg_idx = 0
    reader = _BitReader(segments[0])
    preds = {ci: 0 for ci in scan_cis}
    eobrun = 0
    unit_count = 0                              # MCUs, or blocks if ns == 1

    def maybe_restart():
        nonlocal seg_idx, reader, preds, eobrun
        if (restart_interval and unit_count
                and unit_count % restart_interval == 0):
            seg_idx += 1
            if seg_idx >= len(segments):
                raise ValueError("missing restart segment")
            reader = _BitReader(segments[seg_idx])
            preds = {ci: 0 for ci in scan_cis}
            eobrun = 0

    def decode_block(ci: int, gy: int, gx: int) -> None:
        nonlocal eobrun
        coef = planes[ci][gy, gx]
        td, ta = scan_by_comp[comps[ci][0]]
        if not progressive:
            preds[ci] = _block_baseline(reader, coef, preds[ci],
                                        dc_tabs[td], ac_tabs[ta])
        elif ss == 0:                           # DC scan (se must be 0)
            if ah == 0:
                s = reader.read_symbol(dc_tabs[td])
                preds[ci] += _extend(reader.read_bits(s), s)
                coef[0] = preds[ci] << al
            else:                               # refinement: one raw bit
                if reader.read_bit():
                    coef[0] = int(coef[0]) | (1 << al)
        else:                                   # AC scan
            if ah == 0:
                eobrun = _block_ac_first(reader, coef, ss, se, al,
                                         ac_tabs[ta], eobrun)
            else:
                eobrun = _block_ac_refine(reader, coef, ss, se, al,
                                          ac_tabs[ta], eobrun)

    if interleaved:
        for my in range(mcus_y):
            for mx in range(mcus_x):
                maybe_restart()
                for ci in scan_cis:
                    _, ch_, cv, _ = comps[ci]
                    for by in range(cv):
                        for bx in range(ch_):
                            decode_block(ci, my * cv + by, mx * ch_ + bx)
                unit_count += 1
    else:
        ci = scan_cis[0]
        bh, bw = comp_blocks[ci]
        for by in range(bh):
            for bx in range(bw):
                maybe_restart()
                decode_block(ci, by, bx)
                unit_count += 1


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)           # byte stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def restart(self, n: int) -> None:
        """Byte-align (1-fill) and emit RSTn — no stuffing after a marker."""
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)
        self.out += bytes([0xFF, 0xD0 + (n & 7)])

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)     # 1-fill per T.81 F.1.2.3
        return bytes(self.out)


def _quality_scale(base: np.ndarray, quality: int) -> np.ndarray:
    """Public IJG quality scaling of the Annex-K tables."""
    q = min(max(int(quality), 1), 100)
    scale = 5000 // q if q < 50 else 200 - 2 * q
    return np.clip((base * scale + 50) // 100, 1, 255).astype(np.int64)


def _mag_bits(v: int):
    """(size, magnitude-bits) for a signed coefficient (T.81 F.1.2.1)."""
    if v == 0:
        return 0, 0
    a = abs(v)
    size = a.bit_length()
    bits = v if v > 0 else v + (1 << size) - 1
    return size, bits


def _block_zigzag(chan: np.ndarray, q: np.ndarray, bh: int,
                  bw: int) -> np.ndarray:
    """Pad a channel plane to (bh*8, bw*8), DCT+quantize every 8x8 block
    (batched numpy), return zigzag coefficients of shape (bh, bw, 64)."""
    h, w = chan.shape
    padded = np.empty((bh * 8, bw * 8), dtype=np.float64)
    padded[:h, :w] = chan
    padded[h:, :w] = chan[-1:, :]               # edge-replicate pad
    padded[:, w:] = padded[:, w - 1:w]
    blocks = padded.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3) \
        .reshape(-1, 8, 8) - 128.0
    coef = np.einsum("ux,nxy,vy->nuv", _DCT_C, blocks, _DCT_C)
    qz = np.rint(coef.reshape(-1, 64) / q[np.newaxis, :]).astype(np.int64)
    return qz[:, _ZIGZAG].reshape(bh, bw, 64)


def _emit_block(writer: "_BitWriter", zz: np.ndarray, pred: int,
                dc_tab: dict, ac_tab: dict) -> int:
    """Huffman-encode one zigzag block; returns the new DC predictor."""
    diff = int(zz[0]) - pred
    size, bits = _mag_bits(diff)
    code, ln = dc_tab[size]
    writer.write(code, ln)
    if size:
        writer.write(bits, size)
    nz = np.flatnonzero(zz[1:])
    prev = 0
    for k in nz:
        run = int(k) - prev
        prev = int(k) + 1
        while run > 15:
            code, ln = ac_tab[0xF0]
            writer.write(code, ln)              # ZRL
            run -= 16
        size, bits = _mag_bits(int(zz[1 + k]))
        code, ln = ac_tab[(run << 4) | size]
        writer.write(code, ln)
        writer.write(bits, size)
    if prev < 63:
        code, ln = ac_tab[0x00]                 # EOB
        writer.write(code, ln)
    return int(zz[0])


def encode_jpeg(px: np.ndarray, quality: int = 90,
                subsampling: str = "444", restart_interval: int = 0) -> bytes:
    """uint8 (h, w, 3) RGB or (h, w)/(h, w, 1) gray -> baseline JPEG
    (Annex-K tables quality-scaled; 4:4:4 or 4:2:0 chroma; optional DRI
    restart markers)."""
    a = np.asarray(px, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, nc = a.shape
    if nc == 3:
        r, g, bch = (a[:, :, c].astype(np.float64) for c in range(3))
        y = 0.299 * r + 0.587 * g + 0.114 * bch
        cb = -0.168736 * r - 0.331264 * g + 0.5 * bch + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * bch + 128.0
        channels = [y, cb, cr]
    elif nc == 1:
        channels = [a[:, :, 0].astype(np.float64)]
    else:
        raise ValueError(f"cannot encode {nc}-channel image as JPEG")
    if subsampling not in ("444", "420"):
        raise ValueError(f"unsupported subsampling {subsampling!r}")
    sub420 = subsampling == "420" and nc == 3

    qy = _quality_scale(_Q_LUMA, quality)
    qc = _quality_scale(_Q_CHROMA, quality)
    dc_enc = [_huff_encode_table(_DC_LUMA_BITS, _DC_LUMA_VALS),
              _huff_encode_table(_DC_CHROMA_BITS, _DC_CHROMA_VALS)]
    ac_enc = [_huff_encode_table(_AC_LUMA_BITS, _AC_LUMA_VALS),
              _huff_encode_table(_AC_CHROMA_BITS, _AC_CHROMA_VALS)]

    if sub420:
        # luma MCU = 2x2 blocks; chroma planes 2x2-averaged to half size
        mcus_x, mcus_y = (w + 15) // 16, (h + 15) // 16
        samp = [(2, 2), (1, 1), (1, 1)]
        ch2 = (w + 1) // 2, (h + 1) // 2
        half = []
        for c in channels[1:]:
            ph, pw = (h + 1) // 2 * 2, (w + 1) // 2 * 2
            p = np.empty((ph, pw), dtype=np.float64)
            p[:h, :w] = c
            p[h:, :w] = c[-1:, :]
            p[:, w:] = p[:, w - 1:w]
            half.append(p.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3)))
        plane_zz = [_block_zigzag(channels[0], qy, mcus_y * 2, mcus_x * 2)]
        plane_zz += [_block_zigzag(c, qc, mcus_y, mcus_x) for c in half]
    else:
        mcus_x, mcus_y = (w + 7) // 8, (h + 7) // 8
        samp = [(1, 1)] * len(channels)
        plane_zz = [_block_zigzag(c, qy if ci == 0 else qc, mcus_y, mcus_x)
                    for ci, c in enumerate(channels)]

    writer = _BitWriter()
    preds = [0] * len(channels)
    mcu_count = 0
    rst_n = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if (restart_interval and mcu_count
                    and mcu_count % restart_interval == 0):
                writer.restart(rst_n)
                rst_n = (rst_n + 1) & 7
                preds = [0] * len(channels)
            for ci in range(len(channels)):
                sh, sv = samp[ci]
                tsel = 0 if ci == 0 else 1
                for by in range(sv):
                    for bx in range(sh):
                        zz = plane_zz[ci][my * sv + by, mx * sh + bx]
                        preds[ci] = _emit_block(writer, zz, preds[ci],
                                                dc_enc[tsel], ac_enc[tsel])
            mcu_count += 1
    entropy = writer.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload

    out = bytearray(b"\xFF\xD8")
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xDB, bytes([0]) + bytes(qy[_ZIGZAG].astype(np.uint8)))
    if len(channels) == 3:
        out += seg(0xDB, bytes([1]) + bytes(qc[_ZIGZAG].astype(np.uint8)))
    sof = bytearray(struct.pack(">BHHB", 8, h, w, len(channels)))
    for ci in range(len(channels)):
        sh, sv = samp[ci]
        sof += bytes([ci + 1, (sh << 4) | sv, 0 if ci == 0 else 1])
    out += seg(0xC0, bytes(sof))
    out += seg(0xC4, bytes([0x00]) + _DC_LUMA_BITS + _DC_LUMA_VALS)
    out += seg(0xC4, bytes([0x10]) + _AC_LUMA_BITS + _AC_LUMA_VALS)
    if len(channels) == 3:
        out += seg(0xC4, bytes([0x01]) + _DC_CHROMA_BITS + _DC_CHROMA_VALS)
        out += seg(0xC4, bytes([0x11]) + _AC_CHROMA_BITS + _AC_CHROMA_VALS)
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytearray([len(channels)])
    for ci in range(len(channels)):
        sos += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
    sos += b"\x00\x3F\x00"
    out += seg(0xDA, bytes(sos))
    out += entropy
    out += b"\xFF\xD9"
    return bytes(out)


# ---------------------------------------------------------------------------
# Progressive JPEG encoder (T.81 Annex G, Huffman): spectral selection +
# successive approximation, the scan script shape web encoders emit. AC
# scans use one flat custom Huffman table that includes the EOBn symbols
# (the Annex-K example tables define only EOB0/ZRL, so real EOB runs need
# their own DHT — every progressive encoder ships per-scan tables).
# ---------------------------------------------------------------------------

# all (run, size) symbols an AC-first/refine scan can emit, plus EOBn for
# runs up to 2^7-ish and ZRL; one shared canonical table, every code 9 bits
_AC_PROG_VALS = bytes(
    [(r << 4) | s for r in range(16) for s in range(1, 11)]
    + [r << 4 for r in range(8)]                # EOB0..EOB7 (run <= 255)
    + [0xF0])                                   # ZRL
_AC_PROG_BITS = bytes([0] * 8 + [len(_AC_PROG_VALS)] + [0] * 7)


def _emit_eobrun(writer: "_BitWriter", ac_tab: dict, eobrun: int) -> int:
    """Flush a pending EOB run (T.81 G.1.2.2): EOBn symbol + n extension
    bits. Returns 0 (the cleared run)."""
    while eobrun > 0:
        run = min(eobrun, 255)
        r = run.bit_length() - 1
        code, ln = ac_tab[r << 4]
        writer.write(code, ln)
        if r:
            writer.write(run - (1 << r), r)
        eobrun -= run
    return 0


def _emit_ac_first_block(writer: "_BitWriter", zz: np.ndarray, ss: int,
                         se: int, al: int, ac_tab: dict,
                         eobrun: int) -> int:
    """AC first pass for one block; batches all-zero bands into EOB runs."""
    band = zz[ss:se + 1]
    sh = np.sign(band) * (np.abs(band) >> al)   # point transform
    nz = np.flatnonzero(sh)
    if nz.size == 0:
        return eobrun + 1
    eobrun = _emit_eobrun(writer, ac_tab, eobrun)
    prev = 0
    for k in nz:
        run = int(k) - prev
        prev = int(k) + 1
        while run > 15:
            code, ln = ac_tab[0xF0]
            writer.write(code, ln)
            run -= 16
        size, bits = _mag_bits(int(sh[k]))
        code, ln = ac_tab[(run << 4) | size]
        writer.write(code, ln)
        writer.write(bits, size)
    if prev < len(band):
        eobrun += 1                             # trailing zeros: EOB run
    return eobrun


def _emit_ac_refine_block(writer: "_BitWriter", zz: np.ndarray, ss: int,
                          se: int, al: int, ac_tab: dict, eobrun: int,
                          pending: list) -> int:
    """AC refinement for one block (T.81 G.1.2.3, libjpeg
    encode_mcu_AC_refine shape): newly significant coefficients
    (|c|>>al == 1) as (run,1)+sign symbols; one correction bit per history
    coefficient passed over, flushed immediately after the symbol that
    crosses it (the decoder reads them during its position walk). ZRLs are
    emitted on encountering ANY nonzero — zeros past the last new
    coefficient fold into the EOB run instead. ``pending`` carries bits
    owed across an EOB run spanning blocks."""
    band = zz[ss:se + 1]
    absv = np.abs(band) >> al
    new_pos = np.flatnonzero(absv == 1)
    eob = int(new_pos[-1]) if new_pos.size else -1

    def flush_eob():
        nonlocal eobrun
        if eobrun:
            eobrun = _emit_eobrun(writer, ac_tab, eobrun)
            for bit in pending:
                writer.write(bit, 1)
            pending.clear()

    r = 0
    br: list = []               # correction bits since the last symbol
    for k in range(len(band)):
        t = int(absv[k])
        if t == 0:
            r += 1
            continue
        while r > 15 and k <= eob:              # ZRL (not foldable in EOB)
            flush_eob()
            code, ln = ac_tab[0xF0]
            writer.write(code, ln)
            r -= 16
            for bit in br:
                writer.write(bit, 1)
            br.clear()
        if t > 1:                               # history: buffer its bit
            br.append(t & 1)
            continue
        # newly significant
        flush_eob()
        code, ln = ac_tab[(r << 4) | 1]
        writer.write(code, ln)
        writer.write(1 if band[k] > 0 else 0, 1)
        for bit in br:
            writer.write(bit, 1)
        br.clear()
        r = 0
    if r > 0 or br:
        eobrun += 1                             # rest of band folds into EOB
        pending.extend(br)
    return eobrun


def encode_jpeg_progressive(px: np.ndarray, quality: int = 90) -> bytes:
    """uint8 (h, w, 3) RGB or (h, w)/(h, w, 1) gray -> progressive JPEG
    (4:4:4; DC first+refine, per-component AC bands 1-5 / 6-63 at Al=2
    refined to 1 then 0 — the classic web scan script shape). Decodes to
    bit-identical coefficients vs the baseline encoder at the same
    quality."""
    a = np.asarray(px, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, nc = a.shape
    if nc == 3:
        r, g, bch = (a[:, :, c].astype(np.float64) for c in range(3))
        y = 0.299 * r + 0.587 * g + 0.114 * bch
        cb = -0.168736 * r - 0.331264 * g + 0.5 * bch + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * bch + 128.0
        channels = [y, cb, cr]
    elif nc == 1:
        channels = [a[:, :, 0].astype(np.float64)]
    else:
        raise ValueError(f"cannot encode {nc}-channel image as JPEG")

    qy = _quality_scale(_Q_LUMA, quality)
    qc = _quality_scale(_Q_CHROMA, quality)
    mcus_x, mcus_y = (w + 7) // 8, (h + 7) // 8
    plane_zz = [_block_zigzag(c, qy if ci == 0 else qc, mcus_y, mcus_x)
                for ci, c in enumerate(channels)]
    ncomp = len(channels)

    dc_enc = [_huff_encode_table(_DC_LUMA_BITS, _DC_LUMA_VALS),
              _huff_encode_table(_DC_CHROMA_BITS, _DC_CHROMA_VALS)]
    ac_prog = _huff_encode_table(_AC_PROG_BITS, _AC_PROG_VALS)

    def dc_first_scan(al: int) -> bytes:
        writer = _BitWriter()
        preds = [0] * ncomp
        for my in range(mcus_y):
            for mx in range(mcus_x):
                for ci in range(ncomp):
                    v = int(plane_zz[ci][my, mx, 0]) >> al
                    size, bits = _mag_bits(v - preds[ci])
                    code, ln = dc_enc[0 if ci == 0 else 1][size]
                    writer.write(code, ln)
                    if size:
                        writer.write(bits, size)
                    preds[ci] = v
        return writer.flush()

    def dc_refine_scan(al: int) -> bytes:
        writer = _BitWriter()
        for my in range(mcus_y):
            for mx in range(mcus_x):
                for ci in range(ncomp):
                    writer.write((int(plane_zz[ci][my, mx, 0]) >> al) & 1, 1)
        return writer.flush()

    def ac_scan(ci: int, ss: int, se: int, ah: int, al: int) -> bytes:
        writer = _BitWriter()
        eobrun = 0
        pending: list = []
        for my in range(mcus_y):
            for mx in range(mcus_x):
                zz = plane_zz[ci][my, mx]
                if ah == 0:
                    eobrun = _emit_ac_first_block(writer, zz, ss, se, al,
                                                  ac_prog, eobrun)
                else:
                    eobrun = _emit_ac_refine_block(writer, zz, ss, se, al,
                                                   ac_prog, eobrun, pending)
        if eobrun:
            _emit_eobrun(writer, ac_prog, eobrun)
            for bit in pending:
                writer.write(bit, 1)
        return writer.flush()

    # scan script: DC Al=1; per-comp AC 1-5 and 6-63 at Al=2; AC refine
    # 2->1 and 1->0; DC refine last
    scans = [([*range(ncomp)], 0, 0, 0, 1, dc_first_scan(1))]
    for ci in range(ncomp):
        scans.append(([ci], 1, 5, 0, 2, ac_scan(ci, 1, 5, 0, 2)))
        scans.append(([ci], 6, 63, 0, 2, ac_scan(ci, 6, 63, 0, 2)))
    for ci in range(ncomp):
        scans.append(([ci], 1, 63, 2, 1, ac_scan(ci, 1, 63, 2, 1)))
    scans.append(([*range(ncomp)], 0, 0, 1, 0, dc_refine_scan(0)))
    for ci in range(ncomp):
        scans.append(([ci], 1, 63, 1, 0, ac_scan(ci, 1, 63, 1, 0)))

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload

    out = bytearray(b"\xFF\xD8")
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xDB, bytes([0]) + bytes(qy[_ZIGZAG].astype(np.uint8)))
    if ncomp == 3:
        out += seg(0xDB, bytes([1]) + bytes(qc[_ZIGZAG].astype(np.uint8)))
    sof = bytearray(struct.pack(">BHHB", 8, h, w, ncomp))
    for ci in range(ncomp):
        sof += bytes([ci + 1, 0x11, 0 if ci == 0 else 1])
    out += seg(0xC2, bytes(sof))                # SOF2: progressive
    out += seg(0xC4, bytes([0x00]) + _DC_LUMA_BITS + _DC_LUMA_VALS)
    if ncomp == 3:
        out += seg(0xC4, bytes([0x01]) + _DC_CHROMA_BITS + _DC_CHROMA_VALS)
    out += seg(0xC4, bytes([0x10]) + _AC_PROG_BITS + _AC_PROG_VALS)
    for comp_ids, ss, se, ah, al, entropy in scans:
        sos = bytearray([len(comp_ids)])
        for ci in comp_ids:
            dc_sel = 0 if ci == 0 else 1
            sos += bytes([ci + 1, (dc_sel << 4) | 0])   # AC table 0
        sos += bytes([ss, se, (ah << 4) | al])
        out += seg(0xDA, bytes(sos))
        out += entropy
    out += b"\xFF\xD9"
    return bytes(out)


# ---------------------------------------------------------------------------
# GIF (GIF87a/GIF89a, public spec): LZW-compressed indexed color. Decoder
# handles global/local color tables, interlacing, and transparency-as-index
# (rendered opaque); returns the FIRST frame as RGB — animation deltas need
# a compositor, and the training-pipeline consumers (features/resize) want
# one representative frame. Encoder emits a single-frame GIF89a with a
# clear-code-refreshed fixed-width LZW stream (the classic "uncompressed
# GIF" technique — decodes everywhere, zero dictionary bookkeeping).
# ---------------------------------------------------------------------------

_GIF_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _gif_lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> list:
    """GIF-flavor LZW: LSB-first bit packing, clear/end codes, 12-bit cap."""
    clear = 1 << min_code_size
    end = clear + 1
    out: list = []
    acc = nbits = 0
    code_size = min_code_size + 1
    table = {i: [i] for i in range(clear)}
    prev = None
    next_code = end + 1
    for byte in data:
        acc |= byte << nbits
        nbits += 8
        while nbits >= code_size:
            code = acc & ((1 << code_size) - 1)
            acc >>= code_size
            nbits -= code_size
            if code == clear:
                table = {i: [i] for i in range(clear)}
                next_code = end + 1
                code_size = min_code_size + 1
                prev = None
                continue
            if code == end:
                return out
            if prev is None:
                entry = table[code]
            elif code in table:
                entry = table[code]
                if next_code < 4096:
                    table[next_code] = prev + [entry[0]]
                    next_code += 1
            elif code == next_code:
                entry = prev + [prev[0]]
                if next_code < 4096:
                    table[next_code] = entry
                    next_code += 1
            else:
                raise ValueError("corrupt GIF LZW stream")
            out.extend(entry)
            if len(out) >= n_pixels:
                return out
            prev = entry
            if (next_code == (1 << code_size) and code_size < 12):
                code_size += 1
    return out


def decode_gif(data: bytes) -> np.ndarray:
    """GIF bytes -> (h, w, 3) uint8 RGB of the first frame."""
    b = bytes(data)
    if b[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    sw, sh, flags, bg, _ar = struct.unpack("<HHBBB", b[6:13])
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = np.frombuffer(b[pos:pos + 3 * n], dtype=np.uint8) \
            .reshape(-1, 3).copy()
        pos += 3 * n
    while pos < len(b):
        blk = b[pos]
        if blk == 0x3B:                         # trailer
            break
        if blk == 0x21:                         # extension: skip sub-blocks
            pos += 2
            while b[pos]:
                pos += 1 + b[pos]
            pos += 1
            continue
        if blk != 0x2C:
            raise ValueError(f"unknown GIF block 0x{blk:02x}")
        x, y, w, h, iflags = struct.unpack("<HHHHB", b[pos + 1:pos + 10])
        pos += 10
        ct = gct
        if iflags & 0x80:                       # local color table
            n = 2 << (iflags & 0x07)
            ct = np.frombuffer(b[pos:pos + 3 * n], dtype=np.uint8) \
                .reshape(-1, 3).copy()
            pos += 3 * n
        if ct is None:
            raise ValueError("GIF frame without color table")
        min_code = b[pos]
        pos += 1
        lzw = bytearray()
        while b[pos]:
            ln = b[pos]
            lzw += b[pos + 1:pos + 1 + ln]
            pos += 1 + ln
        pos += 1
        idx = _gif_lzw_decode(bytes(lzw), min_code, w * h)
        if len(idx) < w * h:
            raise ValueError("truncated GIF image data")
        grid = np.array(idx[:w * h], dtype=np.int64).reshape(h, w)
        if iflags & 0x40:                       # interlaced: undo 4-pass order
            deinter = np.empty_like(grid)
            src = 0
            for start, step in _GIF_INTERLACE_PASSES:
                rows = range(start, h, step)
                for r in rows:
                    deinter[r] = grid[src]
                    src += 1
            grid = deinter
        frame = ct[np.clip(grid, 0, len(ct) - 1)]
        if (x, y, w, h) != (0, 0, sw, sh):
            canvas = np.zeros((sh, sw, 3), dtype=np.uint8)
            if gct is not None and bg < len(gct):
                canvas[:, :] = gct[bg]
            canvas[y:y + h, x:x + w] = frame
            return canvas
        return frame
    raise ValueError("GIF without image data")


def encode_gif(px: np.ndarray, interlace: bool = False) -> bytes:
    """uint8 (h, w, 3) RGB (<=256 distinct colors) or (h, w)/(h, w, 1)
    gray -> single-frame GIF89a."""
    a = np.asarray(px, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    if a.shape[2] == 1:
        a = a.repeat(3, axis=2)
    h, w, _ = a.shape
    flat = a.reshape(-1, 3)
    colors, inverse = np.unique(flat, axis=0, return_inverse=True)
    if len(colors) > 256:
        raise ValueError(f"{len(colors)} colors > 256 (quantize first)")
    depth = max(1, int(len(colors) - 1).bit_length())
    table = np.zeros((2 << (depth - 1), 3), dtype=np.uint8)
    table[:len(colors)] = colors
    idx = inverse.reshape(h, w)
    if interlace:
        order = [r for start, step in _GIF_INTERLACE_PASSES
                 for r in range(start, h, step)]
        idx = idx[order]
    min_code = max(2, depth)
    clear, end = 1 << min_code, (1 << min_code) + 1
    code_size = min_code + 1
    acc = nbits = 0
    stream = bytearray()

    def put(code: int):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += code_size
        while nbits >= 8:
            stream.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    put(clear)
    for i, v in enumerate(idx.reshape(-1)):
        # re-clear before the dictionary would grow the code width: every
        # pixel is emitted as a literal root code at a fixed width
        if i and i % (clear - 2) == 0:
            put(clear)
        put(int(v))
    put(end)
    if nbits:
        stream.append(acc & 0xFF)

    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | (depth - 1), 0, 0)
    out += table.tobytes()
    out += struct.pack("<BHHHHB", 0x2C, 0, 0, w, h,
                       0x40 if interlace else 0)
    out.append(min_code)
    for i in range(0, len(stream), 255):
        chunk = stream[i:i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3B"
    return bytes(out)


# ---------------------------------------------------------------------------
# Matroska / WebM (public EBML + Matroska specs): element-tree demux. The
# demuxer walks Segment -> Tracks (to find the first video track number)
# and Segment -> Cluster -> SimpleBlock/BlockGroup, returning the encoded
# frame payloads — the same zero-codec-work contract as the MP4/AVI
# demuxers. No-lacing blocks only (the dominant case for video tracks);
# laced blocks yield their payload region as one frame.
# ---------------------------------------------------------------------------

_MKV_SEGMENT = 0x18538067
_MKV_TRACKS = 0x1654AE6B
_MKV_TRACK_ENTRY = 0xAE
_MKV_TRACK_NUMBER = 0xD7
_MKV_TRACK_TYPE = 0x83
_MKV_CLUSTER = 0x1F43B675
_MKV_SIMPLE_BLOCK = 0xA3
_MKV_BLOCK_GROUP = 0xA0
_MKV_BLOCK = 0xA1


def _ebml_id(b: bytes, pos: int):
    """EBML element id (marker bit KEPT) -> (id, new_pos)."""
    first = b[pos]
    for ln in range(1, 5):
        if first & (0x100 >> ln):
            v = 0
            for i in range(ln):
                v = (v << 8) | b[pos + i]
            return v, pos + ln
    raise ValueError("bad EBML id")


def _ebml_size(b: bytes, pos: int):
    """EBML size (marker bit STRIPPED) -> (size | None if unknown, pos)."""
    first = b[pos]
    for ln in range(1, 9):
        if first & (0x100 >> ln):
            v = first & ((0x100 >> ln) - 1)
            for i in range(1, ln):
                v = (v << 8) | b[pos + i]
            unknown = (1 << (7 * ln)) - 1
            return (None if v == unknown else v), pos + ln
    raise ValueError("bad EBML size")


def _ebml_children(b: bytes, pos: int, end: int):
    """Yield (element_id, payload_start, payload_end) within [pos, end)."""
    while pos < end:
        eid, pos = _ebml_id(b, pos)
        size, pos = _ebml_size(b, pos)
        pend = end if size is None else min(pos + size, end)
        yield eid, pos, pend
        pos = pend


def extract_mkv_frames(data: bytes, every_n: int = 1):
    """Matroska/WebM bytes -> [(frame_no, frame_bytes)] for the first
    video track (or all blocks when no Tracks element resolves)."""
    b = bytes(data)
    if b[:4] != b"\x1A\x45\xDF\xA3":
        raise ValueError("not an EBML/Matroska file")
    # skip the EBML header element, find the Segment
    _eid, pos = _ebml_id(b, 0)
    size, pos = _ebml_size(b, pos)
    pos += size or 0
    eid, pos = _ebml_id(b, pos)
    if eid != _MKV_SEGMENT:
        raise ValueError("no Matroska Segment")
    size, pos = _ebml_size(b, pos)
    seg_end = len(b) if size is None else min(pos + size, len(b))

    video_track = None
    for eid, s, e in _ebml_children(b, pos, seg_end):
        if eid != _MKV_TRACKS:
            continue
        for tid, ts, te in _ebml_children(b, s, e):
            if tid != _MKV_TRACK_ENTRY:
                continue
            num = ttype = None
            for fid, fs, fe in _ebml_children(b, ts, te):
                if fid == _MKV_TRACK_NUMBER:
                    num = int.from_bytes(b[fs:fe], "big")
                elif fid == _MKV_TRACK_TYPE:
                    ttype = int.from_bytes(b[fs:fe], "big")
            if ttype == 1 and num is not None:
                video_track = num
                break
        break

    def block_frame(s: int, e: int):
        # track number is a plain vint WITHOUT the unknown-size sentinel:
        # _ebml_size maps the all-ones vint to None, but 0xFF here is a
        # valid track number (127) whose frames must not be dropped
        first = b[s]
        for ln in range(1, 9):
            if first & (0x100 >> ln):
                track = first & ((0x100 >> ln) - 1)
                for i in range(1, ln):
                    track = (track << 8) | b[s + i]
                p = s + ln
                break
        else:
            raise ValueError("bad Matroska block track vint")
        p += 3                                  # int16 timestamp + flags
        return track, b[p:e]

    frames = []
    n = 0
    for eid, s, e in _ebml_children(b, pos, seg_end):
        if eid != _MKV_CLUSTER:
            continue
        for cid, cs, ce in _ebml_children(b, s, e):
            payload = None
            if cid == _MKV_SIMPLE_BLOCK:
                track, payload = block_frame(cs, ce)
            elif cid == _MKV_BLOCK_GROUP:
                for gid, gs, ge in _ebml_children(b, cs, ce):
                    if gid == _MKV_BLOCK:
                        track, payload = block_frame(gs, ge)
                        break
            if payload is None:
                continue
            if video_track is not None and track != video_track:
                continue
            if n % every_n == 0:
                frames.append((n, payload))
            n += 1
    if n == 0:
        raise ValueError("no Matroska block data")
    return frames


def encode_mkv(frames: List[bytes], track: int = 1,
               with_tracks: bool = True) -> bytes:
    """Minimal valid Matroska: EBML header + Segment(Tracks?, one Cluster
    of SimpleBlocks). Synthetic-fixture twin of encode_avi."""

    def vsize(n: int) -> bytes:
        for ln in range(1, 9):
            if n < (1 << (7 * ln)) - 1:
                v = n | (1 << (7 * ln))
                return v.to_bytes(ln, "big")
        raise ValueError("size too large")

    def elem(eid: int, payload: bytes) -> bytes:
        ln = (eid.bit_length() + 7) // 8
        return eid.to_bytes(ln, "big") + vsize(len(payload)) + payload

    header = elem(0x1A45DFA3,
                  elem(0x4282, b"matroska") + elem(0x4287, b"\x04")
                  + elem(0x4285, b"\x02"))
    tracks = b""
    if with_tracks:
        entry = (elem(_MKV_TRACK_NUMBER, bytes([track]))
                 + elem(_MKV_TRACK_TYPE, b"\x01"))
        tracks = elem(_MKV_TRACKS, elem(_MKV_TRACK_ENTRY, entry))
    blocks = b"".join(
        elem(_MKV_SIMPLE_BLOCK,
             vsize(track) + struct.pack(">hB", i, 0x80) + f)
        for i, f in enumerate(frames))
    cluster = elem(_MKV_CLUSTER, elem(0xE7, b"\x00") + blocks)
    return header + elem(_MKV_SEGMENT, tracks + cluster)
