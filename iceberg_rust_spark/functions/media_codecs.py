"""Pure-stdlib media codecs backing the multimodal operators.

No external image/audio libraries exist in this environment, but two real
kernels are achievable from public specs with stdlib only:

- PNG (ISO/IEC 15948): full pixel decode — chunk walk, IDAT zlib inflate,
  per-scanline unfilter (None/Sub/Up/Average/Paeth), palette expansion —
  plus a minimal encoder (filter 0 + zlib). 8-bit depth, non-interlaced;
  Adam7/16-bit raise ValueError (callers fall back to their marked stubs).
- WAV/RIFF PCM (public RIFF/WAVE layout): fmt/data chunk walk via struct,
  8/16-bit PCM to numpy, linear-interpolation resampling, re-encode.

These run inside Arrow-batched mapInPandas kernels (operators/multimodal.py)
— per-batch numpy, never per-row Python in the hot loop beyond the
per-image/per-clip codec work itself.
"""

from __future__ import annotations

import struct
import zlib
from typing import Tuple

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
