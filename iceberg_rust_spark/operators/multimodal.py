"""Multimodal (image/audio/video) column plumbing over opaque binary columns.

The Spark-side machinery — schema with typed metadata, Arrow-batched
``mapInPandas`` pipelines, partition-friendly batch shapes — is real and
tested; the codec kernels are STUBBED (this container has no image/audio
libraries): ``decode_image_meta`` parses real PNG/JPEG headers from bytes,
while ``extract_features``/``resample_frames`` produce deterministic fakes
behind clearly-marked stubs so the distributed plumbing can be exercised and
swapped for real kernels (PIL/torchaudio/decord) without touching the plan.
"""

from __future__ import annotations

import hashlib
import struct
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

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
    """Header-only decode: PNG IHDR and JPEG SOFn are REAL parsers (the two
    dominant formats need no codec libs for dimensions); anything else falls
    back to a deterministic stub (marked)."""
    if payload is None:
        return {"width": None, "height": None, "n_bytes": 0}
    b = bytes(payload)
    if b[:8] == b"\x89PNG\r\n\x1a\n" and len(b) >= 24:
        w, h = struct.unpack(">II", b[16:24])
        return {"width": int(w), "height": int(h), "n_bytes": len(b)}
    jpeg = _jpeg_dimensions(b)
    if jpeg is not None:
        return {"width": jpeg[0], "height": jpeg[1], "n_bytes": len(b)}
    # STUB: other formats require codec libs not present in this container.
    # Deterministic fake so plumbing stays testable.
    digest = int.from_bytes(hashlib.sha1(b).digest()[:4], "big")
    return {"width": 16 + digest % 64, "height": 16 + (digest >> 8) % 64,
            "n_bytes": len(b)}


def extract_features(df: DataFrame, payload_col: str = "payload",
                     id_col: str = "media_id") -> DataFrame:
    """payload -> fixed-dim float feature vector.

    STUB kernel: deterministic pseudo-features from a sha1 of the payload
    (real impl would run an image/audio encoder per Arrow batch). The Spark
    plumbing — mapInPandas, stable schema, batch-wise numpy — is the real
    deliverable here.
    """
    schema = f"{id_col} long, features array<float>"

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for p in pdf[payload_col]:
                if p is None:
                    feats.append([0.0] * FEATURE_DIM)
                    continue
                seed = int.from_bytes(hashlib.sha1(bytes(p)).digest()[:4], "big")
                rng = np.random.RandomState(seed)
                feats.append(rng.standard_normal(FEATURE_DIM).astype("float32").tolist())
            yield pd.DataFrame({id_col: pdf[id_col].values, "features": feats})

    return df.mapInPandas(featurize, schema=schema)


def resample_frames(df: DataFrame, payload_col: str = "payload",
                    id_col: str = "media_id", every_n: int = 10) -> DataFrame:
    """Video frame-sampling plumbing: emits (media_id, frame_no, frame_bytes)
    rows, one output row per sampled frame.

    STUB kernel: fabricates frame boundaries from payload length (a real impl
    would demux containers per batch). Demonstrates the 1->N mapInPandas shape
    that real frame extraction uses.
    """
    schema = f"{id_col} long, frame_no int, frame bytes".replace("bytes", "binary")

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, frame_nos, frames = [], [], []
            for mid, p in zip(pdf[id_col], pdf[payload_col]):
                if p is None:
                    continue
                b = bytes(p)
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

    STUB kernel: a real impl decodes + resamples per Arrow batch (PIL/opencv);
    here the payload is deterministically re-hashed to width*height//8 bytes
    so batch sizing, schema, and downstream joins behave exactly like the
    real operator. Swap the kernel, keep the plan."""
    schema = f"{id_col} long, resized binary, width int, height int"

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, blobs = [], []
            n_out = max(1, width * height // 8)
            for mid, p in zip(pdf[id_col], pdf[payload_col]):
                if p is None:
                    continue
                # STUB: stretch a sha1 stream to the target byte budget
                seed = hashlib.sha1(bytes(p)).digest()
                reps = (n_out // len(seed)) + 1
                ids.append(mid)
                blobs.append((seed * reps)[:n_out])
            yield pd.DataFrame({
                id_col: pd.Series(ids, dtype="int64"),
                "resized": blobs,
                "width": pd.Series([width] * len(ids), dtype="int32"),
                "height": pd.Series([height] * len(ids), dtype="int32")})

    return df.mapInPandas(resize, schema=schema)


def synthetic_jpeg(width: int, height: int, extra: bytes = b"") -> bytes:
    """Minimal valid-marker-structure JPEG: SOI + APP0(JFIF) + SOF0 carrying
    the dimensions + EOI. Enough for any SOF-walking header parser."""
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" \
        + b"\x00\x01\x00\x01\x00\x00"
    sof0 = b"\xff\xc0" + struct.pack(">H", 11) + b"\x08" \
        + struct.pack(">HH", height, width) + b"\x01\x11\x00"
    return b"\xff\xd8" + app0 + sof0 + extra + b"\xff\xd9"


def synthetic_media_df(spark, n: int = 64) -> DataFrame:
    """Deterministic fake media table for tests/demos (tiny PNGs, minimal
    JPEGs, opaque blobs)."""
    rows = []
    for i in range(n):
        if i % 2 == 0:
            w, h = 1 + i % 7, 1 + i % 5
            payload = (b"\x89PNG\r\n\x1a\n" + b"\x00\x00\x00\rIHDR"
                       + struct.pack(">II", w, h) + bytes(8)
                       + hashlib.sha1(str(i).encode()).digest())
            mime = "image/png"
        elif i % 4 == 1:
            payload = synthetic_jpeg(8 + i % 9, 8 + i % 11,
                                     hashlib.sha1(str(i).encode()).digest())
            mime = "image/jpeg"
        else:
            payload = hashlib.sha1(f"blob{i}".encode()).digest() * (1 + i % 5)
            mime = "application/octet-stream"
        rows.append((i, bytearray(payload), mime))
    return spark.createDataFrame(rows, "media_id long, payload binary, mime string")
