"""Puffin files + deletion-vector-v1 blobs, pure Python (driver-side).

Counterpart of /root/reference/crates/iceberg/src/puffin/{metadata,reader,
writer}.rs and delete_vector.rs, following the PUBLIC specs:

* Puffin file (https://iceberg.apache.org/puffin-spec/)::

      Magic "PFA1" | blob bytes ... | Magic | FooterPayload (JSON) |
      payload-size (u32 LE) | flags (4 bytes) | Magic

  FooterPayload = {"blobs": [BlobMetadata...], "properties": {...}} with
  kebab-case keys (type, fields, snapshot-id, sequence-number, offset,
  length, ...), uncompressed (flag bit 0 unset).

* deletion-vector-v1 blob (Iceberg v3 spec)::

      len (u32 BE, covers magic+vector) | magic D1 D3 39 64 |
      64-bit roaring bitmap "portable" serialization | crc32 (u32 BE of
      magic+vector)

* portable 64-bit roaring: u64 LE count of 32-bit bitmaps; each is u32 LE
  high-key + standard 32-bit roaring serialization (cookie 12346/12347,
  array / bitmap / run containers). We write array+bitmap containers only;
  reads accept all three — enough to interoperate with RoaringBitmap
  implementations in Java/Rust, which is the point of "portable".

Metadata stays tiny (positions of deleted rows), so this is driver-side
Python + numpy; executors only ever see the expanded (file, pos) DataFrame.
"""

from __future__ import annotations

import json
import struct
import zlib
from dataclasses import dataclass, field as dc_field
from typing import Dict, List, Optional, Tuple

import numpy as np

MAGIC = b"PFA1"
DV_MAGIC = bytes([0xD1, 0xD3, 0x39, 0x64])
DELETION_VECTOR_V1 = "deletion-vector-v1"

_SERIAL_COOKIE_NO_RUN = 12346
_SERIAL_COOKIE_RUN = 12347
_NO_OFFSET_THRESHOLD = 4
_ARRAY_MAX = 4096


# ---------------------------------------------------------------------------
# 32-bit roaring (standard serialization)
# ---------------------------------------------------------------------------

def _serialize_roaring32(values: np.ndarray) -> bytes:
    """``values``: sorted unique uint32 array -> standard roaring bytes
    (no-run cookie; array containers <=4096 cardinality, else bitmap)."""
    keys = (values >> 16).astype(np.uint32)
    out = []
    containers: List[Tuple[int, np.ndarray]] = []
    for key in np.unique(keys):
        lows = (values[keys == key] & 0xFFFF).astype(np.uint16)
        containers.append((int(key), lows))
    n = len(containers)
    out.append(struct.pack("<II", _SERIAL_COOKIE_NO_RUN, n))
    for key, lows in containers:
        out.append(struct.pack("<HH", key, len(lows) - 1))
    # offset header (present for the no-run cookie)
    offset = 4 + 4 + 4 * n + 4 * n
    body = []
    for key, lows in containers:
        if len(lows) <= _ARRAY_MAX:
            data = lows.tobytes()
        else:
            bits = np.zeros(1 << 16, dtype=bool)
            bits[lows] = True
            data = np.packbits(bits, bitorder="little").tobytes()
        out.append(struct.pack("<I", offset))
        body.append(data)
        offset += len(data)
    return b"".join(out) + b"".join(body)


def _deserialize_roaring32(buf: bytes, pos: int = 0) -> Tuple[np.ndarray, int]:
    """Parse one standard 32-bit roaring bitmap at ``buf[pos:]``; returns
    (sorted uint32 values, bytes consumed)."""
    start = pos
    cookie = struct.unpack_from("<I", buf, pos)[0]
    has_run = (cookie & 0xFFFF) == _SERIAL_COOKIE_RUN
    if has_run:
        n = ((cookie >> 16) & 0xFFFF) + 1
        pos += 4
        run_flag_bytes = (n + 7) // 8
        run_flags = np.unpackbits(
            np.frombuffer(buf, dtype=np.uint8, count=run_flag_bytes, offset=pos),
            bitorder="little")[:n].astype(bool)
        pos += run_flag_bytes
    elif cookie == _SERIAL_COOKIE_NO_RUN:
        n = struct.unpack_from("<I", buf, pos + 4)[0]
        pos += 8
        run_flags = np.zeros(n, dtype=bool)
    else:
        raise ValueError(f"bad roaring cookie {cookie}")
    keys = np.empty(n, dtype=np.uint32)
    cards = np.empty(n, dtype=np.int64)
    for i in range(n):
        k, c = struct.unpack_from("<HH", buf, pos)
        keys[i], cards[i] = k, c + 1
        pos += 4
    if not has_run or n >= _NO_OFFSET_THRESHOLD:
        pos += 4 * n  # skip the offset header
    parts = []
    for i in range(n):
        card = int(cards[i])
        base = np.uint32(keys[i]) << np.uint32(16)
        if run_flags[i]:
            n_runs = struct.unpack_from("<H", buf, pos)[0]
            pos += 2
            runs = np.frombuffer(buf, dtype="<u2", count=2 * n_runs, offset=pos)
            pos += 4 * n_runs
            lows = np.concatenate([
                np.arange(runs[2 * r], runs[2 * r] + runs[2 * r + 1] + 1,
                          dtype=np.uint32)
                for r in range(n_runs)]) if n_runs else np.empty(0, np.uint32)
        elif card <= _ARRAY_MAX:
            lows = np.frombuffer(buf, dtype="<u2", count=card,
                                 offset=pos).astype(np.uint32)
            pos += 2 * card
        else:
            bits = np.unpackbits(
                np.frombuffer(buf, dtype=np.uint8, count=8192, offset=pos),
                bitorder="little")
            lows = np.nonzero(bits)[0].astype(np.uint32)
            pos += 8192
        parts.append(base | lows)
    vals = (np.concatenate(parts) if parts else np.empty(0, np.uint32))
    return vals, pos - start


# ---------------------------------------------------------------------------
# 64-bit portable roaring + DV blob framing
# ---------------------------------------------------------------------------

def serialize_dv(positions) -> bytes:
    """Sorted-or-not iterable of u64 row positions -> deletion-vector-v1
    blob bytes (len + magic + portable bitmap + crc)."""
    pos64 = np.unique(np.asarray(list(positions), dtype=np.uint64))
    highs = (pos64 >> np.uint64(32)).astype(np.uint32)
    chunks = []
    for h in np.unique(highs):
        lows = (pos64[highs == h] & np.uint64(0xFFFFFFFF)).astype(np.uint32)
        chunks.append(struct.pack("<I", int(h)) + _serialize_roaring32(lows))
    vector = struct.pack("<Q", len(chunks)) + b"".join(chunks)
    payload = DV_MAGIC + vector
    crc = zlib.crc32(payload) & 0xFFFFFFFF
    return struct.pack(">I", len(payload)) + payload + struct.pack(">I", crc)


def deserialize_dv(blob: bytes) -> np.ndarray:
    """deletion-vector-v1 blob bytes -> sorted uint64 position array."""
    (length,) = struct.unpack_from(">I", blob, 0)
    payload = blob[4:4 + length]
    if payload[:4] != DV_MAGIC:
        raise ValueError("bad deletion-vector magic")
    (crc,) = struct.unpack_from(">I", blob, 4 + length)
    if zlib.crc32(payload) & 0xFFFFFFFF != crc:
        raise ValueError("deletion-vector crc mismatch")
    buf = payload[4:]
    (n_maps,) = struct.unpack_from("<Q", buf, 0)
    pos = 8
    parts = []
    for _ in range(n_maps):
        (high,) = struct.unpack_from("<I", buf, pos)
        pos += 4
        vals, used = _deserialize_roaring32(buf, pos)
        pos += used
        parts.append((np.uint64(high) << np.uint64(32)) | vals.astype(np.uint64))
    return np.concatenate(parts) if parts else np.empty(0, np.uint64)


# ---------------------------------------------------------------------------
# Puffin file read/write
# ---------------------------------------------------------------------------

@dataclass
class BlobMetadata:
    type: str
    fields: List[int]
    snapshot_id: int
    sequence_number: int
    offset: int
    length: int
    properties: Dict[str, str] = dc_field(default_factory=dict)
    # puffin spec "compression-codec": none(absent) | lz4 | zstd
    # (validate_puffin_compression, puffin/mod.rs:31-43)
    compression_codec: Optional[str] = None

    def to_json(self) -> dict:
        d = {"type": self.type, "fields": self.fields,
             "snapshot-id": self.snapshot_id,
             "sequence-number": self.sequence_number,
             "offset": self.offset, "length": self.length}
        if self.compression_codec:
            d["compression-codec"] = self.compression_codec
        if self.properties:
            d["properties"] = self.properties
        return d

    @staticmethod
    def from_json(d: dict) -> "BlobMetadata":
        return BlobMetadata(d["type"], d.get("fields", []),
                            d.get("snapshot-id", 0), d.get("sequence-number", 0),
                            d["offset"], d["length"], d.get("properties", {}),
                            d.get("compression-codec"))


# puffin codec name -> pyarrow codec; "lz4" in puffin is the LZ4 FRAME
# format (compression.rs:85 name "lz4" / frame round-trip in its tests)
_PA_CODEC = {"lz4": "lz4_frame", "zstd": "zstd", "gzip": "gzip"}


def _blob_compress(data: bytes, codec: Optional[str]) -> bytes:
    if not codec or codec == "none":
        return data
    import pyarrow as pa
    if codec not in _PA_CODEC:
        raise ValueError(f"unsupported puffin compression codec: {codec}")
    return pa.Codec(_PA_CODEC[codec]).compress(data, asbytes=True)


def _blob_decompress(data: bytes, codec: Optional[str]) -> bytes:
    if not codec or codec == "none":
        return data
    import pyarrow as pa
    if codec not in _PA_CODEC:
        raise ValueError(f"unsupported puffin compression codec: {codec}")
    # stream API: frame formats carry their own size, and puffin blob
    # metadata records only the COMPRESSED length
    stream_name = {"lz4_frame": "lz4"}.get(_PA_CODEC[codec], _PA_CODEC[codec])
    with pa.input_stream(pa.BufferReader(data),
                         compression=stream_name) as s:
        return s.read()


def write_puffin(path: str, blobs: List[Tuple[BlobMetadata, bytes]],
                 properties: Optional[Dict[str, str]] = None,
                 compress_footer: bool = False) -> List[BlobMetadata]:
    """Write blobs to a Puffin file; offsets/lengths in the returned metadata
    are filled in from actual positions. A blob whose metadata names a
    ``compression_codec`` (lz4|zstd, puffin/mod.rs:31-43) is compressed and
    its stored length is the COMPRESSED length per the spec;
    ``compress_footer`` sets flag bit 0 and lz4-frames the footer payload
    (puffin/writer.rs:78,150)."""
    from .io import file_io_for
    import io as _io
    out_meta: List[BlobMetadata] = []
    fh = _io.BytesIO()
    fh.write(MAGIC)
    for meta, data in blobs:
        stored = _blob_compress(data, meta.compression_codec)
        meta.offset = fh.tell()
        meta.length = len(stored)
        fh.write(stored)
        out_meta.append(meta)
    payload = json.dumps({
        "blobs": [m.to_json() for m in out_meta],
        "properties": properties or {},
    }).encode("utf-8")
    flags = b"\x00\x00\x00\x00"
    if compress_footer:
        payload = _blob_compress(payload, "lz4")
        flags = b"\x01\x00\x00\x00"  # FooterPayloadCompressed
    fh.write(MAGIC)
    fh.write(payload)
    fh.write(struct.pack("<I", len(payload)))
    fh.write(flags)
    fh.write(MAGIC)
    file_io_for(path).write_bytes(path, fh.getvalue())
    return out_meta


def read_puffin_footer(path: str) -> Tuple[List[BlobMetadata], Dict[str, str]]:
    from .io import file_io_for
    fio = file_io_for(path)
    # range reads only — header magic, 12-byte trailer, then the footer
    # payload (object-store friendly: 3 small GETs, never the whole file)
    if fio.read_bytes(path, 0, 4) != MAGIC:
        raise ValueError("bad puffin header magic")
    size = fio.size(path)
    tail = fio.read_bytes(path, size - 12, 12)
    (payload_len,) = struct.unpack("<I", tail[:4])
    flags = tail[4:8]
    if tail[8:] != MAGIC:
        raise ValueError("bad puffin trailing magic")
    chunk = fio.read_bytes(path, size - 12 - payload_len - 4, 4 + payload_len)
    if chunk[:4] != MAGIC:
        raise ValueError("bad puffin footer magic")
    raw = chunk[4:]
    if flags[0] & 1:  # FooterPayloadCompressed: lz4-framed (metadata.rs:266)
        raw = _blob_decompress(raw, "lz4")
    payload = json.loads(raw.decode("utf-8"))
    blobs = [BlobMetadata.from_json(b) for b in payload.get("blobs", [])]
    return blobs, payload.get("properties", {})


def read_blob(path: str, meta: BlobMetadata) -> bytes:
    from .io import file_io_for
    data = file_io_for(path).read_bytes(path, meta.offset, meta.length)
    return _blob_decompress(data, meta.compression_codec)


def read_deletion_vectors(path: str) -> Dict[str, np.ndarray]:
    """All deletion-vector-v1 blobs in a Puffin file, keyed by the
    ``referenced-data-file`` property: {data_file_path: positions}."""
    blobs, _props = read_puffin_footer(path)
    out: Dict[str, np.ndarray] = {}
    for meta in blobs:
        if meta.type != DELETION_VECTOR_V1:
            continue
        ref = meta.properties.get("referenced-data-file", "")
        out[ref] = deserialize_dv(read_blob(path, meta))
    return out
