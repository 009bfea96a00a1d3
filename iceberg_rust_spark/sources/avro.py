"""Minimal pure-Python Apache Avro object-container codec.

No Avro library exists in this environment, but Iceberg's spec metadata
(manifests, manifest lists) is Avro on disk — the reference reads/writes it
with the `apache-avro` crate (spec/manifest_list/mod.rs:54). This module
implements exactly the subset the Iceberg spec schemas use, from the public
Avro 1.11 specification:

  container: magic 'Obj\\x01' + file-metadata map (avro.schema JSON,
  avro.codec) + 16-byte sync marker; then blocks of
  (record count, byte size, payload, sync).

  encoding: zigzag-varint int/long; IEEE LE float/double; len-prefixed
  bytes/string; records = field concatenation; unions = branch index +
  value; arrays/maps = counted blocks; fixed = raw bytes; enum = int index.

Supported codecs: null, deflate (zlib raw). Used by avro_manifest.py for
spec-layout manifest interop (read real Iceberg tables / write manifests
external readers understand). Verified against the reference's golden files
(crates/iceberg/testdata/manifests_lists) in tests/test_avro.py.
"""

from __future__ import annotations

import io
import json
import os
import struct
import zlib
from typing import Any, Dict, List, Optional, Tuple

MAGIC = b"Obj\x01"

# ---------------------------------------------------------------------------
# primitive codecs
# ---------------------------------------------------------------------------


def _read_long(buf: io.BytesIO) -> int:
    shift = 0
    acc = 0
    while True:
        b = buf.read(1)
        if not b:
            raise EOFError("truncated varint")
        byte = b[0]
        acc |= (byte & 0x7F) << shift
        if not byte & 0x80:
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1)  # zigzag decode


def _write_long(out: io.BytesIO, n: int) -> None:
    n = (n << 1) ^ (n >> 63) if n >= 0 else ((-n - 1) << 1) | 1  # zigzag
    # the arithmetic form above is branch-split to avoid Python's infinite
    # sign extension: for n >= 0, (n << 1); for n < 0, ((-n-1) << 1) | 1
    while True:
        byte = n & 0x7F
        n >>= 7
        if n:
            out.write(bytes([byte | 0x80]))
        else:
            out.write(bytes([byte]))
            break


def _read_bytes(buf: io.BytesIO) -> bytes:
    n = _read_long(buf)
    data = buf.read(n)
    if len(data) != n:
        raise EOFError("truncated bytes")
    return data


def _write_bytes(out: io.BytesIO, data: bytes) -> None:
    _write_long(out, len(data))
    out.write(data)


# ---------------------------------------------------------------------------
# schema-driven value codec
# ---------------------------------------------------------------------------


def decode_value(schema: Any, buf: io.BytesIO) -> Any:
    if isinstance(schema, str):
        t = schema
        if t == "null":
            return None
        if t == "boolean":
            return buf.read(1) == b"\x01"
        if t in ("int", "long"):
            return _read_long(buf)
        if t == "float":
            return struct.unpack("<f", buf.read(4))[0]
        if t == "double":
            return struct.unpack("<d", buf.read(8))[0]
        if t == "bytes":
            return _read_bytes(buf)
        if t == "string":
            return _read_bytes(buf).decode("utf-8")
        raise ValueError(f"unknown primitive {t!r}")
    if isinstance(schema, list):  # union: branch index then value
        idx = _read_long(buf)
        return decode_value(schema[idx], buf)
    t = schema["type"]
    if t == "record":
        return {f["name"]: decode_value(f["type"], buf)
                for f in schema["fields"]}
    if t == "array":
        out = []
        while True:
            n = _read_long(buf)
            if n == 0:
                break
            if n < 0:
                _read_long(buf)  # block byte size (skippable; we decode all)
                n = -n
            for _ in range(n):
                out.append(decode_value(schema["items"], buf))
        return out
    if t == "map":
        out = {}
        while True:
            n = _read_long(buf)
            if n == 0:
                break
            if n < 0:
                _read_long(buf)
                n = -n
            for _ in range(n):
                k = _read_bytes(buf).decode("utf-8")
                out[k] = decode_value(schema["values"], buf)
        return out
    if t == "fixed":
        return buf.read(schema["size"])
    if t == "enum":
        return schema["symbols"][_read_long(buf)]
    return decode_value(t, buf)  # {'type': 'long', 'logicalType': ...}


def encode_value(schema: Any, value: Any, out: io.BytesIO) -> None:
    if isinstance(schema, str):
        t = schema
        if t == "null":
            return
        if t == "boolean":
            out.write(b"\x01" if value else b"\x00")
        elif t in ("int", "long"):
            _write_long(out, int(value))
        elif t == "float":
            out.write(struct.pack("<f", float(value)))
        elif t == "double":
            out.write(struct.pack("<d", float(value)))
        elif t == "bytes":
            _write_bytes(out, bytes(value))
        elif t == "string":
            _write_bytes(out, value.encode("utf-8"))
        else:
            raise ValueError(f"unknown primitive {t!r}")
        return
    if isinstance(schema, list):  # union — pick the branch matching value
        idx = _union_branch(schema, value)
        _write_long(out, idx)
        encode_value(schema[idx], value, out)
        return
    t = schema["type"]
    if t == "record":
        for f in schema["fields"]:
            encode_value(f["type"], value.get(f["name"]), out)
    elif t == "array":
        if value:
            _write_long(out, len(value))
            for v in value:
                encode_value(schema["items"], v, out)
        _write_long(out, 0)
    elif t == "map":
        if value:
            _write_long(out, len(value))
            for k, v in value.items():
                _write_bytes(out, k.encode("utf-8"))
                encode_value(schema["values"], v, out)
        _write_long(out, 0)
    elif t == "fixed":
        out.write(bytes(value))
    elif t == "enum":
        _write_long(out, schema["symbols"].index(value))
    else:
        encode_value(t, value, out)


def _union_branch(union: List[Any], value: Any) -> int:
    for i, s in enumerate(union):
        if value is None and s == "null":
            return i
        if value is not None and s != "null":
            return i
    raise ValueError(f"no union branch for {value!r} in {union}")


# ---------------------------------------------------------------------------
# object container files
# ---------------------------------------------------------------------------


def read_container(data: bytes) -> Tuple[Any, List[Any], Dict[str, bytes]]:
    """-> (parsed schema, records, file metadata)."""
    buf = io.BytesIO(data)
    if buf.read(4) != MAGIC:
        raise ValueError("not an Avro object container (bad magic)")
    meta_raw = decode_value({"type": "map", "values": "bytes"}, buf)
    schema = json.loads(meta_raw["avro.schema"].decode("utf-8"))
    codec = meta_raw.get("avro.codec", b"null").decode("utf-8")
    sync = buf.read(16)
    records: List[Any] = []
    while True:
        head = buf.read(1)
        if not head:
            break
        buf.seek(-1, 1)
        count = _read_long(buf)
        size = _read_long(buf)
        block = buf.read(size)
        if codec == "deflate":
            block = zlib.decompress(block, -15)
        elif codec != "null":
            raise ValueError(f"unsupported avro codec {codec!r}")
        bbuf = io.BytesIO(block)
        for _ in range(count):
            records.append(decode_value(schema, bbuf))
        if buf.read(16) != sync:
            raise ValueError("avro block sync mismatch")
    return schema, records, meta_raw


def write_container(schema: Any, records: List[Any],
                    metadata: Optional[Dict[str, bytes]] = None,
                    codec: str = "deflate") -> bytes:
    out = io.BytesIO()
    out.write(MAGIC)
    meta = {"avro.schema": json.dumps(schema).encode("utf-8"),
            "avro.codec": codec.encode("utf-8"), **(metadata or {})}
    encode_value({"type": "map", "values": "bytes"}, meta, out)
    sync = os.urandom(16)
    out.write(sync)
    if records:
        body = io.BytesIO()
        for r in records:
            encode_value(schema, r, body)
        payload = body.getvalue()
        if codec == "deflate":
            comp = zlib.compressobj(wbits=-15)
            payload = comp.compress(payload) + comp.flush()
        _write_long(out, len(records))
        _write_long(out, len(payload))
        out.write(payload)
        out.write(sync)
    return out.getvalue()
