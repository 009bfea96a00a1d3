"""Minimal Apache Thrift binary protocol (strict) + transports.

Counterpart of the transport layer the reference's HMS catalog gets from
``volo_thrift`` (crates/catalog/hms/src/catalog.rs:226-236: buffered or
framed codec over a TCP address). This module implements the public Thrift
binary wire protocol — message envelope, struct/field/container encoding —
from the published spec (thrift-rpc.md / thrift-binary-protocol.md), with
no generated code: structs travel as ``{field_id: (ttype, value)}`` dicts,
which keeps both the client (hms.py) and the in-process test metastore on
the same single codec.

Wire format (strict binary):
  message  := i32(0x8001_0000 | mtype) string(name) i32(seqid) payload
  struct   := (byte(ttype) i16(fid) value)* byte(0)        # TType.STOP
  list/set := byte(elem_ttype) i32(count) value*
  map      := byte(ktype) byte(vtype) i32(count) (key value)*
  string   := i32(len) bytes
"""

from __future__ import annotations

import socket
import struct
import threading
from typing import Any, Dict, Tuple

# TType ids (public spec)
STOP, BOOL, BYTE, DOUBLE, I16, I32, I64, STRING, STRUCT, MAP, SET, LIST = (
    0, 2, 3, 4, 6, 8, 10, 11, 12, 13, 14, 15)

# Message types
CALL, REPLY, EXCEPTION, ONEWAY = 1, 2, 3, 4

_VERSION_1 = 0x80010000


class TApplicationException(Exception):
    """Server-side protocol failure (mtype EXCEPTION)."""


# --------------------------------------------------------------- encoding
def _w_i16(out: bytearray, v: int) -> None:
    out += struct.pack(">h", v)


def _w_i32(out: bytearray, v: int) -> None:
    out += struct.pack(">i", v)


def _w_i64(out: bytearray, v: int) -> None:
    out += struct.pack(">q", v)


def _w_str(out: bytearray, v) -> None:
    b = v.encode("utf-8") if isinstance(v, str) else bytes(v)
    _w_i32(out, len(b))
    out += b


def write_value(out: bytearray, ttype: int, v: Any) -> None:
    if ttype == BOOL:
        out.append(1 if v else 0)
    elif ttype == BYTE:
        out += struct.pack(">b", v)
    elif ttype == DOUBLE:
        out += struct.pack(">d", v)
    elif ttype == I16:
        _w_i16(out, v)
    elif ttype == I32:
        _w_i32(out, v)
    elif ttype == I64:
        _w_i64(out, v)
    elif ttype == STRING:
        _w_str(out, v)
    elif ttype == STRUCT:
        write_struct(out, v)
    elif ttype in (LIST, SET):
        elem_t, elems = v
        out.append(elem_t)
        _w_i32(out, len(elems))
        for e in elems:
            write_value(out, elem_t, e)
    elif ttype == MAP:
        kt, vt, items = v
        out.append(kt)
        out.append(vt)
        _w_i32(out, len(items))
        for k, val in items.items():
            write_value(out, kt, k)
            write_value(out, vt, val)
    else:
        raise TApplicationException(f"cannot encode ttype {ttype}")


def write_struct(out: bytearray, fields: Dict[int, Tuple[int, Any]]) -> None:
    for fid in sorted(fields):
        ttype, v = fields[fid]
        if v is None:
            continue  # unset optional field
        out.append(ttype)
        _w_i16(out, fid)
        write_value(out, ttype, v)
    out.append(STOP)


def encode_message(name: str, mtype: int, seqid: int,
                   payload: Dict[int, Tuple[int, Any]]) -> bytes:
    out = bytearray()
    out += struct.pack(">I", (_VERSION_1 | mtype) & 0xFFFFFFFF)
    _w_str(out, name)
    _w_i32(out, seqid)
    write_struct(out, payload)
    return bytes(out)


# --------------------------------------------------------------- decoding
class Reader:
    """Pull-parser over a byte source with an exact-read contract."""

    def __init__(self, read_exact):
        self._read = read_exact

    def i8(self) -> int:
        return struct.unpack(">b", self._read(1))[0]

    def i16(self) -> int:
        return struct.unpack(">h", self._read(2))[0]

    def i32(self) -> int:
        return struct.unpack(">i", self._read(4))[0]

    def i64(self) -> int:
        return struct.unpack(">q", self._read(8))[0]

    def dbl(self) -> float:
        return struct.unpack(">d", self._read(8))[0]

    def string(self) -> str:
        n = self.i32()
        return self._read(n).decode("utf-8", errors="replace")

    def value(self, ttype: int) -> Any:
        if ttype == BOOL:
            return self._read(1)[0] != 0
        if ttype == BYTE:
            return self.i8()
        if ttype == DOUBLE:
            return self.dbl()
        if ttype == I16:
            return self.i16()
        if ttype == I32:
            return self.i32()
        if ttype == I64:
            return self.i64()
        if ttype == STRING:
            return self.string()
        if ttype == STRUCT:
            return self.struct()
        if ttype in (LIST, SET):
            elem_t = self._read(1)[0]
            n = self.i32()
            return (elem_t, [self.value(elem_t) for _ in range(n)])
        if ttype == MAP:
            kt = self._read(1)[0]
            vt = self._read(1)[0]
            n = self.i32()
            return (kt, vt, {self.value(kt): self.value(vt) for _ in range(n)})
        raise TApplicationException(f"cannot decode ttype {ttype}")

    def struct(self) -> Dict[int, Tuple[int, Any]]:
        fields: Dict[int, Tuple[int, Any]] = {}
        while True:
            ttype = self._read(1)[0]
            if ttype == STOP:
                return fields
            fid = self.i16()
            fields[fid] = (ttype, self.value(ttype))

    def message(self) -> Tuple[str, int, int, Dict[int, Tuple[int, Any]]]:
        head = self.i32() & 0xFFFFFFFF
        if head & 0xFFFF0000 != _VERSION_1:
            raise TApplicationException("old-style unframed message header")
        mtype = head & 0xFF
        name = self.string()
        seqid = self.i32()
        return name, mtype, seqid, self.struct()


# -------------------------------------------------------------- transport
class ThriftClient:
    """Buffered- or framed-transport RPC client over a TCP socket.

    ``call`` returns the REPLY result struct ``{fid: (ttype, value)}``;
    field 0 is the method's success slot, other fields are declared
    exceptions (thrift-rpc.md response-struct convention).
    """

    def __init__(self, host: str, port: int, framed: bool = False,
                 timeout: float = 10.0):
        self._addr = (host, port)
        self._framed = framed
        self._timeout = timeout
        self._sock: socket.socket | None = None
        self._seq = 0
        # one in-flight RPC per connection: concurrent callers serialize
        # here instead of interleaving bytes on the shared socket
        self._mutex = threading.Lock()

    def _connect(self) -> socket.socket:
        if self._sock is None:
            self._sock = socket.create_connection(self._addr, self._timeout)
        return self._sock

    def close(self) -> None:
        if self._sock is not None:
            try:
                self._sock.close()
            finally:
                self._sock = None

    def _read_exact_sock(self, sock: socket.socket, n: int) -> bytes:
        buf = bytearray()
        while len(buf) < n:
            chunk = sock.recv(n - len(buf))
            if not chunk:
                raise ConnectionError("metastore closed the connection")
            buf += chunk
        return bytes(buf)

    def call(self, method: str,
             args: Dict[int, Tuple[int, Any]]) -> Dict[int, Tuple[int, Any]]:
        with self._mutex:
            return self._call_locked(method, args)

    def _call_locked(self, method: str,
                     args: Dict[int, Tuple[int, Any]]
                     ) -> Dict[int, Tuple[int, Any]]:
        self._seq += 1
        msg = encode_message(method, CALL, self._seq, args)
        sock = self._connect()
        try:
            if self._framed:
                sock.sendall(struct.pack(">i", len(msg)) + msg)
            else:
                sock.sendall(msg)
        except (ConnectionError, OSError):
            # the pooled connection went stale (metastore restart, idle
            # reset). Failing during SEND means the request cannot have
            # been applied, so one reconnect+resend is always safe — a
            # failure during the reply read below is NOT retried (the call
            # may have landed server-side).
            self.close()
            sock = self._connect()
            if self._framed:
                sock.sendall(struct.pack(">i", len(msg)) + msg)
            else:
                sock.sendall(msg)
        try:
            if self._framed:
                n = struct.unpack(
                    ">i", self._read_exact_sock(sock, 4))[0]
                frame = self._read_exact_sock(sock, n)
                pos = [0]

                def rd(k: int) -> bytes:
                    b = frame[pos[0]:pos[0] + k]
                    pos[0] += k
                    return b
                reader = Reader(rd)
            else:
                reader = Reader(lambda k: self._read_exact_sock(sock, k))
            name, mtype, _seqid, payload = reader.message()
        except (ConnectionError, OSError):
            self.close()
            raise
        if mtype == EXCEPTION:
            text = payload.get(1, (STRING, "unknown"))[1]
            raise TApplicationException(f"{method}: {text}")
        return payload
