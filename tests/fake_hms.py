"""In-process fake Hive metastore speaking real Thrift binary RPC.

Test double for HmsCatalog: a ThreadingTCPServer that decodes strict-binary
Thrift messages off the socket (buffered or framed transport), keeps
databases/tables in dicts, and implements the metastore lock RPCs
(lock/check_lock/unlock) with a per-table FIFO queue so the catalog's
EXCLUSIVE-lock commit protocol is exercised for real — including the
WAITING -> check_lock -> ACQUIRED path and conflicting committers.

Only the server-side state machine lives here; the wire codec is
iceberg_rust_spark.sources.thrift_proto (the codec IS the public spec, so
client and server sharing it is the same situation as both ends linking
libthrift).
"""

from __future__ import annotations

import socketserver
import struct
import threading
from typing import Dict, Tuple

from iceberg_rust_spark.sources import thrift_proto as tp

NO_SUCH_OBJECT = {1: (tp.STRING, "NoSuchObjectException")}
ALREADY_EXISTS = {1: (tp.STRING, "AlreadyExistsException: already exists")}


class _State:
    def __init__(self):
        self.dbs: Dict[str, dict] = {}
        self.tables: Dict[Tuple[str, str], dict] = {}
        self.mutex = threading.Lock()
        self.next_lock_id = 1
        # (db, table) -> [lock_id, ...] FIFO; head holds the lock
        self.lock_queues: Dict[Tuple[str, str], list] = {}
        self.lock_target: Dict[int, Tuple[str, str]] = {}


def _sget(st, fid, default=None):
    e = st.get(fid)
    return e[1] if e is not None else default


class _Handler(socketserver.BaseRequestHandler):
    def _read_exact(self, n: int) -> bytes:
        buf = bytearray()
        while len(buf) < n:
            chunk = self.request.recv(n - len(buf))
            if not chunk:
                raise ConnectionError("client gone")
            buf += chunk
        return bytes(buf)

    def handle(self):
        st: _State = self.server.state  # type: ignore[attr-defined]
        framed: bool = self.server.framed  # type: ignore[attr-defined]
        while True:
            try:
                if framed:
                    n = struct.unpack(">i", self._read_exact(4))[0]
                    frame = self._read_exact(n)
                    pos = [0]

                    def rd(k, _f=frame, _p=pos):
                        b = _f[_p[0]:_p[0] + k]
                        _p[0] += k
                        return b
                    reader = tp.Reader(rd)
                else:
                    reader = tp.Reader(self._read_exact)
                name, _mtype, seqid, args = reader.message()
            except (ConnectionError, OSError, struct.error):
                return
            result = self._dispatch(st, name, args)
            msg = tp.encode_message(name, tp.REPLY, seqid, result)
            if framed:
                msg = struct.pack(">i", len(msg)) + msg
            try:
                self.request.sendall(msg)
            except OSError:
                return

    # ---------------------------------------------------------- dispatch
    def _dispatch(self, st: _State, method: str, args):
        fn = getattr(self, "do_" + method, None)
        if fn is None:
            return {1: (tp.STRUCT,
                        {1: (tp.STRING, f"unknown method {method}")})}
        with st.mutex:
            return fn(st, args)

    # namespaces
    def do_get_all_databases(self, st, args):
        return {0: (tp.LIST, (tp.STRING, sorted(st.dbs)))}

    def do_get_database(self, st, args):
        name = _sget(args, 1)
        db = st.dbs.get(name)
        if db is None:
            return {1: (tp.STRUCT, dict(NO_SUCH_OBJECT))}
        return {0: (tp.STRUCT, db)}

    def do_create_database(self, st, args):
        db = _sget(args, 1)
        name = _sget(db, 1)
        if name in st.dbs:
            return {1: (tp.STRUCT, dict(ALREADY_EXISTS))}
        st.dbs[name] = db
        return {}

    def do_alter_database(self, st, args):
        name = _sget(args, 1)
        if name not in st.dbs:
            return {2: (tp.STRUCT, dict(NO_SUCH_OBJECT))}
        st.dbs[name] = _sget(args, 2)
        return {}

    def do_drop_database(self, st, args):
        name = _sget(args, 1)
        if name not in st.dbs:
            return {1: (tp.STRUCT, dict(NO_SUCH_OBJECT))}
        if any(db == name for db, _ in st.tables):
            return {2: (tp.STRUCT,
                        {1: (tp.STRING, "InvalidOperation: not empty")})}
        del st.dbs[name]
        return {}

    # tables
    def do_get_all_tables(self, st, args):
        db = _sget(args, 1)
        if db not in st.dbs:
            return {1: (tp.STRUCT, dict(NO_SUCH_OBJECT))}
        names = sorted(t for d, t in st.tables if d == db)
        return {0: (tp.LIST, (tp.STRING, names))}

    def do_get_table(self, st, args):
        key = (_sget(args, 1), _sget(args, 2))
        tbl = st.tables.get(key)
        if tbl is None:
            return {2: (tp.STRUCT, dict(NO_SUCH_OBJECT))}
        return {0: (tp.STRUCT, tbl)}

    def do_create_table(self, st, args):
        tbl = _sget(args, 1)
        key = (_sget(tbl, 2), _sget(tbl, 1))
        if key[0] not in st.dbs:
            return {4: (tp.STRUCT, dict(NO_SUCH_OBJECT))}
        if key in st.tables:
            return {1: (tp.STRUCT, dict(ALREADY_EXISTS))}
        st.tables[key] = tbl
        return {}

    def do_alter_table(self, st, args):
        key = (_sget(args, 1), _sget(args, 2))
        if key not in st.tables:
            return {2: (tp.STRUCT, dict(NO_SUCH_OBJECT))}
        new_tbl = _sget(args, 3)
        new_key = (_sget(new_tbl, 2), _sget(new_tbl, 1))
        del st.tables[key]
        st.tables[new_key] = new_tbl
        return {}

    def do_drop_table(self, st, args):
        key = (_sget(args, 1), _sget(args, 2))
        if key not in st.tables:
            return {1: (tp.STRUCT, dict(NO_SUCH_OBJECT))}
        del st.tables[key]
        return {}

    # locks: FIFO queue per table; head of queue holds the lock
    def do_lock(self, st, args):
        req = _sget(args, 1)
        comps = _sget(req, 1, (tp.STRUCT, []))[1]
        comp = comps[0] if comps else {}
        key = (_sget(comp, 3, ""), _sget(comp, 4, ""))
        lock_id = st.next_lock_id
        st.next_lock_id += 1
        q = st.lock_queues.setdefault(key, [])
        q.append(lock_id)
        st.lock_target[lock_id] = key
        state = 1 if q[0] == lock_id else 2  # ACQUIRED / WAITING
        return {0: (tp.STRUCT, {1: (tp.I64, lock_id), 2: (tp.I32, state)})}

    def do_check_lock(self, st, args):
        req = _sget(args, 1)
        lock_id = _sget(req, 1)
        key = st.lock_target.get(lock_id)
        if key is None:
            return {1: (tp.STRUCT, dict(NO_SUCH_OBJECT))}
        q = st.lock_queues.get(key, [])
        state = 1 if q and q[0] == lock_id else 2
        return {0: (tp.STRUCT, {1: (tp.I64, lock_id), 2: (tp.I32, state)})}

    def do_unlock(self, st, args):
        req = _sget(args, 1)
        lock_id = _sget(req, 1)
        key = st.lock_target.pop(lock_id, None)
        if key is not None:
            q = st.lock_queues.get(key, [])
            if lock_id in q:
                q.remove(lock_id)
        return {}


class FakeHms(socketserver.ThreadingTCPServer):
    allow_reuse_address = True
    daemon_threads = True

    def __init__(self, framed: bool = False):
        super().__init__(("127.0.0.1", 0), _Handler)
        self.state = _State()
        self.framed = framed
        self._thread = threading.Thread(target=self.serve_forever,
                                        daemon=True)

    def start(self) -> str:
        self._thread.start()
        host, port = self.server_address
        return f"{host}:{port}"

    def stop(self) -> None:
        self.shutdown()
        self.server_close()
