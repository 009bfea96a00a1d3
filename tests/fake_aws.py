"""In-process fake AWS endpoints: Glue (JSON 1.1) and S3Tables (rest-json).

Test doubles for GlueCatalog / S3TablesCatalog. Every request's SigV4
signature is RE-DERIVED from the raw request with the shared secret and
rejected on mismatch (sigv4.verify_request), so the clients' canonical-
request construction is genuinely exercised. Glue tables carry a
``VersionId`` that increments on every UpdateTable and must match the
caller's — a stale VersionId gets ConcurrentModificationException, which
is the CAS the reference's commit leans on (glue/src/catalog.rs:934-951).
S3Tables keys CAS off ``versionToken`` on UpdateTableMetadataLocation.
"""

from __future__ import annotations

import json
import threading
import urllib.parse
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Dict, Tuple

from iceberg_rust_spark.sources import sigv4

SECRET = "test-secret-key"
ACCESS = "AKIDTEST"


class _GlueState:
    def __init__(self):
        self.dbs: Dict[str, dict] = {}
        self.tables: Dict[Tuple[str, str], dict] = {}
        self.mutex = threading.Lock()
        self.next_version = 1


class _GlueHandler(BaseHTTPRequestHandler):
    protocol_version = "HTTP/1.1"

    def log_message(self, *a):  # quiet
        pass

    def _reply(self, code: int, body: dict) -> None:
        data = json.dumps(body).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/x-amz-json-1.1")
        self.send_header("Content-Length", str(len(data)))
        self.end_headers()
        self.wfile.write(data)

    def _err(self, type_: str, msg: str, code: int = 400) -> None:
        self._reply(code, {"__type": type_, "Message": msg})

    def do_POST(self):  # noqa: N802
        st: _GlueState = self.server.state  # type: ignore[attr-defined]
        n = int(self.headers.get("Content-Length", 0))
        payload = self.rfile.read(n)
        parsed = urllib.parse.urlsplit(self.path)
        ok, detail = sigv4.verify_request(
            "POST", parsed.path, parsed.query, dict(self.headers), payload,
            secret_key=SECRET)
        if not ok:
            return self._err("IncompleteSignatureException", detail, 403)
        target = self.headers.get("X-Amz-Target", "")
        op = target.split(".", 1)[-1]
        body = json.loads(payload or b"{}")
        fn = getattr(self, "op_" + op, None)
        if fn is None:
            return self._err("InvalidActionException", f"unknown op {op}")
        with st.mutex:
            fn(st, body)

    # -- databases -------------------------------------------------------
    def op_CreateDatabase(self, st, body):  # noqa: N802
        db = body["DatabaseInput"]
        if db["Name"] in st.dbs:
            return self._err("AlreadyExistsException", db["Name"])
        st.dbs[db["Name"]] = db
        self._reply(200, {})

    def op_GetDatabase(self, st, body):  # noqa: N802
        db = st.dbs.get(body["Name"])
        if db is None:
            return self._err("EntityNotFoundException", body["Name"])
        self._reply(200, {"Database": db})

    def op_GetDatabases(self, st, body):  # noqa: N802
        self._reply(200, {"DatabaseList":
                          [st.dbs[k] for k in sorted(st.dbs)]})

    def op_UpdateDatabase(self, st, body):  # noqa: N802
        if body["Name"] not in st.dbs:
            return self._err("EntityNotFoundException", body["Name"])
        st.dbs[body["Name"]] = body["DatabaseInput"]
        self._reply(200, {})

    def op_DeleteDatabase(self, st, body):  # noqa: N802
        if body["Name"] not in st.dbs:
            return self._err("EntityNotFoundException", body["Name"])
        del st.dbs[body["Name"]]
        self._reply(200, {})

    # -- tables ----------------------------------------------------------
    def op_CreateTable(self, st, body):  # noqa: N802
        db = body["DatabaseName"]
        if db not in st.dbs:
            return self._err("EntityNotFoundException", db)
        ti = body["TableInput"]
        key = (db, ti["Name"])
        if key in st.tables:
            return self._err("AlreadyExistsException", ti["Name"])
        tbl = dict(ti)
        tbl["DatabaseName"] = db
        tbl["VersionId"] = str(st.next_version)
        st.next_version += 1
        st.tables[key] = tbl
        self._reply(200, {})

    def op_GetTable(self, st, body):  # noqa: N802
        tbl = st.tables.get((body["DatabaseName"], body["Name"]))
        if tbl is None:
            return self._err("EntityNotFoundException", body["Name"])
        self._reply(200, {"Table": tbl})

    def op_GetTables(self, st, body):  # noqa: N802
        db = body["DatabaseName"]
        tl = [st.tables[k] for k in sorted(st.tables) if k[0] == db]
        self._reply(200, {"TableList": tl})

    def op_UpdateTable(self, st, body):  # noqa: N802
        db = body["DatabaseName"]
        ti = body["TableInput"]
        key = (db, ti["Name"])
        cur = st.tables.get(key)
        if cur is None:
            return self._err("EntityNotFoundException", ti["Name"])
        want = body.get("VersionId")
        if want is not None and want != cur["VersionId"]:
            return self._err("ConcurrentModificationException",
                             f"version {want} is stale")
        tbl = dict(ti)
        tbl["DatabaseName"] = db
        tbl["VersionId"] = str(st.next_version)
        st.next_version += 1
        st.tables[key] = tbl
        self._reply(200, {})

    def op_DeleteTable(self, st, body):  # noqa: N802
        key = (body["DatabaseName"], body["Name"])
        if key not in st.tables:
            return self._err("EntityNotFoundException", body["Name"])
        del st.tables[key]
        self._reply(200, {})


class _S3TablesState:
    def __init__(self, warehouse_root: str):
        self.root = warehouse_root.rstrip("/")
        self.namespaces: set = set()
        # (ns, name) -> {"name","namespace","warehouseLocation",
        #                "metadataLocation"?, "versionToken"}
        self.tables: Dict[Tuple[str, str], dict] = {}
        self.mutex = threading.Lock()
        self.next_token = 1

    def new_token(self) -> str:
        tok = f"vt-{self.next_token}"
        self.next_token += 1
        return tok


class _S3TablesHandler(BaseHTTPRequestHandler):
    protocol_version = "HTTP/1.1"

    def log_message(self, *a):
        pass

    def _reply(self, code: int, body: dict) -> None:
        data = json.dumps(body).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(data)))
        self.end_headers()
        self.wfile.write(data)

    def _err(self, type_: str, msg: str, code: int = 400) -> None:
        self._reply(code, {"__type": type_, "message": msg})

    def _route(self, method: str):
        st: _S3TablesState = self.server.state  # type: ignore[attr-defined]
        n = int(self.headers.get("Content-Length", 0))
        payload = self.rfile.read(n)
        parsed = urllib.parse.urlsplit(self.path)
        ok, detail = sigv4.verify_request(
            method, parsed.path, parsed.query, dict(self.headers), payload,
            secret_key=SECRET)
        if not ok:
            return self._err("AccessDeniedException", detail, 403)
        body = json.loads(payload or b"{}")
        query = dict(urllib.parse.parse_qsl(parsed.query))
        seg = [urllib.parse.unquote(s)
               for s in parsed.path.strip("/").split("/")]
        with st.mutex:
            self._dispatch(st, method, seg, query, body)

    do_GET = lambda self: self._route("GET")     # noqa: E731
    do_PUT = lambda self: self._route("PUT")     # noqa: E731
    do_DELETE = lambda self: self._route("DELETE")  # noqa: E731

    def _dispatch(self, st, method, seg, query, body):
        # /get-table?tableBucketARN=&namespace=&name=
        if seg[0] == "get-table" and method == "GET":
            key = (query.get("namespace", ""), query.get("name", ""))
            tbl = st.tables.get(key)
            if tbl is None:
                return self._err("NotFoundException", "no such table", 404)
            return self._reply(200, tbl)
        if seg[0] == "namespaces":
            if method == "PUT" and len(seg) == 2:
                ns = body["namespace"][0]
                if ns in st.namespaces:
                    return self._err("ConflictException", "exists", 409)
                st.namespaces.add(ns)
                return self._reply(200, {"namespace": [ns]})
            if method == "GET" and len(seg) == 2:
                return self._reply(200, {"namespaces": [
                    {"namespace": [n]} for n in sorted(st.namespaces)]})
            if len(seg) == 3:
                ns = seg[2]
                if ns not in st.namespaces:
                    return self._err("NotFoundException", ns, 404)
                if method == "GET":
                    return self._reply(200, {"namespace": [ns]})
                if method == "DELETE":
                    if any(k[0] == ns for k in st.tables):
                        return self._err("ConflictException",
                                         "namespace not empty", 409)
                    st.namespaces.discard(ns)
                    return self._reply(200, {})
        if seg[0] == "tables":
            if method == "GET" and len(seg) == 2:
                ns = query.get("namespace")
                tl = [st.tables[k] for k in sorted(st.tables)
                      if ns is None or k[0] == ns]
                return self._reply(200, {"tables": tl})
            if method == "PUT" and len(seg) == 3:
                ns = seg[2]
                if ns not in st.namespaces:
                    return self._err("NotFoundException", ns, 404)
                name = body["name"]
                if (ns, name) in st.tables:
                    return self._err("ConflictException", name, 409)
                tok = st.new_token()
                st.tables[(ns, name)] = {
                    "name": name, "namespace": [ns],
                    "warehouseLocation": f"{st.root}/{ns}/{name}",
                    "versionToken": tok,
                    "format": body.get("format", "ICEBERG")}
                return self._reply(200, {"versionToken": tok})
            if len(seg) >= 4:
                ns, name = seg[2], seg[3]
                tbl = st.tables.get((ns, name))
                if tbl is None:
                    return self._err("NotFoundException", name, 404)
                suffix = seg[4] if len(seg) > 4 else ""
                if method == "DELETE" and not suffix:
                    del st.tables[(ns, name)]
                    return self._reply(200, {})
                if method == "PUT" and suffix == "metadata-location":
                    if body.get("versionToken") != tbl["versionToken"]:
                        return self._err("ConflictException",
                                         "stale versionToken", 409)
                    tbl["metadataLocation"] = body["metadataLocation"]
                    tbl["versionToken"] = st.new_token()
                    return self._reply(
                        200, {"versionToken": tbl["versionToken"]})
                if method == "PUT" and suffix == "rename":
                    if body.get("versionToken") != tbl["versionToken"]:
                        return self._err("ConflictException",
                                         "stale versionToken", 409)
                    new_ns = body.get("newNamespaceName", ns)
                    new_name = body.get("newName", name)
                    if new_ns not in st.namespaces:
                        return self._err("NotFoundException", new_ns, 404)
                    if (new_ns, new_name) in st.tables:
                        return self._err("ConflictException", new_name, 409)
                    del st.tables[(ns, name)]
                    tbl["name"] = new_name
                    tbl["namespace"] = [new_ns]
                    tbl["versionToken"] = st.new_token()
                    st.tables[(new_ns, new_name)] = tbl
                    return self._reply(200, {})
        return self._err("NotFoundException", "no route", 404)


class FakeS3Tables(ThreadingHTTPServer):
    allow_reuse_address = True
    daemon_threads = True

    def __init__(self, warehouse_root: str):
        super().__init__(("127.0.0.1", 0), _S3TablesHandler)
        self.state = _S3TablesState(warehouse_root)
        self._thread = threading.Thread(target=self.serve_forever,
                                        daemon=True)

    def start(self) -> str:
        self._thread.start()
        host, port = self.server_address
        return f"http://{host}:{port}"

    def stop(self) -> None:
        self.shutdown()
        self.server_close()


class FakeGlue(ThreadingHTTPServer):
    allow_reuse_address = True
    daemon_threads = True

    def __init__(self):
        super().__init__(("127.0.0.1", 0), _GlueHandler)
        self.state = _GlueState()
        self._thread = threading.Thread(target=self.serve_forever,
                                        daemon=True)

    def start(self) -> str:
        self._thread.start()
        host, port = self.server_address
        return f"http://{host}:{port}"

    def stop(self) -> None:
        self.shutdown()
        self.server_close()
