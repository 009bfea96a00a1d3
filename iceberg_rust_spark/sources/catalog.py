"""Filesystem ("hadoop-style") catalog with optimistic-concurrency commits.

Same trait surface as the reference's Catalog
(/root/reference/crates/iceberg/src/catalog/mod.rs:58): namespace + table CRUD
plus ``commit_table`` CAS. Atomicity on a local/posix FS via ``os.rename`` of
the next ``vN.metadata.json`` with O_EXCL create — a concurrent committer loses
the race and gets CommitConflict, which Transaction retries with
refresh-and-reapply (transaction/mod.rs:175-219 behavior).

On object stores this would swap to a conditional PUT; the reference likewise
punts real atomicity to catalog servers.
"""

from __future__ import annotations

import os
import re
import shutil
from typing import Dict, List, Optional, Tuple

from .metadata import TableMetadata

VERSION_RE = re.compile(r"^v(\d+)\.metadata\.json$")


class CommitConflict(Exception):
    """Another writer committed first; refresh and retry."""


class NoSuchTable(Exception):
    pass


class TableAlreadyExists(Exception):
    pass


class FileSystemCatalog:
    def __init__(self, warehouse: str):
        self.warehouse = os.path.abspath(warehouse)
        os.makedirs(self.warehouse, exist_ok=True)

    # -- identifiers: "namespace.table" -----------------------------------
    def _table_dir(self, identifier: str) -> str:
        parts = identifier.split(".")
        return os.path.join(self.warehouse, *parts)

    def _metadata_dir(self, identifier: str) -> str:
        return os.path.join(self._table_dir(identifier), "metadata")

    # -- namespaces --------------------------------------------------------
    def create_namespace(self, namespace: str) -> None:
        os.makedirs(os.path.join(self.warehouse, *namespace.split(".")), exist_ok=True)

    def list_namespaces(self) -> List[str]:
        out = []
        for name in sorted(os.listdir(self.warehouse)):
            p = os.path.join(self.warehouse, name)
            if os.path.isdir(p) and not os.path.isdir(os.path.join(p, "metadata")):
                out.append(name)
        return out

    def list_tables(self, namespace: str) -> List[str]:
        ns_dir = os.path.join(self.warehouse, *namespace.split("."))
        if not os.path.isdir(ns_dir):
            return []
        return sorted(
            name for name in os.listdir(ns_dir)
            if os.path.isfile(os.path.join(ns_dir, name, "metadata",
                                           "version-hint.text")))

    # -- tables ------------------------------------------------------------
    def table_exists(self, identifier: str) -> bool:
        return os.path.isfile(os.path.join(self._metadata_dir(identifier), "version-hint.text"))

    def create_table(self, identifier: str, metadata: TableMetadata) -> TableMetadata:
        md_dir = self._metadata_dir(identifier)
        if self.table_exists(identifier):
            raise TableAlreadyExists(identifier)
        os.makedirs(md_dir, exist_ok=True)
        os.makedirs(os.path.join(self._table_dir(identifier), "data"), exist_ok=True)
        metadata.location = self._table_dir(identifier)
        self._write_version(identifier, 1, metadata)
        return metadata

    def load_table(self, identifier: str) -> Tuple[TableMetadata, int]:
        md_dir = self._metadata_dir(identifier)
        hint = os.path.join(md_dir, "version-hint.text")
        if not os.path.isfile(hint):
            raise NoSuchTable(identifier)
        with open(hint) as fh:
            version = int(fh.read().strip())
        with open(os.path.join(md_dir, f"v{version}.metadata.json")) as fh:
            return TableMetadata.from_json(fh.read()), version

    def drop_table(self, identifier: str, purge: bool = True) -> None:
        tdir = self._table_dir(identifier)
        if not os.path.isdir(tdir):
            raise NoSuchTable(identifier)
        if purge:
            shutil.rmtree(tdir)
        else:
            shutil.rmtree(os.path.join(tdir, "metadata"))

    def rename_table(self, src: str, dst: str) -> None:
        """Catalog-entry rename (Catalog::rename_table, catalog/mod.rs:~380):
        only the identifier that resolves to the metadata moves — the table
        LOCATION (data files, manifests) stays put and keeps its absolute
        paths, so no data rewrite. Same semantics as the reference's
        REST/memory catalogs, where identifier and location are independent.
        """
        if not self.table_exists(src):
            raise NoSuchTable(src)
        if self.table_exists(dst):
            raise TableAlreadyExists(dst)
        src_md = self._metadata_dir(src)
        dst_md = self._metadata_dir(dst)
        os.makedirs(dst_md, exist_ok=True)
        md, version = self.load_table(src)
        for f in os.listdir(src_md):
            if f.endswith(".metadata.json") or f == "version-hint.text":
                shutil.move(os.path.join(src_md, f), os.path.join(dst_md, f))
        # metadata-log entries pointed at the moved version files — re-anchor
        for entry in md.metadata_log:
            entry["metadata-file"] = entry["metadata-file"].replace(
                src_md, dst_md, 1)
        with open(os.path.join(dst_md, f"v{version}.metadata.json"), "w") as fh:
            fh.write(md.to_json())

    def commit_table(self, identifier: str, base_version: int,
                     metadata: TableMetadata) -> int:
        """CAS commit: succeed only if base_version is still current."""
        new_version = base_version + 1
        md_dir = self._metadata_dir(identifier)
        target = os.path.join(md_dir, f"v{new_version}.metadata.json")
        # spec metadata-log: record the superseded metadata file, capped by
        # write.metadata.previous-versions-max (default 100)
        prev = os.path.join(md_dir, f"v{base_version}.metadata.json")
        if os.path.isfile(prev):
            metadata.metadata_log.append({
                "timestamp-ms": int(os.path.getmtime(prev) * 1000),
                "metadata-file": prev})
            keep = int(metadata.properties.get(
                "write.metadata.previous-versions-max", "100"))
            metadata.metadata_log = metadata.metadata_log[-keep:]
        try:
            fd = os.open(target, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            raise CommitConflict(f"{identifier}: v{new_version} already committed")
        with os.fdopen(fd, "w") as fh:
            fh.write(metadata.to_json())
        self._write_hint(md_dir, new_version)
        return new_version

    # -- helpers -----------------------------------------------------------
    def _write_version(self, identifier: str, version: int, metadata: TableMetadata) -> None:
        md_dir = self._metadata_dir(identifier)
        with open(os.path.join(md_dir, f"v{version}.metadata.json"), "w") as fh:
            fh.write(metadata.to_json())
        self._write_hint(md_dir, version)

    @staticmethod
    def _write_hint(md_dir: str, version: int) -> None:
        tmp = os.path.join(md_dir, f".version-hint.{version}.tmp")
        with open(tmp, "w") as fh:
            fh.write(str(version))
        os.replace(tmp, os.path.join(md_dir, "version-hint.text"))
