"""Views: versioned SQL view metadata + execution through spark.sql.

Counterpart of the reference's view support (spec/view_metadata.rs:59, SQL
representations at :456-458): view metadata is a JSON file holding versioned
SQL text + the default namespace; executing a view registers the referenced
tables as temp views and runs the SQL through Catalyst.
"""

from __future__ import annotations

import json
import os
import time
import uuid
from dataclasses import dataclass, field as dc_field
from typing import Dict, List, Optional

from pyspark.sql import DataFrame, SparkSession

from .catalog import FileSystemCatalog, NoSuchTable
from .table import Table


@dataclass
class ViewVersion:
    version_id: int
    timestamp_ms: int
    sql: str
    dialect: str = "spark"
    default_namespace: str = "db"
    summary: Dict[str, str] = dc_field(default_factory=dict)

    def to_json(self) -> dict:
        return {"version-id": self.version_id, "timestamp-ms": self.timestamp_ms,
                "summary": self.summary, "default-namespace": self.default_namespace,
                "representations": [{"type": "sql", "sql": self.sql,
                                     "dialect": self.dialect}]}

    @staticmethod
    def from_json(d: dict) -> "ViewVersion":
        rep = next(r for r in d["representations"] if r["type"] == "sql")
        return ViewVersion(d["version-id"], d["timestamp-ms"], rep["sql"],
                           rep.get("dialect", "spark"),
                           d.get("default-namespace", "db"), d.get("summary", {}))


@dataclass
class ViewMetadata:
    view_uuid: str
    location: str
    current_version_id: int
    versions: List[ViewVersion]
    properties: Dict[str, str] = dc_field(default_factory=dict)

    def current_version(self) -> ViewVersion:
        return next(v for v in self.versions if v.version_id == self.current_version_id)

    def to_json(self) -> str:
        return json.dumps({
            "view-uuid": self.view_uuid, "format-version": 1,
            "location": self.location,
            "current-version-id": self.current_version_id,
            "versions": [v.to_json() for v in self.versions],
            "properties": self.properties}, indent=2)

    @staticmethod
    def from_json(text: str) -> "ViewMetadata":
        d = json.loads(text)
        return ViewMetadata(d["view-uuid"], d["location"], d["current-version-id"],
                            [ViewVersion.from_json(v) for v in d["versions"]],
                            d.get("properties", {}))


class ViewCatalog:
    """View CRUD over the same warehouse directory layout as tables."""

    def __init__(self, catalog: FileSystemCatalog):
        self.catalog = catalog

    @property
    def _io(self):
        return self.catalog.io

    def _view_path(self, identifier: str) -> str:
        from .io import posix_join
        parts = identifier.split(".")
        return posix_join(self.catalog.warehouse, *parts[:-1],
                          f"{parts[-1]}.view.json")

    def create_view(self, identifier: str, sql: str,
                    properties: Optional[Dict[str, str]] = None) -> ViewMetadata:
        path = self._view_path(identifier)
        if self._io.is_file(path):
            raise ValueError(f"view {identifier} exists")
        md = ViewMetadata(str(uuid.uuid4()), path, 1,
                          [ViewVersion(1, int(time.time() * 1000), sql)],
                          properties or {})
        self._io.write_text(path, md.to_json())
        return md

    def replace_view(self, identifier: str, sql: str) -> ViewMetadata:
        md = self.load_view(identifier)
        next_id = max(v.version_id for v in md.versions) + 1
        md.versions.append(ViewVersion(next_id, int(time.time() * 1000), sql))
        md.current_version_id = next_id
        self._io.write_text(self._view_path(identifier), md.to_json())
        return md

    def load_view(self, identifier: str) -> ViewMetadata:
        path = self._view_path(identifier)
        if not self._io.is_file(path):
            raise NoSuchTable(f"view {identifier}")
        return ViewMetadata.from_json(self._io.read_text(path))

    def drop_view(self, identifier: str) -> None:
        self._io.delete(self._view_path(identifier))

    def list_views(self, namespace: str) -> List[str]:
        from .io import posix_join
        ns_dir = posix_join(self.catalog.warehouse, *namespace.split("."))
        return sorted(f[:-len(".view.json")] for f in self._io.list_dir(ns_dir)
                      if f.endswith(".view.json"))

    def read_view(self, spark: SparkSession, identifier: str,
                  version_id: Optional[int] = None) -> DataFrame:
        """Register every table of the view's namespace as temp views, then
        run the view SQL (the reference likewise delegates execution to its
        SQL engine through catalog providers)."""
        md = self.load_view(identifier)
        version = (md.current_version() if version_id is None else
                   next(v for v in md.versions if v.version_id == version_id))
        ns = version.default_namespace
        for tname in self.catalog.list_tables(ns):
            try:
                t = Table.load(self.catalog, f"{ns}.{tname}")
            except NoSuchTable:
                continue
            t.to_df(spark).createOrReplaceTempView(tname)
        return spark.sql(version.sql)
