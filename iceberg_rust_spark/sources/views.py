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


# view builder property knobs (spec/view_metadata.rs:45-51)
PROP_DROP_DIALECT_ALLOWED = "replace.drop-dialect.allowed"
PROP_VERSION_HISTORY_SIZE = "version.history.num-entries"
VERSION_HISTORY_SIZE_DEFAULT = 10


@dataclass
class ViewVersion:
    version_id: int
    timestamp_ms: int
    sql: str
    dialect: str = "spark"
    default_namespace: str = "db"
    summary: Dict[str, str] = dc_field(default_factory=dict)
    # full multi-dialect representation list; when None, derived from
    # (sql, dialect). A version may carry the same SQL in several dialects
    # (view_metadata.rs:456-458) but only one representation PER dialect
    # (view_metadata_builder.rs:303 require_unique_dialects).
    representations: Optional[List[Dict[str, str]]] = None
    # schema the view's output rows conform to (view_version.rs:50-51);
    # -1 = "last added schema" sentinel inside a builder transaction
    schema_id: int = 0
    # catalog for unqualified table references (view_version.rs:59-61)
    default_catalog: Optional[str] = None

    def reps(self) -> List[Dict[str, str]]:
        return self.representations or [{"type": "sql", "sql": self.sql,
                                         "dialect": self.dialect}]

    def dialects(self) -> set:
        return {r.get("dialect", "spark").lower() for r in self.reps()}

    def sql_for(self, dialect: str = "spark") -> str:
        for r in self.reps():
            if r.get("dialect", "spark").lower() == dialect.lower():
                return r["sql"]
        return self.reps()[0]["sql"]

    def same_content(self, other: "ViewVersion") -> bool:
        return (self.reps() == other.reps()
                and self.default_namespace == other.default_namespace)

    def behaves_identical_to(self, other: "ViewVersion") -> bool:
        """Version identity for id reuse (view_version.rs:142-148): summary,
        representations, default catalog/namespace, and schema id — NOT the
        version id or timestamp."""
        return (self.summary == other.summary
                and self.reps() == other.reps()
                and self.default_catalog == other.default_catalog
                and self.default_namespace == other.default_namespace
                and self.schema_id == other.schema_id)

    def replaced(self, version_id: Optional[int] = None,
                 schema_id: Optional[int] = None) -> "ViewVersion":
        """Copy with a new version/schema id (with_version_id/with_schema_id)."""
        from dataclasses import replace as _replace
        out = self
        if version_id is not None:
            out = _replace(out, version_id=version_id)
        if schema_id is not None:
            out = _replace(out, schema_id=schema_id)
        return out

    def to_json(self) -> dict:
        # default-namespace is a LIST of levels in the spec JSON
        # (ViewMetadataV1Valid.json); internally a dotted string
        d = {"version-id": self.version_id, "timestamp-ms": self.timestamp_ms,
             "schema-id": self.schema_id,
             "summary": self.summary,
             "default-namespace": self.default_namespace.split("."),
             "representations": self.reps()}
        if self.default_catalog is not None:
            d["default-catalog"] = self.default_catalog
        return d

    @staticmethod
    def from_json(d: dict) -> "ViewVersion":
        reps = [r for r in d["representations"] if r["type"] == "sql"]
        rep = reps[0]
        ns = d.get("default-namespace", "db")
        if isinstance(ns, list):
            ns = ".".join(ns)
        return ViewVersion(d["version-id"], d["timestamp-ms"], rep["sql"],
                           rep.get("dialect", "spark"),
                           ns, d.get("summary", {}),
                           representations=reps,
                           schema_id=d.get("schema-id", 0),
                           default_catalog=d.get("default-catalog"))


@dataclass
class ViewMetadata:
    view_uuid: str
    location: str
    current_version_id: int
    versions: List[ViewVersion]
    properties: Dict[str, str] = dc_field(default_factory=dict)
    # schemas referenced by versions, spec-shaped dicts
    # {"schema-id": int, "type": "struct", "fields": [...]}
    # (view_metadata.rs: schemas map keyed by schema-id)
    schemas: List[dict] = dc_field(default_factory=list)
    # [{"version-id": int, "timestamp-ms": int}] — when each version became
    # current (view_metadata.rs:199 ViewVersionLog)
    version_log: List[dict] = dc_field(default_factory=list)
    format_version: int = 1

    def current_version(self) -> ViewVersion:
        return next(v for v in self.versions if v.version_id == self.current_version_id)

    def version_by_id(self, version_id: int) -> Optional[ViewVersion]:
        return next((v for v in self.versions if v.version_id == version_id),
                    None)

    def schema_by_id(self, schema_id: int) -> Optional[dict]:
        return next((s for s in self.schemas
                     if s.get("schema-id", 0) == schema_id), None)

    def to_json(self) -> str:
        return json.dumps({
            "view-uuid": self.view_uuid, "format-version": self.format_version,
            "location": self.location,
            "current-version-id": self.current_version_id,
            "versions": [v.to_json() for v in self.versions],
            "version-log": self.version_log,
            "schemas": self.schemas,
            "properties": self.properties}, indent=2)

    @staticmethod
    def from_json(text: str) -> "ViewMetadata":
        d = json.loads(text)
        return ViewMetadata(d["view-uuid"], d["location"], d["current-version-id"],
                            [ViewVersion.from_json(v) for v in d["versions"]],
                            d.get("properties", {}),
                            schemas=d.get("schemas", []),
                            version_log=d.get("version-log", []),
                            format_version=d.get("format-version", 1))


class ViewCatalog:
    """View CRUD over the same warehouse directory layout as tables."""

    def __init__(self, catalog: FileSystemCatalog):
        self.catalog = catalog

    @property
    def _io(self):
        return self.catalog.io

    def _view_path(self, identifier: str) -> str:
        from .io import posix_join
        if not hasattr(self.catalog, "warehouse"):
            # e.g. S3Tables: the service owns all locations and has no
            # Iceberg-view concept — match it with a named error
            raise ValueError(
                f"catalog {type(self.catalog).__name__} has no view storage")
        parts = identifier.split(".")
        return posix_join(self.catalog.warehouse, *parts[:-1],
                          f"{parts[-1]}.view.json")

    def create_view(self, identifier: str, sql: str,
                    properties: Optional[Dict[str, str]] = None) -> ViewMetadata:
        from .view_builder import ViewMetadataBuilder
        path = self._view_path(identifier)
        if self._io.is_file(path):
            raise ValueError(f"view {identifier} exists")
        ns = ".".join(identifier.split(".")[:-1]) or "db"
        builder = ViewMetadataBuilder.from_view_creation(
            path, [{"type": "sql", "sql": sql, "dialect": "spark"}], ns,
            properties=properties)
        md, _ = builder.build()
        self._io.write_text(path, md.to_json())
        return md

    def replace_view(self, identifier: str, sql: str,
                     dialect: str = "spark",
                     representations: Optional[List[Dict[str, str]]] = None
                     ) -> ViewMetadata:
        """CREATE OR REPLACE semantics with the reference builder's rules
        (view_metadata_builder.rs):

        - dialect-drop guard (:482-485): the replacement must keep every SQL
          dialect the current version has, unless the view property
          `replace.drop-dialect.allowed=true` — a dropped dialect silently
          breaks OTHER engines reading this view.
        - version dedup (:261 add_version_internal): replacing with content
          identical to an existing version re-points to it, no new version.
        - history expiration (:499-552): keep the newest
          `version.history.num-entries` (default 10, must be positive)
          versions plus the current one.
        """
        from .view_builder import EMPTY_SCHEMA, ViewMetadataBuilder
        md = self.load_view(identifier)
        # stricter than the builder (which clamps to >=1 like the
        # reference's expire_versions): a view whose stored property is
        # explicitly non-positive is a misconfiguration — fail loudly
        raw = md.properties.get(PROP_VERSION_HISTORY_SIZE)
        if raw is not None and int(raw) <= 0:
            raise ValueError(f"{PROP_VERSION_HISTORY_SIZE} must be positive,"
                             f" got {raw}")
        prev = md.current_version()
        new = ViewVersion(0, int(time.time() * 1000), sql, dialect,
                          default_namespace=prev.default_namespace,
                          representations=representations)
        schema = md.schema_by_id(prev.schema_id) or dict(EMPTY_SCHEMA)
        builder = ViewMetadataBuilder(md).set_current_version(new, schema)
        md, _ = builder.build()
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
        if not hasattr(self.catalog, "warehouse"):
            return []  # no view storage on this catalog (see _view_path)
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
        return spark.sql(version.sql_for("spark"))
