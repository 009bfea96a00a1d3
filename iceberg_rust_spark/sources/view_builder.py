"""ViewMetadataBuilder — the validated state machine for view metadata
commits.

Rule-level port of the reference builder
(crates/iceberg/src/spec/view_metadata_builder.rs): every mutation keeps the
metadata consistent and records a change entry, and ``build()`` enforces the
cross-cutting invariants before the metadata may be committed:

- format-version may only upgrade (:143 upgrade_format_version)
- the current version id must reference an existing version, and that
  version's schema id an existing schema (view_metadata.rs:165 validate)
- a version may carry at most one SQL representation per dialect
  (:614 require_unique_dialects)
- a replacement may not silently drop a dialect another engine reads,
  unless `replace.drop-dialect.allowed` is truthy (:576,:585)
- version/schema ids are reused when content is identical
  (:343 reuse_or_create_new_view_version_id, :403 reuse_or_create_new_schema_id)
- `-1` means "the version/schema added in this builder" (:183,:294)
- version timestamps may not go backwards beyond 1 minute of clock skew
  vs the last log entry (:304-323)
- history is trimmed to `version.history.num-entries` (>=1, never dropping
  versions added by this builder nor the current version; :500 expire_versions)
- the version log is truncated at gaps: when an expired version id appears
  in the log, everything up to and including it is dropped
  (:561 update_version_log)

Changes are emitted as wire-shaped dicts (``{"action": "add-view-version",
...}``) matching the REST catalog update actions in sources/updates.py style.
"""

from __future__ import annotations

import copy
import time
import uuid as _uuid
from typing import Dict, List, Optional, Tuple

from .views import ViewMetadata, ViewVersion

LAST_ADDED = -1
INITIAL_VIEW_VERSION_ID = 1          # view_metadata.rs:42
DEFAULT_SCHEMA_ID = 0                # view_metadata.rs:54
PROP_VERSION_HISTORY_SIZE = "version.history.num-entries"
VERSION_HISTORY_SIZE_DEFAULT = 10    # view_metadata.rs:51
PROP_DROP_DIALECT_ALLOWED = "replace.drop-dialect.allowed"
DROP_DIALECT_ALLOWED_DEFAULT = False
ONE_MINUTE_MS = 60_000

EMPTY_SCHEMA = {"schema-id": DEFAULT_SCHEMA_ID, "type": "struct",
                "fields": []}


class ViewBuildError(ValueError):
    """Metadata mutation the reference builder rejects (DataInvalid)."""


def _is_truthy(value: str) -> bool:
    # io/mod.rs:60 — the reference's property-boolean parse
    return value.lower() in ("true", "t", "1", "on")


def _schema_body(schema: dict) -> dict:
    """Schema identity ignores the assigned id (Schema::is_same_schema)."""
    return {k: v for k, v in schema.items() if k != "schema-id"}


def _highest_field_id(node) -> int:
    """Max field id anywhere in a spec-shaped schema dict (for the
    AddSchema change's last-column-id)."""
    best = 0
    if isinstance(node, dict):
        for key in ("id", "element-id", "key-id", "value-id"):
            v = node.get(key)
            if isinstance(v, int):
                best = max(best, v)
        for key in ("fields", "type", "element", "key", "value"):
            if key in node:
                best = max(best, _highest_field_id(node[key]))
    elif isinstance(node, list):
        for item in node:
            best = max(best, _highest_field_id(item))
    return best


def _now_ms() -> int:
    return int(time.time() * 1000)


class ViewMetadataBuilder:
    """Stateful builder over a (deep-copied) ViewMetadata; every public
    method mirrors one reference builder method and raises ViewBuildError
    where the reference returns ErrorKind::DataInvalid."""

    def __init__(self, previous: ViewMetadata):
        # new_from_metadata (:102): remember the previous current version
        # for the dialect-drop check at build() time
        self.metadata = copy.deepcopy(previous)
        self.changes: List[dict] = []
        self.last_added_schema_id: Optional[int] = None
        self.last_added_version_id: Optional[int] = None
        self.history_entry: Optional[dict] = None
        self.previous_view_version: Optional[ViewVersion] = (
            previous.current_version()
            if previous.version_by_id(previous.current_version_id) else None)

    # -- constructors --------------------------------------------------

    @classmethod
    def new(cls, location: str, schema: dict, view_version: ViewVersion,
            properties: Optional[Dict[str, str]] = None,
            format_version: int = 1) -> "ViewMetadataBuilder":
        """Builder for a brand-new view (:69): location + first version +
        schema + properties, all validated through the same mutators."""
        md = ViewMetadata(str(_uuid.uuid4()), "", -1, [], {},
                          schemas=[], version_log=[],
                          format_version=format_version)
        b = cls.__new__(cls)
        b.metadata = md
        b.changes = []
        b.last_added_schema_id = None
        b.last_added_version_id = None
        b.history_entry = None
        b.previous_view_version = None  # new view: no dialect baseline
        return (b.set_location(location)
                 .set_current_version(view_version, schema)
                 .set_properties(properties or {}))

    @classmethod
    def from_view_creation(cls, location: str,
                           representations: List[Dict[str, str]],
                           default_namespace: str,
                           schema: Optional[dict] = None,
                           default_catalog: Optional[str] = None,
                           summary: Optional[Dict[str, str]] = None,
                           properties: Optional[Dict[str, str]] = None
                           ) -> "ViewMetadataBuilder":
        """ViewCreation -> builder (:115)."""
        schema = schema if schema is not None else dict(EMPTY_SCHEMA)
        version = ViewVersion(
            INITIAL_VIEW_VERSION_ID, _now_ms(),
            representations[0]["sql"],
            representations[0].get("dialect", "spark"),
            default_namespace, summary or {},
            representations=list(representations),
            schema_id=schema.get("schema-id", DEFAULT_SCHEMA_ID),
            default_catalog=default_catalog)
        return cls.new(location, schema, version, properties)

    # -- simple setters ------------------------------------------------

    def upgrade_format_version(self, format_version: int
                               ) -> "ViewMetadataBuilder":
        """Downgrades rejected (:143)."""
        if format_version < self.metadata.format_version:
            raise ViewBuildError(
                f"Cannot downgrade ViewFormatVersion from "
                f"{self.metadata.format_version} to {format_version}")
        if format_version != self.metadata.format_version:
            self.metadata.format_version = format_version
            self.changes.append({"action": "upgrade-format-version",
                                 "format-version": format_version})
        return self

    def set_location(self, location: str) -> "ViewMetadataBuilder":
        """Trailing slashes stripped; no-op if unchanged (:166)."""
        location = location.rstrip("/")
        if self.metadata.location != location:
            self.metadata.location = location
            self.changes.append({"action": "set-location",
                                 "location": location})
        return self

    def assign_uuid(self, uuid: str) -> "ViewMetadataBuilder":
        if self.metadata.view_uuid != uuid:  # :462
            self.metadata.view_uuid = uuid
            self.changes.append({"action": "assign-uuid", "uuid": uuid})
        return self

    def set_properties(self, updates: Dict[str, str]
                       ) -> "ViewMetadataBuilder":
        """Rejects a parseable-negative history size (:420-443; the
        reference ignores unparseable values, defaulting them later)."""
        if not updates:
            return self
        raw = updates.get(PROP_VERSION_HISTORY_SIZE)
        try:
            n = int(raw) if raw is not None else 1
        except ValueError:
            n = 1
        if n < 0:
            raise ViewBuildError(
                f"{PROP_VERSION_HISTORY_SIZE} must be positive but was {n}")
        self.metadata.properties.update(updates)
        self.changes.append({"action": "set-properties",
                             "updates": dict(updates)})
        return self

    def remove_properties(self, removals: List[str]) -> "ViewMetadataBuilder":
        if not removals:  # :445
            return self
        for p in removals:
            self.metadata.properties.pop(p, None)
        self.changes.append({"action": "remove-properties",
                             "removals": list(removals)})
        return self

    # -- schemas ---------------------------------------------------------

    def add_schema(self, schema: dict) -> "ViewMetadataBuilder":
        self._add_schema_internal(schema)
        return self

    def _add_schema_internal(self, schema: dict) -> int:
        """Reuse the id of a content-identical schema, else highest+1
        (:370-417). Records the change exactly once per distinct id."""
        schema_id = self._reuse_or_new_schema_id(schema)
        existing = self.metadata.schema_by_id(schema_id)
        if existing is not None:
            if self.last_added_schema_id != schema_id:
                self.changes.append({"action": "add-schema",
                                     "schema": {**_schema_body(schema),
                                                "schema-id": schema_id}})
                self.last_added_schema_id = schema_id
            return schema_id
        stored = {**_schema_body(schema), "schema-id": schema_id}
        self.metadata.schemas.append(stored)
        self.changes.append({"action": "add-schema", "schema": stored,
                             "last-column-id": _highest_field_id(stored)})
        self.last_added_schema_id = schema_id
        return schema_id

    def _reuse_or_new_schema_id(self, schema: dict) -> int:
        body = _schema_body(schema)
        for s in self.metadata.schemas:
            if _schema_body(s) == body:
                return s.get("schema-id", DEFAULT_SCHEMA_ID)
        ids = [s.get("schema-id", DEFAULT_SCHEMA_ID)
               for s in self.metadata.schemas]
        return (max(ids) + 1) if ids else DEFAULT_SCHEMA_ID

    # -- versions --------------------------------------------------------

    def add_version(self, view_version: ViewVersion) -> "ViewMetadataBuilder":
        self._add_version_internal(view_version)
        return self

    def _add_version_internal(self, view_version: ViewVersion) -> int:
        version_id = self._reuse_or_new_version_id(view_version)
        view_version = view_version.replaced(version_id=version_id)

        if self.metadata.version_by_id(version_id) is not None:
            # content-identical to an existing version: record the change
            # (the builder state mutated) but add nothing (:264-274)
            if self.last_added_version_id != version_id:
                self.changes.append({"action": "add-view-version",
                                     "view-version": view_version.to_json()})
                self.last_added_version_id = version_id
            return version_id

        if view_version.schema_id == LAST_ADDED:
            if self.last_added_schema_id is None:  # :283-289
                raise ViewBuildError(
                    "Cannot set last added schema: no schema has been added")
            view_version = view_version.replaced(
                schema_id=self.last_added_schema_id)

        if self.metadata.schema_by_id(view_version.schema_id) is None:
            raise ViewBuildError(  # :294-300
                f"Cannot add version with unknown schema: "
                f"{view_version.schema_id}")

        self._require_unique_dialects(view_version)

        if self.metadata.version_log:  # clock-skew guard (:304-323)
            last_ts = self.metadata.version_log[-1]["timestamp-ms"]
            if view_version.timestamp_ms - last_ts < -ONE_MINUTE_MS:
                raise ViewBuildError(
                    f"Invalid snapshot timestamp {view_version.timestamp_ms}:"
                    f" before last snapshot timestamp {last_ts}")

        self.metadata.versions.append(view_version)
        # emit -1 for the schema id when it references the schema added in
        # this same change set (:325-334) — the wire form a REST catalog
        # replays on its own metadata
        emitted = view_version
        if (self.last_added_schema_id is not None
                and view_version.schema_id == self.last_added_schema_id):
            emitted = view_version.replaced(schema_id=LAST_ADDED)
        self.changes.append({"action": "add-view-version",
                             "view-version": emitted.to_json()})
        self.last_added_version_id = version_id
        return version_id

    def _reuse_or_new_version_id(self, view_version: ViewVersion) -> int:
        for v in self.metadata.versions:  # :343-357
            if view_version.behaves_identical_to(v):
                return v.version_id
        ids = [v.version_id for v in self.metadata.versions]
        return (max(ids) + 1) if ids else INITIAL_VIEW_VERSION_ID

    @staticmethod
    def _require_unique_dialects(view_version: ViewVersion) -> None:
        seen = set()
        for rep in view_version.reps():  # :614-631
            d = rep.get("dialect", "spark").lower()
            if d in seen:
                raise ViewBuildError(
                    f"Invalid view version: Cannot add multiple queries "
                    f"for dialect {rep.get('dialect', 'spark')}")
            seen.add(d)

    def set_current_version_id(self, version_id: int
                               ) -> "ViewMetadataBuilder":
        """-1 = the version added by this builder (:183-236)."""
        if version_id == LAST_ADDED:
            if self.last_added_version_id is None:
                raise ViewBuildError(
                    "Cannot set current version id to last added version: "
                    "no version has been added.")
            version_id = self.last_added_version_id

        if version_id == self.metadata.current_version_id:
            return self

        version = self.metadata.version_by_id(version_id)
        if version is None:
            raise ViewBuildError(
                f"Cannot set current version to unknown version with id: "
                f"{version_id}")

        self.metadata.current_version_id = version_id
        self.changes.append({
            "action": "set-current-view-version",
            "view-version-id": (LAST_ADDED
                                if self.last_added_version_id == version_id
                                else version_id)})

        # log timestamp: the version's own if it was added in this change
        # set, else "now" (the version came from a past transaction)
        added_here = any(
            c.get("action") == "add-view-version"
            and c["view-version"].get("version-id") == version_id
            for c in self.changes)
        self.history_entry = {
            "version-id": version_id,
            "timestamp-ms": (version.timestamp_ms if added_here
                             else _now_ms())}
        return self

    def set_current_version(self, view_version: ViewVersion,
                            schema: dict) -> "ViewMetadataBuilder":
        """Add schema + version, then point current at it (:238-249)."""
        schema_id = self._add_schema_internal(schema)
        view_version = view_version.replaced(schema_id=schema_id)
        version_id = self._add_version_internal(view_version)
        return self.set_current_version_id(version_id)

    # -- build -----------------------------------------------------------

    def build(self) -> Tuple[ViewMetadata, List[dict]]:
        """Validate + expire + trim the log; returns (metadata, changes)
        (:472-498)."""
        if self.history_entry is not None:
            self.metadata.version_log.append(self.history_entry)
            self.history_entry = None

        # view_metadata.rs:165 validate()
        current = self.metadata.version_by_id(
            self.metadata.current_version_id)
        if current is None:
            raise ViewBuildError(
                f"No version exists with the current version id "
                f"{self.metadata.current_version_id}.")
        if self.metadata.schema_by_id(current.schema_id) is None:
            raise ViewBuildError(
                f"No schema exists with the schema id {current.schema_id}.")

        if self.previous_view_version is not None:
            allowed = _is_truthy(self.metadata.properties.get(
                PROP_DROP_DIALECT_ALLOWED,
                str(DROP_DIALECT_ALLOWED_DEFAULT)))
            if not allowed:
                prev_d = self.previous_view_version.dialects()
                cur_d = current.dialects()
                if not cur_d >= prev_d:  # :585-602
                    raise ViewBuildError(
                        f"Cannot replace view due to loss of view dialects:"
                        f" Previous dialects: {sorted(prev_d)} New dialects:"
                        f" {sorted(cur_d)} Set {PROP_DROP_DIALECT_ALLOWED}"
                        f" to true to allow dropping dialects.")

        self._expire_versions()
        self._update_version_log()
        return self.metadata, self.changes

    def _expire_versions(self) -> List[ViewVersion]:
        """Keep the newest `version.history.num-entries` versions by id
        (min 1, never fewer than were added by this builder), always
        retaining the current version — when the current version is old,
        it displaces the lowest kept id (:500-552)."""
        raw = self.metadata.properties.get(PROP_VERSION_HISTORY_SIZE)
        try:
            keep = int(raw) if raw is not None else (
                VERSION_HISTORY_SIZE_DEFAULT)
            if keep < 0:
                keep = VERSION_HISTORY_SIZE_DEFAULT
        except ValueError:
            keep = VERSION_HISTORY_SIZE_DEFAULT
        keep = max(keep, 1)
        num_added = sum(1 for c in self.changes
                        if c.get("action") == "add-view-version")
        keep = max(keep, num_added)

        if len(self.metadata.versions) <= keep:
            return []
        ids = sorted((v.version_id for v in self.metadata.versions),
                     reverse=True)
        keep_ids = set(ids[:keep])
        cur = self.metadata.current_version_id
        if cur not in keep_ids:
            if keep > num_added and keep_ids:
                keep_ids.remove(min(keep_ids))
            keep_ids.add(cur)
        expired = [v for v in self.metadata.versions
                   if v.version_id not in keep_ids]
        self.metadata.versions = [v for v in self.metadata.versions
                                  if v.version_id in keep_ids]
        return expired

    def _update_version_log(self) -> None:
        """Truncate the log at gaps: an expired id in the log invalidates
        everything before and including it (:561-573) — a reader walking
        history must never cross a missing version."""
        kept_ids = {v.version_id for v in self.metadata.versions}
        retained: List[dict] = []
        for entry in self.metadata.version_log:
            if entry["version-id"] in kept_ids:
                retained.append(entry)
            else:
                retained.clear()
        self.metadata.version_log = retained
