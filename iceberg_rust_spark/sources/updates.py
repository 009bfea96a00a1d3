"""Commit-protocol IR: TableUpdate appliers + TableRequirement checks.

Counterpart of the reference's catalog commit protocol
(crates/iceberg/src/catalog/mod.rs:443-649): the same externally-tagged
kebab-case wire shapes the Iceberg REST catalog speaks —
``{"action": "add-schema", ...}`` updates and
``{"type": "assert-table-uuid", ...}`` requirements. A catalog commit is
"check every requirement against the CURRENT metadata, then fold every update
into a copy, then CAS" — requirements are the optimistic-concurrency guards,
updates are the state transition.

Validation mirrors the builder rules of spec/table_metadata_builder.rs:
unique ids on add, no dangling current/default pointers, no removing the
active schema/spec, last-added (-1) sentinel resolution.
"""

from __future__ import annotations

import copy
from typing import Any, Dict, List, Optional

from .metadata import (Snapshot, SnapshotRef, SortOrder, TableMetadata,
                       PartitionSpec)
from .types import Schema

LAST_ADDED = -1


class RequirementFailed(Exception):
    """An assert-* requirement did not hold against current metadata."""


class InvalidUpdate(Exception):
    """An update is malformed or violates a metadata invariant."""


# ---------------------------------------------------------------------------
# requirements (catalog/mod.rs:443-501)
# ---------------------------------------------------------------------------

def check_requirement(md: Optional[TableMetadata], req: Dict[str, Any]) -> None:
    """Raise RequirementFailed unless ``req`` holds for ``md`` (None = table
    does not exist)."""
    t = req.get("type")
    if t == "assert-create":
        if md is not None:
            raise RequirementFailed("table already exists")
        return
    if md is None:
        raise RequirementFailed(f"table does not exist (required for {t})")
    if t == "assert-table-uuid":
        if md.table_uuid != req["uuid"]:
            raise RequirementFailed(
                f"uuid {md.table_uuid} != required {req['uuid']}")
    elif t == "assert-ref-snapshot-id":
        ref = md.refs.get(req["ref"])
        want = req.get("snapshot-id")
        if want is None:
            if ref is not None:
                raise RequirementFailed(f"ref {req['ref']} must not exist")
        elif ref is None or ref.snapshot_id != want:
            raise RequirementFailed(
                f"ref {req['ref']} is {ref and ref.snapshot_id}, required {want}")
    elif t == "assert-last-assigned-field-id":
        if md.last_column_id != req["last-assigned-field-id"]:
            raise RequirementFailed(
                f"last-column-id {md.last_column_id} != "
                f"{req['last-assigned-field-id']}")
    elif t == "assert-current-schema-id":
        if md.current_schema_id != req["current-schema-id"]:
            raise RequirementFailed(
                f"current-schema-id {md.current_schema_id} != "
                f"{req['current-schema-id']}")
    elif t == "assert-last-assigned-partition-id":
        if md.last_partition_id != req["last-assigned-partition-id"]:
            raise RequirementFailed(
                f"last-partition-id {md.last_partition_id} != "
                f"{req['last-assigned-partition-id']}")
    elif t == "assert-default-spec-id":
        if md.default_spec_id != req["default-spec-id"]:
            raise RequirementFailed(
                f"default-spec-id {md.default_spec_id} != {req['default-spec-id']}")
    elif t == "assert-default-sort-order-id":
        if md.default_sort_order_id != req["default-sort-order-id"]:
            raise RequirementFailed(
                f"default-sort-order-id {md.default_sort_order_id} != "
                f"{req['default-sort-order-id']}")
    else:
        raise InvalidUpdate(f"unknown requirement type: {t!r}")


# ---------------------------------------------------------------------------
# updates (catalog/mod.rs:506-649)
# ---------------------------------------------------------------------------

def apply_updates(md: TableMetadata,
                  updates: List[Dict[str, Any]]) -> TableMetadata:
    """Fold update dicts into a copy of ``md``; original is untouched."""
    out = copy.deepcopy(md)
    state = {"last_added_schema": None, "last_added_spec": None,
             "last_added_order": None}
    for upd in updates:
        _apply_one(out, upd, state)
    return out


def _apply_one(md: TableMetadata, upd: Dict[str, Any], state: dict) -> None:
    action = upd.get("action")
    if action == "upgrade-format-version":
        v = upd["format-version"]
        if v < md.format_version:
            raise InvalidUpdate(
                f"cannot downgrade format version {md.format_version} -> {v}")
        if v > 3:
            raise InvalidUpdate(f"unsupported format version {v} (max 3)")
        md.format_version = v
    elif action == "assign-uuid":
        md.table_uuid = upd["uuid"]
    elif action == "add-schema":
        schema = (upd["schema"] if isinstance(upd["schema"], Schema)
                  else Schema.from_json_dict(upd["schema"]))
        if any(s.schema_id == schema.schema_id for s in md.schemas):
            raise InvalidUpdate(f"schema id {schema.schema_id} already exists")
        # schema evolution cannot introduce field names that match existing
        # partition field names, unless the name already exists in some
        # historical schema (i.e. an identity partition named after its
        # source) — table_metadata_builder.rs
        # test_schema_evolution_now_correctly_validates_partition_field_name
        # _conflicts / _allows_existing_partition_field_if_exists_in
        # _historical_schema
        part_names = {pf.name for sp in md.partition_specs for pf in sp.fields}
        historical = {f.name for s in md.schemas for f in s.fields}
        for f in schema.fields:
            if f.name in part_names and f.name not in historical:
                raise InvalidUpdate(
                    f"cannot add schema field '{f.name}': conflicts with an "
                    f"existing partition field name (schema evolution cannot "
                    f"introduce field names matching partition field names)")
        md.schemas.append(schema)
        md.last_column_id = max(md.last_column_id, schema.highest_field_id)
        state["last_added_schema"] = schema.schema_id
    elif action == "set-current-schema":
        sid = upd["schema-id"]
        if sid == LAST_ADDED:
            if state["last_added_schema"] is None:
                raise InvalidUpdate("set-current-schema -1 without add-schema")
            sid = state["last_added_schema"]
        target = md.schema(sid)  # raises KeyError if absent
        # cross-validate against the live spec and sort order: every source
        # field they reference must exist in the new current schema
        # (test_add_incompatible_current_schema_fails; the builder's
        # sort-order/schema cross-checks on evolution)
        for pf in md.spec().fields:
            if target.field_by_id(pf.source_id) is None:
                raise InvalidUpdate(
                    f"cannot find partition source field id {pf.source_id} "
                    f"(partition field '{pf.name}') in schema {sid}")
        default_order = next((o for o in md.sort_orders
                              if o.order_id == md.default_sort_order_id), None)
        if default_order is not None:
            for sf in default_order.fields:
                if target.field_by_id(sf.source_id) is None:
                    raise InvalidUpdate(
                        f"cannot find sort source field id {sf.source_id} "
                        f"in schema {sid}")
        md.current_schema_id = sid
    elif action == "add-spec":
        spec = (upd["spec"] if isinstance(upd["spec"], PartitionSpec)
                else PartitionSpec.from_json(upd["spec"]))
        if any(s.spec_id == spec.spec_id for s in md.partition_specs):
            raise InvalidUpdate(f"spec id {spec.spec_id} already exists")
        # cross-spec field-id compatibility (partitioning.rs: two specs
        # defining the same partition field id must agree on source and
        # transform — the id names ONE logical partition field forever).
        # v1 is exempt: its sequential-block rule forces every spec to
        # start at 1000, so ids are NOT unique across v1 specs
        # (partitioning.rs's own caveat).
        by_fid = ({} if md.format_version < 2 else
                  {f.field_id: f for s in md.partition_specs
                   for f in s.fields})
        for pf in spec.fields:
            prev = by_fid.get(pf.field_id)
            if prev is not None and (prev.source_id != pf.source_id
                                     or repr(prev.transform) != repr(pf.transform)):
                raise InvalidUpdate(
                    f"partition field id {pf.field_id} already maps to "
                    f"source {prev.source_id}/{prev.transform!r}; cannot "
                    f"redefine as source {pf.source_id}/{pf.transform!r}")
        seen_names: set = set()
        for pf in spec.fields:
            f = md.schema().field_by_id(pf.source_id)
            if f is None:
                raise InvalidUpdate(
                    f"partition field {pf.name} references unknown "
                    f"source id {pf.source_id}")
            if not pf.transform.can_transform(f.field_type):
                raise InvalidUpdate(
                    f"transform {pf.transform!r} cannot apply to "
                    f"{f.name}: {f.field_type}")
            if pf.name in seen_names:
                raise InvalidUpdate(f"duplicate partition field name {pf.name}")
            seen_names.add(pf.name)
            # a partition field may share a schema field's name only when it
            # is the identity transform OF that field
            # (test_partition_spec_evolution_validates_schema_field_name
            # _conflicts / _allows_non_conflicting_names)
            clash = md.schema().field_by_name(pf.name)
            if clash is not None and not (
                    repr(pf.transform) == "identity"
                    and clash.field_id == pf.source_id):
                raise InvalidUpdate(
                    f"cannot create partition field '{pf.name}': conflicts "
                    f"with schema field of the same name and is not an "
                    f"identity transform of it")
        # v1 requires partition field ids to be the sequential block starting
        # at 1000 (test_add_partition_spec_for_v1_requires_sequential_ids)
        if md.format_version == 1 and spec.fields:
            ids = [f.field_id for f in spec.fields]
            if ids != list(range(1000, 1000 + len(ids))):
                raise InvalidUpdate(
                    f"cannot add partition spec with non-sequential field "
                    f"ids {ids} to a format version 1 table")
        md.partition_specs.append(spec)
        if spec.fields:
            md.last_partition_id = max(md.last_partition_id,
                                       max(f.field_id for f in spec.fields))
        state["last_added_spec"] = spec.spec_id
    elif action == "set-default-spec":
        sid = upd["spec-id"]
        if sid == LAST_ADDED:
            if state["last_added_spec"] is None:
                raise InvalidUpdate("set-default-spec -1 without add-spec")
            sid = state["last_added_spec"]
        spec = md.spec(sid)
        # the default spec must BIND to the current schema — the reference
        # recomputes partition_type(current_schema) here and fails on a
        # missing source field or inapplicable transform
        # (table_metadata_builder.rs set_default_partition_spec:959-961)
        cur = md.schema()
        for pf in spec.fields:
            f = cur.field_by_id(pf.source_id)
            if f is None:
                raise InvalidUpdate(
                    f"cannot set default spec {sid}: partition field "
                    f"'{pf.name}' references source id {pf.source_id} "
                    f"missing from current schema {md.current_schema_id}")
            if not pf.transform.can_transform(f.field_type):
                raise InvalidUpdate(
                    f"cannot set default spec {sid}: transform "
                    f"{pf.transform!r} cannot apply to {f.name}: "
                    f"{f.field_type}")
        md.default_spec_id = sid
    elif action == "add-sort-order":
        so = (upd["sort-order"] if isinstance(upd["sort-order"], SortOrder)
              else SortOrder.from_json(upd["sort-order"]))
        if any(s.order_id == so.order_id for s in md.sort_orders):
            raise InvalidUpdate(f"sort order id {so.order_id} already exists")
        for sf in so.fields:
            f = md.schema().field_by_id(sf.source_id)
            if f is None:
                raise InvalidUpdate(
                    f"sort field references unknown source id {sf.source_id}")
            if not sf.transform.can_transform(f.field_type):
                raise InvalidUpdate(
                    f"sort transform {sf.transform!r} cannot apply to "
                    f"{f.name}: {f.field_type}")
        md.sort_orders.append(so)
        state["last_added_order"] = so.order_id
    elif action == "set-default-sort-order":
        oid = upd["sort-order-id"]
        if oid == LAST_ADDED:
            if state["last_added_order"] is None:
                raise InvalidUpdate("set-default-sort-order -1 without add-sort-order")
            oid = state["last_added_order"]
        if not any(s.order_id == oid for s in md.sort_orders):
            raise InvalidUpdate(f"no sort order id {oid}")
        md.default_sort_order_id = oid
    elif action == "add-snapshot":
        snap = (upd["snapshot"] if isinstance(upd["snapshot"], Snapshot)
                else Snapshot.from_json(upd["snapshot"]))
        if md.snapshot_by_id(snap.snapshot_id) is not None:
            raise InvalidUpdate(f"snapshot {snap.snapshot_id} already exists")
        if snap.sequence_number <= md.last_sequence_number and md.snapshots:
            raise InvalidUpdate(
                f"snapshot sequence {snap.sequence_number} not after "
                f"{md.last_sequence_number}")
        if snap.schema_id is not None and not any(
                s.schema_id == snap.schema_id for s in md.schemas):
            raise InvalidUpdate(
                f"snapshot {snap.snapshot_id} references unknown "
                f"schema id {snap.schema_id}")
        if md.format_version >= 3:
            # v3 row lineage (table_metadata_builder.rs:401-436): every
            # snapshot must carry its row range; a first-row-id behind the
            # table's next-row-id would hand out duplicate row ids
            if snap.first_row_id is None:
                raise InvalidUpdate(
                    "first-row-id must be set for format version >= 3")
            if snap.first_row_id < md.next_row_id:
                raise InvalidUpdate(
                    f"first-row-id is behind table next-row-id: "
                    f"{snap.first_row_id} < {md.next_row_id}")
            # advance TO the end of the claimed range, not BY added_rows:
            # a client that assigned first-row-id ahead of the counter must
            # not leave next_row_id inside its own range (overlap with the
            # next snapshot's claim)
            md.next_row_id = snap.first_row_id + (snap.added_rows or 0)
        md.snapshots.append(snap)
        md.last_sequence_number = max(md.last_sequence_number,
                                      snap.sequence_number)
    elif action == "set-snapshot-ref":
        name = upd["ref-name"]
        snap_id = upd["snapshot-id"]
        new_ref = SnapshotRef(snap_id, upd.get("type", "branch"),
                              upd.get("min-snapshots-to-keep"),
                              upd.get("max-snapshot-age-ms"),
                              upd.get("max-ref-age-ms"))
        # idempotent no-op when the ref already equals the target
        # (table_metadata_builder.rs set_ref:518-525): a retried commit must
        # not append a duplicate snapshot-log entry
        if md.refs.get(name) == new_ref:
            return
        snap = md.snapshot_by_id(snap_id)
        if snap is None:
            raise InvalidUpdate(f"ref {name} -> unknown snapshot {snap_id}")
        md.refs[name] = new_ref
        if name == "main":
            # the snapshot LOG is the MAIN branch's current-snapshot history
            # (table_metadata_builder.rs test_set_branch_snapshot_* family):
            # adding a snapshot to a side branch must not log; re-pointing
            # main does — stamped with the snapshot's own timestamp so
            # diff->apply round-trips byte-identically with the write path
            md.current_snapshot_id = snap_id
            md.snapshot_log.append({"timestamp-ms": snap.timestamp_ms,
                                    "snapshot-id": snap_id})
    elif action == "remove-snapshots":
        # reference semantics (table_metadata_builder.rs remove_snapshots:
        # 487-511): removal is not rejected for referenced snapshots —
        # refs that become dangling are dropped with them (main's drop also
        # clears current_snapshot_id, mirroring remove_ref)
        ids = set(upd["snapshot-ids"])
        md.snapshots = [s for s in md.snapshots if s.snapshot_id not in ids]
        md.snapshot_log = [e for e in md.snapshot_log
                           if e["snapshot-id"] not in ids]
        live = {s.snapshot_id for s in md.snapshots}
        dropped_main = ("main" in md.refs
                        and md.refs["main"].snapshot_id not in live)
        md.refs = {n: r for n, r in md.refs.items()
                   if r.snapshot_id in live}
        if dropped_main or md.current_snapshot_id in ids:
            md.current_snapshot_id = None
    elif action == "remove-snapshot-ref":
        # removing main clears current_snapshot_id but KEEPS the snapshot
        # log (test_remove_main_ref_keeps_snapshot_log)
        if upd["ref-name"] == "main":
            md.current_snapshot_id = None
        md.refs.pop(upd["ref-name"], None)
    elif action == "set-location":
        md.location = upd["location"]
    elif action == "set-properties":
        reserved = {"format-version", "uuid"} & set(upd["updates"])
        if reserved:
            raise InvalidUpdate(
                f"reserved properties cannot be set: {sorted(reserved)}")
        md.properties.update(upd["updates"])
    elif action == "remove-properties":
        for k in upd["removals"]:
            md.properties.pop(k, None)
    elif action == "remove-partition-specs":
        ids = set(upd["spec-ids"])
        if md.default_spec_id in ids:
            raise InvalidUpdate("cannot remove the default partition spec")
        md.partition_specs = [s for s in md.partition_specs
                              if s.spec_id not in ids]
    elif action == "remove-schemas":
        ids = set(upd["schema-ids"])
        if md.current_schema_id in ids:
            raise InvalidUpdate("cannot remove the current schema")
        in_use = {s.schema_id for s in md.snapshots if s.schema_id is not None}
        bad = ids & in_use
        if bad:
            raise InvalidUpdate(f"cannot remove schemas used by snapshots: {sorted(bad)}")
        md.schemas = [s for s in md.schemas if s.schema_id not in ids]
    elif action == "set-statistics":
        sf = upd["statistics"]
        md.statistics = [s for s in md.statistics
                         if s.get("snapshot-id") != sf.get("snapshot-id")] + [sf]
    elif action == "remove-statistics":
        md.statistics = [s for s in md.statistics
                         if s.get("snapshot-id") != upd["snapshot-id"]]
    elif action == "set-partition-statistics":
        sf = upd["partition-statistics"]
        md.partition_statistics = [
            s for s in md.partition_statistics
            if s.get("snapshot-id") != sf.get("snapshot-id")] + [sf]
    elif action == "remove-partition-statistics":
        md.partition_statistics = [
            s for s in md.partition_statistics
            if s.get("snapshot-id") != upd["snapshot-id"]]
    elif action == "add-encryption-key":
        key = upd["encryption-key"]
        if any(k.get("key-id") == key.get("key-id")
               for k in md.encryption_keys):
            raise InvalidUpdate(f"encryption key {key.get('key-id')} exists")
        md.encryption_keys.append(key)
    elif action == "remove-encryption-key":
        md.encryption_keys = [k for k in md.encryption_keys
                              if k.get("key-id") != upd["key-id"]]
    else:
        raise InvalidUpdate(f"unknown update action: {action!r}")
