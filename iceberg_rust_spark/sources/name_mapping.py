"""NameMapping: field-id resolution for id-less data files.

Counterpart of /root/reference/crates/iceberg/src/spec/name_mapping/
(NameMapping, mod.rs:31), following the public Iceberg name-mapping spec:
a JSON list of ``{"field-id": N, "names": [aliases...], "fields": [...]}``
entries stored in the ``schema.name-mapping.default`` table property.
Files written without Iceberg field ids (external imports, migrated Hive
data) resolve their columns through this mapping — any listed alias maps to
the canonical field id, recursively for nested fields.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field as dc_field
from typing import Dict, List, Optional

from .types import Schema

NAME_MAPPING_PROPERTY = "schema.name-mapping.default"


@dataclass
class MappedField:
    field_id: Optional[int]
    names: List[str]
    fields: List["MappedField"] = dc_field(default_factory=list)

    def to_json(self) -> dict:
        d: dict = {"names": self.names}
        if self.field_id is not None:
            d["field-id"] = self.field_id
        if self.fields:
            d["fields"] = [f.to_json() for f in self.fields]
        return d

    @staticmethod
    def from_json(d: dict) -> "MappedField":
        return MappedField(d.get("field-id"), d.get("names", []),
                           [MappedField.from_json(f) for f in d.get("fields", [])])


@dataclass
class NameMapping:
    root: List[MappedField]

    def to_json(self) -> str:
        return json.dumps([f.to_json() for f in self.root])

    @staticmethod
    def from_json(text: str) -> "NameMapping":
        return NameMapping([MappedField.from_json(d) for d in json.loads(text)])

    @staticmethod
    def from_schema(schema: Schema,
                    aliases: Optional[Dict[str, List[str]]] = None) -> "NameMapping":
        """Default mapping: every top-level field maps its canonical name
        (plus any ``aliases[name]``) to its field id."""
        aliases = aliases or {}
        return NameMapping([
            MappedField(f.field_id, [f.name] + list(aliases.get(f.name, [])))
            for f in schema.fields])

    def id_for(self, name: str) -> Optional[int]:
        """Top-level alias -> field id."""
        for f in self.root:
            if name in f.names:
                return f.field_id
        return None

    def alias_to_canonical(self, schema: Schema) -> Dict[str, str]:
        """alias -> canonical (current-schema) column name."""
        out: Dict[str, str] = {}
        for f in self.root:
            if f.field_id is None:
                continue
            cur = schema.field_by_id(f.field_id)
            if cur is None:
                continue
            for alias in f.names:
                out[alias] = cur.name
        return out
