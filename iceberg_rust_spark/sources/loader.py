"""Catalog loader registry — counterpart of the reference's
crates/catalog/loader (lib.rs CATALOG_REGISTRY / load_catalog): one entry
point that resolves a catalog TYPE string plus a property map to a live
catalog instance, with the same property keys the reference's builders
take (`uri`, `warehouse`; rest adds headers/token pass-through).

Supported here: ``rest`` (real-HTTP client), ``sql`` (sqlite pointer-CAS),
``fs`` / ``hadoop`` (filesystem version-hint), ``memory``. The reference's
``glue`` / ``hms`` / ``s3tables`` entries require live cloud/Thrift
endpoints this environment cannot reach; they are registered to raise a
clear error naming the gap rather than being silently absent.
"""

from __future__ import annotations

from typing import Callable, Dict


def _load_rest(name: str, props: Dict[str, str]):
    from .rest import RestCatalog
    uri = props.get("uri")
    if not uri:
        raise ValueError("rest catalog requires the 'uri' property")
    return RestCatalog(uri)


def _load_sql(name: str, props: Dict[str, str]):
    from .sql_catalog import SqlCatalog
    uri = props.get("uri")
    warehouse = props.get("warehouse")
    if not uri or not warehouse:
        raise ValueError("sql catalog requires 'uri' and 'warehouse'")
    # reference accepts sqlite://<path> URIs (catalog.rs sqlite tests)
    for prefix in ("sqlite://", "sqlite:"):
        if uri.startswith(prefix):
            uri = uri[len(prefix):]
            break
    return SqlCatalog(uri, warehouse, catalog_name=name)


def _load_fs(name: str, props: Dict[str, str]):
    from .catalog import FileSystemCatalog
    warehouse = props.get("warehouse")
    if not warehouse:
        raise ValueError("fs catalog requires the 'warehouse' property")
    return FileSystemCatalog(warehouse)


def _load_memory(name: str, props: Dict[str, str]):
    from .rest import MemoryCatalog
    warehouse = props.get("warehouse")
    if not warehouse:
        raise ValueError("memory catalog requires the 'warehouse' property")
    return MemoryCatalog(warehouse)


def _load_hms(name: str, props: Dict[str, str]):
    from .hms import HmsCatalog
    uri = props.get("uri")
    warehouse = props.get("warehouse")
    if not uri or not warehouse:
        # same required props as the reference builder (hms/catalog.rs:43-55)
        raise ValueError("hms catalog requires 'uri' and 'warehouse'")
    for prefix in ("thrift://",):
        if uri.startswith(prefix):
            uri = uri[len(prefix):]
    framed = props.get("thrift_transport", "buffered").lower() == "framed"
    return HmsCatalog(uri, warehouse, framed=framed)


def _unreachable(kind: str) -> Callable:
    def load(name: str, props: Dict[str, str]):
        raise NotImplementedError(
            f"catalog type {kind!r} requires a live "
            f"{'AWS' if kind in ('glue', 's3tables') else 'Thrift'} "
            f"endpoint; this build supports rest/sql/fs/memory "
            f"(reference: crates/catalog/{kind})")
    return load


_REGISTRY: Dict[str, Callable] = {
    "rest": _load_rest,
    "sql": _load_sql,
    "fs": _load_fs,
    "hadoop": _load_fs,
    "memory": _load_memory,
    "glue": _unreachable("glue"),
    "hms": _load_hms,
    "s3tables": _unreachable("s3tables"),
}


def supported_types() -> list:
    """Types load_catalog accepts (loader/lib.rs supported_types)."""
    return list(_REGISTRY)


def load_catalog(catalog_type: str, name: str = "default",
                 props: Dict[str, str] | None = None, **kwargs: str):
    """Resolve ``catalog_type`` + properties to a catalog instance.

    Properties may be passed as a dict or keywords:
    ``load_catalog("sql", uri="sqlite:///tmp/c.db", warehouse="/tmp/wh")``.
    """
    merged = dict(props or {}, **kwargs)
    try:
        factory = _REGISTRY[catalog_type]
    except KeyError:
        raise ValueError(
            f"unknown catalog type {catalog_type!r}; supported: "
            f"{sorted(_REGISTRY)}")
    return factory(name, merged)
