"""Catalog loader registry — counterpart of the reference's
crates/catalog/loader (lib.rs CATALOG_REGISTRY / load_catalog): one entry
point that resolves a catalog TYPE string plus a property map to a live
catalog instance, with the same property keys the reference's builders
take (`uri`, `warehouse`; rest adds headers/token pass-through).

Supported here: ``rest`` (real-HTTP client), ``sql`` (sqlite pointer-CAS),
``fs`` / ``hadoop`` (filesystem version-hint), ``memory``, ``hms``
(Thrift binary RPC), ``glue`` (AWS JSON 1.1 + SigV4), ``s3tables``
(rest-json + SigV4) — the full reference registry
(crates/catalog/loader/src/lib.rs). The AWS-backed types take an
endpoint override, same as the reference builders, so they run against
any endpoint speaking the public protocol.
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


def _load_glue(name: str, props: Dict[str, str]):
    from .glue import GlueCatalog
    uri = props.get("uri")
    warehouse = props.get("warehouse")
    if not uri or not warehouse:
        # 'uri' is the endpoint override; reference property keys
        # otherwise (glue/src/utils.rs:30-42)
        raise ValueError("glue catalog requires 'uri' and 'warehouse'")
    return GlueCatalog(
        uri, warehouse,
        region=props.get("region_name", "us-east-1"),
        access_key=props.get("aws_access_key_id", ""),
        secret_key=props.get("aws_secret_access_key", ""),
        session_token=props.get("aws_session_token"))


def _load_s3tables(name: str, props: Dict[str, str]):
    from .s3tables import S3TablesCatalog
    arn = props.get("table_bucket_arn")
    endpoint = props.get("endpoint_url")
    if not arn or not endpoint:
        # reference keys (s3tables/catalog.rs:43-45); endpoint_url is
        # optional there (defaults to AWS) but required without cloud reach
        raise ValueError(
            "s3tables catalog requires 'table_bucket_arn' and 'endpoint_url'")
    return S3TablesCatalog(
        endpoint, arn,
        region=props.get("region_name", "us-east-1"),
        access_key=props.get("aws_access_key_id", ""),
        secret_key=props.get("aws_secret_access_key", ""),
        session_token=props.get("aws_session_token"))


_REGISTRY: Dict[str, Callable] = {
    "rest": _load_rest,
    "sql": _load_sql,
    "fs": _load_fs,
    "hadoop": _load_fs,
    "memory": _load_memory,
    "glue": _load_glue,
    "hms": _load_hms,
    "s3tables": _load_s3tables,
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
