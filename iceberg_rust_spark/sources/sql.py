"""SQL front door: run SQL text against catalog tables and views.

Counterpart of the reference's DataFusion catalog providers
(crates/integrations/datafusion/src/catalog.rs:33, schema.rs:40 —
IcebergCatalogProvider / IcebergSchemaProvider): every ``namespace.table``
identifier in the query that resolves in the catalog is registered as a temp
view over the table's (pruned) scan DataFrame, then Catalyst executes the
query. Views resolve through ViewCatalog the same way.

Pushdown semantics mirror the reference's Inexact pattern
(table/mod.rs:145-151): filters written in SQL reach the Parquet reader via
Catalyst (row-group + page pruning) but not our *file-level* metadata
pruning — for that, pass ``scan_filters={"ns.table": Predicate}`` and the
named tables are planned with the predicate (files pruned) while the full
SQL WHERE clause still re-applies on top, so over-pruning is impossible and
under-pruning only costs IO.
"""

from __future__ import annotations

import re
from typing import Dict, Optional

from pyspark.sql import DataFrame, SparkSession

from ..plans import expr as E
from .catalog import FileSystemCatalog, NoSuchTable
from .table import Table
from .views import ViewCatalog


# inspect/metadata tables addressable from SQL as ns.table.<meta>
# (counterpart of the reference's IcebergMetadataScan,
# physical_plan/metadata_scan.rs:30)
_META_TABLES = {"snapshots": "snapshots_df", "history": "history_df",
                "manifests": "manifests_df", "files": "files_df",
                "entries": "entries_df", "refs": "refs_df",
                "partitions": "partitions_df"}


def run_sql(spark: SparkSession, catalog: FileSystemCatalog, query: str,
            scan_filters: Optional[Dict[str, "E.Predicate"]] = None) -> DataFrame:
    """Execute ``query`` with catalog identifiers resolved to Iceberg scans."""
    scan_filters = scan_filters or {}
    vc = ViewCatalog(catalog)
    rewritten = query
    for ns in catalog.list_namespaces():
        for tname in catalog.list_tables(ns):
            full = f"{ns}.{tname}"
            pat = re.compile(rf"(?<![\w.]){re.escape(full)}(?![\w.])")
            meta_hits = {
                meta: re.compile(
                    rf"(?<![\w.]){re.escape(full)}\.{meta}(?![\w.])")
                for meta in _META_TABLES
                if re.search(rf"(?<![\w.]){re.escape(full)}\.{meta}(?![\w.])",
                             rewritten)}
            if not pat.search(rewritten) and not meta_hits:
                continue
            try:
                t = Table.load(catalog, full)
            except NoSuchTable:
                continue
            for meta, mpat in meta_hits.items():
                mview = f"__ice_meta_{ns}_{tname}_{meta}"
                getattr(t, _META_TABLES[meta])(spark) \
                    .createOrReplaceTempView(mview)
                rewritten = mpat.sub(mview, rewritten)
            if pat.search(rewritten):
                view_name = f"__ice_{ns}_{tname}"
                t.scan(row_filter=scan_filters.get(full)) \
                    .to_df(spark).createOrReplaceTempView(view_name)
                rewritten = pat.sub(view_name, rewritten)
        for vname in vc.list_views(ns):
            full = f"{ns}.{vname}"
            pat = re.compile(rf"(?<![\w.]){re.escape(full)}(?![\w.])")
            if not pat.search(rewritten):
                continue
            view_name = f"__ice_view_{ns}_{vname}"
            vc.read_view(spark, full).createOrReplaceTempView(view_name)
            rewritten = pat.sub(view_name, rewritten)
    return spark.sql(rewritten)
