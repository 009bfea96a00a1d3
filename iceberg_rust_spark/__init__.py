"""iceberg_rust_spark — a PySpark-native engine with the query and
data-processing capabilities of apache/iceberg-rust.

Layout:
  sources/    table format: types, metadata, manifests, catalog, scan, write
  plans/      predicate AST + metadata-pruning evaluators
  functions/  partition transforms, murmur3, text/vector helpers
  operators/  LLM-pipeline operators: dedup, similarity, text analysis, multimodal
  streaming/  incremental snapshot-diff reads
"""

from .sources.catalog import (CommitConflict, FileSystemCatalog,
                              ValidationConflict)
from .sources.sql_catalog import SqlCatalog
from .sources.loader import load_catalog, supported_types
from .sources.metadata import PartitionField, PartitionSpec
from .sources.rest import MemoryCatalog, RestCatalog, RestCatalogServer
from .sources.table import Table
from .sources.types import NestedField, Schema
from .plans import expr

__all__ = ["FileSystemCatalog", "SqlCatalog", "MemoryCatalog", "RestCatalog",
           "RestCatalogServer", "Table", "Schema", "NestedField",
           "PartitionSpec", "PartitionField", "expr", "load_catalog",
           "supported_types", "CommitConflict", "ValidationConflict"]
__version__ = "0.1.0"
