"""SQL front door: run SQL text against catalog tables and views.

Counterpart of the reference's DataFusion catalog providers
(crates/integrations/datafusion/src/catalog.rs:33, schema.rs:40 —
IcebergCatalogProvider / IcebergSchemaProvider): every ``namespace.table``
identifier in the query that resolves in the catalog is registered as a temp
view over the table's (pruned) scan DataFrame, then Catalyst executes the
query. Views resolve through ViewCatalog the same way.

Pushdown semantics mirror the reference's Inexact pattern
(table/mod.rs:145-151): filters written in SQL reach the Parquet reader via
Catalyst (row-group + page pruning); for *file-level* metadata pruning,
single-table ``SELECT ... FROM t WHERE <cond>`` queries are auto-parsed
(plans/sql_pred.py) and planned with the predicate, and multi-table queries
can pass ``scan_filters={"ns.table": Predicate}`` explicitly. The full SQL
WHERE clause always re-applies on top, so over-pruning is impossible and
under-pruning only costs IO.
"""

from __future__ import annotations

import re
from typing import Dict, List, Optional

from pyspark.sql import DataFrame, SparkSession

from ..plans import expr as E
from .catalog import FileSystemCatalog, NoSuchNamespace, NoSuchTable
from .table import Table
from .views import ViewCatalog


# inspect/metadata tables addressable from SQL as ns.table.<meta>
# (counterpart of the reference's IcebergMetadataScan,
# physical_plan/metadata_scan.rs:30)
_META_TABLES = {"snapshots": "snapshots_df", "history": "history_df",
                "manifests": "manifests_df", "files": "files_df",
                "entries": "entries_df", "refs": "refs_df",
                "partitions": "partitions_df",
                "all_manifests": "all_manifests_df",
                "all_files": "all_files_df",
                "all_entries": "all_entries_df",
                "delete_files": "delete_files_df",
                "metadata_log_entries": "metadata_log_entries_df",
                "position_deletes": "position_deletes_df",
                "data_files": "data_files_df",
                "all_data_files": "all_data_files_df",
                "all_delete_files": "all_delete_files_df"}


_INSERT_RE = re.compile(r"^\s*INSERT\s+INTO\s+([\w.]+)\s+(.*)$",
                        re.IGNORECASE | re.DOTALL)
_INSERT_OVERWRITE_RE = re.compile(
    r"^\s*INSERT\s+OVERWRITE\s+(?:TABLE\s+)?([\w.]+)\s+(.*)$",
    re.IGNORECASE | re.DOTALL)
_DROP_TABLE_RE = re.compile(
    r"^\s*DROP\s+TABLE\s+(IF\s+EXISTS\s+)?([\w.]+)\s*$", re.IGNORECASE)
_TRUNCATE_RE = re.compile(r"^\s*TRUNCATE\s+TABLE\s+([\w.]+)\s*$",
                          re.IGNORECASE)
_PART_BY_RE = re.compile(r"\s+PARTITIONED\s+BY\s*\((.*)\)\s*$",
                         re.IGNORECASE | re.DOTALL)
_CREATE_RE = re.compile(
    r"^\s*CREATE\s+TABLE\s+(?:IF\s+NOT\s+EXISTS\s+)?([\w.]+)\s*\((.*)\)\s*$",
    re.IGNORECASE | re.DOTALL)
# DataFusion integration parity (table_provider_factory.rs:62-155):
# CREATE EXTERNAL TABLE t STORED AS ICEBERG LOCATION '<metadata json>'
_CREATE_EXT_RE = re.compile(
    r"^\s*CREATE\s+EXTERNAL\s+TABLE\s+([\w.]+)\s+STORED\s+AS\s+ICEBERG\s+"
    r"LOCATION\s+'([^']+)'\s*$", re.IGNORECASE)
_DROP_RE = re.compile(r"^\s*DROP\s+TABLE\s+(IF\s+EXISTS\s+)?([\w.]+)\s*$",
                      re.IGNORECASE)
# ALTER TABLE schema evolution -> SchemaUpdate builder
# (transaction/update_schema.rs:42-147 counterpart on the SQL surface)
_ALTER_ADD_RE = re.compile(
    r"^\s*ALTER\s+TABLE\s+([\w.]+)\s+ADD\s+COLUMN\s+(\w+)\s+([\w()., ]+?)"
    r"(?:\s+DEFAULT\s+('[^']*'|[-\w.]+))?\s*$", re.IGNORECASE)
_ALTER_DROP_RE = re.compile(
    r"^\s*ALTER\s+TABLE\s+([\w.]+)\s+DROP\s+COLUMN\s+(\w+)\s*$", re.IGNORECASE)
_ALTER_RENAME_RE = re.compile(
    r"^\s*ALTER\s+TABLE\s+([\w.]+)\s+RENAME\s+COLUMN\s+(\w+)\s+TO\s+(\w+)\s*$",
    re.IGNORECASE)
_ALTER_TYPE_RE = re.compile(
    r"^\s*ALTER\s+TABLE\s+([\w.]+)\s+ALTER\s+COLUMN\s+(\w+)\s+TYPE\s+"
    r"([\w()., ]+)\s*$", re.IGNORECASE)
# partition-spec evolution + table properties on the SQL surface
# (transaction update-spec / set-properties actions)
_ALTER_ADD_PART_RE = re.compile(
    r"^\s*ALTER\s+TABLE\s+([\w.]+)\s+ADD\s+PARTITION\s+FIELD\s+(.+?)\s*$",
    re.IGNORECASE)
_ALTER_DROP_PART_RE = re.compile(
    r"^\s*ALTER\s+TABLE\s+([\w.]+)\s+DROP\s+PARTITION\s+FIELD\s+(\w+)\s*$",
    re.IGNORECASE)
_ALTER_PROPS_RE = re.compile(
    r"^\s*ALTER\s+TABLE\s+([\w.]+)\s+SET\s+TBLPROPERTIES\s*\((.*)\)\s*$",
    re.IGNORECASE | re.DOTALL)
# ALTER TABLE t WRITE ORDERED BY (c1 DESC, truncate(4, s)) / WRITE UNORDERED
_WRITE_ORDERED_RE = re.compile(
    r"^\s*ALTER\s+TABLE\s+([\w.]+)\s+WRITE\s+"
    r"(?:ORDERED\s+BY\s*\((.*)\)|UNORDERED)\s*$",
    re.IGNORECASE | re.DOTALL)
# SQL type synonyms -> Iceberg primitive names (spec/datatypes.rs naming)
_SQL_TO_ICE_TYPE = {
    "bigint": "long", "integer": "int", "smallint": "int", "tinyint": "int",
    "varchar": "string", "text": "string", "bool": "boolean",
    "real": "float", "timestamp_ntz": "timestamp",
}


def _ice_type_name(sql_type: str) -> str:
    s = sql_type.strip().lower()
    s = re.sub(r"\s+", "", s) if s.startswith("decimal") else s
    return _SQL_TO_ICE_TYPE.get(s, s)


def _parse_default(tok: Optional[str]):
    if tok is None:
        return None
    if tok.startswith("'"):
        return tok[1:-1]
    low = tok.lower()
    if low in ("true", "false"):
        return low == "true"
    try:
        return int(tok)
    except ValueError:
        return float(tok)
_NS_WORD = r"(?:NAMESPACE|DATABASE|SCHEMA)"
_CREATE_NS_RE = re.compile(
    rf"^\s*CREATE\s+{_NS_WORD}\s+(IF\s+NOT\s+EXISTS\s+)?([\w.]+)"
    r"(?:\s+WITH\s+(?:DB)?PROPERTIES\s*\((.*)\))?\s*$",
    re.IGNORECASE | re.DOTALL)
_DROP_NS_RE = re.compile(
    rf"^\s*DROP\s+{_NS_WORD}\s+(IF\s+EXISTS\s+)?([\w.]+)\s*$",
    re.IGNORECASE)
_ALTER_NS_RE = re.compile(
    rf"^\s*ALTER\s+{_NS_WORD}\s+([\w.]+)\s+(SET|UNSET)\s+"
    r"(?:DB)?PROPERTIES\s*\((.*)\)\s*$", re.IGNORECASE | re.DOTALL)
_DESC_NS_RE = re.compile(
    rf"^\s*DESC(?:RIBE)?\s+{_NS_WORD}\s+([\w.]+)\s*$", re.IGNORECASE)
_SHOW_NS_RE = re.compile(r"^\s*SHOW\s+(?:NAMESPACES|DATABASES|SCHEMAS)\s*$",
                         re.IGNORECASE)
_SHOW_PARTS_RE = re.compile(r"^\s*SHOW\s+PARTITIONS\s+([\w.]+)\s*$",
                            re.IGNORECASE)
_SHOW_PROPS_RE = re.compile(
    r"^\s*SHOW\s+TBLPROPERTIES\s+([\w.]+)(?:\s*\(\s*'([^']+)'\s*\))?\s*$",
    re.IGNORECASE)
_SHOW_VIEWS_RE = re.compile(r"^\s*SHOW\s+VIEWS(?:\s+IN\s+([\w.]+))?\s*$",
                            re.IGNORECASE)
_SHOW_RE = re.compile(r"^\s*SHOW\s+TABLES(?:\s+IN\s+([\w.]+))?\s*$",
                      re.IGNORECASE)
# stored-procedure surface, Spark-Iceberg shape: CALL system.proc(args...)
_CALL_RE = re.compile(r"^\s*CALL\s+(?:[\w]+\.)?system\.(\w+)\s*\((.*)\)\s*$",
                      re.IGNORECASE | re.DOTALL)
_DESCRIBE_RE = re.compile(r"^\s*DESC(?:RIBE)?\s+(?:TABLE\s+)?([\w.]+)\s*$",
                          re.IGNORECASE)
_SHOW_CREATE_RE = re.compile(r"^\s*SHOW\s+CREATE\s+TABLE\s+([\w.]+)\s*$",
                             re.IGNORECASE)
# Spark-Iceberg branch/tag DDL incl. retention clauses:
#   ALTER TABLE t CREATE BRANCH b [AS OF VERSION v] [RETAIN n DAYS]
#     [WITH SNAPSHOT RETENTION m SNAPSHOTS [n DAYS]]
_BRANCH_TAG_RE = re.compile(
    r"^\s*ALTER\s+TABLE\s+([\w.]+)\s+(CREATE|DROP)\s+(BRANCH|TAG)\s+(\w+)"
    r"(?:\s+AS\s+OF\s+VERSION\s+(\d+))?"
    r"(?:\s+RETAIN\s+(\d+)\s+(DAYS|HOURS|MINUTES))?"
    r"(?:\s+WITH\s+SNAPSHOT\s+RETENTION\s+(\d+)\s+SNAPSHOTS"
    r"(?:\s+(\d+)\s+(DAYS|HOURS|MINUTES))?)?\s*$", re.IGNORECASE)

_TIME_UNIT_MS = {"DAYS": 86_400_000, "HOURS": 3_600_000, "MINUTES": 60_000}
_CREATE_VIEW_RE = re.compile(
    r"^\s*CREATE\s+(OR\s+REPLACE\s+)?VIEW\s+([\w.]+)\s+AS\s+(.*)$",
    re.IGNORECASE | re.DOTALL)
_DROP_VIEW_RE = re.compile(r"^\s*DROP\s+VIEW\s+(IF\s+EXISTS\s+)?([\w.]+)\s*$",
                           re.IGNORECASE)
# FOR VERSION AS OF <snapshot-id> / FOR TIMESTAMP AS OF '<ts>' time travel
_TRAVEL_RE = re.compile(
    r"([\w.]+)\s+FOR\s+(VERSION|TIMESTAMP)\s+AS\s+OF\s+('[^']*'|\d+)",
    re.IGNORECASE)

# opt-in planner observability for the SQL front door: when set to a list
# (tools/frontdoor_audit.py), run_sql appends one record per Iceberg scan
# it plans — captured predicate + plan_files pruning counters. None (the
# default) costs nothing on the hot path.
AUDIT_SCANS: "Optional[list]" = None


def _parse_partition_clause(clause: str, schema) -> "PartitionSpec":
    """'month(ts), bucket(8, id), cat' -> PartitionSpec (Spark SQL's
    PARTITIONED BY transform syntax)."""
    from ..functions.transforms import parse_transform
    from .metadata import PartitionField, PartitionSpec

    # paren-aware top-level comma split: "month(ts), bucket(4, id)" has a
    # comma inside bucket() that must not separate fields
    items, cur, depth = [], [], 0
    for ch in clause:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            items.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    if cur:
        items.append("".join(cur))

    fields, fid = [], 1000
    for part in items:
        part = part.strip()
        m = re.match(r"(\w+)\s*\(\s*(.*?)\s*\)$", part)
        if m:
            fn, args = m.group(1).lower(), [a.strip() for a in
                                            m.group(2).split(",")]
            if fn in ("bucket", "truncate"):
                n, col = (args[0], args[1]) if args[0].isdigit() else (args[1], args[0])
                transform, src, pname = (parse_transform(f"{fn}[{n}]"),
                                         col, f"{col}_{fn}")
            else:
                transform, src, pname = (parse_transform(fn), args[0],
                                         f"{args[0]}_{fn}")
        else:
            transform, src, pname = parse_transform("identity"), part, part
        f = schema.field_by_name(src)
        if f is None:
            raise ValueError(f"PARTITIONED BY references unknown column {src}")
        fields.append(PartitionField(f.field_id, fid, pname, transform))
        fid += 1
    return PartitionSpec(0, fields)
_CTAS_RE = re.compile(r"^\s*CREATE\s+TABLE\s+([\w.]+)\s+AS\s+(.*)$",
                      re.IGNORECASE | re.DOTALL)
_DELETE_RE = re.compile(r"^\s*DELETE\s+FROM\s+([\w.]+)\s+WHERE\s+(.*)$",
                        re.IGNORECASE | re.DOTALL)
_DELETE_ALL_RE = re.compile(r"^\s*DELETE\s+FROM\s+([\w.]+)\s*$",
                            re.IGNORECASE)
_MERGE_RE = re.compile(
    r"^\s*MERGE\s+INTO\s+([\w.]+)\s+USING\s+(.*?)\s+ON\s+([\w,\s]+)$",
    re.IGNORECASE | re.DOTALL)
# full-clause MERGE (Spark-Iceberg grammar subset): WHEN MATCHED [AND c]
# THEN UPDATE SET ... | DELETE, WHEN NOT MATCHED THEN INSERT *
_MERGE_WHEN_RE = re.compile(
    r"^\s*MERGE\s+INTO\s+([\w.]+)(?:\s+(?:AS\s+)?(?!USING\b)(\w+))?"
    r"\s+USING\s+(.*?)\s+ON\s+(.*?)"
    r"((?:\s+WHEN\s+(?:NOT\s+)?MATCHED\b.*)+)$",
    re.IGNORECASE | re.DOTALL)
_WHEN_CLAUSE_RE = re.compile(
    r"WHEN\s+(NOT\s+)?MATCHED(\s+BY\s+SOURCE)?(?:\s+AND\s+(.*?))?\s+THEN\s+"
    r"(DELETE|INSERT\s+\*|UPDATE\s+SET\s+.*?)(?=\s+WHEN\s+(?:NOT\s+)?MATCHED|\s*$)",
    re.IGNORECASE | re.DOTALL)
_UPDATE_RE = re.compile(
    r"^\s*UPDATE\s+([\w.]+)\s+SET\s+(.*?)(?:\s+WHERE\s+(.*))?$",
    re.IGNORECASE | re.DOTALL)


def _split_assignments(set_clause: str) -> Dict[str, str]:
    """'a = 1, b = v * 2' -> {'a': '1', 'b': 'v * 2'} (quote/paren aware)."""
    parts, cur, depth, inq = [], [], 0, False
    for ch in set_clause:
        if ch == "'":
            inq = not inq
        elif not inq:
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
            elif ch == "," and depth == 0:
                parts.append("".join(cur))
                cur = []
                continue
        cur.append(ch)
    parts.append("".join(cur))
    out = {}
    for p in parts:
        name, _, expr = p.partition("=")
        if not _ or not name.strip().replace("_", "a").isalnum():
            raise ValueError(f"bad SET assignment: {p!r}")
        out[name.strip()] = expr.strip()
    return out
# single-table SELECT ... FROM t WHERE <cond> [GROUP/ORDER/HAVING/LIMIT...]
# splits text into [sql, 'literal', sql, 'literal', ...]; odd indices are
# single-quoted literal segments ('' = escaped quote) and must never be
# rewritten by alias handling
_SQUOTE_RE = re.compile(r"('(?:[^']|'')*')")


def _split_top_or(s: str) -> List[str]:
    """Split on top-level OR (paren + quote aware)."""
    parts, start, depth, inq, i = [], 0, 0, False, 0
    up = s.upper()
    while i < len(s):
        ch = s[i]
        if ch == "'":
            inq = not inq
        elif not inq:
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
            elif (depth == 0 and up[i:i + 2] == "OR"
                  and (i == 0 or not (s[i - 1].isalnum() or s[i - 1] == "_"))
                  and (i + 2 >= len(s)
                       or not (s[i + 2].isalnum() or s[i + 2] == "_"))):
                parts.append(s[start:i])
                start = i + 2
                i += 2
                continue
        i += 1
    parts.append(s[start:])
    return [p.strip() for p in parts if p.strip()]


def _strip_outer_parens(s: str) -> str:
    s = s.strip()
    while s.startswith("(") and s.endswith(")"):
        depth = 0
        for i, ch in enumerate(_mask_literals(s)):
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
                if depth == 0 and i != len(s) - 1:
                    return s            # parens don't wrap the whole text
        s = s[1:-1].strip()
    return s


def _split_top_and(s: str) -> List[str]:
    """Split on top-level AND (paren + quote + BETWEEN aware): the AND that
    closes a `BETWEEN lo AND hi` belongs to the BETWEEN, not the conjunct
    list, so `x BETWEEN a AND b AND y = 1` splits into two conjuncts."""
    parts, start, depth, inq, i = [], 0, 0, False, 0
    between_depth = None                # paren depth of an open BETWEEN
    up = s.upper()

    def _kw(word: str) -> bool:
        n = len(word)
        return (up[i:i + n] == word
                and (i == 0 or not (s[i - 1].isalnum() or s[i - 1] == "_"))
                and (i + n >= len(s)
                     or not (s[i + n].isalnum() or s[i + n] == "_")))

    while i < len(s):
        ch = s[i]
        if ch == "'":
            inq = not inq
        elif not inq:
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
                if between_depth is not None and depth < between_depth:
                    between_depth = None
            elif _kw("BETWEEN"):
                between_depth = depth
                i += 7
                continue
            elif _kw("AND"):
                if between_depth is not None and depth == between_depth:
                    between_depth = None    # this AND closes the BETWEEN
                elif depth == 0:
                    parts.append(s[start:i])
                    start = i + 3
                i += 3
                continue
        i += 1
    parts.append(s[start:])
    return [p.strip() for p in parts if p.strip()]


def _mask_literals(s: str) -> str:
    """Same-length copy of ``s`` with single-quoted literal BODIES blanked,
    so structural scanning (parens, keywords, identifiers) never reads
    literal text. Positions align 1:1 with the original."""
    out = []
    for i, seg in enumerate(_SQUOTE_RE.split(s)):
        out.append(seg if i % 2 == 0 else "'" + " " * (len(seg) - 2) + "'")
    return "".join(out)


_BLOCK_TERMS = ("GROUP", "ORDER", "HAVING", "LIMIT", "UNION",
                "INTERSECT", "EXCEPT", "WINDOW", "OFFSET", "FETCH")


def _kw_at(up: str, j: int, word: str) -> bool:
    n = len(word)
    return (up[j:j + n] == word
            and (j == 0 or not (up[j - 1].isalnum() or up[j - 1] == "_"))
            and (j + n >= len(up)
                 or not (up[j + n].isalnum() or up[j + n] == "_")))


def _from_where_blocks(query: str) -> List[tuple]:
    """(from_text, where_text | None, from_offset) for EVERY select block
    in the query — top level, derived tables, CTE bodies, EXISTS/IN/scalar
    subqueries. ``from_offset`` is the absolute index of from_text's first
    character in ``query`` (per-reference span arithmetic keys off it —
    the whitespace strip() removes is accounted for).
    A block's FROM clause runs to the first depth-0 terminator keyword /
    closing paren; its WHERE (if any) to the next. Mis-shapen regions
    (e.g. ``extract(year FROM col)``) yield junk from_texts that the ref
    parser rejects — per-block skip, never a whole-query bail."""
    masked = _mask_literals(query)
    up = masked.upper()
    n = len(masked)
    blocks = []
    for m in re.finditer(r"\bFROM\b", up):
        i = m.end()
        depth = 0
        j = i
        from_end = None
        where_start = None
        while j < n:
            ch = masked[j]
            if ch == "(":
                depth += 1
            elif ch == ")":
                if depth == 0:
                    break
                depth -= 1
            elif ch == ";" and depth == 0:
                break
            elif depth == 0 and (ch.isalpha() or ch == "_"):
                if where_start is None and _kw_at(up, j, "WHERE"):
                    from_end = j
                    where_start = j + 5
                    j += 5
                    continue
                if any(_kw_at(up, j, w) for w in _BLOCK_TERMS):
                    break
                k = j
                while k < n and (masked[k].isalnum() or masked[k] == "_"):
                    k += 1
                j = k
                continue
            j += 1
        if where_start is not None:
            raw = query[i:from_end]
        else:
            raw = query[i:j]
        off = i + (len(raw) - len(raw.lstrip()))
        blocks.append((raw.strip(),
                       query[where_start:j].strip()
                       if where_start is not None else None,
                       off))
    return blocks


def _split_top_commas(s: str) -> List[str]:
    masked = _mask_literals(s)
    parts, start, depth = [], 0, 0
    for i, ch in enumerate(masked):
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif ch == "," and depth == 0:
            parts.append(s[start:i])
            start = i + 1
    parts.append(s[start:])
    return [p.strip() for p in parts if p.strip()]


def _select_list_columns(body: str) -> Optional[frozenset]:
    """Output column names of ``SELECT <list> FROM ...`` when every item is
    ``expr AS name`` or a plain (possibly qualified) column; None when the
    list has ``*`` or an item we can't name (callers then treat the
    relation's columns as UNKNOWN — disables unqualified attribution)."""
    masked = _mask_literals(body)
    mm = re.match(r"\s*SELECT\s+(?:DISTINCT\s+)?", masked, re.IGNORECASE)
    if not mm:
        return None
    start = mm.end()
    up = masked.upper()
    depth, from_pos, j = 0, None, start
    while j < len(masked):
        ch = masked[j]
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif depth == 0 and _kw_at(up, j, "FROM"):
            from_pos = j
            break
        j += 1
    if from_pos is None:
        return None
    cols = set()
    for item in _split_top_commas(masked[start:from_pos]):
        if item.endswith("*"):
            return None
        am = re.search(r"\bAS\s+(\w+)\s*$", item, re.IGNORECASE)
        if am:
            cols.add(am.group(1))
            continue
        pm = re.match(r"^(?:(\w+)\.)?(\w+)$", item)
        if pm:
            cols.add(pm.group(2))
            continue
        return None                     # unnamed expression
    return frozenset(cols)


_CTE_DEF_RE = re.compile(r"\b(\w+)\s+AS\s*\(", re.IGNORECASE)


def _cte_columns(query: str) -> Dict[str, Optional[frozenset]]:
    """{cte/derived name: output columns or None(unknown)} for every
    ``name AS ( SELECT ... )`` in the query."""
    masked = _mask_literals(query)
    out: Dict[str, Optional[frozenset]] = {}
    for m in _CTE_DEF_RE.finditer(masked):
        j, depth = m.end(), 1
        while j < len(masked) and depth:
            if masked[j] == "(":
                depth += 1
            elif masked[j] == ")":
                depth -= 1
            j += 1
        body = query[m.end():j - 1]
        if re.match(r"\s*SELECT\b", body, re.IGNORECASE):
            out[m.group(1)] = _select_list_columns(body)
    return out


_SQL_WORDS = frozenset("""AND OR NOT BETWEEN IN LIKE ILIKE RLIKE IS NULL TRUE
    FALSE TIMESTAMP DATE INTERVAL CAST AS CASE WHEN THEN ELSE END EXISTS
    SELECT FROM WHERE DISTINCT ESCAPE ALL ANY SOME ASC DESC""".split())

_OPAQUE = object()                      # ref marker: not a catalog table


def _parse_block_refs(from_part: str):
    """-> (refs, preserved, on_parts) or None when the FROM shape is not
    one we understand. refs: alias -> table identifier | _OPAQUE. Comma
    segments are INNER-joined (all preserved); JOIN chains inside a
    segment follow the outer-join preserved-side rules (see capture())."""
    if re.search(r"\b(FULL\s+(OUTER\s+)?JOIN|SEMI\s+JOIN|ANTI\s+JOIN|"
                 r"CROSS\s+JOIN|LATERAL|TABLESAMPLE|NATURAL)\b",
                 _mask_literals(from_part), re.IGNORECASE):
        return None
    refs: Dict[str, Any] = {}
    preserved: set = set()
    on_parts: List[tuple] = []

    def one_ref(piece: str):
        """alias, tbl(_OPAQUE for CTE/derived) — or None if unparseable."""
        piece = piece.strip()
        dm = re.match(r"^\((.*)\)\s*(?:AS\s+)?(\w+)$", piece,
                      re.IGNORECASE | re.DOTALL)
        if dm:
            return dm.group(2), _OPAQUE
        tm = re.match(r"^([\w.]+)(?:\s+(?:AS\s+)?(\w+))?$", piece,
                      re.IGNORECASE)
        if not tm:
            return None
        tbl = tm.group(1)
        alias = tm.group(2) or tbl
        # run_sql resolves catalog tables by full ns.table identifiers;
        # a bare single word is a CTE / temp view (opaque)
        return alias, (tbl if "." in tbl else _OPAQUE)

    for seg in _split_top_commas(from_part):
        if not re.search(r"\bJOIN\b", _mask_literals(seg), re.IGNORECASE):
            r = one_ref(seg)
            if r is None:
                return None
            refs[r[0]] = r[1]
            preserved.add(r[0])
            continue
        join_split = re.split(
            r"\b(INNER\s+JOIN|LEFT\s+(?:OUTER\s+)?JOIN|"
            r"RIGHT\s+(?:OUTER\s+)?JOIN|JOIN)\b",
            seg, flags=re.IGNORECASE)
        seg_aliases: set = set()
        for idx in range(0, len(join_split), 2):
            part = join_split[idx]
            om = re.search(r"\bON\b(.*)$", _mask_literals(part),
                           re.IGNORECASE | re.DOTALL)
            on_text = part[om.start() + 2:] if om else None
            piece = (part[:om.start()] if om else part).strip()
            r = one_ref(piece)
            if r is None:
                return None
            alias, tbl = r
            prior = set(seg_aliases)
            refs[alias] = tbl
            seg_aliases.add(alias)
            kw = "" if idx == 0 else join_split[idx - 1].upper()
            if idx == 0 or ("LEFT" not in kw and "RIGHT" not in kw):
                preserved.add(alias)
                if on_text:
                    on_parts.append((on_text, prior | {alias}))
            elif "RIGHT" in kw:
                # prior SEGMENT side becomes null-supplying
                preserved -= prior
                preserved.add(alias)
                if on_text:
                    on_parts.append((on_text, prior))
            else:                       # LEFT: new side null-supplying
                if on_text:
                    on_parts.append((on_text, {alias}))
    return refs, preserved, on_parts


# words that can follow a table reference without being its alias
_REF_TAIL_STOP = frozenset("""JOIN INNER LEFT RIGHT FULL CROSS ON WHERE
    GROUP ORDER HAVING LIMIT UNION INTERSECT EXCEPT SEMI ANTI NATURAL
    LATERAL USING FOR TABLESAMPLE""".split())


def _ref_spans(from_part: str, refs: dict) -> Dict[str, tuple]:
    """alias -> (start, end) span of the TABLE-IDENTIFIER text of each
    catalog-table reference at depth 0 of ``from_part`` (derived-table
    bodies masked out, so an inner block's reference of the same table
    never claims an outer span). Spans are relative to from_part; an
    alias matched by more than one span is dropped (soundness: a span we
    cannot attribute uniquely must not be rewritten)."""
    masked = list(_mask_literals(from_part))
    depth = 0
    for idx, ch in enumerate(masked):
        if ch == "(":
            depth += 1
            masked[idx] = " "
        elif ch == ")":
            depth -= 1
            masked[idx] = " "
        elif depth > 0:
            masked[idx] = " "
    flat = "".join(masked)
    by_tbl: Dict[str, list] = {}
    for alias, tbl in refs.items():
        if tbl is not _OPAQUE:
            by_tbl.setdefault(tbl, []).append(alias)
    out: Dict[str, tuple] = {}
    dropped: set = set()
    for tbl, aliases in by_tbl.items():
        pat = re.compile(rf"(?<![\w.]){re.escape(tbl)}(?![\w.$])")
        for m in pat.finditer(flat):
            tail = re.match(r"\s+(?:AS\s+)?([A-Za-z_]\w*)", flat[m.end():],
                            re.IGNORECASE)
            word = tail.group(1) if tail else None
            if word is not None and word.upper() in _REF_TAIL_STOP:
                word = None
            if word is not None and word in aliases:
                owner = word
            elif word is None and tbl in aliases:
                owner = tbl            # bare reference: alias == table
            else:
                continue
            if owner in out or owner in dropped:
                dropped.add(owner)
                out.pop(owner, None)
                continue
            out[owner] = (m.start(), m.end())
    return out


def _auto_scan_filters(query: str, catalog=None) -> Dict[str, "E.Predicate"]:
    """Table-keyed capture (see _auto_scan_filters_ex for the per-
    reference sibling run_sql uses for multi-referenced tables)."""
    return _auto_scan_filters_ex(query, catalog)[0]


def _auto_scan_filters_ex(query: str, catalog=None):
    """-> ({table: Predicate}, per_ref) captured from WHERE clauses for
    file pruning. Inclusive pruning of a conjunct that the block's own
    WHERE re-applies can only over-read, never over-prune — PROVIDED the
    pruned scan backs exactly one reference. The TABLE-KEYED dict feeds
    run_sql's one-view-per-table path, so any table referenced more than
    once anywhere in the query (self join, correlated subquery on the
    same table) is dropped from it — capturing one reference's conjunct
    would filter the other reference's rows too (r12 fix: the previous
    join path captured both sides of a self join into one contradictory
    filter).

    ``per_ref`` records carry each capture at REFERENCE granularity:
    {table, alias, pred, start, end} where [start, end) is the span of
    that reference's table identifier in ``query``. run_sql uses them to
    register a DISTINCT pruned view per reference of a multi-referenced
    table (the reference plans one TableProvider::scan per reference,
    crates/integrations/datafusion/src/table/mod.rs:120-143) — each
    reference then prunes with its own conjunct, which the once-only
    rule above must surrender when one view is shared.

    EVERY select block is scanned (top level, CTE bodies, derived tables,
    EXISTS/IN/scalar subqueries): a conjunct captured from an inner block
    is sound for that block's table under the same once-only rule.
    Conjunct attribution:
    - qualified (alias.col): the alias must be on the block's PRESERVED
      side (outer-join pushdown rules; ON-clause conjuncts may prune the
      null-supplying side instead).
    - unqualified: resolved by schema when a catalog is given — the
      column must belong to exactly ONE of the block's referenced tables,
      with no opaque-unknown relation (CTE/derived with unparseable
      select list) that could shadow it. Without a catalog, only
      single-ref blocks attribute unqualified conjuncts (old behavior).
    Subquery-bearing conjuncts and cross-table conjuncts are skipped
    (conservative; the full WHERE re-applies either way)."""
    from ..plans.sql_pred import sql_to_predicate

    def _has_subquery(text: str) -> bool:
        return bool(re.search(r"\(\s*SELECT\b", _mask_literals(text),
                              re.IGNORECASE))

    cte_cols = _cte_columns(query)
    schema_memo: Dict[str, Optional[frozenset]] = {}

    def table_columns(tbl: str) -> Optional[frozenset]:
        if catalog is None:
            return None
        got = schema_memo.get(tbl, _OPAQUE)
        if got is not _OPAQUE:
            return got
        try:
            md_schema = Table.load(catalog, tbl).metadata.schema()
            got = frozenset(f.name for f in md_schema.fields)
        except Exception:
            got = None
        schema_memo[tbl] = got
        return got

    out: Dict[str, "E.Predicate"] = {}
    per_ref: List[dict] = []

    def capture(text: str, refs: dict, allowed: set, caps: dict) -> None:
        def attribute(piece: str) -> Optional[str]:
            """The single block ref that owns every column of ``piece``,
            or None (cross-table / unresolvable / ambiguous)."""
            segs = _SQUOTE_RE.split(piece)
            masked_sql = [sg for i, sg in enumerate(segs) if i % 2 == 0]
            qual_aliases = {a for sg in masked_sql
                            for a, _c in re.findall(
                                r"\b(\w+)\s*\.\s*(\w+)", sg)
                            if a in refs}
            # unqualified identifiers: not function names, not qualified,
            # not keywords
            unq = set()
            for sg in masked_sql:
                for im in re.finditer(r"(\.)?\s*\b([A-Za-z_]\w*)\b(\s*\()?",
                                      sg):
                    if im.group(1) or im.group(3):
                        continue        # qualified tail / function call
                    w = im.group(2)
                    if w.upper() in _SQL_WORDS or w in refs:
                        continue
                    unq.add(w)
            owners = set(qual_aliases)
            if unq:
                if catalog is None:
                    cat_refs = [a for a, t in refs.items()
                                if t is not _OPAQUE]
                    if len(refs) == 1 and len(cat_refs) == 1:
                        owners.add(cat_refs[0])
                    else:
                        return None
                else:
                    for col in unq:
                        col_owner = None
                        ambiguous = False
                        for alias, tbl in refs.items():
                            cs = (cte_cols.get(alias)
                                  if tbl is _OPAQUE else table_columns(tbl))
                            if cs is None:
                                ambiguous = True   # unknown relation: may
                                break              # shadow the column
                            if col in cs:
                                if col_owner is not None:
                                    ambiguous = True
                                    break
                                col_owner = alias
                        if ambiguous or col_owner is None \
                                or refs[col_owner] is _OPAQUE:
                            return None
                        owners.add(col_owner)
            if len(owners) != 1:
                return None
            return owners.pop()

        def to_pred(piece: str, alias: str) -> Optional["E.Predicate"]:
            segs = _SQUOTE_RE.split(piece)
            strip = re.compile(rf"\b{re.escape(alias)}\s*\.\s*")
            bare = "".join(sg if i % 2 else strip.sub("", sg)
                           for i, sg in enumerate(segs))
            try:
                return sql_to_predicate(bare)
            except ValueError:
                return None

        def emit(alias: str, pred: "E.Predicate") -> None:
            caps[alias] = E.And(caps[alias], pred) if alias in caps else pred

        # SQL precedence: AND binds tighter than OR, so a text with a
        # TOP-LEVEL OR is a single disjunction — AND-splitting
        # `a OR b AND c` into ['a OR b', 'c'] would fabricate an
        # over-restrictive (a OR b) AND c and silently DROP rows
        # (review r12). Such texts flow through as ONE conjunct: either
        # the whole disjunction attributes to one table (sql_to_predicate
        # parses precedence correctly) or the OR-projection below
        # distributes it per table.
        conjuncts = ([text] if len(_split_top_or(text)) > 1
                     else _split_top_and(text))
        for conj in conjuncts:
            if _has_subquery(conj):
                continue
            alias = attribute(conj)
            if alias is not None:
                if refs[alias] is _OPAQUE or alias not in allowed:
                    continue
                pred = to_pred(conj, alias)
                if pred is not None:
                    emit(alias, pred)
                continue
            # cross-table conjunct: if it is an OR of AND-groups (TPC-H
            # Q19's shape), DISTRIBUTE per table — table t's projection
            # is OR over branches of (AND of t's own sub-conjuncts).
            # Dropping a branch's other-table / unparseable sub-conjuncts
            # only WIDENS the projection (sound for inclusive pruning);
            # a table missing from ANY branch is unbounded by the OR and
            # gets no capture.
            branches = _split_top_or(conj)
            if len(branches) < 2:
                continue
            per_alias: Dict[str, list] = {}
            for bi, br in enumerate(branches):
                by_alias: Dict[str, Any] = {}
                for piece in _split_top_and(_strip_outer_parens(br)):
                    if _has_subquery(piece):
                        continue
                    a = attribute(piece)
                    if a is None:
                        continue
                    p = to_pred(piece, a)
                    if p is None:
                        continue
                    by_alias[a] = (E.And(by_alias[a], p)
                                   if a in by_alias else p)
                for a, p in by_alias.items():
                    per_alias.setdefault(a, []).append(p)
            for a, preds in per_alias.items():
                if len(preds) != len(branches):
                    continue            # unbounded in some branch
                if refs.get(a) is _OPAQUE or a not in allowed:
                    continue
                acc = preds[0]
                for p in preds[1:]:
                    acc = E.Or(acc, p)
                emit(a, acc)

    for from_part, where, from_off in _from_where_blocks(query):
        parsed = _parse_block_refs(from_part)
        if parsed is None:
            continue
        refs, preserved, on_parts = parsed
        caps: Dict[str, "E.Predicate"] = {}
        if where is not None:
            plain = _mask_literals(where)
            if plain.count("(") == plain.count(")"):
                capture(where, refs, preserved, caps)
        for on_text, on_allowed in on_parts:
            capture(on_text, refs, on_allowed, caps)
        if not caps:
            continue
        spans = _ref_spans(from_part, refs)
        for alias, pred in caps.items():
            tbl = refs[alias]
            out[tbl] = E.And(out[tbl], pred) if tbl in out else pred
            sp = spans.get(alias)
            if sp is not None:
                per_ref.append({"table": tbl, "alias": alias, "pred": pred,
                                "start": from_off + sp[0],
                                "end": from_off + sp[1]})

    # once-only rule: a table textually referenced more than once shares
    # one filtered view across references — drop its capture from the
    # table-keyed dict (run_sql recovers these via per_ref instead)
    masked_q = _mask_literals(query)
    for tbl in list(out):
        pat = rf"(?<![\w.]){re.escape(tbl)}(?![\w.$])"
        if len(re.findall(pat, masked_q)) > 1:
            del out[tbl]
    return out, per_ref


def _memoizable_tables(query: str, catalog) -> Optional[frozenset]:
    """Catalog tables referenced by ``query`` when the query is
    CATALOG-CLOSED — every relation in every select block parses and
    resolves to an existing catalog table. None when any block fails to
    parse, any reference is a CTE/derived/temp view/Iceberg view/metadata
    table/travel clause, or the catalog lacks filesystem state
    (_run_sql_select_memo's safety gate: only catalog-closed plans can be
    keyed on catalog state alone — a temp view's content is invisible to
    the fingerprint, so any query that could touch one is never memoized)."""
    if not (hasattr(catalog, "warehouse") and hasattr(catalog, "io")
            and hasattr(catalog, "_metadata_dir")):
        return None
    blocks = _from_where_blocks(query)
    if not blocks:
        return None
    tables = set()
    for from_part, _w, _off in blocks:
        parsed = _parse_block_refs(from_part)
        if parsed is None:
            return None
        refs = parsed[0]
        for _alias, tbl in refs.items():
            if tbl is _OPAQUE:
                return None
            tables.add(tbl)
    if not tables:
        return None
    for tbl in tables:
        try:
            if not catalog.table_exists(tbl):
                return None
        except Exception:
            return None
    return frozenset(tables)


def _catalog_fingerprint(catalog, tables) -> Optional[tuple]:
    """(table, version-hint mtime_ns) per referenced table — changes on
    every commit/replace/drop (the hint file is atomically renamed into
    place per commit). None if any table's hint is unreadable."""
    from .io import posix_join as _pj
    try:
        return tuple(sorted(
            (t, catalog.io.mtime_ns(
                _pj(catalog._metadata_dir(t), "version-hint.text")))
            for t in tables))
    except Exception:
        return None


def _register_scan_view(spark: SparkSession, t: "Table", full: str,
                        view_name: str, pred, fallback_pred=None) -> None:
    """Register ``view_name`` over ``t.scan(row_filter=pred)``. Capture is
    best-effort: a predicate that does not bind to this table's schema
    (mis-attributed column) must degrade — first to ``fallback_pred``
    (a caller-supplied filter known independently of the capture), then
    to an unfiltered scan — never fail the query."""
    scan_obj = t.scan(row_filter=pred)
    if pred is not None:
        for cand in (fallback_pred, None):
            try:
                E.bind(scan_obj.row_filter, t.metadata.schema(),
                       scan_obj.case_sensitive)
                break
            except Exception:
                scan_obj = (t.scan(row_filter=cand) if cand is not None
                            else t.scan())
    if AUDIT_SCANS is not None:
        # opt-in planner observability (tools/frontdoor_audit): counters
        # come from a dedicated plan; the to_df below replans warm
        # (manifest + delete-index caches hit). Reads the POST-guard
        # row_filter so a degraded scan reports no filter, not one it
        # actually dropped.
        p = scan_obj.plan_files()
        AUDIT_SCANS.append({
            "table": full,
            "filter": ("None" if isinstance(
                scan_obj.row_filter, E.AlwaysTrue)
                else str(scan_obj.row_filter)),
            "total_manifests": p.total_manifests,
            "skipped_manifests": p.skipped_manifests,
            "total_data_files": p.total_data_files,
            "skipped_by_partition": p.skipped_by_partition,
            "skipped_by_metrics": p.skipped_by_metrics,
        })
    scan_obj.to_df(spark).createOrReplaceTempView(view_name)


def run_sql(spark: SparkSession, catalog: FileSystemCatalog, query: str,
            scan_filters: Optional[Dict[str, "E.Predicate"]] = None) -> DataFrame:
    """Execute ``query`` with catalog identifiers resolved to Iceberg scans.

    DML/DDL front door (counterpart of the reference's DataFusion
    ``insert_into``, physical_plan/write.rs:61 + commit.rs:43):
    ``INSERT INTO ns.t <select>`` appends the select's result to the Iceberg
    table in one snapshot; ``CREATE TABLE ns.t AS <select>`` creates the
    table from the result schema and appends. Both return the written rows.
    """
    scan_filters = scan_filters or {}

    m = _CALL_RE.match(query)
    if m:
        return _run_procedure(spark, catalog, m.group(1).lower(), m.group(2))
    m = _CREATE_EXT_RE.match(query)
    if m:
        # register an existing Iceberg table by its metadata-file path
        # (DataFusion's STORED AS ICEBERG factory registers session-scoped;
        # here it lands in the catalog so every later query resolves it)
        ident, location = m.group(1), m.group(2)
        md = catalog.register_table(ident, location)
        cur = md.current_snapshot()
        return spark.createDataFrame(
            [(ident, location, cur.snapshot_id if cur else None)],
            "table string, metadata_file string, current_snapshot_id long")
    m = _DESCRIBE_RE.match(query)
    if m:
        # a view / temp view / non-Iceberg relation is not in the catalog:
        # fall through to spark.sql like other unmatched statements
        try:
            t = Table.load(catalog, m.group(1))
        except NoSuchTable:
            t = None
        if t is not None:
            schema = t.metadata.schema()
            part_by = {pf.source_id: repr(pf.transform)
                       for pf in t.metadata.spec().fields}
            rows = [(f.name, str(f.field_type), not f.required,
                     part_by.get(f.field_id))
                    for f in schema.fields]
            return spark.createDataFrame(
                rows, "col_name string, data_type string, nullable boolean, "
                      "partition_transform string")
    m = _SHOW_CREATE_RE.match(query)
    if m:
        try:
            t = Table.load(catalog, m.group(1))
        except NoSuchTable:
            t = None  # view / non-Iceberg relation: defer to spark.sql
        if t is not None:
            schema = t.metadata.schema()
            cols = ",\n  ".join(
                f"{f.name} {f.field_type}"
                + ("" if not f.required else " NOT NULL")
                for f in schema.fields)
            spec = t.metadata.spec()
            src_name = {f.field_id: f.name for f in schema.fields}
            parts = ", ".join(
                (src_name[pf.source_id] if repr(pf.transform) == "identity"
                 else f"{repr(pf.transform).split('[')[0]}"
                      f"({src_name[pf.source_id]})")
                for pf in spec.fields)
            ddl = f"CREATE TABLE {m.group(1)} (\n  {cols}\n)"
            if parts:
                ddl += f"\nPARTITIONED BY ({parts})"
            props = ",\n  ".join(
                f"'{k}' = '{v}'"
                for k, v in sorted(t.metadata.properties.items()))
            if props:
                ddl += f"\nTBLPROPERTIES (\n  {props}\n)"
            return spark.createDataFrame([(ddl,)], "createtab_stmt string")
    m = _BRANCH_TAG_RE.match(query)
    if m:
        ident, action, kind, name, ver = (m.group(1), m.group(2).upper(),
                                          m.group(3).lower(), m.group(4),
                                          m.group(5))
        t = Table.load(catalog, ident)
        if action == "CREATE":
            snap_id = (int(ver) if ver
                       else t.metadata.current_snapshot_id)
            if snap_id is None:
                raise ValueError(f"{ident} has no snapshot to {kind}")
            ref_age = (int(m.group(6)) * _TIME_UNIT_MS[m.group(7).upper()]
                       if m.group(6) else None)
            min_keep = int(m.group(8)) if m.group(8) else None
            snap_age = (int(m.group(9)) * _TIME_UNIT_MS[m.group(10).upper()]
                        if m.group(9) else None)
            t.set_ref(name, snap_id, ref_type=kind,
                      min_snapshots_to_keep=min_keep,
                      max_snapshot_age_ms=snap_age,
                      max_ref_age_ms=ref_age)
        else:
            if name not in t.metadata.refs:
                raise ValueError(f"no {kind} named {name}")
            t.commit_updates([{"action": "remove-snapshot-ref",
                               "ref-name": name}], [])
        return spark.createDataFrame([(name, kind)], "ref string, type string")
    m = _CREATE_VIEW_RE.match(query)
    if m:
        replace, ident, view_sql = bool(m.group(1)), m.group(2), m.group(3)
        vc = ViewCatalog(catalog)
        try:
            exists = True
            vc.load_view(ident)
        except NoSuchTable:
            exists = False
        if exists:
            if not replace:
                raise ValueError(f"view {ident} already exists "
                                 f"(use CREATE OR REPLACE VIEW)")
            vc.replace_view(ident, view_sql.strip())
        else:
            vc.create_view(ident, view_sql.strip())
        return spark.createDataFrame([(ident,)], "view string")
    m = _DROP_VIEW_RE.match(query)
    if m:
        vc = ViewCatalog(catalog)
        try:
            vc.drop_view(m.group(2))
        except Exception:
            if not m.group(1):
                raise
        return spark.createDataFrame([(m.group(2),)], "view string")
    m = _INSERT_OVERWRITE_RE.match(query)
    if m:
        from .table import Table as _Table

        target, select_sql = m.group(1), m.group(2)
        t = _Table.load(catalog, target)
        df = run_sql(spark, catalog, select_sql, scan_filters)
        # Spark's partitionOverwriteMode conf picks the Iceberg semantics:
        # dynamic replaces only the partitions the rows touch, static (the
        # default) replaces the whole table — both one atomic snapshot
        mode = spark.conf.get("spark.sql.sources.partitionOverwriteMode",
                              "static").lower()
        if mode == "dynamic":
            t.overwrite_dynamic(spark, df)
        else:
            t.overwrite_all(spark, df)
        return df
    m = _INSERT_RE.match(query)
    if m:
        from .table import Table as _Table

        target, select_sql = m.group(1), m.group(2)
        t = _Table.load(catalog, target)
        df = run_sql(spark, catalog, select_sql, scan_filters)
        # standard SQL INSERT maps the query's columns POSITIONALLY when
        # the arity matches (a bare VALUES list arrives as col1..colN);
        # arity mismatches keep the name-based path (defaults fill in)
        tcols = [f.name for f in t.metadata.schema().fields]
        if len(df.columns) == len(tcols) and df.columns != tcols:
            df = df.toDF(*tcols)
        t.append(spark, df)
        return df
    m = _DROP_TABLE_RE.match(query)
    if m:
        if_exists, ident = bool(m.group(1)), m.group(2)
        if catalog.table_exists(ident):
            catalog.drop_table(ident)
            return spark.createDataFrame([(ident, True)],
                                         "table string, dropped boolean")
        if if_exists:
            return spark.createDataFrame([(ident, False)],
                                         "table string, dropped boolean")
        # unknown to the catalog: defer to spark.sql (temp/external relation)
    m = _TRUNCATE_RE.match(query)
    if m:
        from .table import Table as _Table

        t = _Table.load(catalog, m.group(1))
        n = t.to_df(spark).count()
        t._commit_retry(lambda md: t._snapshot_update(
            md, "delete", remove_all=True))
        return spark.createDataFrame([(n,)], "deleted_rows long")
    part_clause = None
    create_q = query
    if not _CTAS_RE.match(query):
        pm = _PART_BY_RE.search(query)
        if pm and _CREATE_RE.match(query[:pm.start()] or " "):
            part_clause = pm.group(1)
            create_q = query[:pm.start()]
    m = None if _CTAS_RE.match(query) else _CREATE_RE.match(create_q)
    if m:
        from pyspark.sql.types import _parse_datatype_string
        from .table import Table as _Table
        from .types import schema_from_spark

        target, cols = m.group(1), m.group(2)
        # TIMESTAMP(6) (ANSI precision syntax, e.g. from the reference's
        # sqllogictest DDL) == microsecond timestamps == Iceberg/Spark
        # TIMESTAMP; Spark's DDL parser rejects the precision form
        cols = re.sub(r"TIMESTAMP\s*\(\s*6\s*\)", "TIMESTAMP", cols,
                      flags=re.IGNORECASE)
        if catalog.table_exists(target):
            if re.search(r"IF\s+NOT\s+EXISTS", query, re.IGNORECASE):
                return spark.createDataFrame([(target, False)],
                                             "table string, created boolean")
            raise ValueError(f"table {target} already exists")
        schema = schema_from_spark(_parse_datatype_string(cols))
        spec = (_parse_partition_clause(part_clause, schema)
                if part_clause else None)
        _Table.create(catalog, target, schema, spec)
        return spark.createDataFrame([(target, True)],
                                     "table string, created boolean")
    m = _ALTER_ADD_RE.match(query)
    if m:
        from .table import Table as _Table

        target, col, typ, default = m.groups()
        t = _Table.load(catalog, target)
        t.update_schema().add_column(
            col, _ice_type_name(typ),
            initial_default=_parse_default(default)).commit()
        return spark.createDataFrame([(target, col, _ice_type_name(typ))],
                                     "table string, added string, type string")
    m = _ALTER_DROP_RE.match(query)
    if m:
        from .table import Table as _Table

        target, col = m.groups()
        t = _Table.load(catalog, target)
        t.update_schema().drop_column(col).commit()
        return spark.createDataFrame([(target, col)],
                                     "table string, dropped string")
    m = _ALTER_RENAME_RE.match(query)
    if m:
        from .table import Table as _Table

        target, old, new = m.groups()
        t = _Table.load(catalog, target)
        t.update_schema().rename_column(old, new).commit()
        return spark.createDataFrame([(target, old, new)],
                                     "table string, renamed string, to string")
    m = _ALTER_TYPE_RE.match(query)
    if m:
        from .table import Table as _Table

        target, col, typ = m.groups()
        t = _Table.load(catalog, target)
        t.update_schema().promote_column(col, _ice_type_name(typ)).commit()
        return spark.createDataFrame([(target, col, _ice_type_name(typ))],
                                     "table string, promoted string, type string")
    m = _ALTER_ADD_PART_RE.match(query)
    if m:
        from .metadata import PartitionField, PartitionSpec
        from .table import Table as _Table

        target, expr = m.groups()
        t = _Table.load(catalog, target)
        schema = t.metadata.schema()
        pf = _parse_partition_clause(expr, schema).fields[0]
        # a re-added (source, transform) pair REUSES its historical field id
        # (table_metadata_builder.rs test_partition_field_id_reuse_across_
        # specs / partitioning.rs compatibility rule); only genuinely new
        # pairs get a fresh id
        prior = {(f.source_id, repr(f.transform)): f.field_id
                 for sp in t.metadata.partition_specs for f in sp.fields}
        next_fid = prior.get((pf.source_id, repr(pf.transform)))
        if next_fid is None:
            next_fid = max((f.field_id for sp in t.metadata.partition_specs
                            for f in sp.fields), default=999) + 1
        cur = t.metadata.spec()
        next_sid = max(s.spec_id for s in t.metadata.partition_specs) + 1
        new_spec = PartitionSpec(next_sid, list(cur.fields) + [
            PartitionField(pf.source_id, next_fid, pf.name, pf.transform)])
        t.commit_updates(updates=[{"action": "add-spec", "spec": new_spec},
                                  {"action": "set-default-spec", "spec-id": -1}])
        return spark.createDataFrame([(target, pf.name)],
                                     "table string, added_partition_field string")
    m = _ALTER_DROP_PART_RE.match(query)
    if m:
        from .metadata import PartitionSpec
        from .table import Table as _Table

        target, pname = m.groups()
        t = _Table.load(catalog, target)
        cur = t.metadata.spec()
        kept = [f for f in cur.fields if f.name != pname]
        if len(kept) == len(cur.fields):
            raise ValueError(f"no partition field {pname} in current spec")
        next_sid = max(s.spec_id for s in t.metadata.partition_specs) + 1
        t.commit_updates(updates=[{"action": "add-spec",
                                   "spec": PartitionSpec(next_sid, kept)},
                                  {"action": "set-default-spec", "spec-id": -1}])
        return spark.createDataFrame([(target, pname)],
                                     "table string, dropped_partition_field string")
    m = _ALTER_PROPS_RE.match(query)
    if m:
        from .table import Table as _Table

        target, body = m.groups()
        props = dict(re.findall(r"'([^']*)'\s*=\s*'([^']*)'", body))
        if not props:
            raise ValueError("SET TBLPROPERTIES needs 'key'='value' pairs")
        _Table.load(catalog, target).update_properties(props)
        return spark.createDataFrame(sorted(props.items()),
                                     "property string, value string")
    m = _WRITE_ORDERED_RE.match(query)
    if m:
        # Spark-Iceberg DDL: ALTER TABLE t WRITE ORDERED BY (c1 [ASC|DESC],
        # transform(c), ...) / WRITE UNORDERED — metadata-only SortOrder
        # replacement; the write path then sorts within partitions
        from ..functions.transforms import parse_transform
        from .metadata import SortField, SortOrder
        target, clause = m.group(1), m.group(2)
        t = Table.load(catalog, target)
        if clause is None:                         # WRITE UNORDERED
            def unordered(md):
                md.default_sort_order_id = 0
                if not any(o.order_id == 0 for o in md.sort_orders):
                    md.sort_orders.append(SortOrder(0, []))
                return md
            t._commit_retry(unordered)
            return spark.createDataFrame([(target, 0)],
                                         "table string, sort_order_id int")
        schema = t.metadata.schema()
        sfs = []
        for item in re.split(r",(?![^()]*\))", clause):
            im = re.match(
                r"^\s*(?:(\w+)\s*\(\s*([\w,\s]+?)\s*\)|(\w+))"
                r"(?:\s+(ASC|DESC))?(?:\s+NULLS\s+(FIRST|LAST))?\s*$",
                item, re.IGNORECASE)
            if not im:
                raise ValueError(f"cannot parse sort field {item!r}")
            fn, fn_args, bare, direction, nulls = im.groups()
            if fn:
                args = [a.strip() for a in fn_args.split(",")]
                if fn.lower() in ("bucket", "truncate"):
                    n, col = ((args[0], args[1]) if args[0].isdigit()
                              else (args[1], args[0]))
                    transform = parse_transform(f"{fn.lower()}[{n}]")
                else:
                    transform, col = parse_transform(fn.lower()), args[0]
            else:
                transform, col = parse_transform("identity"), bare
            f = schema.field_by_name(col)
            if f is None:
                raise ValueError(f"no column {col}")
            if not transform.can_transform(f.field_type):
                raise ValueError(
                    f"sort transform {transform!r} cannot apply to "
                    f"{col}: {f.field_type}")
            sfs.append(SortField(
                f.field_id, transform,
                (direction or "asc").lower(),
                f"nulls-{(nulls or 'last').lower()}"))

        def ordered(md):
            oid = max((o.order_id for o in md.sort_orders), default=0) + 1
            md.sort_orders.append(SortOrder(oid, sfs))
            md.default_sort_order_id = oid
            return md
        t = t._commit_retry(ordered)
        return spark.createDataFrame(
            [(target, t.metadata.default_sort_order_id)],
            "table string, sort_order_id int")
    m = _DROP_RE.match(query)
    if m:
        if_exists, target = bool(m.group(1)), m.group(2)
        if not catalog.table_exists(target):
            if if_exists:
                return spark.createDataFrame([(target, False)],
                                             "table string, dropped boolean")
            raise NoSuchTable(target)
        catalog.drop_table(target)
        return spark.createDataFrame([(target, True)],
                                     "table string, dropped boolean")
    m = _SHOW_RE.match(query)
    if m:
        ns_filter = m.group(1)
        rows = [(ns, t) for ns in catalog.list_namespaces()
                if ns_filter is None or ns == ns_filter
                for t in catalog.list_tables(ns)]
        return spark.createDataFrame(rows or [],
                                     "namespace string, tableName string")
    m = _SHOW_NS_RE.match(query)
    if m:
        return spark.createDataFrame(
            [(ns,) for ns in catalog.list_namespaces()] or [],
            "namespace string")
    m = _CREATE_NS_RE.match(query)
    if m:
        if_not_exists, ns, props_body = m.groups()
        props = dict(re.findall(r"'([^']*)'\s*=\s*'([^']*)'",
                                props_body or ""))
        if catalog.namespace_exists(ns):
            if not if_not_exists:
                raise ValueError(f"namespace {ns} already exists")
            return spark.createDataFrame([(ns, False)],
                                         "namespace string, created boolean")
        catalog.create_namespace(ns, props)
        return spark.createDataFrame([(ns, True)],
                                     "namespace string, created boolean")
    m = _DROP_NS_RE.match(query)
    if m:
        if_exists, ns = m.groups()
        if not catalog.namespace_exists(ns):
            if if_exists:
                return spark.createDataFrame(
                    [(ns, False)], "namespace string, dropped boolean")
            raise NoSuchNamespace(ns)
        catalog.drop_namespace(ns)  # NamespaceNotEmpty propagates
        return spark.createDataFrame([(ns, True)],
                                     "namespace string, dropped boolean")
    m = _ALTER_NS_RE.match(query)
    if m:
        ns, verb, body = m.groups()
        if verb.upper() == "SET":
            updates = dict(re.findall(r"'([^']*)'\s*=\s*'([^']*)'", body))
            if not updates:
                raise ValueError("SET PROPERTIES needs 'key'='value' pairs")
            catalog.update_namespace(ns, updates=updates)
        else:
            removals = re.findall(r"'([^']*)'", body)
            if not removals:
                raise ValueError("UNSET PROPERTIES needs 'key' names")
            catalog.update_namespace(ns, removals=removals)
        rows = sorted(catalog.namespace_properties(ns).items())
        return spark.createDataFrame(rows or [], "property string, value string")
    m = _DESC_NS_RE.match(query)
    if m:
        ns = m.group(1)
        rows = sorted(catalog.namespace_properties(ns).items())
        return spark.createDataFrame(
            [("namespace", ns)] + rows, "info_name string, info_value string")
    m = _SHOW_PARTS_RE.match(query)
    if m:
        # alias for the partitions metadata table (Spark's SHOW PARTITIONS)
        t = Table.load(catalog, m.group(1))
        return t.partitions_df(spark)
    m = _SHOW_PROPS_RE.match(query)
    if m:
        t = Table.load(catalog, m.group(1))
        props = t.metadata.properties
        if m.group(2):
            rows = [(m.group(2), props.get(m.group(2)))]
        else:
            rows = sorted(props.items()) or []
        return spark.createDataFrame(rows, "key string, value string")
    m = _SHOW_VIEWS_RE.match(query)
    if m:
        vc0 = ViewCatalog(catalog)
        ns_filter = m.group(1)
        rows = [(ns, v) for ns in catalog.list_namespaces()
                if ns_filter is None or ns == ns_filter
                for v in vc0.list_views(ns)]
        return spark.createDataFrame(rows or [],
                                     "namespace string, viewName string")
    m = _CTAS_RE.match(query)
    if m:
        from .table import Table as _Table
        from .types import schema_from_spark

        target, select_sql = m.group(1), m.group(2)
        df = run_sql(spark, catalog, select_sql, scan_filters)
        t = _Table.create(catalog, target, schema_from_spark(df.schema))
        t.append(spark, df)
        return df
    m = _DELETE_ALL_RE.match(query)
    if m:
        # DELETE without WHERE = truncate semantics (one replace snapshot)
        from .table import Table as _Table
        t = _Table.load(catalog, m.group(1))
        n = t.to_df(spark).count()
        t._commit_retry(lambda md: t._snapshot_update(
            md, "delete", remove_all=True))
        return spark.createDataFrame([(n,)], "deleted_rows long")
    m = _DELETE_RE.match(query)
    if m:
        from ..plans.sql_pred import sql_to_predicate
        from .table import Table as _Table

        target, where_sql = m.group(1), m.group(2)
        pred = sql_to_predicate(where_sql)  # raises if not prunable: DELETE
        # must never silently under/over-delete, so no fallback here
        t = _Table.load(catalog, target)
        n = t.scan(row_filter=pred).to_df(spark) \
            .where(E.to_spark_column(pred)).count()
        t.delete_where(spark, pred)
        return spark.createDataFrame([(n,)], "deleted_rows long")

    m = _MERGE_WHEN_RE.match(query)
    if m:
        return _run_merge_when(spark, catalog, scan_filters, m)
    m = _MERGE_RE.match(query)
    if m:
        from .table import Table as _Table

        target, source_sql, on_cols = m.group(1), m.group(2), m.group(3)
        if source_sql.startswith("(") and source_sql.endswith(")"):
            source_sql = source_sql[1:-1]
        keys = [c.strip() for c in on_cols.split(",") if c.strip()]
        t = _Table.load(catalog, target)
        src = run_sql(spark, catalog, source_sql, scan_filters)
        t.merge(spark, src, keys)
        return src

    m = _UPDATE_RE.match(query)
    if m:
        from ..plans.sql_pred import sql_to_predicate
        from .table import Table as _Table

        target, set_clause, where_sql = m.group(1), m.group(2), m.group(3)
        # UPDATE without WHERE touches every row
        pred = (sql_to_predicate(where_sql) if where_sql
                else E.ALWAYS_TRUE)
        assignments = _split_assignments(set_clause)
        t = _Table.load(catalog, target)
        n = t.scan(row_filter=pred).to_df(spark) \
            .where(E.to_spark_column(pred)).count()
        t.update_where(spark, pred, assignments)
        return spark.createDataFrame([(n,)], "updated_rows long")

    # SELECT-path plan memo (guide §1.2 driver chatter): parse + capture +
    # per-reference view registration + Catalyst analysis cost ~0.15 s of
    # pure construct per call and are a deterministic function of (query
    # text, scan_filters, referenced-table state) for CATALOG-CLOSED
    # queries (_memoizable_tables). The memo holds the analyzed LAZY
    # DataFrame only — every action still plans jobs and reads parquet —
    # keyed on each referenced table's version-hint mtime so any commit,
    # replace or drop invalidates it (same immutable-state argument as
    # scan.cached_parquet_relation). Queries that could resolve a temp
    # view, CTE, Iceberg view, metadata table or travel clause are never
    # memoized; AUDIT_SCANS bypasses the memo so per-call audit records
    # keep appending.
    memo_key = memo_fp = None
    if AUDIT_SCANS is None:
        memo_tables = _memoizable_tables(query, catalog)
        if memo_tables:
            memo_fp = _catalog_fingerprint(catalog, memo_tables)
        if memo_fp is not None:
            sf_key = tuple(sorted((t, str(p))
                           for t, p in scan_filters.items()))
            memo_key = (catalog.warehouse, query, sf_key)
            memo = getattr(spark, "_irs_run_sql_memo", None)
            if memo is None:
                from collections import OrderedDict
                memo = OrderedDict()
                spark._irs_run_sql_memo = memo
            hit = memo.get(memo_key)
            if hit is not None and hit[0] == memo_fp:
                memo.move_to_end(memo_key)
                return hit[1]

    auto, per_ref = _auto_scan_filters_ex(query, catalog)
    if auto:
        scan_filters = {**{t: p for t, p in auto.items()
                           if t not in scan_filters}, **scan_filters}
    vc = ViewCatalog(catalog)
    rewritten = query

    # per-reference pruned views: a table referenced MORE than once never
    # gets a shared filtered view (once-only rule — capturing one
    # reference's conjunct would drop the other reference's rows, r12
    # bug), so each captured reference is spliced onto its OWN pruned
    # scan view over exactly its table-identifier span instead — the
    # reference's planner does the same, one TableProvider::scan per
    # reference (crates/integrations/datafusion/src/table/mod.rs:120).
    # References without a captured conjunct keep the shared (unfiltered
    # or user-filtered) view via the catalog loop below.
    if per_ref:
        masked_q0 = _mask_literals(query)
        multi = {r["table"] for r in per_ref if len(re.findall(
            rf"(?<![\w.]){re.escape(r['table'])}(?![\w.$])", masked_q0)) > 1}
        spliced = sorted((r for r in per_ref if r["table"] in multi),
                         key=lambda r: -r["start"])
        prev_start = len(query) + 1
        for k, r in enumerate(spliced):
            if r["end"] > prev_start:
                continue                # overlap: never splice twice
            try:
                t = Table.load(catalog, r["table"])
            except NoSuchTable:
                continue
            user_pred = scan_filters.get(r["table"])
            pred = (E.And(user_pred, r["pred"])
                    if user_pred is not None else r["pred"])
            view_name = f"__ice_pr{k}_" + r["table"].replace(".", "_")
            _register_scan_view(spark, t, r["table"], view_name, pred,
                                user_pred)
            rewritten = (rewritten[:r["start"]] + view_name
                         + rewritten[r["end"]:])
            prev_start = r["start"]

    # time travel: `t FOR VERSION AS OF <id>` / `FOR TIMESTAMP AS OF '<ts>'`
    # registers a snapshot-pinned scan under a synthetic view name
    def _travel(m: "re.Match") -> str:
        ident, kind, lit = m.group(1), m.group(2).upper(), m.group(3)
        try:
            t = Table.load(catalog, ident)
        except NoSuchTable:
            return m.group(0)
        if kind == "VERSION":
            if lit.startswith("'"):
                # branch/tag name (Spark-Iceberg allows VERSION AS OF to
                # name a ref): resolve through the table's refs map
                ref = lit.strip("'")
                scan = t.scan(ref=ref)
                tag = re.sub(r"\W", "_", ref)
            else:
                scan = t.scan(snapshot_id=int(lit))
                tag = lit
        else:
            import datetime as _dt
            ts = _dt.datetime.fromisoformat(lit.strip("'"))
            ms = int(ts.replace(tzinfo=_dt.timezone.utc).timestamp() * 1000)
            scan = t.scan(as_of_timestamp_ms=ms)
            tag = str(ms)
        view = f"__ice_travel_{ident.replace('.', '_')}_{tag}"
        scan.to_df(spark).createOrReplaceTempView(view)
        return view

    rewritten = _TRAVEL_RE.sub(_travel, rewritten)
    for ns in catalog.list_namespaces():
        for tname in catalog.list_tables(ns):
            full = f"{ns}.{tname}"
            pat = re.compile(rf"(?<![\w.]){re.escape(full)}(?![\w.$])")
            # metadata tables address as ns.t.snapshots or the Java-style
            # ns.t$snapshots — both rewrite to the same temp view
            meta_hits = {
                meta: re.compile(
                    rf"(?<![\w.]){re.escape(full)}[.$]{meta}(?![\w.])")
                for meta in _META_TABLES
                if re.search(rf"(?<![\w.]){re.escape(full)}[.$]{meta}(?![\w.])",
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
                _register_scan_view(spark, t, full, view_name,
                                    scan_filters.get(full))
                rewritten = pat.sub(view_name, rewritten)
        for vname in vc.list_views(ns):
            full = f"{ns}.{vname}"
            pat = re.compile(rf"(?<![\w.]){re.escape(full)}(?![\w.])")
            if not pat.search(rewritten):
                continue
            view_name = f"__ice_view_{ns}_{vname}"
            vc.read_view(spark, full).createOrReplaceTempView(view_name)
            rewritten = pat.sub(view_name, rewritten)
    out = spark.sql(rewritten)
    if memo_key is not None:
        memo = spark._irs_run_sql_memo
        memo[memo_key] = (memo_fp, out)
        memo.move_to_end(memo_key)
        while len(memo) > 64:
            memo.popitem(last=False)
    return out


# positional signatures for named-argument (`name => value`) calls;
# names follow Spark-Iceberg's procedure parameters
_PROC_PARAMS: Dict[str, List[str]] = {
    "snapshot": ["source_table", "table"],
    "compute_table_stats": ["table", "columns"],
    "register_table": ["table", "metadata_file"],
    "rewrite_data_files": ["table", "strategy"],
    "rewrite_manifests": ["table", "target_entries"],
    "convert_equality_deletes": ["table"],
    "rewrite_position_delete_files": ["table"],
    "expire_snapshots": ["table", "older_than", "retain_last"],
    "remove_orphan_files": ["table", "older_than"],
    "rollback_to_snapshot": ["table", "snapshot_id"],
    "rollback_to_timestamp": ["table", "timestamp"],
    "add_files": ["table", "source_table"],
    "remove_dangling_deletes": ["table"],
    "rewrite_table_path": ["table", "source_prefix", "target_prefix"],
    "set_current_snapshot": ["table", "snapshot_id"],
    "fast_forward": ["table", "branch", "to"],
    "cherrypick_snapshot": ["table", "snapshot_id"],
    "publish_changes": ["table", "wap_id"],
    "ancestors_of": ["table", "snapshot_id"],
    "create_changelog_view": ["table", "changelog_view", "net_changes"],
}


def _run_procedure(spark: SparkSession, catalog: FileSystemCatalog,
                   proc: str, raw_args: str) -> DataFrame:
    """Maintenance stored procedures, Spark-Iceberg's `CALL system.*` shape
    (the reference exposes these as transaction actions; a SQL user expects
    the procedure spelling). Positional (`'db.t', 5`) or Spark-style named
    (`table => 'db.t', retain_last => 5`) arguments — named args re-order
    onto the procedure's positional signature. Each returns a one-row
    summary DataFrame like Spark's procedures.
    """
    from .table import Table as _Table

    def _parse_val(a: str):
        return a[1:-1] if a.startswith("'") and a.endswith("'") else int(a)

    args: List[Any] = []
    named: Dict[str, Any] = {}
    for a in re.findall(r"\w+\s*=>\s*(?:'[^']*'|[^,\s]+)|'[^']*'|[^,\s][^,]*",
                        raw_args):
        a = a.strip()
        if not a:
            continue
        m_kw = re.match(r"(\w+)\s*=>\s*(.*)$", a)
        if m_kw:
            named[m_kw.group(1).lower()] = _parse_val(m_kw.group(2).strip())
        else:
            args.append(_parse_val(a))
    if named:
        sig = _PROC_PARAMS.get(proc)
        if sig is None:
            raise ValueError(
                f"CALL system.{proc}: named arguments not supported")
        slots: List[Any] = list(args)
        for name, val in named.items():
            if name not in sig:
                raise ValueError(
                    f"CALL system.{proc}: unknown argument {name!r} "
                    f"(takes {', '.join(sig)})")
            idx = sig.index(name)
            while len(slots) <= idx:
                slots.append(None)
            slots[idx] = val
        # trim trailing unset optionals; interior None = omitted optional
        while slots and slots[-1] is None:
            slots.pop()
        if slots and slots[0] is None:
            raise ValueError(f"CALL system.{proc}: {sig[0]} is required")
        args = slots
    if not args:
        raise ValueError(f"CALL system.{proc}: table identifier required")
    if proc == "snapshot":
        # snapshot(source_glob, table): adopt EXISTING parquet files as a
        # brand-new Iceberg table without copying them — Spark-Iceberg's
        # system.snapshot for a path source (schema inferred, files
        # imported via the name-mapping add_files path). The files stay
        # where they are; only metadata is created.
        if len(args) < 2:
            raise ValueError("snapshot(source_glob, table)")
        import glob as _glob

        from .types import schema_from_spark
        src_glob, ident = str(args[0]), str(args[1])
        paths = sorted(_glob.glob(src_glob))
        if not paths:
            raise ValueError(f"no files match {src_glob}")
        inferred = spark.read.parquet(*paths).schema
        t = _Table.create(catalog, ident, schema_from_spark(inferred))
        t = t.add_files(spark, paths)
        n_rows = t.to_df(spark).count()
        return spark.createDataFrame(
            [(ident, len(paths), n_rows)],
            "table string, imported_files_count int, imported_rows long")
    if proc == "compute_table_stats":
        # Spark-Iceberg's system.compute_table_stats: one distributed NDV
        # aggregation -> Puffin statistics file -> set-statistics commit
        t = _Table.load(catalog, str(args[0]))
        cols = [str(a) for a in args[1:]] or None
        t = t.analyze(spark, columns=cols)
        sf = t.metadata.statistics[-1] if t.metadata.statistics else {}
        return spark.createDataFrame(
            [(str(args[0]), sf.get("statistics-path", ""))],
            "table string, statistics_file string")
    if proc == "register_table":
        # register_table(table, metadata_file): catalog entry at EXISTING
        # metadata (Catalog::register_table; Spark's system.register_table
        # procedure) — dispatched before Table.load since the identifier
        # doesn't exist yet
        if len(args) < 2:
            raise ValueError("register_table(table, metadata_file)")
        md = catalog.register_table(str(args[0]), str(args[1]))
        cur = md.current_snapshot()
        return spark.createDataFrame(
            [(str(args[0]), str(args[1]),
              cur.snapshot_id if cur else None)],
            "table string, metadata_file string, current_snapshot_id long")
    t = _Table.load(catalog, str(args[0]))

    if proc == "rewrite_data_files":
        strategy = str(args[1]) if len(args) > 1 and args[1] is not None \
            else "binpack"
        zm = re.match(r"zorder\(([\w,\s]+)\)", strategy)
        before = len(list(t.scan().plan_files().tasks))
        if zm:
            t = t.rewrite_zorder(spark,
                                 [c.strip() for c in zm.group(1).split(",")])
        elif strategy == "binpack":
            t = t.compact(spark)
        else:
            raise ValueError(f"unknown rewrite strategy: {strategy}")
        after = len(list(t.scan().plan_files().tasks))
        return spark.createDataFrame(
            [(before, after)],
            "rewritten_data_files_count int, added_data_files_count int")
    if proc == "rewrite_manifests":
        from .scan import load_manifest_list
        target = int(args[1]) if len(args) > 1 and args[1] is not None \
            else 100_000
        before = len(load_manifest_list(
            t.metadata.current_snapshot().manifest_list)) \
            if t.metadata.current_snapshot() else 0
        t = t.rewrite_manifests(target_entries=target)
        after = len(load_manifest_list(
            t.metadata.current_snapshot().manifest_list)) \
            if t.metadata.current_snapshot() else 0
        return spark.createDataFrame(
            [(before, after)],
            "rewritten_manifests_count int, added_manifests_count int")
    if proc == "convert_equality_deletes":
        n_eq = t.delete_files_df(spark).where("content = 2").count()
        t = t.convert_equality_deletes(spark)
        n_pos = t.delete_files_df(spark) \
            .where("content = 1 AND file_format <> 'puffin'").count()
        return spark.createDataFrame(
            [(n_eq, n_pos)],
            "converted_equality_files_count int, position_delete_files_count int")
    if proc == "rewrite_position_delete_files":
        cond = "content = 1 AND file_format <> 'puffin'"
        before = t.delete_files_df(spark).where(cond).count()
        t = t.rewrite_position_deletes(spark)
        after = t.delete_files_df(spark).where(cond).count()
        return spark.createDataFrame(
            [(before, after)],
            "rewritten_delete_files_count int, added_delete_files_count int")
    if proc == "expire_snapshots":
        older = int(args[1]) if len(args) > 1 and args[1] is not None \
            else None
        retain = int(args[2]) if len(args) > 2 and args[2] is not None \
            else None
        n_before = len(t.metadata.snapshots)
        t = t.expire_snapshots(older_than_ms=older, retain_last=retain)
        return spark.createDataFrame(
            [(n_before - len(t.metadata.snapshots),)],
            "deleted_snapshots_count int")
    if proc == "remove_orphan_files":
        older = int(args[1]) if len(args) > 1 and args[1] is not None \
            else None
        removed = t.remove_orphan_files(older_than_ms=older)
        return spark.createDataFrame(
            [(len(removed),)], "orphan_file_count int")
    if proc == "rollback_to_snapshot":
        if len(args) < 2:
            raise ValueError("rollback_to_snapshot(table, snapshot_id)")
        prev = t.metadata.current_snapshot_id
        t = t.rollback_to(int(args[1]))
        return spark.createDataFrame(
            [(prev, int(args[1]))],
            "previous_snapshot_id long, current_snapshot_id long")
    if proc == "rollback_to_timestamp":
        # Spark's procedure: roll main back to the last snapshot at or
        # before the timestamp (snapshot_as_of resolution)
        if len(args) < 2:
            raise ValueError(
                "rollback_to_timestamp(table, 'YYYY-MM-DD HH:MM:SS' | ms)")
        raw = args[1]
        if isinstance(raw, int):
            ms = raw
        else:
            import datetime as _dt
            ts = _dt.datetime.fromisoformat(str(raw))
            if ts.tzinfo is None:
                ts = ts.replace(tzinfo=_dt.timezone.utc)
            ms = int(ts.timestamp() * 1000)
        snap = t.metadata.snapshot_as_of(ms)
        if snap is None:
            raise ValueError(f"no snapshot at or before {raw}")
        prev = t.metadata.current_snapshot_id
        t = t.rollback_to(snap.snapshot_id)
        return spark.createDataFrame(
            [(prev, snap.snapshot_id)],
            "previous_snapshot_id long, current_snapshot_id long")
    if proc == "add_files":
        if len(args) < 2:
            raise ValueError("add_files(table, path_glob)")
        import glob as _glob
        paths = sorted(_glob.glob(str(args[1])))
        if not paths:
            raise ValueError(f"no files match {args[1]}")
        before = len(list(t.scan().plan_files().tasks))
        t = t.add_files(spark, paths)
        after = len(list(t.scan().plan_files().tasks))
        return spark.createDataFrame(
            [(after - before,)], "added_files_count int")
    if proc == "remove_dangling_deletes":
        before_snap = t.metadata.current_snapshot_id
        t2 = t.remove_dangling_deletes()
        snap = t2.metadata.current_snapshot()
        # a no-op sweep commits nothing — the head is unchanged
        removed = int(snap.summary.get("removed-delete-files", "0")) \
            if snap and snap.snapshot_id != before_snap else 0
        return spark.createDataFrame(
            [(removed,)], "removed_delete_files_count int")
    if proc == "rewrite_table_path":
        # rewrite_table_path(table, source_prefix, target_prefix): stage a
        # path-rewritten metadata tree + the copy file list (Spark's
        # procedure shape; the bulk copy itself is the caller's DistCp)
        if len(args) < 3:
            raise ValueError(
                "rewrite_table_path(table, source_prefix, target_prefix)")
        out = t.rewrite_table_path(str(args[1]), str(args[2]))
        return spark.createDataFrame(
            [(out["latest_version"], out["file_list_location"])],
            "latest_version string, file_list_location string")
    if proc == "set_current_snapshot":
        if len(args) < 2:
            raise ValueError("set_current_snapshot(table, snapshot_id)")
        prev = t.metadata.current_snapshot_id
        t = t.rollback_to(int(args[1]))
        return spark.createDataFrame(
            [(prev, int(args[1]))],
            "previous_snapshot_id long, current_snapshot_id long")
    if proc == "fast_forward":
        # fast_forward(table, branch, to_branch): point `branch` at
        # `to_branch`'s head (the WAP publish step after audited writes)
        if len(args) < 3:
            raise ValueError("fast_forward(table, branch, to_branch)")
        branch, to_branch = str(args[1]), str(args[2])
        src = t.metadata.refs.get(to_branch)
        if src is None:
            raise ValueError(f"no branch named {to_branch}")
        prev_ref = t.metadata.refs.get(branch)
        prev = prev_ref.snapshot_id if prev_ref else None
        if prev is not None and prev != src.snapshot_id:
            # Spark's procedure refuses non-fast-forward moves: the target
            # head must descend from the branch's current head, else this
            # would silently rewind the branch or jump it onto an
            # unrelated history
            snaps = {s.snapshot_id: s for s in t.metadata.snapshots}
            cur, seen = src.snapshot_id, set()
            while cur is not None and cur not in seen:
                if cur == prev:
                    break
                seen.add(cur)
                snap = snaps.get(cur)
                cur = snap.parent_snapshot_id if snap else None
            else:
                raise ValueError(
                    f"cannot fast-forward {branch}: {to_branch}'s head "
                    f"{src.snapshot_id} is not a descendant of "
                    f"{branch}'s head {prev}")
        t.set_ref(branch, src.snapshot_id)
        return spark.createDataFrame(
            [(branch, prev, src.snapshot_id)],
            "branch string, previous_ref long, updated_ref long")
    if proc == "cherrypick_snapshot":
        # publish a staged (WAP) snapshot: only the fast-path where the
        # staged snapshot is already based on the current head — the same
        # constraint Spark's procedure enforces for non-append rewrites
        if len(args) < 2:
            raise ValueError("cherrypick_snapshot(table, snapshot_id)")
        sid = int(args[1])
        snap = t.metadata.snapshot_by_id(sid)
        if snap is None:
            raise ValueError(f"no snapshot {sid}")
        cur = t.metadata.current_snapshot_id
        if snap.parent_snapshot_id != cur:
            raise ValueError(
                f"cannot cherry-pick {sid}: not based on the current head "
                f"{cur} (re-stage the write and retry)")
        t.set_ref("main", sid)
        return spark.createDataFrame(
            [(cur, sid)], "source_snapshot_id long, current_snapshot_id long")
    if proc == "publish_changes":
        # Spark's WAP publish by wap-id: find the staged snapshot whose
        # summary carries wap.id = <id> and cherry-pick it (same
        # current-head-parent constraint as cherrypick_snapshot)
        if len(args) < 2:
            raise ValueError("publish_changes(table, wap_id)")
        wid = str(args[1])
        staged = [s for s in t.metadata.snapshots
                  if s.summary.get("wap.id") == wid]
        if not staged:
            raise ValueError(f"no staged snapshot with wap.id {wid!r}")
        snap = staged[-1]
        cur = t.metadata.current_snapshot_id
        if snap.parent_snapshot_id != cur:
            raise ValueError(
                f"cannot publish wap.id {wid!r}: snapshot "
                f"{snap.snapshot_id} is not based on the current head "
                f"{cur} (re-stage the write and retry)")
        t.set_ref("main", snap.snapshot_id)
        return spark.createDataFrame(
            [(cur, snap.snapshot_id)],
            "source_snapshot_id long, current_snapshot_id long")
    if proc == "ancestors_of":
        from ..streaming.changes import _ancestor_chain
        head = int(args[1]) if len(args) > 1 \
            else t.metadata.current_snapshot_id
        chain = _ancestor_chain(t.metadata, head)
        rows = [(s.snapshot_id, s.timestamp_ms, s.parent_snapshot_id)
                for s in reversed(chain)]  # newest first, like Spark's
        return spark.createDataFrame(
            rows, "snapshot_id long, timestamp_ms long, "
                  "parent_snapshot_id long")
    if proc == "create_changelog_view":
        # create_changelog_view(table, view_name [, net_changes 0|1]):
        # registers the CDC changelog (streaming/changes.py) as a temp view
        from ..streaming.changes import changes_df, net_changes as _net
        if len(args) < 2:
            raise ValueError("create_changelog_view(table, view_name"
                             "[, net_changes])")
        view = str(args[1])
        ch = changes_df(spark, t)
        if len(args) > 2 and int(args[2]):
            keys = [t.metadata.schema().field_by_id(i).name
                    for i in t.metadata.schema().identifier_field_ids]
            if not keys:
                raise ValueError(
                    "net_changes requires identifier fields on the table")
            ch = _net(ch, keys)
        ch.createOrReplaceTempView(view)
        return spark.createDataFrame([(view,)], "changelog_view string")
    raise ValueError(f"unknown procedure: system.{proc}")


def _run_merge_when(spark: SparkSession, catalog: FileSystemCatalog,
                    scan_filters, m: "re.Match") -> DataFrame:
    """Full-clause MERGE (Spark-Iceberg grammar subset):

        MERGE INTO tgt [AS t] USING (<select>|table) [AS s]
        ON t.k = s.k [AND ...]          -- or a bare same-name key list
        [WHEN MATCHED [AND <cond>] THEN DELETE]
        [WHEN MATCHED [AND <cond>] THEN UPDATE SET col = expr, ...]
        [WHEN NOT MATCHED THEN INSERT *]

    Clauses apply IN ORDER, first match wins per row (standard MERGE
    semantics). Commit is ONE snapshot: equality deletes for every matched
    key a clause touched + data files for updated rows and inserts (the
    same atomic shape as Table.merge)."""
    import pyspark.sql.functions as F

    from .table import Table as _Table

    target, t_alias, source_part, on_str, clauses_str = (
        m.group(1), m.group(2) or "t", m.group(3), m.group(4), m.group(5))

    # source: "(select ...)" or "(select ...) [AS] s" or "ns.tbl [AS] s"
    s_alias = "s"
    sp = source_part.strip()
    am = re.match(r"^(.*\))\s+(?:AS\s+)?(\w+)$", sp, re.DOTALL)
    if am:
        sp, s_alias = am.group(1), am.group(2)
    else:
        am = re.match(r"^([\w.]+)\s+(?:AS\s+)?(\w+)$", sp)
        if am:
            sp, s_alias = am.group(1), am.group(2)
    if sp.startswith("(") and sp.endswith(")"):
        sp = sp[1:-1]
    src = run_sql(spark, catalog, sp, scan_filters)

    # ON: "a.k = b.k AND ..." or bare "k1, k2"
    pairs = []
    if "=" in on_str:
        for part in re.split(r"\s+AND\s+", on_str.strip(), flags=re.IGNORECASE):
            em = re.match(r"^\s*(\w+)\.(\w+)\s*=\s*(\w+)\.(\w+)\s*$", part)
            if not em:
                raise ValueError(f"unsupported MERGE ON term: {part!r}")
            la, lk, ra, rk = em.groups()
            if la == t_alias:
                pairs.append((lk, rk))
            elif ra == t_alias:
                pairs.append((rk, lk))
            else:
                raise ValueError(f"MERGE ON term references unknown alias: "
                                 f"{part!r}")
    else:
        pairs = [(k.strip(), k.strip()) for k in on_str.split(",")
                 if k.strip()]

    t = _Table.load(catalog, target)
    tcols = [f.name for f in t.metadata.schema().fields]
    tgt_df = t.to_df(spark).alias(t_alias)
    src_df = src.alias(s_alias)
    # cardinality guard (standard MERGE semantics, same error Spark raises):
    # several source rows matching one TARGET row would silently write
    # duplicates — refuse. Only duplicates that actually match a target row
    # violate (the ON join is a pure equi-join, so "a target row matches >1
    # source rows" == "a duplicated source key exists in the target"), and
    # an insert-only MERGE never updates matched rows, so it never violates.
    has_matched_clause = any(not wm.group(1)
                             for wm in _WHEN_CLAUSE_RE.finditer(clauses_str))
    if has_matched_clause and pairs:
        key_ids = [f"_mk{i}" for i in range(len(pairs))]
        dup_keys = (src_df
                    .groupBy(*[F.col(f"{s_alias}.{sk}").alias(k)
                               for k, (_, sk) in zip(key_ids, pairs)])
                    .count().where(F.col("count") > 1).drop("count"))
        tgt_keys = tgt_df.select(*[F.col(f"{t_alias}.{tk}").alias(k)
                                   for k, (tk, _) in zip(key_ids, pairs)])
        dup = dup_keys.join(tgt_keys, key_ids, "left_semi").limit(1).count()
        if dup:
            raise ValueError(
                "MERGE cardinality violation: multiple source rows match one "
                "target row; aggregate the source first")
    join_cond = F.expr(" AND ".join(
        f"{t_alias}.{tk} = {s_alias}.{sk}" for tk, sk in pairs))
    matched = tgt_df.join(src_df, join_cond, "inner")

    remaining = F.lit(True)
    touched = F.lit(False)
    data_parts = []
    saw_insert = False
    # WHEN NOT MATCHED BY SOURCE acts on TARGET rows with no source match
    unmatched_tgt = tgt_df.join(src_df, join_cond, "left_anti")
    by_source_remaining = F.lit(True)
    by_source_touched = F.lit(False)
    by_source_updates = []
    for wm in _WHEN_CLAUSE_RE.finditer(clauses_str):
        negated, by_source, cond_sql, action = (wm.group(1), wm.group(2),
                                                wm.group(3), wm.group(4))
        action_u = action.strip().upper()
        if negated and by_source:
            cond = F.expr(cond_sql) if cond_sql else F.lit(True)
            eff = by_source_remaining & cond
            if action_u == "DELETE":
                by_source_touched = by_source_touched | eff
            elif action_u.startswith("UPDATE"):
                set_sql = re.sub(r"^UPDATE\s+SET\s+", "", action.strip(),
                                 flags=re.IGNORECASE)
                assigns = _split_assignments(set_sql)
                rows = unmatched_tgt.where(eff).select(
                    *[F.expr(assigns.get(c, f"{t_alias}.{c}")).alias(c)
                      for c in tcols])
                by_source_updates.append(rows)
                by_source_touched = by_source_touched | eff
            else:
                raise ValueError(
                    "WHEN NOT MATCHED BY SOURCE supports DELETE/UPDATE")
            by_source_remaining = by_source_remaining & ~cond
            continue
        if negated:
            if not action_u.startswith("INSERT"):
                raise ValueError("WHEN NOT MATCHED supports INSERT *")
            saw_insert = True
            continue
        cond = F.expr(cond_sql) if cond_sql else F.lit(True)
        eff = remaining & cond
        if action_u == "DELETE":
            touched = touched | eff
        elif action_u.startswith("UPDATE"):
            set_sql = re.sub(r"^UPDATE\s+SET\s+", "", action.strip(),
                             flags=re.IGNORECASE)
            assigns = _split_assignments(set_sql)
            rows = matched.where(eff).select(
                *[F.expr(assigns.get(c, f"{t_alias}.{c}")).alias(c)
                  for c in tcols])
            data_parts.append(rows)
            touched = touched | eff
        else:
            raise ValueError(f"unsupported MERGE action: {action!r}")
        remaining = remaining & ~cond

    key_cols = [tk for tk, _ in pairs]
    touched_keys = (matched.where(touched)
                    .select(*[F.col(f"{t_alias}.{tk}").alias(tk)
                              for tk in key_cols]).dropDuplicates())
    bs_keys = (unmatched_tgt.where(by_source_touched)
               .select(*[F.col(f"{t_alias}.{tk}").alias(tk)
                         for tk in key_cols]).dropDuplicates())
    touched_keys = touched_keys.unionByName(bs_keys).dropDuplicates()
    data_parts.extend(by_source_updates)
    if saw_insert:
        ins = (src_df.join(tgt_df, join_cond, "left_anti")
               .select(*[F.col(f"{s_alias}.{c}").alias(c) for c in tcols]))
        data_parts.append(ins)
    if data_parts:
        data = data_parts[0]
        for p in data_parts[1:]:
            data = data.unionByName(p)
    else:
        data = spark.createDataFrame([], t.metadata.schema().to_spark())
    t.merge(spark, data, key_cols, delete_keys_df=touched_keys)
    n_del = touched_keys.count()
    n_data = data.count()
    return spark.createDataFrame(
        [(n_del, n_data)], "touched_keys long, written_rows long")
