"""Driver-side metadata pruning: the reference's "optimizer core" re-expressed
in Python over our Predicate AST.

Four evaluators, applied in planning order (mirrors the 4-stage pipeline in
/root/reference/crates/iceberg/src/scan/mod.rs:381-499):

1. InclusiveProjection  — row predicate -> partition-space predicate
   (expr/visitors/inclusive_projection.rs:55). MAY-match semantics: projection
   is allowed to be weaker (false positives fine, false negatives never).
2. ManifestEvaluator    — partition predicate vs per-partition-field
   FieldSummary (min/max/contains-null/contains-nan) on manifest-list rows:
   skip whole manifests (expr/visitors/manifest_evaluator.rs:83).
3. ExpressionEvaluator  — partition predicate vs a file's concrete partition
   values (expr/visitors/expression_evaluator.rs:46).
4. InclusiveMetricsEvaluator — row predicate vs per-file column metrics
   (lower/upper bounds, null/nan counts): ROWS_MIGHT_MATCH truth tables
   (expr/visitors/inclusive_metrics_evaluator.rs:42).

Row-group and page-level pruning are intentionally NOT ported: Spark's
vectorized Parquet reader already does both (spark.sql.parquet.filterPushdown).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Any, Dict, List, Optional, Sequence

from ..functions.transforms import Transform
from ..sources.datum import to_comparable
from . import expr as E

ROWS_MIGHT_MATCH = True
ROWS_CANNOT_MATCH = False


# ---------------------------------------------------------------------------
# 1. InclusiveProjection
# ---------------------------------------------------------------------------

def inclusive_projection(pred: E.Predicate,
                         spec_fields: Sequence["PartitionFieldInfo"]) -> E.Predicate:
    """Project a bound row predicate into partition space for one spec.

    ``spec_fields``: per partition field — (source field name, partition column
    name, transform, source type). A leaf that cannot be projected becomes
    ALWAYS_TRUE (inclusive/may-match), never ALWAYS_FALSE.
    """
    by_source: Dict[str, List[PartitionFieldInfo]] = {}
    for pf in spec_fields:
        by_source.setdefault(pf.source_name, []).append(pf)

    def project(p: E.Predicate) -> E.Predicate:
        if isinstance(p, (E.AlwaysTrue, E.AlwaysFalse)):
            return p
        if isinstance(p, E.And):
            return E.and_(project(p.left), project(p.right))
        if isinstance(p, E.Or):
            # inclusive projection of OR must stay OR
            return E.or_(project(p.left), project(p.right))
        src = p.field.name if hasattr(p, "field") else p.term
        parts = by_source.get(src)
        if not parts:
            return E.ALWAYS_TRUE
        projected = [_project_leaf(p, pf) for pf in parts]
        strict = [q for q in projected if not isinstance(q, E.AlwaysTrue)]
        return E.and_(*strict) if strict else E.ALWAYS_TRUE

    return project(pred)


@dataclass(frozen=True)
class PartitionFieldInfo:
    source_name: str
    partition_name: str
    transform: Transform
    source_type: Any  # IcebergType


def _project_leaf(p: E.Predicate, pf: PartitionFieldInfo) -> E.Predicate:
    t, pname, styp = pf.transform, pf.partition_name, pf.source_type
    tname = repr(t)

    if isinstance(p, (E.UnaryPred, E.BoundUnaryPred)):
        if p.op in (E.IS_NULL, E.NOT_NULL):
            if tname == "void":
                return E.ALWAYS_TRUE
            # all transforms preserve null-ness
            return E.UnaryPred(p.op, pname)
        return E.ALWAYS_TRUE  # nan-ness not preserved in partition values

    if isinstance(p, (E.SetPred, E.BoundSetPred)):
        if p.op == E.IN and tname != "void":
            try:
                lits = tuple(t.apply(v, styp) for v in p.literals)
            except TypeError:
                return E.ALWAYS_TRUE
            return E.SetPred(E.IN, pname, lits)
        return E.ALWAYS_TRUE  # NOT_IN can't be projected inclusively

    if isinstance(p, (E.BinaryPred, E.BoundBinaryPred)):
        op, lit = p.op, p.literal
        if tname == "void":
            return E.ALWAYS_TRUE
        if op == E.EQ:
            try:
                return E.BinaryPred(E.EQ, pname, t.apply(lit, styp))
            except TypeError:
                return E.ALWAYS_TRUE
        if op == E.STARTS_WITH:
            from ..functions.transforms import IdentityTransform, TruncateTransform
            if isinstance(t, IdentityTransform):
                return E.BinaryPred(E.STARTS_WITH, pname, lit)
            if isinstance(t, TruncateTransform) and isinstance(lit, str):
                if len(lit) >= t.w:
                    return E.BinaryPred(E.EQ, pname, lit[:t.w])
                return E.BinaryPred(E.STARTS_WITH, pname, lit)
            return E.ALWAYS_TRUE
        if op in (E.LT, E.LT_EQ, E.GT, E.GT_EQ) and t.preserves_order():
            # boundary tightening for discrete SOURCE types (Java
            # ProjectionUtil / the reference's Transform::project): v < X ≡
            # v <= pred(X), so project the predecessor — one partition tighter
            # at exact boundaries (date < 2024-01-01 -> month <= 647, not
            # 648). The shift is keyed on the Iceberg source type matching
            # the literal's granularity, NOT the Python literal type: an int
            # literal against a float/double column (SQL 'f < 5') must NOT
            # become LT_EQ 4 — value 4.5 would be wrongly pruned.
            if op in (E.LT, E.GT):
                step = _discrete_step(lit, styp)
                if step is not None:
                    if op == E.LT:
                        lit, op = step(-1), E.LT_EQ
                    else:
                        lit, op = step(+1), E.GT_EQ
            try:
                tl = t.apply(lit, styp)
            except TypeError:
                return E.ALWAYS_TRUE
            # inclusive relaxation: v < X  =>  t(v) <= t(X)  etc.
            relaxed = {E.LT: E.LT_EQ, E.LT_EQ: E.LT_EQ,
                       E.GT: E.GT_EQ, E.GT_EQ: E.GT_EQ}[op]
            return E.BinaryPred(relaxed, pname, tl)
        return E.ALWAYS_TRUE

    return E.ALWAYS_TRUE


def _discrete_step(lit: Any, styp: Any):
    """Return ``step(n) -> shifted literal`` iff the (literal, Iceberg source
    type) pair is discrete at the literal's granularity, else None.

    Dispatching on the SOURCE type mirrors Java ProjectionUtil (which switches
    on the bound term's type): a Python int literal bound against a
    float/double column is continuous, and a µs shift against a nanosecond
    timestamp column would skip 999 representable values — both must fall back
    to the plain relaxed projection (still correct, just one partition wider).
    """
    import datetime as _dt
    from decimal import Decimal as _Dec
    name = getattr(styp, "name", None) or (str(styp) if styp is not None else "")
    if isinstance(lit, bool):
        return None
    if isinstance(lit, int) and name in ("int", "long"):
        return lambda n: lit + n
    if isinstance(lit, _dt.datetime) and name in ("timestamp", "timestamptz"):
        return lambda n: lit + _dt.timedelta(microseconds=n)
    if isinstance(lit, _dt.date) and not isinstance(lit, _dt.datetime) \
            and name == "date":
        return lambda n: lit + _dt.timedelta(days=n)
    if isinstance(lit, _Dec) and name.startswith("decimal"):
        try:
            scale = int(name[:-1].split(",")[1])
        except (IndexError, ValueError):
            return None
        if -lit.as_tuple().exponent == scale:
            unit = _Dec(1).scaleb(-scale)
            return lambda n: lit + unit * n
        return None
    return None


# ---------------------------------------------------------------------------
# 1b. StrictProjection — ROWS_MUST_MATCH in partition space
# ---------------------------------------------------------------------------

def strict_projection(pred: E.Predicate,
                      spec_fields: Sequence["PartitionFieldInfo"]) -> E.Predicate:
    """Project a bound row predicate to a partition predicate that GUARANTEES
    every row in a matching partition satisfies the original predicate
    (expr/visitors/strict_projection.rs:30 + Transform::strict_project,
    spec/transform.rs:333). Dual of inclusive projection: anything
    unprojectable becomes ALWAYS_FALSE (no guarantee), multiple partition
    fields over one source OR together (any one guarantee suffices —
    strict_projection.rs:77-84's day/hour example), and NOT must have been
    rewritten away.

    Used for metadata-only COW deletes: if the strict projection matches a
    file's partition tuple, the whole file can be dropped without reading
    its per-file metrics."""
    by_source: Dict[str, List[PartitionFieldInfo]] = {}
    for pf in spec_fields:
        by_source.setdefault(pf.source_name, []).append(pf)

    def project(p: E.Predicate) -> E.Predicate:
        if isinstance(p, (E.AlwaysTrue, E.AlwaysFalse)):
            return p
        if isinstance(p, E.And):
            return E.and_(project(p.left), project(p.right))
        if isinstance(p, E.Or):
            return E.or_(project(p.left), project(p.right))
        if isinstance(p, E.Not):
            return E.ALWAYS_FALSE  # must be pre-rewritten (rewrite_not)
        src = p.field.name if hasattr(p, "field") else p.term
        parts = by_source.get(src)
        if not parts:
            return E.ALWAYS_FALSE
        out: E.Predicate = E.ALWAYS_FALSE
        for pf in parts:
            q = _strict_leaf(p, pf)
            if not isinstance(q, E.AlwaysFalse):
                out = q if isinstance(out, E.AlwaysFalse) else E.or_(out, q)
        return out

    return project(pred)


def _strict_leaf(p: E.Predicate, pf: "PartitionFieldInfo") -> E.Predicate:
    from ..functions.transforms import (BucketTransform, IdentityTransform,
                                        TruncateTransform, VoidTransform)
    t, pname, styp = pf.transform, pf.partition_name, pf.source_type

    if isinstance(t, VoidTransform):
        return E.ALWAYS_FALSE

    # null-ness is preserved by every non-void transform
    if isinstance(p, (E.UnaryPred, E.BoundUnaryPred)):
        if p.op in (E.IS_NULL, E.NOT_NULL):
            return E.UnaryPred(p.op, pname)
        return E.ALWAYS_FALSE  # nan-ness is not visible in partition values

    def apply(v):
        return t.apply(v, styp)

    if isinstance(p, E.SetPred) or isinstance(p, E.BoundSetPred):
        if isinstance(t, IdentityTransform):
            return E.SetPred(p.op, pname, tuple(p.literals))
        if p.op == E.NOT_IN:
            # t(v) ∉ {t(x)...} guarantees v ∉ {x...}  (transform.rs:617-647)
            try:
                return E.SetPred(E.NOT_IN, pname,
                                 tuple(apply(v) for v in p.literals))
            except (TypeError, ValueError):
                return E.ALWAYS_FALSE
        return E.ALWAYS_FALSE

    if not isinstance(p, (E.BinaryPred, E.BoundBinaryPred)):
        return E.ALWAYS_FALSE

    op, lit = p.op, p.literal
    if isinstance(t, IdentityTransform):
        return E.BinaryPred(op, pname, lit)

    if isinstance(t, BucketTransform):
        if op == E.NOT_EQ:  # different bucket ⟹ different value
            try:
                return E.BinaryPred(E.NOT_EQ, pname, apply(lit))
            except (TypeError, ValueError):
                return E.ALWAYS_FALSE
        return E.ALWAYS_FALSE

    # truncate[W] over strings/binary (transform.rs:365-437)
    if isinstance(t, TruncateTransform) and isinstance(lit, (str, bytes)):
        w = t.w
        if op == E.STARTS_WITH:
            if len(lit) < w:
                return E.BinaryPred(E.STARTS_WITH, pname, lit)
            if len(lit) == w:
                return E.BinaryPred(E.EQ, pname, lit)
            return E.ALWAYS_FALSE
        if op == E.NOT_STARTS_WITH:
            if len(lit) < w:
                return E.BinaryPred(E.NOT_STARTS_WITH, pname, lit)
            if len(lit) == w:
                return E.BinaryPred(E.NOT_EQ, pname, lit)
            return E.BinaryPred(E.NOT_STARTS_WITH, pname, apply(lit))
        # truncate_array_strict: LT/LTEQ -> part < t(X); GT/GTEQ -> part > t(X)
        try:
            tl = apply(lit)
        except (TypeError, ValueError):
            return E.ALWAYS_FALSE
        if op in (E.LT, E.LT_EQ):
            return E.BinaryPred(E.LT, pname, tl)
        if op in (E.GT, E.GT_EQ):
            return E.BinaryPred(E.GT, pname, tl)
        if op == E.NOT_EQ:
            return E.BinaryPred(E.NOT_EQ, pname, tl)
        return E.ALWAYS_FALSE

    # numeric truncate + temporal transforms: truncate_number_strict
    # (transform.rs:897-952) with ±1-in-source-granularity boundary shifts
    if not t.preserves_order():
        return E.ALWAYS_FALSE
    try:
        if op == E.LT:
            return E.BinaryPred(E.LT, pname, apply(lit))
        if op == E.LT_EQ:
            # v <= X -> part < t(X+1) when the source type is discrete at the
            # literal's granularity; else the weaker (still sound) part < t(X)
            step = _discrete_step(lit, styp)
            return E.BinaryPred(E.LT, pname, apply(step(+1) if step else lit))
        if op == E.GT:
            return E.BinaryPred(E.GT, pname, apply(lit))
        if op == E.GT_EQ:
            step = _discrete_step(lit, styp)
            return E.BinaryPred(E.GT, pname, apply(step(-1) if step else lit))
        if op == E.NOT_EQ:
            return E.BinaryPred(E.NOT_EQ, pname, apply(lit))
    except (TypeError, ValueError):
        return E.ALWAYS_FALSE
    return E.ALWAYS_FALSE  # EQ has no strict projection under widening


def partition_must_match(strict_pred: E.Predicate,
                         partition: Dict[str, Any]) -> bool:
    """Evaluate the strict projection against a file's concrete partition
    tuple: True ⟹ every row of the file matches the original predicate."""
    if isinstance(strict_pred, E.AlwaysFalse):
        return False
    return E.evaluate_row(strict_pred, partition)


# ---------------------------------------------------------------------------
# 2. ManifestEvaluator — FieldSummary-level pruning
# ---------------------------------------------------------------------------

@dataclass
class FieldSummary:
    contains_null: bool = True
    contains_nan: Optional[bool] = None
    lower: Any = None  # comparable-normalized at construction
    upper: Any = None


def manifest_might_match(partition_pred: E.Predicate,
                         summaries: Dict[str, FieldSummary]) -> bool:
    """True if a manifest's partition FieldSummaries might contain matching
    partitions. ``summaries`` keyed by partition column name."""
    return _eval_bounds(partition_pred, lambda name: summaries.get(name))


# ---------------------------------------------------------------------------
# 4. InclusiveMetricsEvaluator — per-file column metrics pruning
# ---------------------------------------------------------------------------

@dataclass
class ColumnMetrics:
    value_count: Optional[int] = None
    null_count: Optional[int] = None
    nan_count: Optional[int] = None
    lower: Any = None
    upper: Any = None


def file_might_match(row_pred: E.Predicate,
                     metrics: Dict[str, ColumnMetrics],
                     record_count: Optional[int] = None) -> bool:
    """ROWS_MIGHT_MATCH truth tables over per-file metrics, keyed by column
    name. Conservative: missing metrics => might match."""
    if record_count == 0:
        return ROWS_CANNOT_MATCH

    def lookup(name: str) -> Optional[FieldSummary]:
        m = metrics.get(name)
        if m is None:
            return None
        all_null = (m.value_count is not None and m.null_count is not None
                    and m.value_count == m.null_count)
        no_nulls = m.null_count == 0
        s = FieldSummary(
            contains_null=not no_nulls,
            contains_nan=None if m.nan_count is None else m.nan_count > 0,
            lower=to_comparable(m.lower), upper=to_comparable(m.upper))
        s._all_null = all_null  # type: ignore[attr-defined]
        s._all_nan = (m.nan_count is not None and m.value_count is not None
                      and m.nan_count == m.value_count)  # type: ignore[attr-defined]
        s._null_count = m.null_count  # type: ignore[attr-defined]
        s._value_count = m.value_count  # type: ignore[attr-defined]
        return s

    return _eval_bounds(row_pred, lookup)


# ---------------------------------------------------------------------------
# 3. ExpressionEvaluator = expr.evaluate_row on concrete partition dicts
# ---------------------------------------------------------------------------

def partition_might_match(partition_pred: E.Predicate, partition: Dict[str, Any]) -> bool:
    return E.evaluate_row(partition_pred, partition)


# ---------------------------------------------------------------------------
# shared bounds truth tables
# ---------------------------------------------------------------------------

def _is_nan(v: Any) -> bool:
    return isinstance(v, float) and math.isnan(v)


def _eval_bounds(pred: E.Predicate, lookup) -> bool:
    """Evaluate a predicate over (lower, upper, contains_null, contains_nan)
    summaries; returns might-match. Unknown columns/metrics => might match."""

    def ev(p: E.Predicate) -> bool:
        if isinstance(p, E.AlwaysTrue):
            return ROWS_MIGHT_MATCH
        if isinstance(p, E.AlwaysFalse):
            return ROWS_CANNOT_MATCH
        if isinstance(p, E.And):
            return ev(p.left) and ev(p.right)
        if isinstance(p, E.Or):
            return ev(p.left) or ev(p.right)
        if isinstance(p, E.Not):
            # NOT must be rewritten away before pruning; be conservative
            return ROWS_MIGHT_MATCH
        name = p.field.name if hasattr(p, "field") else p.term
        s: Optional[FieldSummary] = lookup(name)
        if s is None:
            return ROWS_MIGHT_MATCH
        all_null = getattr(s, "_all_null", False)
        all_nan = getattr(s, "_all_nan", False)

        if isinstance(p, (E.UnaryPred, E.BoundUnaryPred)):
            if p.op == E.IS_NULL:
                return s.contains_null
            if p.op == E.NOT_NULL:
                return not all_null
            if p.op == E.IS_NAN:
                if s.contains_nan is False:
                    return ROWS_CANNOT_MATCH
                if all_null:
                    return ROWS_CANNOT_MATCH
                return ROWS_MIGHT_MATCH
            if p.op == E.NOT_NAN:
                return not all_nan
            return ROWS_MIGHT_MATCH

        # not_starts_with first: under Iceberg semantics NOT(startsWith)
        # includes nulls, so null presence forces might-match — this must
        # run BEFORE the all-null cutoff (inclusive_metrics_evaluator.rs
        # not_starts_with: may_contain_null => ROWS_MIGHT_MATCH)
        if isinstance(p, (E.BinaryPred, E.BoundBinaryPred)) \
                and p.op == E.NOT_STARTS_WITH:
            if s.contains_null or s.contains_null is None:
                return ROWS_MIGHT_MATCH
            prefix = to_comparable(p.literal)
            lower, upper = s.lower, s.upper
            if not isinstance(lower, str) or not isinstance(prefix, str):
                return ROWS_MIGHT_MATCH
            if lower < prefix:
                return ROWS_MIGHT_MATCH
            if lower[:len(prefix)] == prefix:
                if not isinstance(upper, str) or len(upper) < len(prefix):
                    return ROWS_MIGHT_MATCH
                if upper[:len(prefix)] == prefix:
                    # every row starts with the prefix -> none satisfies NOT
                    return ROWS_CANNOT_MATCH
            return ROWS_MIGHT_MATCH

        # ordered / set comparisons need non-null values present
        if all_null:
            return ROWS_CANNOT_MATCH

        lower, upper = s.lower, s.upper
        # NaN-poisoned bounds are unusable for comparison
        if _is_nan(lower):
            lower = None
        if _is_nan(upper):
            upper = None

        if isinstance(p, (E.BinaryPred, E.BoundBinaryPred)):
            lit = to_comparable(p.literal)
            op = p.op
            try:
                if op == E.LT:
                    return not (lower is not None and lower >= lit)
                if op == E.LT_EQ:
                    return not (lower is not None and lower > lit)
                if op == E.GT:
                    return not (upper is not None and upper <= lit)
                if op == E.GT_EQ:
                    return not (upper is not None and upper < lit)
                if op == E.EQ:
                    if lower is not None and lower > lit:
                        return ROWS_CANNOT_MATCH
                    if upper is not None and upper < lit:
                        return ROWS_CANNOT_MATCH
                    return ROWS_MIGHT_MATCH
                if op == E.NOT_EQ:
                    return ROWS_MIGHT_MATCH
                if op == E.STARTS_WITH:
                    prefix = lit
                    if isinstance(lower, str) and lower[:len(prefix)] > prefix:
                        return ROWS_CANNOT_MATCH
                    if isinstance(upper, str) and upper[:len(prefix)] < prefix:
                        return ROWS_CANNOT_MATCH
                    return ROWS_MIGHT_MATCH
                if op == E.NOT_STARTS_WITH:
                    return ROWS_MIGHT_MATCH
            except TypeError:
                return ROWS_MIGHT_MATCH
            return ROWS_MIGHT_MATCH

        if isinstance(p, (E.SetPred, E.BoundSetPred)):
            if p.op == E.IN:
                lits = [to_comparable(v) for v in p.literals]
                try:
                    in_range = [v for v in lits
                                if (lower is None or v >= lower)
                                and (upper is None or v <= upper)]
                    if not in_range:
                        return ROWS_CANNOT_MATCH
                except TypeError:
                    return ROWS_MIGHT_MATCH
                return ROWS_MIGHT_MATCH
            return ROWS_MIGHT_MATCH  # NOT_IN

        return ROWS_MIGHT_MATCH

    return ev(pred)


# ---------------------------------------------------------------------------
# StrictMetricsEvaluator — ROWS_MUST_MATCH (used for metadata-only deletes)
# ---------------------------------------------------------------------------

def file_must_match(row_pred: E.Predicate,
                    metrics: Dict[str, ColumnMetrics],
                    record_count: Optional[int] = None) -> bool:
    """True only when EVERY row in the file is guaranteed to match
    (counterpart of expr/visitors/strict_metrics_evaluator.rs). Used to drop
    whole files on DELETE without reading them."""

    def ev(p: E.Predicate) -> bool:
        if isinstance(p, E.AlwaysTrue):
            return True
        if isinstance(p, E.AlwaysFalse):
            return False
        if isinstance(p, E.And):
            return ev(p.left) and ev(p.right)
        if isinstance(p, E.Or):
            return ev(p.left) or ev(p.right)
        if isinstance(p, E.Not):
            return False
        name = p.field.name if hasattr(p, "field") else p.term
        m = metrics.get(name)
        if m is None:
            return False
        no_nulls = m.null_count == 0
        all_null = (m.value_count is not None and m.null_count is not None
                    and m.value_count == m.null_count)
        lower, upper = to_comparable(m.lower), to_comparable(m.upper)
        if _is_nan(lower):
            lower = None
        if _is_nan(upper):
            upper = None
        has_nan_maybe = m.nan_count is None or m.nan_count > 0

        if isinstance(p, (E.UnaryPred, E.BoundUnaryPred)):
            if p.op == E.IS_NULL:
                return all_null
            if p.op == E.NOT_NULL:
                return no_nulls
            if p.op == E.IS_NAN:
                return (m.nan_count is not None and m.value_count is not None
                        and m.nan_count == m.value_count)
            if p.op == E.NOT_NAN:
                return m.nan_count == 0
            return False

        if not no_nulls:
            return False  # a null row never matches an ordered predicate

        if isinstance(p, (E.BinaryPred, E.BoundBinaryPred)):
            lit = to_comparable(p.literal)
            op = p.op
            if has_nan_maybe and op in (E.LT, E.LT_EQ, E.GT, E.GT_EQ, E.EQ):
                if isinstance(lit, float):
                    return False  # possible NaN rows break guarantees
            try:
                if op == E.LT:
                    return upper is not None and upper < lit
                if op == E.LT_EQ:
                    return upper is not None and upper <= lit
                if op == E.GT:
                    return lower is not None and lower > lit
                if op == E.GT_EQ:
                    return lower is not None and lower >= lit
                if op == E.EQ:
                    return (lower is not None and upper is not None
                            and lower == lit and upper == lit)
                if op == E.NOT_EQ:
                    return (lower is not None and lower > lit) or \
                           (upper is not None and upper < lit)
            except TypeError:
                return False
            return False

        if isinstance(p, (E.SetPred, E.BoundSetPred)):
            lits = {to_comparable(v) for v in p.literals}
            if p.op == E.IN:
                return (lower is not None and upper is not None
                        and lower == upper and lower in lits)
            if p.op == E.NOT_IN:
                try:
                    return all((lower is not None and v < lower) or
                               (upper is not None and v > upper) for v in lits)
                except TypeError:
                    return False
        return False

    if record_count == 0:
        return True
    return ev(row_pred)
