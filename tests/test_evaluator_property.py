"""Hypothesis soundness property for metrics pruning: file_might_match must
NEVER say False for a file that contains a matching row (a false skip
silently loses data), and file_must_match must never say True for a file
containing a non-matching row. Over-approximation (might=True with no match)
is allowed — that's only an IO cost."""

import hypothesis.strategies as st
from hypothesis import given, settings

from iceberg_rust_spark.plans import expr as E
from iceberg_rust_spark.plans.evaluators import (ColumnMetrics,
                                                 file_might_match,
                                                 file_must_match)
from iceberg_rust_spark.sources.types import LONG, NestedField, Schema

S = Schema([NestedField(1, "x", LONG)])

values = st.lists(st.one_of(st.integers(-50, 50), st.none()),
                  min_size=1, max_size=12)
operand = st.integers(-55, 55)


def leaf_predicates(v):
    c = E.col("x")
    return [c < v, c <= v, c > v, c >= v, c == v, c != v,
            c.is_null(), c.not_null(),
            c.isin([v, v + 3]), c.not_in([v, v + 3])]


@st.composite
def predicates(draw, depth=2):
    v = draw(operand)
    p = draw(st.sampled_from(leaf_predicates(v)))
    if depth > 0 and draw(st.booleans()):
        q = draw(predicates(depth=depth - 1))
        op = draw(st.sampled_from(["and", "or", "not"]))
        if op == "and":
            return p & q
        if op == "or":
            return p | q
        return ~p
    return p


def row_matches(pred, value):
    """Ground truth: evaluate the bound predicate on one row (SQL
    three-valued logic on nulls collapsed to False at the top)."""
    r = _eval(pred, value)
    return r is True


def _eval(p, v):
    if isinstance(p, E.AlwaysTrue):
        return True
    if isinstance(p, E.AlwaysFalse):
        return False
    if isinstance(p, E.And):
        l, r = _eval(p.left, v), _eval(p.right, v)
        if l is False or r is False:
            return False
        if l is None or r is None:
            return None
        return True
    if isinstance(p, E.Or):
        l, r = _eval(p.left, v), _eval(p.right, v)
        if l is True or r is True:
            return True
        if l is None or r is None:
            return None
        return False
    if isinstance(p, E.Not):
        r = _eval(p.child, v)
        return None if r is None else (not r)
    op = p.op
    if op == "is_null":
        return v is None
    if op == "not_null":
        return v is not None
    if v is None:
        return None  # comparisons with null are unknown
    if op == "lt":
        return v < p.literal
    if op == "lt_eq":
        return v <= p.literal
    if op == "gt":
        return v > p.literal
    if op == "gt_eq":
        return v >= p.literal
    if op == "eq":
        return v == p.literal
    if op == "not_eq":
        return v != p.literal
    if op == "in":
        return v in p.literals
    if op == "not_in":
        return v not in p.literals
    raise AssertionError(f"unhandled op {op}")


def metrics_for(vals):
    non_null = [v for v in vals if v is not None]
    return {"x": ColumnMetrics(
        lower=min(non_null) if non_null else None,
        upper=max(non_null) if non_null else None,
        null_count=sum(1 for v in vals if v is None),
        value_count=len(vals))}


@settings(max_examples=400, deadline=None)
@given(vals=values, pred=predicates())
def test_inclusive_never_false_skips(vals, pred):
    bound = E.bind(pred, S)
    mets = metrics_for(vals)
    any_match = any(row_matches(bound, v) for v in vals)
    if any_match:
        assert file_might_match(bound, mets), \
            f"FALSE SKIP: {pred} on {vals} with {mets['x']}"


@settings(max_examples=400, deadline=None)
@given(vals=values, pred=predicates())
def test_strict_never_false_keeps(vals, pred):
    bound = E.bind(pred, S)
    mets = metrics_for(vals)
    all_match = all(row_matches(bound, v) for v in vals)
    if not all_match:
        assert not file_must_match(bound, mets), \
            f"FALSE MUST-MATCH: {pred} on {vals} with {mets['x']}"


# --------------------------------------------------------------------------
# Compiled-matcher equivalence: the planner's hot-loop matcher
# (TableScan._compiled_file_matcher) must agree with the interpreted
# _metrics_for_file + file_might_match pair on every (predicate, stats)
# combination — they share _eval_bounds, so this pins the lookup parity.
# --------------------------------------------------------------------------

stat_counts = st.one_of(st.none(), st.integers(0, 20))
bound_vals = st.one_of(st.none(), st.integers(-60, 60))


@given(pred=predicates(), vc=stat_counts, nc=stat_counts,
       nanc=stat_counts, lo=bound_vals, hi=bound_vals,
       rec=st.integers(0, 25))
@settings(max_examples=300, deadline=None)
def test_compiled_matcher_equals_interpreted(pred, vc, nc, nanc,
                                             lo, hi, rec):
    from iceberg_rust_spark.sources.manifest import DataFile
    from iceberg_rust_spark.sources.metadata import TableMetadata
    from iceberg_rust_spark.sources.scan import TableScan

    bound = E.bind(pred, S)
    from iceberg_rust_spark.sources.metadata import PartitionSpec
    md = TableMetadata(location="/tmp/x", schemas=[S], current_schema_id=0,
                       partition_specs=[PartitionSpec(0, [])],
                       default_spec_id=0)
    scan = TableScan(md, row_filter=pred)
    df_ = DataFile(
        file_path="/f.parquet", record_count=rec,
        value_counts={} if vc is None else {"x": vc},
        null_value_counts={} if nc is None else {"x": nc},
        nan_value_counts={} if nanc is None else {"x": nanc},
        lower_bounds={} if lo is None else {"x": lo},
        upper_bounds={} if hi is None else {"x": hi},
        schema_id=0, spec_id=0)
    interpreted = file_might_match(
        bound, scan._metrics_for_file(df_, S), df_.record_count)
    compiled = scan._compiled_file_matcher(bound, S, 0)(df_)
    assert compiled == interpreted


@given(pred=predicates(), vc=stat_counts, nc=stat_counts,
       nanc=stat_counts, lo=bound_vals, hi=bound_vals,
       rec=st.integers(0, 25))
@settings(max_examples=300, deadline=None)
def test_columnar_matcher_equals_compiled(pred, vc, nc, nanc,
                                          lo, hi, rec):
    """The columnar planner matcher (flat metric extracts, objects only
    for survivors) must agree with the compiled per-DataFile matcher on
    every (predicate, stats) combination — BOTH through a written v2
    manifest, so the tag-scalar encode/decode is in the loop."""
    import os
    import tempfile

    from iceberg_rust_spark.sources.manifest import (DataFile,
                                                     ManifestEntry,
                                                     read_manifest_columns,
                                                     write_manifest)
    from iceberg_rust_spark.sources.metadata import (PartitionSpec,
                                                     TableMetadata)
    from iceberg_rust_spark.sources.scan import TableScan, _pred_columns

    bound = E.bind(pred, S)
    md = TableMetadata(location="/tmp/x", schemas=[S], current_schema_id=0,
                       partition_specs=[PartitionSpec(0, [])],
                       default_spec_id=0)
    scan = TableScan(md, row_filter=pred)
    df_ = DataFile(
        file_path="/f.parquet", record_count=rec,
        value_counts={} if vc is None else {"x": vc},
        null_value_counts={} if nc is None else {"x": nc},
        nan_value_counts={} if nanc is None else {"x": nanc},
        lower_bounds={} if lo is None else {"x": lo},
        upper_bounds={} if hi is None else {"x": hi},
        schema_id=0, spec_id=0)
    compiled = scan._compiled_file_matcher(bound, S, 0)(df_)
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "m.parquet")
        write_manifest(p, [ManifestEntry(
            status=1, snapshot_id=1, sequence_number=1,
            file_sequence_number=1, data_file=df_)])
        cols = read_manifest_columns(p)
    columnar = scan._columnar_matcher(bound, S, 0, cols,
                                      _pred_columns(bound))(0)
    assert columnar == compiled


@given(pred=predicates(),
       stats=st.lists(st.tuples(stat_counts, stat_counts, stat_counts,
                                bound_vals, bound_vals,
                                st.integers(0, 25)),
                      min_size=1, max_size=8))
@settings(max_examples=400, deadline=None)
def test_vector_matcher_equals_per_row(pred, stats):
    """The numpy-vectorized metrics matcher must agree with the per-row
    _eval_bounds walker on every (predicate, stats) combination, through
    a written v2 manifest — or decline (None) and fall back. Never a
    third behavior."""
    import os
    import tempfile

    from iceberg_rust_spark.sources.manifest import (DataFile,
                                                     ManifestEntry,
                                                     read_manifest_columns,
                                                     write_manifest)
    from iceberg_rust_spark.sources.metadata import (PartitionSpec,
                                                     TableMetadata)
    from iceberg_rust_spark.sources.scan import TableScan, _pred_columns

    bound = E.bind(pred, S)
    md = TableMetadata(location="/tmp/x", schemas=[S], current_schema_id=0,
                       partition_specs=[PartitionSpec(0, [])],
                       default_spec_id=0)
    scan = TableScan(md, row_filter=pred)
    entries = []
    for k, (vc, nc, nanc, lo, hi, rec) in enumerate(stats):
        entries.append(ManifestEntry(
            status=1, snapshot_id=1, sequence_number=1,
            file_sequence_number=1,
            data_file=DataFile(
                file_path=f"/f{k}.parquet", record_count=rec,
                value_counts={} if vc is None else {"x": vc},
                null_value_counts={} if nc is None else {"x": nc},
                nan_value_counts={} if nanc is None else {"x": nanc},
                lower_bounds={} if lo is None else {"x": lo},
                upper_bounds={} if hi is None else {"x": hi},
                schema_id=0, spec_id=0)))
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "m.parquet")
        write_manifest(p, entries)
        cols = read_manifest_columns(p)
    ref = _pred_columns(bound)
    vec = scan._vector_matcher(bound, S, 0, cols, ref)
    per_row = scan._columnar_matcher(bound, S, 0, cols, ref)
    want = [per_row(i) for i in range(cols.n)]
    if vec is None:
        return                      # declined: per-row path serves
    assert list(map(bool, vec)) == want, (pred, stats)
