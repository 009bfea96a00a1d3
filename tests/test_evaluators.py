"""Metrics/partition pruning truth tables — ported from the behavior the
reference asserts in expr/visitors/{inclusive_metrics,strict_metrics,
manifest,inclusive_projection} tests (behavior parity, no code)."""

import datetime as dt

from iceberg_rust_spark.functions.transforms import (BucketTransform,
                                                     DayTransform,
                                                     IdentityTransform,
                                                     TruncateTransform)
from iceberg_rust_spark.plans import expr as E
from iceberg_rust_spark.plans.evaluators import (ColumnMetrics, FieldSummary,
                                                 PartitionFieldInfo,
                                                 file_might_match,
                                                 file_must_match,
                                                 inclusive_projection,
                                                 manifest_might_match,
                                                 partition_might_match)
from iceberg_rust_spark.sources.types import (DATE, DOUBLE, LONG, STRING,
                                              NestedField, Schema)

S = Schema([NestedField(1, "x", LONG), NestedField(2, "s", STRING),
            NestedField(3, "f", DOUBLE), NestedField(4, "d", DATE)])


def m(**kw):
    return {"x": ColumnMetrics(**kw)}


def bound(p):
    return E.bind(p, S)


# ---------------- inclusive metrics ----------------

def test_bounds_lt_gt():
    mets = m(lower=10, upper=20, null_count=0, value_count=100)
    assert not file_might_match(bound(E.col("x") < 10), mets)
    assert file_might_match(bound(E.col("x") < 11), mets)
    assert not file_might_match(bound(E.col("x") > 20), mets)
    assert file_might_match(bound(E.col("x") >= 20), mets)
    assert not file_might_match(bound(E.col("x") <= 9), mets)
    assert not file_might_match(bound(E.col("x") >= 21), mets)


def test_bounds_eq_in():
    mets = m(lower=10, upper=20, null_count=0, value_count=100)
    assert not file_might_match(bound(E.col("x") == 9), mets)
    assert not file_might_match(bound(E.col("x") == 21), mets)
    assert file_might_match(bound(E.col("x") == 15), mets)
    assert file_might_match(bound(E.col("x") != 15), mets)  # NOT_EQ never prunes
    assert not file_might_match(bound(E.col("x").isin([1, 2, 30])), mets)
    assert file_might_match(bound(E.col("x").isin([1, 15])), mets)
    assert file_might_match(bound(E.col("x").not_in([15])), mets)


def test_null_counts():
    no_nulls = m(null_count=0, value_count=100, lower=1, upper=2)
    all_null = m(null_count=100, value_count=100)
    some = m(null_count=5, value_count=100, lower=1, upper=2)
    assert not file_might_match(bound(E.col("x").is_null()), no_nulls)
    assert file_might_match(bound(E.col("x").is_null()), some)
    assert not file_might_match(bound(E.col("x").not_null()), all_null)
    assert file_might_match(bound(E.col("x").not_null()), some)
    # ordered predicates can't match an all-null column
    assert not file_might_match(bound(E.col("x") > 0), all_null)
    assert not file_might_match(bound(E.col("x").isin([1])), all_null)


def test_nan_counts():
    no_nan = {"f": ColumnMetrics(nan_count=0, value_count=10, null_count=0)}
    all_nan = {"f": ColumnMetrics(nan_count=10, value_count=10, null_count=0)}
    unknown = {"f": ColumnMetrics(value_count=10, null_count=0)}
    assert not file_might_match(bound(E.col("f").is_nan()), no_nan)
    assert file_might_match(bound(E.col("f").is_nan()), unknown)
    assert not file_might_match(bound(E.col("f").not_nan()), all_nan)
    assert file_might_match(bound(E.col("f").not_nan()), unknown)


def test_nan_poisoned_bounds_ignored():
    mets = {"f": ColumnMetrics(lower=float("nan"), upper=float("nan"),
                               null_count=0, value_count=5)}
    assert file_might_match(bound(E.col("f") < 100.0), mets)


def test_starts_with_bounds():
    mets = {"s": ColumnMetrics(lower="apple", upper="grape",
                               null_count=0, value_count=10)}
    assert file_might_match(bound(E.col("s").starts_with("b")), mets)
    assert not file_might_match(bound(E.col("s").starts_with("z")), mets)
    assert not file_might_match(bound(E.col("s").starts_with("Z")), mets)
    assert file_might_match(bound(E.col("s").starts_with("ap")), mets)


def test_missing_metrics_conservative():
    assert file_might_match(bound(E.col("x") > 100), {})
    assert file_might_match(bound(E.col("x") > 100), m())


def test_empty_file_never_matches():
    assert not file_might_match(bound(E.col("x") > 0), m(lower=1, upper=2),
                                record_count=0)


def test_date_bounds():
    mets = {"d": ColumnMetrics(lower=dt.date(2020, 1, 1),
                               upper=dt.date(2020, 6, 1),
                               null_count=0, value_count=10)}
    assert not file_might_match(bound(E.col("d") > dt.date(2020, 7, 1)), mets)
    assert file_might_match(bound(E.col("d") > dt.date(2020, 5, 1)), mets)


# ---------------- strict metrics (ROWS_MUST_MATCH) ----------------

def test_strict_ordered():
    mets = m(lower=10, upper=20, null_count=0, value_count=100, nan_count=0)
    assert file_must_match(bound(E.col("x") < 21), mets)
    assert not file_must_match(bound(E.col("x") < 20), mets)
    assert file_must_match(bound(E.col("x") <= 20), mets)
    assert file_must_match(bound(E.col("x") > 9), mets)
    assert not file_must_match(bound(E.col("x") > 10), mets)
    assert file_must_match(bound(E.col("x") != 30), mets)
    assert not file_must_match(bound(E.col("x") == 15), mets)
    single = m(lower=15, upper=15, null_count=0, value_count=3, nan_count=0)
    assert file_must_match(bound(E.col("x") == 15), single)


def test_strict_nulls_block():
    some_null = m(lower=10, upper=20, null_count=1, value_count=100)
    assert not file_must_match(bound(E.col("x") < 100), some_null)
    all_null = m(null_count=5, value_count=5)
    assert file_must_match(bound(E.col("x").is_null()), all_null)
    assert not file_must_match(bound(E.col("x").not_null()), all_null)


# ---------------- manifest evaluator ----------------

def test_manifest_field_summaries():
    summ = {"day": FieldSummary(contains_null=False, lower=100, upper=200)}
    assert manifest_might_match(E.col("day") >= 150, summ)
    assert not manifest_might_match(E.col("day") > 200, summ)
    assert not manifest_might_match(E.col("day").is_null(), summ)
    summ_n = {"day": FieldSummary(contains_null=True, lower=100, upper=200)}
    assert manifest_might_match(E.col("day").is_null(), summ_n)


# ---------------- inclusive projection ----------------

def _infos():
    return [
        PartitionFieldInfo("d", "d_day", DayTransform(), DATE),
        PartitionFieldInfo("x", "x_bucket", BucketTransform(16), LONG),
        PartitionFieldInfo("s", "s_trunc", TruncateTransform(3), STRING),
    ]


def test_projection_day_relaxes():
    # boundary-tightened like the reference (inclusive_projection.rs
    # test_inclusive_projection_date_*): d < X projects to day <= day(X-1)
    p = inclusive_projection(bound(E.col("d") < dt.date(2020, 1, 10)), _infos())
    assert isinstance(p, E.BinaryPred)
    assert p.op == E.LT_EQ and p.term == "d_day"
    assert p.literal == (dt.date(2020, 1, 9) - dt.date(1970, 1, 1)).days


def test_projection_boundary_tightening_reference_cases():
    """inclusive_projection.rs date-transform expectations, exact literals."""
    from iceberg_rust_spark.functions.transforms import (MonthTransform,
                                                         YearTransform)
    d = dt.date(2024, 1, 1)
    year_i = [PartitionFieldInfo("d", "year", YearTransform(), DATE)]
    month_i = [PartitionFieldInfo("d", "month", MonthTransform(), DATE)]
    day_i = [PartitionFieldInfo("d", "day", DayTransform(), DATE)]
    p = inclusive_projection(bound(E.col("d") < d), year_i)
    assert (p.op, p.literal) == (E.LT_EQ, 53)
    p = inclusive_projection(bound(E.col("d") < d), month_i)
    assert (p.op, p.literal) == (E.LT_EQ, 647)
    p = inclusive_projection(bound(E.col("d") < d), day_i)
    assert (p.op, p.literal) == (E.LT_EQ,
                                 (dt.date(2023, 12, 31) - dt.date(1970, 1, 1)).days)
    # GT tightens through the successor
    p = inclusive_projection(bound(E.col("d") > d), month_i)
    assert (p.op, p.literal) == (E.GT_EQ, 648)
    # short prefix through truncate keeps STARTS_WITH (EQ would over-prune)
    from iceberg_rust_spark.functions.transforms import TruncateTransform
    tr = [PartitionFieldInfo("s", "st", TruncateTransform(4), STRING)]
    p = inclusive_projection(bound(E.col("s").starts_with("Te")), tr)
    assert (p.op, p.literal) == (E.STARTS_WITH, "Te")
    p = inclusive_projection(bound(E.col("s").starts_with("Testy McTest")), tr)
    assert (p.op, p.literal) == (E.EQ, "Test")


def test_projection_bucket_eq_only():
    p = inclusive_projection(bound(E.col("x") == 34), _infos())
    assert p.op == E.EQ and p.term == "x_bucket"
    # range predicates cannot project through bucket
    p2 = inclusive_projection(bound(E.col("x") > 34), _infos())
    assert isinstance(p2, E.AlwaysTrue)


def test_projection_truncate_starts_with():
    p = inclusive_projection(bound(E.col("s").starts_with("iceberg")), _infos())
    assert p.op == E.EQ and p.literal == "ice"
    p2 = inclusive_projection(bound(E.col("s").starts_with("ic")), _infos())
    assert p2.op == E.STARTS_WITH and p2.literal == "ic"


def test_projection_no_tightening_for_continuous_source():
    """Regression: an int literal bound against a DOUBLE source must NOT be
    boundary-shifted (f < 5 is not f <= 4 — value 4.5 would be pruned). The
    shift dispatches on the Iceberg source type, like Java ProjectionUtil."""
    fi = [PartitionFieldInfo("f", "f_id", IdentityTransform(), DOUBLE)]
    p = inclusive_projection(bound(E.col("f") < 5), fi)
    assert partition_might_match(p, {"f_id": 4.5})
    p2 = inclusive_projection(bound(E.col("f") > 4), fi)
    assert partition_might_match(p2, {"f_id": 4.5})
    # discrete source types still tighten
    li = [PartitionFieldInfo("x", "x_id", IdentityTransform(), LONG)]
    p3 = inclusive_projection(bound(E.col("x") < 5), li)
    assert (p3.op, p3.literal) == (E.LT_EQ, 4)


def test_projection_unpartitioned_col_is_true():
    p = inclusive_projection(bound(E.col("f") > 0.5), _infos())
    assert isinstance(p, E.AlwaysTrue)


def test_projection_or_keeps_or():
    p = inclusive_projection(
        bound((E.col("x") == 1) | (E.col("f") > 0.5)), _infos())
    # OR with an unprojectable side must not prune anything -> collapses TRUE
    assert isinstance(p, E.AlwaysTrue)
    assert manifest_might_match(p, {"x_bucket": FieldSummary(False, None, 5, 9)})
    # but OR of two projectable sides stays a real OR
    p2 = inclusive_projection(
        bound((E.col("x") == 1) | (E.col("x") == 2)), _infos())
    assert isinstance(p2, E.Or)


def test_partition_might_match_exact():
    pred = inclusive_projection(bound(E.col("x") == 34), _infos())
    b = BucketTransform(16).apply(34, LONG)
    assert partition_might_match(pred, {"x_bucket": b})
    assert not partition_might_match(pred, {"x_bucket": (b + 1) % 16})


# ---------------- reference truth tables: string prefix bounds -------------
# Fixtures mirror inclusive_metrics_evaluator.rs get_test_file_{2,3,4}
# (string column with 2 nulls of 20 values and the given bounds).

def _sm(lower, upper, nulls=2, values=20):
    return {"s": ColumnMetrics(value_count=values, null_count=nulls,
                               lower=lower, upper=upper)}


F2 = _sm("aa", "dC")
F3 = _sm("1str1", "3str3")
F4 = _sm("abc", "イロハニホヘト")  # イロハニホヘト


def test_starts_with_reference_cases():
    sw = lambda pre: bound(E.col("s").starts_with(pre))
    # reads (inclusive_metrics_evaluator.rs test_string_starts_with)
    for mets, pre in [(F2, "a"), (F2, "aa"), (F2, "aaa"), (F3, "1s"),
                      (F3, "1str1x"), (F4, "ff")]:
        assert file_might_match(sw(pre), mets, 50), pre
    # skips
    for mets, pre in [(F2, "aB"), (F2, "dWX"), (F3, "5"), (F3, "3str3x")]:
        assert not file_might_match(sw(pre), mets, 50), pre
    # all-null column never matches startsWith
    all_null = {"s": ColumnMetrics(value_count=20, null_count=20)}
    assert not file_might_match(sw(""), all_null, 50)
    # truncated-upper-bound subtlety: upper イロハニホヘト cut to 5 chars then
    # next code point at position 5 -> prefix sorts ABOVE every actual value
    assert not file_might_match(sw("イロハニボ"), F4, 50)


def test_not_starts_with_reference_cases():
    nsw = lambda pre: bound(~E.col("s").starts_with(pre))
    # nulls present (reference fixtures) => always read
    for mets, pre in [(F2, "a"), (F2, "aa"), (F2, "aaa"), (F3, "1s"),
                      (F3, "1str1x"), (F4, "ff"), (F2, "aB"), (F2, "dWX"),
                      (F3, "5"), (F3, "3str3x"),
                      (F4, "イロハニホヘト")]:
        assert file_might_match(nsw(pre), mets, 50), pre
    # no nulls + both bounds start with the prefix => every row starts with
    # it => NOT cannot match (the pruning branch)
    both = _sm("abcde", "abcfg", nulls=0)
    assert not file_might_match(nsw("abc"), both, 50)
    # no nulls, upper does not share the prefix => might match
    mixed = _sm("abcde", "abx", nulls=0)
    assert file_might_match(nsw("abc"), mixed, 50)
    # lower below the prefix => might match
    low = _sm("aa", "abcfg", nulls=0)
    assert file_might_match(nsw("abc"), low, 50)


def test_in_bounds_reference_cases():
    # inclusive_metrics_evaluator.rs test_integer_in, bounds [30, 79]
    mets = {"x": ColumnMetrics(value_count=50, null_count=0,
                               lower=30, upper=79)}
    assert file_might_match(bound(E.col("x").isin([25, 30])), mets, 50)
    assert not file_might_match(bound(E.col("x").isin([25, 26])), mets, 50)
    assert file_might_match(bound(E.col("x").isin([79, 80])), mets, 50)
    assert not file_might_match(bound(E.col("x").isin([80, 81])), mets, 50)
    all_null = {"x": ColumnMetrics(value_count=50, null_count=50)}
    assert not file_might_match(bound(E.col("x").isin([30])), all_null, 50)
    # NOT IN can never prune from bounds
    assert file_might_match(bound(~E.col("x").isin([30])), mets, 50)
