"""StrictProjection truth tables (expr/visitors/strict_projection.rs:30 +
Transform::strict_project, spec/transform.rs:333-453) and the metadata-only
COW delete they enable."""

import datetime as dt

import pyspark.sql.functions as F
import pytest

from iceberg_rust_spark import PartitionField, PartitionSpec, Table, expr as E
from iceberg_rust_spark.functions.transforms import parse_transform
from iceberg_rust_spark.plans.evaluators import (PartitionFieldInfo,
                                                 partition_must_match,
                                                 strict_projection)
from iceberg_rust_spark.sources.types import PrimitiveType, schema_from_spark


def _info(transform, src="c", pname="p", styp="long"):
    return [PartitionFieldInfo(src, pname, parse_transform(transform),
                               PrimitiveType(styp))]


def _sp(pred, infos):
    return strict_projection(pred, infos)


def test_identity_carries_all_ops():
    infos = _info("identity")
    for pred, expect in [
        (E.col("c") == 5, "p = 5"),
        (E.col("c") != 5, "p != 5"),
        (E.col("c") < 5, "p < 5"),
        (E.col("c") >= 5, "p >= 5"),
        (E.col("c").is_null(), "p IS NULL"),
        (E.col("c").isin([1, 2]), None),  # set carries, text form varies
    ]:
        q = _sp(pred, infos)
        assert not isinstance(q, E.AlwaysFalse), pred


def test_bucket_strict_rules():
    infos = _info("bucket[16]")
    # equality can never be guaranteed through a bucket
    assert isinstance(_sp(E.col("c") == 5, infos), E.AlwaysFalse)
    assert isinstance(_sp(E.col("c") < 5, infos), E.AlwaysFalse)
    assert isinstance(_sp(E.col("c").isin([1]), infos), E.AlwaysFalse)
    # inequality: a different bucket proves a different value
    q = _sp(E.col("c") != 5, infos)
    assert isinstance(q, E.BinaryPred) and q.op == E.NOT_EQ
    # NotIn: different buckets prove exclusion
    q = _sp(E.SetPred(E.NOT_IN, "c", (1, 2)), infos)
    assert isinstance(q, E.SetPred) and q.op == E.NOT_IN
    # null checks survive (null maps to null partition)
    q = _sp(E.col("c").is_null(), infos)
    assert isinstance(q, E.UnaryPred) and q.op == E.IS_NULL


def test_truncate_int_boundaries():
    infos = _info("truncate[10]")
    # v < 100  ->  p < 100   (p is a multiple of 10; p<100 ⟹ v<=99)
    q = _sp(E.col("c") < 100, infos)
    assert (q.op, q.literal) == (E.LT, 100)
    # v <= 99  ->  p < trunc(100) = 100
    q = _sp(E.col("c") <= 99, infos)
    assert (q.op, q.literal) == (E.LT, 100)
    # v > 100  ->  p > trunc(100) = 100 (p>=110 ⟹ v>=110 > 100)
    q = _sp(E.col("c") > 100, infos)
    assert (q.op, q.literal) == (E.GT, 100)
    # v >= 100 ->  p > trunc(99) = 90
    q = _sp(E.col("c") >= 100, infos)
    assert (q.op, q.literal) == (E.GT, 90)
    # equality has no strict projection under widening
    assert isinstance(_sp(E.col("c") == 100, infos), E.AlwaysFalse)
    # inequality: different truncation bucket proves difference
    q = _sp(E.col("c") != 105, infos)
    assert (q.op, q.literal) == (E.NOT_EQ, 100)


def test_truncate_string_startswith():
    infos = _info("truncate[5]", styp="string")
    # shorter prefix than width carries as startswith
    q = _sp(E.col("c").starts_with("ab"), infos)
    assert (q.op, q.literal) == (E.STARTS_WITH, "ab")
    # exact width becomes equality on the partition value
    q = _sp(E.col("c").starts_with("abcde"), infos)
    assert (q.op, q.literal) == (E.EQ, "abcde")
    # longer than width: no guarantee
    assert isinstance(_sp(E.col("c").starts_with("abcdef"), infos),
                      E.AlwaysFalse)


def test_month_strict_boundaries():
    infos = _info("month", styp="timestamp")
    jan1 = dt.datetime(1997, 1, 1)
    feb1 = dt.datetime(1997, 2, 1)
    pred = (E.col("c") >= jan1) & (E.col("c") < feb1)
    q = _sp(E.bind(pred, _schema_ts()), infos)
    # month index of 1997-01 is (1997-1970)*12 + 0 = 324
    jan = 324
    assert partition_must_match(q, {"p": jan})
    assert not partition_must_match(q, {"p": jan - 1})
    assert not partition_must_match(q, {"p": jan + 1})


def _schema_ts():
    from iceberg_rust_spark.sources.types import NestedField, Schema
    return Schema([NestedField(1, "c", PrimitiveType("timestamp"), False)])


def test_unpartitioned_source_gives_no_guarantee():
    q = _sp(E.col("other") == 1, _info("identity"))
    assert isinstance(q, E.AlwaysFalse)


def test_or_of_multiple_parts_over_one_source():
    infos = [PartitionFieldInfo("c", "d", parse_transform("day"),
                                PrimitiveType("timestamp")),
             PartitionFieldInfo("c", "h", parse_transform("hour"),
                                PrimitiveType("timestamp"))]
    pred = E.bind(E.col("c") >= dt.datetime(2019, 1, 2), _schema_ts())
    q = _sp(pred, infos)
    assert isinstance(q, E.Or)  # either granularity's guarantee suffices


# ------------------------------------------------ metadata-only COW delete
def test_cow_delete_whole_month_is_metadata_only(spark, warehouse):
    rows = []
    for m in (1, 2, 3):
        for d in range(1, 20):
            rows.append((m * 100 + d, dt.datetime(1997, m, d, 12)))
    df = spark.createDataFrame(rows, "id long, ts timestamp_ntz")
    s = schema_from_spark(df.schema)
    t = Table.create(warehouse, "db.m", s, PartitionSpec(0, [
        PartitionField(s.field_by_name("ts").field_id, 1000, "ts_month",
                       parse_transform("month"))]))
    t = t.append(spark, df)
    pred = (E.col("ts") >= dt.datetime(1997, 2, 1)) & \
           (E.col("ts") < dt.datetime(1997, 3, 1))
    t = t.delete_where(spark, pred, mode="cow")
    snap = t.metadata.current_snapshot()
    # the whole Feb partition dropped from partition tuples alone: no files
    # read or rewritten, pure metadata operation
    assert int(snap.summary["strict-partition-deleted-files"]) >= 1
    assert snap.summary["added-data-files"] == "0"
    assert snap.operation == "delete"
    got = t.to_df(spark)
    assert got.count() == 2 * 19
    assert got.where(F.month("ts") == 2).count() == 0


def test_negative_month_boundaries_match_reference():
    """strict_projection.rs test_strict_projection_negative_month_*: pre-1970
    dates use floor-division months (1969-01-01 -> month -12); boundary ops
    shift exactly as the reference asserts."""
    import datetime as dt
    from iceberg_rust_spark.functions.transforms import MonthTransform
    from iceberg_rust_spark.sources.types import DATE, NestedField, Schema
    S2 = Schema([NestedField(1, "d", DATE)])
    infos = [PartitionFieldInfo("d", "pd", MonthTransform(), DATE)]
    jan1_69 = dt.date(1969, 1, 1)

    def proj(p):
        return strict_projection(E.bind(p, S2), infos)

    p = proj(E.col("d") < jan1_69)
    assert (p.term, p.op, p.literal) == ("pd", E.LT, -12)
    p = proj(E.col("d") <= jan1_69)
    assert (p.term, p.op, p.literal) == ("pd", E.LT, -12)
    p = proj(E.col("d") > jan1_69)
    assert (p.term, p.op, p.literal) == ("pd", E.GT, -12)
    p = proj(E.col("d") >= jan1_69)
    assert (p.term, p.op, p.literal) == ("pd", E.GT, -13)
    p = proj(E.col("d") != jan1_69)
    assert (p.term, p.op, p.literal) == ("pd", E.NOT_EQ, -12)
    p = proj(E.col("d").not_in([jan1_69, dt.date(1969, 12, 31)]))
    assert (p.term, p.op, sorted(p.literals)) == ("pd", E.NOT_IN, [-12, -1])
