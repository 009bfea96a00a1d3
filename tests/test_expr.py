import datetime as dt

import pytest

from iceberg_rust_spark.plans import expr as E
from iceberg_rust_spark.sources.types import (DOUBLE, LONG, STRING, NestedField,
                                              Schema, TIMESTAMP)

SCHEMA = Schema([
    NestedField(1, "id", LONG, required=True),
    NestedField(2, "name", STRING),
    NestedField(3, "score", DOUBLE),
    NestedField(4, "ts", TIMESTAMP),
])


def test_builders_and_repr():
    p = (E.col("id") > 5) & (E.col("name") == "x") | E.col("score").is_null()
    assert "AND" in repr(p) and "OR" in repr(p)


def test_and_or_simplification():
    assert E.and_(E.ALWAYS_TRUE, E.ALWAYS_TRUE) is E.ALWAYS_TRUE
    assert isinstance(E.and_(E.ALWAYS_FALSE, E.col("id") > 1), E.AlwaysFalse)
    assert isinstance(E.or_(E.ALWAYS_TRUE, E.col("id") > 1), E.AlwaysTrue)
    assert E.or_(E.ALWAYS_FALSE, E.ALWAYS_FALSE) is E.ALWAYS_FALSE


def test_rewrite_not_de_morgan():
    p = E.not_((E.col("id") > 5) & (E.col("name") == "x"))
    q = E.rewrite_not(p)
    assert isinstance(q, E.Or)
    assert q.left.op == E.LT_EQ
    assert q.right.op == E.NOT_EQ
    # double negation
    assert E.rewrite_not(E.not_(E.not_(E.col("id") > 5))).op == E.GT


def test_negation_table():
    pairs = [(E.IS_NULL, E.NOT_NULL), (E.IS_NAN, E.NOT_NAN), (E.LT, E.GT_EQ),
             (E.GT, E.LT_EQ), (E.EQ, E.NOT_EQ), (E.IN, E.NOT_IN),
             (E.STARTS_WITH, E.NOT_STARTS_WITH)]
    for a, b in pairs:
        assert E._NEGATIONS[a] == b and E._NEGATIONS[b] == a


def test_bind_resolves_and_errors():
    b = E.bind(E.col("id") > 5, SCHEMA)
    assert isinstance(b, E.BoundBinaryPred) and b.field.field_id == 1
    with pytest.raises(ValueError):
        E.bind(E.col("missing") == 1, SCHEMA)
    # empty IN folds to FALSE
    assert isinstance(E.bind(E.col("id").isin([]), SCHEMA), E.AlwaysFalse)


def test_bind_case_insensitive():
    b = E.bind(E.col("ID") > 5, SCHEMA, case_sensitive=False)
    assert b.field.field_id == 1


def test_evaluate_row():
    row = {"id": 7, "name": None, "score": float("nan"),
           "ts": dt.datetime(2020, 6, 1)}
    assert E.evaluate_row(E.col("id") > 5, row)
    assert not E.evaluate_row(E.col("id") > 7, row)
    assert E.evaluate_row(E.col("name").is_null(), row)
    assert E.evaluate_row(E.col("score").is_nan(), row)
    assert not E.evaluate_row(E.col("score").not_nan(), row)
    assert E.evaluate_row(E.col("ts") >= dt.datetime(2020, 1, 1), row)
    assert E.evaluate_row(E.col("id").isin([7, 8]), row)
    assert not E.evaluate_row(E.col("id").not_in([7]), row)
    # null never matches ordered predicates
    assert not E.evaluate_row(E.col("name") == "x", row)


def test_spark_column_equivalence(spark):
    rows = [(1, "ab", 1.5), (2, None, float("nan")), (3, "ba", -2.0),
            (4, "abc", 0.0)]
    df = spark.createDataFrame(rows, "id long, name string, score double")
    preds = [
        E.col("id") > 2,
        (E.col("id") >= 2) & (E.col("score") < 1.0),
        E.col("name").is_null() | E.col("name").starts_with("ab"),
        E.col("score").is_nan(),
        E.not_(E.col("id").isin([1, 3])),
    ]
    for p in preds:
        got = {r["id"] for r in df.filter(E.to_spark_column(p)).collect()}
        exp = {r[0] for r in rows if E.evaluate_row(
            E.rewrite_not(p), {"id": r[0], "name": r[1], "score": r[2]})}
        assert got == exp, repr(p)


def test_referenced_columns():
    p = (E.col("a") > 1) & (E.col("b").is_null() | E.col("a").isin([1]))
    assert set(E.referenced_columns(p)) == {"a", "b"}


def test_bind_coerces_string_literals_to_column_type():
    """Bind-time literal coercion (reference: Datum typed construction,
    spec/values/datum.rs:58): ISO strings bind against date/timestamp
    columns, numeric strings against numeric columns, and impossible
    literals fail AT BIND with a clear TypeError instead of deep inside
    transform projection."""
    import datetime as dt
    from decimal import Decimal

    import pytest

    from iceberg_rust_spark import expr as E
    from iceberg_rust_spark.plans.expr import bind
    from iceberg_rust_spark.sources import types as ice
    from iceberg_rust_spark.sources.types import NestedField, Schema

    schema = Schema([
        NestedField(1, "d", ice.DATE),
        NestedField(2, "ts", ice.TIMESTAMP),
        NestedField(3, "n", ice.LONG),
        NestedField(4, "dec", ice.decimal(10, 2)),
        NestedField(5, "s", ice.STRING),
        NestedField(6, "b", ice.BOOLEAN),
    ])

    bp = bind(E.col("d") >= "1998-01-01", schema)
    assert bp.literal == dt.date(1998, 1, 1)
    bp = bind(E.col("d") >= dt.datetime(1998, 1, 1), schema)
    assert bp.literal == dt.date(1998, 1, 1)
    bp = bind(E.col("ts") < "2020-06-01T12:30:00", schema)
    assert bp.literal == dt.datetime(2020, 6, 1, 12, 30)
    bp = bind(E.col("n") == "42", schema)
    assert bp.literal == 42 and isinstance(bp.literal, int)
    bp = bind(E.col("n") > 5.5, schema)          # fractional range: kept
    assert bp.literal == 5.5
    bp = bind(E.col("dec") <= 3.14, schema)
    assert bp.literal == Decimal("3.14")
    bp = bind(E.col("b") == "true", schema)
    assert bp.literal is True
    bp = bind(E.col("d").isin(["1998-01-01", dt.date(1998, 2, 1)]), schema)
    assert set(bp.literals) == {dt.date(1998, 1, 1), dt.date(1998, 2, 1)}

    with pytest.raises(TypeError, match="cannot bind"):
        bind(E.col("d") >= "not-a-date", schema)
    with pytest.raises(TypeError, match="not a date"):
        bind(E.col("d") >= dt.datetime(1998, 1, 1, 5, 0), schema)
    with pytest.raises(TypeError, match="cannot bind"):
        bind(E.col("s") > 5, schema)
