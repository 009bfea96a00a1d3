"""Schema-evolution read path — FIXTURES.md §4: files written under v1 must be
re-projected at v2 by field id: rename, float->double promotion, drop, add
with initial_default, null-fill (record_batch_transformer.rs 4-rule parity)."""

import pyspark.sql.functions as F
import pytest

from iceberg_rust_spark import Table
from iceberg_rust_spark.sources.types import (FLOAT, LONG, STRING, NestedField,
                                              Schema)


@pytest.fixture()
def evolved(spark, warehouse):
    s1 = Schema([NestedField(1, "id", LONG, required=True),
                 NestedField(2, "name", STRING),
                 NestedField(3, "price", FLOAT)])
    t = Table.create(warehouse, "db.evo", s1)
    v1 = spark.createDataFrame([(1, "a", 1.5), (2, "b", 2.5)],
                               "id long, name string, price float")
    t.append(spark, v1)
    t.update_schema() \
        .rename_column("id", "ident") \
        .promote_column("price", "double") \
        .drop_column("name") \
        .add_column("category", "string", initial_default="default_category") \
        .add_column("qty", "long") \
        .commit()
    v2 = spark.createDataFrame([(3, 3.5, "X", 30), (4, 4.5, "Y", 40)],
                               "ident long, price double, category string, qty long")
    t.append(spark, v2)
    return t


def test_evolved_read(spark, evolved):
    rows = {r["ident"]: r for r in evolved.to_df(spark).collect()}
    assert set(rows) == {1, 2, 3, 4}
    # v1 rows: renamed by field id, promoted, default-filled, null-filled
    assert rows[1]["price"] == 1.5 and isinstance(rows[1]["price"], float)
    assert rows[1]["category"] == "default_category"
    assert rows[1]["qty"] is None
    # v2 rows: verbatim
    assert rows[3]["category"] == "X" and rows[3]["qty"] == 30
    assert "name" not in evolved.to_df(spark).columns


def test_filter_on_renamed_column(spark, evolved):
    from iceberg_rust_spark import expr as E
    got = sorted(r["ident"] for r in
                 evolved.scan(row_filter=E.col("ident") <= 3).to_df(spark).collect())
    assert got == [1, 2, 3]


def test_filter_on_added_column(spark, evolved):
    from iceberg_rust_spark import expr as E
    got = sorted(r["ident"] for r in
                 evolved.scan(row_filter=E.col("category") == "default_category")
                 .to_df(spark).collect())
    assert got == [1, 2]


def test_add_required_without_default_rejected(spark, warehouse):
    s = Schema([NestedField(1, "id", LONG, required=True)])
    t = Table.create(warehouse, "db.evo2", s)
    with pytest.raises(ValueError):
        t.update_schema().add_column("x", "long", required=True).commit()


def test_invalid_promotion_rejected(spark, warehouse):
    s = Schema([NestedField(1, "id", LONG, required=True),
                NestedField(2, "name", STRING)])
    t = Table.create(warehouse, "db.evo3", s)
    with pytest.raises(ValueError, match="promote"):
        t.update_schema().promote_column("name", "long").commit()
