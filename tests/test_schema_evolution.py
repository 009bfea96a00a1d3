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


def test_nested_struct_evolution_by_field_id(spark, warehouse):
    """Nested projection recurses BY FIELD ID: renaming a struct child,
    promoting its type, adding an optional child, and REORDERING children
    must resolve correctly (a positional struct cast would silently pair
    wrong fields)."""
    from iceberg_rust_spark.sources.types import (DOUBLE, INT,
                                                  StructType as IceStruct)

    s1 = Schema([
        NestedField(1, "id", LONG, required=True),
        NestedField(2, "info", IceStruct((
            NestedField(3, "a", INT),
            NestedField(4, "b", STRING),
        ))),
    ])
    t = Table.create(warehouse, "db.nested_evo", s1)
    v1 = spark.createDataFrame([(1, (10, "x")), (2, (20, "y")), (3, None)],
                               "id long, info struct<a int, b string>")
    t = t.append(spark, v1)

    # evolve the nested struct: reorder children, rename a->alpha with an
    # int->long promotion, add optional c; ids preserved
    s2 = Schema([
        NestedField(1, "id", LONG, required=True),
        NestedField(2, "info", IceStruct((
            NestedField(4, "b", STRING),
            NestedField(3, "alpha", LONG),
            NestedField(5, "c", DOUBLE),
        ))),
    ], schema_id=1)
    t.commit_updates(
        [{"action": "add-schema", "schema": s2},
         {"action": "set-current-schema", "schema-id": -1}], [])
    t.refresh()

    rows = {r["id"]: r["info"] for r in t.to_df(spark).collect()}
    assert rows[1]["alpha"] == 10 and rows[1]["b"] == "x" and rows[1]["c"] is None
    assert rows[2]["alpha"] == 20 and rows[2]["b"] == "y"
    assert rows[3] is None  # NULL struct stays NULL, not struct-of-nulls
    # new writes under v2 read back alongside v1 files
    v2 = spark.createDataFrame(
        [(4, ("z", 40, 4.5))],
        "id long, info struct<b string, alpha long, c double>")
    t = t.append(spark, v2)
    rows = {r["id"]: r["info"] for r in t.to_df(spark).collect()}
    assert len(rows) == 4 and rows[4]["alpha"] == 40 and rows[4]["c"] == 4.5


def test_nested_list_and_map_evolution(spark, warehouse):
    """Field-id projection through list elements and map values."""
    from iceberg_rust_spark.sources.types import (DOUBLE, INT, ListType,
                                                  MapType,
                                                  StructType as IceStruct)
    s1 = Schema([
        NestedField(1, "id", LONG, required=True),
        NestedField(2, "tags", ListType(3, IceStruct((
            NestedField(4, "k", STRING),
            NestedField(5, "n", INT),
        )))),
        NestedField(6, "m", MapType(7, STRING, 8, INT)),
    ])
    t = Table.create(warehouse, "db.nested_lm", s1)
    v1 = spark.createDataFrame(
        [(1, [("t1", 5), ("t2", 6)], {"a": 1})],
        "id long, tags array<struct<k string, n int>>, m map<string, int>")
    t = t.append(spark, v1)

    s2 = Schema([
        NestedField(1, "id", LONG, required=True),
        NestedField(2, "tags", ListType(3, IceStruct((
            NestedField(5, "count", LONG),   # renamed + promoted + reordered
            NestedField(4, "k", STRING),
        )))),
        NestedField(6, "m", MapType(7, STRING, 8, DOUBLE)),  # value promoted
    ], schema_id=1)
    t.commit_updates(
        [{"action": "add-schema", "schema": s2},
         {"action": "set-current-schema", "schema-id": -1}], [])
    t.refresh()
    row = t.to_df(spark).collect()[0]
    assert [e["count"] for e in row["tags"]] == [5, 6]
    assert [e["k"] for e in row["tags"]] == ["t1", "t2"]
    assert row["m"] == {"a": 1.0}


def test_update_schema_builder_nested_paths(spark, warehouse):
    """SchemaUpdate dotted paths: rename/promote/add/drop INSIDE a struct
    through the builder (update_schema.rs nested addressing), end to end
    through the projection read."""
    from iceberg_rust_spark.sources.types import INT, StructType as IceStruct

    s1 = Schema([
        NestedField(1, "id", LONG, required=True),
        NestedField(2, "info", IceStruct((
            NestedField(3, "a", INT),
            NestedField(4, "b", STRING),
        ))),
    ])
    t = Table.create(warehouse, "db.nested_builder", s1)
    t = t.append(spark, spark.createDataFrame(
        [(1, (7, "x"))], "id long, info struct<a int, b string>"))
    t.update_schema() \
        .rename_column("info.a", "alpha") \
        .promote_column("info.a", "long") \
        .drop_column("info.b") \
        .add_column("info.c", "double") \
        .add_column("top", "string") \
        .commit()
    t.refresh()
    sch = t.schema
    info_t = sch.field_by_name("info").field_type
    names = [f.name for f in info_t.fields]
    assert names == ["alpha", "c"]
    # fresh nested ids never collide with existing ids
    ids = [f.field_id for f in info_t.fields]
    assert ids[0] == 3 and ids[1] > 4
    row = t.to_df(spark).collect()[0]
    assert row["info"]["alpha"] == 7 and row["info"]["c"] is None
    assert row["top"] is None
    import pytest as _pytest
    with _pytest.raises(ValueError, match="not found"):
        t.update_schema().add_column("nope.x", "int").commit()


def test_filtered_scan_with_dropped_partition_source_column(spark, warehouse):
    """scan/mod.rs test_filtered_scan_with_dropped_partition_source_column:
    historical manifests reference a spec whose SOURCE column was dropped
    from the current schema — planning must neither fail nor wrongly prune,
    and results must equal the pre-evolution scan."""
    from iceberg_rust_spark import PartitionField, PartitionSpec, expr as E
    from iceberg_rust_spark.functions.transforms import IdentityTransform
    from iceberg_rust_spark.sources.metadata import (PartitionSpec as PSpec)

    s1 = Schema([NestedField(1, "x", LONG, required=True),
                 NestedField(2, "y", LONG)])
    spec = PSpec(0, [PartitionField(1, 1000, "x", IdentityTransform())])
    t = Table.create(warehouse, "db.dropsrc", s1, spec)
    df = spark.createDataFrame([(i % 3, i) for i in range(12)],
                               "x long, y long")
    t = t.append(spark, df)

    baseline = sorted(r["y"] for r in
                      t.scan(row_filter=E.col("y") >= 5).to_df(spark)
                      .select("y").collect())
    assert baseline == list(range(5, 12))

    # make an unpartitioned spec the default, then drop the source column
    t.commit_updates(
        [{"action": "add-spec", "spec": PSpec(1, [])},
         {"action": "set-default-spec", "spec-id": -1}], [])
    t.refresh()
    t.update_schema().drop_column("x").commit()
    t.refresh()

    got = sorted(r["y"] for r in
                 t.scan(row_filter=E.col("y") >= 5).to_df(spark)
                 .select("y").collect())
    assert got == baseline
    # and filtering on a surviving partitioned read still prunes correctly
    got2 = t.scan(row_filter=E.col("y") < 3).to_df(spark).count()
    assert got2 == 3
