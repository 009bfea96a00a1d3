"""NameMapping serde + persisted-mapping external-file import."""

import pyspark.sql.functions as F

from iceberg_rust_spark import Table
from iceberg_rust_spark.sources.name_mapping import MappedField, NameMapping
from iceberg_rust_spark.sources.types import schema_from_spark


def test_name_mapping_serde_and_resolution():
    nm = NameMapping([
        MappedField(1, ["id", "ID", "legacy_id"]),
        MappedField(2, ["name"], [MappedField(3, ["inner"])]),
    ])
    back = NameMapping.from_json(nm.to_json())
    assert back.id_for("legacy_id") == 1
    assert back.id_for("name") == 2
    assert back.id_for("nope") is None
    assert back.root[1].fields[0].names == ["inner"]
    # spec JSON shape: kebab-case field-id key
    assert '"field-id": 1' in nm.to_json() or '"field-id":1' in nm.to_json()


def test_add_files_with_persisted_mapping(spark, warehouse, tmp_path):
    ext = str(tmp_path / "ext.parquet")
    spark.createDataFrame([(1, "a"), (2, "b")], "legacy_id long, label string") \
        .coalesce(1).write.parquet(ext)

    df = spark.createDataFrame([], "id long, name string")
    schema = schema_from_spark(df.schema)
    t = Table.create(warehouse, "db.nmtest", schema)
    nm = NameMapping.from_schema(schema, aliases={"id": ["legacy_id"],
                                                  "name": ["label"]})
    t = t.set_name_mapping(nm)
    assert t.name_mapping().id_for("legacy_id") == \
        schema.field_by_name("id").field_id

    import glob
    files = glob.glob(ext + "/*.parquet")
    t = t.add_files(spark, files)
    # stats were canonicalized through the persisted mapping
    entries = t.entries_df(spark).collect()
    assert sum(e["record_count"] for e in entries) == 2
    plan = t.scan().plan_files()
    f = plan.tasks[0].data_file
    assert "id" in f.value_counts and "legacy_id" not in f.value_counts
    # the DATA reads back through the mapping (not as nulls)
    rows = sorted((r["id"], r["name"]) for r in t.to_df(spark).collect())
    assert rows == [(1, "a"), (2, "b")]


def test_add_files_same_names_reads_back(spark, warehouse, tmp_path):
    ext = str(tmp_path / "ext2.parquet")
    spark.createDataFrame([(7, "x")], "id long, name string") \
        .coalesce(1).write.parquet(ext)
    df = spark.createDataFrame([], "id long, name string")
    t = Table.create(warehouse, "db.nm2", schema_from_spark(df.schema))
    import glob
    t = t.add_files(spark, glob.glob(ext + "/*.parquet"))
    assert [(r["id"], r["name"]) for r in t.to_df(spark).collect()] == [(7, "x")]
