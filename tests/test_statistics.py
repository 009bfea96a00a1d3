"""Table statistics (analyze -> Puffin stats file -> set-statistics) and the
refs/partitions metadata tables."""

import os

import pyspark.sql.functions as F

from iceberg_rust_spark import PartitionField, PartitionSpec, Table
from iceberg_rust_spark.functions.transforms import parse_transform
from iceberg_rust_spark.sources.puffin import read_puffin_footer
from iceberg_rust_spark.sources.types import schema_from_spark


def _mk(spark, warehouse, name="db.stats", partitioned=False):
    df = spark.range(0, 100).select(
        F.col("id"), (F.col("id") % 4).alias("g"),
        F.when(F.col("id") % 10 == 0, None).otherwise(F.col("id") % 7)
        .alias("v"))
    schema = schema_from_spark(df.schema)
    spec = None
    if partitioned:
        fid = schema.field_by_name("g").field_id
        spec = PartitionSpec(0, [PartitionField(fid, 1000, "g",
                                                parse_transform("identity"))])
    t = Table.create(warehouse, name, schema, partition_spec=spec)
    return t.append(spark, df), df


def test_analyze_writes_puffin_and_commits(spark, warehouse):
    t, df = _mk(spark, warehouse)
    t = t.analyze(spark)
    assert len(t.metadata.statistics) == 1
    sf = t.metadata.statistics[0]
    assert sf["snapshot-id"] == t.metadata.current_snapshot_id
    assert os.path.exists(sf["statistics-path"])
    assert sf["file-size-in-bytes"] == os.path.getsize(sf["statistics-path"])

    stats = t.column_stats()
    assert abs(stats["id"]["ndv"] - 100) <= 2  # HLL at rsd=0.01
    assert stats["g"]["ndv"] == 4
    assert stats["v"]["null_count"] == 10
    # blobs are keyed by field id and carry the spec's ndv property
    metas, _ = read_puffin_footer(sf["statistics-path"])
    assert {m.type for m in metas} == {"ndv-long-v1"}
    assert all(len(m.fields) == 1 for m in metas)


def test_analyze_replaces_stats_for_same_snapshot(spark, warehouse):
    t, _ = _mk(spark, warehouse, name="db.stats2")
    t = t.analyze(spark, columns=["g"]).analyze(spark, columns=["g", "v"])
    assert len(t.metadata.statistics) == 1  # replaced, not appended
    assert set(t.column_stats()) == {"g", "v"}


def test_partition_statistics_file(spark, warehouse):
    t, _ = _mk(spark, warehouse, name="db.pstats", partitioned=True)
    t = t.analyze_partitions(spark)
    assert len(t.metadata.partition_statistics) == 1
    sf = t.metadata.partition_statistics[0]
    assert sf["snapshot-id"] == t.metadata.current_snapshot_id
    assert os.path.exists(sf["statistics-path"])

    ps = t.partition_stats_df(spark).collect()
    assert len(ps) == 4
    assert sum(r["data_record_count"] for r in ps) == 100
    # survives a metadata round-trip through the catalog
    reloaded = t.refresh()
    assert reloaded.metadata.partition_statistics == t.metadata.partition_statistics


def test_refs_and_partitions_metadata_tables(spark, warehouse):
    t, df = _mk(spark, warehouse, name="db.meta", partitioned=True)
    t = t.set_ref("audit", t.metadata.current_snapshot_id, ref_type="tag")

    refs = {r["name"]: (r["type"], r["snapshot_id"])
            for r in t.refs_df(spark).collect()}
    assert refs["main"] == ("branch", t.metadata.current_snapshot_id)
    assert refs["audit"] == ("tag", t.metadata.current_snapshot_id)

    parts = t.partitions_df(spark).collect()
    assert len(parts) == 4  # g in {0,1,2,3}
    assert sum(r["record_count"] for r in parts) == 100
    assert all(r["file_count"] >= 1 for r in parts)
    assert all(r["total_size_bytes"] > 0 for r in parts)
