"""Spark 4 Python DataSource integration: batch + streaming reads."""

import pyspark.sql.functions as F

from iceberg_rust_spark import Table, expr as E
from iceberg_rust_spark.sources.types import schema_from_spark
from iceberg_rust_spark.streaming.datasource import register


def _mk(spark, warehouse, name, n=60):
    df = spark.range(0, n).select(F.col("id"), (F.col("id") % 5).alias("g"))
    t = Table.create(warehouse, name, schema_from_spark(df.schema))
    return t.append(spark, df), df


def test_batch_datasource_read(spark, warehouse):
    t, df = _mk(spark, warehouse, "db.ds_batch")
    register(spark)
    out = (spark.read.format("iceberg_rust")
           .option("warehouse", warehouse.warehouse)
           .option("table", "db.ds_batch").load())
    assert out.count() == 60
    assert sorted(out.columns) == ["g", "id"]
    assert out.agg(F.sum("id")).collect()[0][0] == sum(range(60))
    # pushed-down where option prunes at planning time; result still exact
    pruned = (spark.read.format("iceberg_rust")
              .option("warehouse", warehouse.warehouse)
              .option("table", "db.ds_batch")
              .option("where", "id < 10").load())
    assert pruned.where("id < 10").count() == 10


def test_stream_datasource_incremental(spark, warehouse, tmp_path):
    t, df = _mk(spark, warehouse, "db.ds_stream", 40)
    register(spark)
    ckpt = str(tmp_path / "ds_ckpt")
    out_dir = str(tmp_path / "ds_out")

    def run_pass():
        q = (spark.readStream.format("iceberg_rust")
             .option("warehouse", warehouse.warehouse)
             .option("table", "db.ds_stream").load()
             .writeStream.format("parquet").option("path", out_dir)
             .option("checkpointLocation", ckpt)
             .outputMode("append").trigger(availableNow=True).start())
        q.awaitTermination(120)

    def sink():
        return spark.read.parquet(out_dir)

    run_pass()
    assert sink().count() == 40

    # new snapshot -> ONLY its rows arrive on the next pass (offset recovery)
    t = t.append(spark, spark.range(100, 110).select(
        F.col("id"), (F.col("id") % 5).alias("g")))
    run_pass()
    assert sink().count() == 50
    assert sink().agg(F.max("id")).collect()[0][0] == 109

    # no new snapshots -> nothing appended
    run_pass()
    assert sink().count() == 50
