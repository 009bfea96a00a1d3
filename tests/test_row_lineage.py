import pyspark.sql.functions as F
from iceberg_rust_spark import Table
from iceberg_rust_spark.sources.types import schema_from_spark

def test_row_lineage(spark, warehouse):
    df = spark.range(0, 30).select(F.col("id"))
    t = Table.create(warehouse, "db.rl", schema_from_spark(df.schema))
    t = t.append(spark, df.where(F.col("id") < 20))
    t = t.append(spark, df.where(F.col("id") >= 20))
    assert t.metadata.next_row_id == 30
    out = t.scan(include_metadata_columns=True).to_df(spark)
    rows = out.select("id", "_row_id").collect()
    ids = sorted(r["_row_id"] for r in rows)
    assert ids == list(range(30))          # dense, unique, stable
    # _row_id survives metadata round-trip
    t2 = Table.load(warehouse, "db.rl")
    ids2 = sorted(r["_row_id"] for r in
                  t2.scan(include_metadata_columns=True).to_df(spark).collect())
    assert ids2 == ids
