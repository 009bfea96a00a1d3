"""Co-located (shuffle-free) joins via Spark-native bucketed tables.

The reference's bucket[N] partition transform (transform/bucket.rs:40-111)
exists so engines can co-locate rows that join on the same key. In Spark the
native expression of that contract is a bucketed managed table:
``bucketBy(N, key).sortBy(key)`` at write time records the hash-partitioning
in the catalog, and a join of two tables bucketed by the same key and bucket
count executes as a SortMergeJoin with ZERO Exchange — each task reads
bucket i of both sides. At 100 TB this removes the two largest shuffles of
any repeated fact-to-fact join (writes are one-time; every subsequent join
is shuffle-free), which is exactly the trade bucketing exists to make.

Iceberg's bucket transform and Spark's bucketing use different hashes
(murmur3 seed 0 over Iceberg encodings vs seed 42 over Spark encodings), so
a table written here is Spark-bucketed, not Iceberg-bucket-partitioned; the
iceberg-side twin is ``PartitionSpec(bucket[N])`` + file pruning
(functions/transforms.py). Use this module when the workload is join-heavy,
the iceberg spec when it is point-lookup/prune-heavy.
"""

from __future__ import annotations

from typing import List, Optional

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table_name: str, keys: List[str],
                   num_buckets: int, sort: bool = True,
                   mode: str = "overwrite") -> None:
    """Persist ``df`` as a parquet table hash-bucketed (and per-bucket
    sorted) on ``keys``; the sort makes the later SortMergeJoin sort-free
    too (bucketed scan emits sorted runs)."""
    w = df.write.format("parquet").mode(mode).bucketBy(num_buckets, *keys)
    if sort:
        w = w.sortBy(*keys)
    w.saveAsTable(table_name)


def bucketed_join(spark: SparkSession, left_table: str, right_table: str,
                  on: List[str], how: str = "inner",
                  force_sort_merge: bool = False,
                  expect_shuffle_free: bool = False) -> DataFrame:
    """Join two same-bucketed tables; with ``expect_shuffle_free`` raise if
    the executed plan still contains a shuffle Exchange (guards against
    config or bucket-count drift silently reintroducing it). A broadcast of
    one small side does NOT count as a shuffle — that plan is strictly
    better. ``force_sort_merge`` pins the SMJ strategy (what a 100 TB
    fact-to-fact join would pick anyway; in small tests AQE would otherwise
    broadcast and bypass the bucketed scan entirely)."""
    left = spark.table(left_table)
    right = spark.table(right_table)
    if force_sort_merge:
        left, right = left.hint("merge"), right.hint("merge")
    out = left.join(right, on, how)
    if expect_shuffle_free and count_shuffles(out) > 0:
        raise RuntimeError(
            f"bucketed_join({left_table}, {right_table}) still shuffles — "
            "check matching bucket counts/keys and "
            "spark.sql.sources.bucketing.enabled")
    return out


def count_shuffles(df: DataFrame) -> int:
    """Number of shuffle (non-broadcast) Exchange operators in the pre-AQE
    executed plan — the plan-audit primitive used by tests and perf
    checks."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.count("Exchange") - plan.count("BroadcastExchange")
