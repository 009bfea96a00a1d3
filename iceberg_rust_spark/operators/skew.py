"""Skew-mitigation utilities for 100 TB joins and aggregations.

AQE's skew-join split (on by default in our sessions) handles most cases at
runtime; explicit salting remains the tool when one side's hot keys are known
and the other side is small enough to replicate — e.g. joining a web-scale
event log against a per-domain dimension where three domains are 50% of rows.

- salted_join: replicate the small side SALT ways, scatter the big side's hot
  keys uniformly across the replicas; the shuffle then spreads each hot key
  over SALT reducers instead of one.
- salted_count: hot-key aggregation in two stages (partial per salt, then
  final) — the groupBy analogue.
"""

from __future__ import annotations

from typing import List, Optional

from pyspark.sql import DataFrame, functions as F

SALT_COL = "_salt"


def salted_join(big: DataFrame, small: DataFrame, on: List[str],
                how: str = "inner", n_salts: int = 16) -> DataFrame:
    """Join a skewed big side against a replicable small side.

    big rows get a uniform random-ish salt derived from a stable row hash
    (xxhash64 over all columns — deterministic, no rand() so retries/resumes
    agree); small rows are exploded into all n_salts replicas. Equality on
    (keys + salt) spreads each hot key across n_salts shuffle partitions.
    Cost: small side shuffles n_salts x its size — use only when
    |small| * n_salts << |big|.
    """
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]),
                  F.lit(n_salts)).cast("int")
    big_s = big.withColumn(SALT_COL, salt)
    small_s = small.withColumn(
        SALT_COL, F.explode(F.array(*[F.lit(i) for i in range(n_salts)])))
    out = big_s.join(small_s, on=on + [SALT_COL], how=how)
    return out.drop(SALT_COL)


def salted_count(df: DataFrame, keys: List[str], n_salts: int = 16,
                 value_col: Optional[str] = None) -> DataFrame:
    """Two-stage aggregation for heavily skewed group keys: partial
    count/sum per (key, salt), then final rollup per key. Spark's map-side
    partial aggregation usually makes this unnecessary — reach for it when
    the partials themselves overflow one reducer (billions of rows on one
    key)."""
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]),
                  F.lit(n_salts)).cast("int")
    aggs = [F.count("*").alias("_n")]
    finals = [F.sum("_n").alias("n")]
    if value_col is not None:
        aggs.append(F.sum(value_col).alias("_s"))
        finals.append(F.sum("_s").alias(f"sum_{value_col}"))
    partial = (df.withColumn(SALT_COL, salt)
               .groupBy(*keys, SALT_COL).agg(*aggs))
    return partial.groupBy(*keys).agg(*finals)
