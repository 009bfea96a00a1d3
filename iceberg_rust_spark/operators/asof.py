"""As-of (point-in-time) join — a custom operator Spark lacks natively.

Single-shuffle formulation: union left probes and right states on the key,
sort within each key partition by (ts, side), carry the latest right payload
forward with a running ``last(ignorenulls)`` window, keep left rows. No
row-at-a-time Python; one exchange + one in-partition sort, so it scales like
any windowed aggregation (and AQE handles key skew).

Semantics: for each left row, the right row with the greatest right_ts such
that right_ts <= left_ts (backward as-of), per key. Right-side ties on
(key, ts) must be pre-deduplicated by the caller for determinism.
"""

from __future__ import annotations

from typing import List

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window


def asof_join(left: DataFrame, right: DataFrame, on: List[str],
              left_ts: str, right_ts: str,
              how: str = "inner", suffix: str = "_r") -> DataFrame:
    """Backward as-of join. ``on``: equality key columns present in both
    sides. Right payload columns are appended (suffixed on collision)."""
    if how not in ("inner", "left"):
        raise ValueError("how must be 'inner' or 'left'")
    lcols = left.columns
    rcols = [c for c in right.columns if c not in on]
    if not rcols:
        raise ValueError("right side has no payload columns")
    out_rnames = [c if c not in lcols else c + suffix for c in rcols]

    l_struct_t = left.select(*lcols).schema.simpleString()       # struct<...>
    r_struct_t = right.select(F.lit(True).alias("_m"),
                              *rcols).schema.simpleString()
    ts_type = dict(left.dtypes)[left_ts]

    l = left.select(
        *[F.col(c) for c in on],
        F.col(left_ts).cast(ts_type).alias("_asof_ts"),
        F.lit(1).alias("_side"),
        F.struct(*[F.col(c) for c in lcols]).alias("_lpay"),
        F.lit(None).cast(r_struct_t).alias("_rpay"))
    r = right.select(
        *[F.col(c) for c in on],
        F.col(right_ts).cast(ts_type).alias("_asof_ts"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(l_struct_t).alias("_lpay"),
        F.struct(F.lit(True).alias("_m"),
                 *[F.col(c) for c in rcols]).alias("_rpay"))

    u = l.unionByName(r.select(*l.columns))
    w = (Window.partitionBy(*on).orderBy(F.col("_asof_ts"), F.col("_side"))
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    u = u.withColumn("_rlast", F.last("_rpay", ignorenulls=True).over(w))

    probes = u.where(F.col("_side") == 1)
    cols = [F.col(f"_lpay.{c}").alias(c) for c in lcols]
    cols += [F.col(f"_rlast.{src}").alias(dst)
             for src, dst in zip(rcols, out_rnames)]
    if how == "inner":
        probes = probes.where(F.col("_rlast._m"))
    return probes.select(*cols)
