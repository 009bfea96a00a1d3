"""Deterministic sampling / quota operators for training-data curation.

At 100 TB, curation needs sampling that is (a) reproducible across runs and
engines — no RNG seeds that change with partitioning — and (b) expressible
as a scan-level filter so it composes with pushdown. Both operators here are
pure column expressions (JVM-side, whole-stage codegen; no UDF, no shuffle
for the sample; one bounded shuffle for the quota).

Engine-portable determinism: the sample keeps a row iff the first 8 hex
chars of md5(key) compare below a hex threshold string. md5 is bit-identical
everywhere (Spark, DuckDB, Python), so the SAME rows are selected by every
engine — which is also what makes the DuckDB oracle exact.
"""

from __future__ import annotations

from typing import List, Optional

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _hex_threshold(rate: float) -> str:
    """rate in [0,1] -> 8-hex-digit threshold string ('40000000' for 0.25)."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0,1], got {rate}")
    if rate >= 1.0:
        return "gggggggg"  # 'g' > any hex digit: keeps everything
    return format(int(rate * 0x100000000), "08x")


def sample_predicate(key: Column, rate: float) -> Column:
    """Boolean column: deterministically keep ~``rate`` of rows by key.
    Same key ⇒ same verdict in every run/engine (md5-prefix ordering)."""
    return F.substring(F.md5(key.cast("string")), 1, 8) < _hex_threshold(rate)


def deterministic_sample(df: DataFrame, key_col: str, rate: float) -> DataFrame:
    """Reproducible ~``rate`` sample keyed on ``key_col``. A filter, not a
    shuffle: survives pushdown and never resamples differently when the
    input repartitions (unlike df.sample, whose output depends on split
    layout)."""
    return df.where(sample_predicate(F.col(key_col), rate))


def sql_sample_predicate(key_sql: str, rate: float) -> str:
    """DuckDB/ANSI twin of sample_predicate — selects the SAME rows."""
    return (f"substring(md5(CAST({key_sql} AS VARCHAR)), 1, 8) < "
            f"'{_hex_threshold(rate)}'")


def quota_per_group(df: DataFrame, group_cols: List[str], quota: int,
                    order_col: Optional[str] = None,
                    keep_col: str = None) -> DataFrame:
    """Cap rows per group (e.g. max N documents per source domain), keeping
    the first ``quota`` by ``order_col`` (deterministic tie-break required —
    pass a unique column). One hash-shuffle on the group key; each group is
    processed streaming by the window, so a skewed giant group costs one
    task's sort, never memory (rank, don't collect). At extreme skew,
    pre-aggregate with operators/skew.py salting."""
    order = F.col(order_col) if order_col else F.monotonically_increasing_id()
    w = Window.partitionBy(*group_cols).orderBy(order)
    return (df.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") <= quota).drop("_rn"))


def token_budget_per_group(df: DataFrame, group_cols: List[str],
                           token_budget: int, tokens_col: str,
                           order_col: str) -> DataFrame:
    """Keep documents per group until a TOKEN budget is exhausted (the
    training-mix primitive: "N tokens per source", not "N documents" —
    document lengths vary by orders of magnitude, so row quotas skew the
    mix). Deterministic by ``order_col``; SOFT cap: a document is kept while
    the running sum of the documents BEFORE it is under budget, so the first
    budget-crossing document is included and a group may exceed
    ``token_budget`` by at most one document's tokens (guarantees every
    group with data contributes at least one document).

    Same scale shape as quota_per_group: one hash shuffle on the group key,
    one streaming window pass computing the running token sum — skewed
    groups cost a sort, never memory."""
    w = (Window.partitionBy(*group_cols).orderBy(F.col(order_col))
         .rowsBetween(Window.unboundedPreceding, -1))
    before = F.coalesce(F.sum(tokens_col).over(w), F.lit(0))
    return (df.withColumn("_tok_before", before)
            .where(F.col("_tok_before") < token_budget)
            .drop("_tok_before"))


def hash_split(df: DataFrame, key_col: str,
               splits: Optional[List] = None,
               split_col: str = "split") -> DataFrame:
    """Deterministic train/val/test assignment: every row gets a split
    label from the md5-prefix of its key — the same engine-portable hash
    the sampler uses, so (a) the SAME key always lands in the same split
    across runs, engines, and repartitions (no leakage between train and
    eval when the corpus is re-processed), and (b) a DuckDB oracle can
    reproduce the assignment bit-for-bit.

    ``splits``: [(label, fraction), ...] summing to ~1.0 (default the
    classic 98/1/1). Pure column expression — codegen'd filter-friendly,
    zero shuffles at any scale."""
    splits = splits or [("train", 0.98), ("val", 0.01), ("test", 0.01)]
    total = sum(f for _, f in splits)
    if not 0.999 <= total <= 1.001:
        raise ValueError(f"split fractions must sum to 1, got {total}")
    h = F.substring(F.md5(F.col(key_col).cast("string")), 1, 8)
    expr = None
    acc = 0.0
    for label, frac in splits[:-1]:
        acc += frac
        cond = h < _hex_threshold(acc)
        expr = (F.when(cond, F.lit(label)) if expr is None
                else expr.when(cond, F.lit(label)))
    last = splits[-1][0]
    expr = F.lit(last) if expr is None else expr.otherwise(F.lit(last))
    return df.withColumn(split_col, expr)


def pack_sequences(df: DataFrame, budget: int,
                   group_cols: Optional[List[str]] = None,
                   order_col: str = "doc_id",
                   tokens_col: str = "n_tokens",
                   shard_chars: int = 0) -> DataFrame:
    """Greedy sequential sample packing: assign each document to a
    fixed-token-budget training sequence — ``seq_no`` = which budget
    bucket the running token total lands in, walking docs in ``order_col``
    order inside each group. The standard pre-training packing
    approximation (documents are not split; a doc longer than the budget
    owns its sequence).

    Scale shape: ONE window per group partition — ``group_cols`` (e.g.
    language or source) keys the parallelism, so no global sort; within a
    group the running sum is a single pass. Deterministic given
    (order_col, tokens_col), so the same assignment reproduces on any
    cluster layout and in the DuckDB oracle.

    With FEW groups the per-group window caps parallelism (4 languages =
    4 tasks regardless of cluster size): ``shard_chars`` > 0 additionally
    partitions by the first N hex chars of md5(order_col) — 16^N shards
    per group, each packed independently (any disjoint partition of docs
    into sequences is a valid packing). The shard key is a STRING prefix,
    so the oracle computes it identically with no cross-engine integer
    hashing.
    """
    parts = list(group_cols or [])
    if shard_chars:
        parts.append(F.substring(
            F.md5(F.col(order_col).cast("string")), 1, shard_chars)
            .alias("__shard"))
    w = Window.partitionBy(*(parts or [F.lit(0)])) \
        .orderBy(order_col) \
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cum = F.sum(F.col(tokens_col)).over(w)
    seq = F.floor((cum - F.col(tokens_col)) / F.lit(budget)) \
        .cast("long").alias("seq_no")
    off = (cum - F.col(tokens_col) -
           F.floor((cum - F.col(tokens_col)) / F.lit(budget)) *
           F.lit(budget)).cast("long").alias("seq_offset")
    shard_out = ([F.substring(F.md5(F.col(order_col).cast("string")), 1,
                              shard_chars).alias("shard")]
                 if shard_chars else [])
    return df.select(*(group_cols or []), *shard_out, order_col,
                     F.col(tokens_col).cast("long").alias(tokens_col),
                     seq, off)


def sql_pack_sequences(table: str, budget: int,
                       group_cols: Optional[List[str]] = None,
                       order_col: str = "doc_id",
                       tokens_col: str = "n_tokens",
                       shard_chars: int = 0) -> str:
    keys = list(group_cols or [])
    shard_sql = (f"substr(md5(CAST({order_col} AS VARCHAR)), 1, "
                 f"{shard_chars})")
    if shard_chars:
        keys.append(shard_sql)
    part = f"PARTITION BY {', '.join(keys)} " if keys else ""
    cum = (f"SUM({tokens_col}) OVER ({part}ORDER BY {order_col} "
           f"ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)")
    prev = f"({cum} - {tokens_col})"
    sel_groups = (", ".join(group_cols) + ", ") if group_cols else ""
    sel_shard = f"{shard_sql} AS shard, " if shard_chars else ""
    return f"""
    SELECT {sel_groups}{sel_shard}{order_col},
           CAST({tokens_col} AS BIGINT) AS {tokens_col},
           CAST(floor({prev} / {budget}) AS BIGINT) AS seq_no,
           CAST({prev} - floor({prev} / {budget}) * {budget} AS BIGINT)
               AS seq_offset
    FROM {table}
    """


def stratified_mix(df: DataFrame, group_col: str, targets: dict,
                   total: int, key_col: str = "doc_id") -> DataFrame:
    """Rebalance a corpus to a target group mix by deterministic
    downsampling: keep ``floor(target_fraction * total)`` rows per group
    (capped by what the group has — a short group skews the realized mix
    rather than upsampling), choosing WHICH rows by md5(key) order so the
    selection is engine-portable and layout-stable. Groups absent from
    ``targets`` are dropped.

    Scale shape: one window per group partition (rank by hash), keep-count
    folded into a CASE literal — no join, no second shuffle, no driver
    pass over the data. The exact-count rank needs one sort per group, so
    parallelism is capped by the group count; at the scale where that
    matters, trade exactness for the shuffle-free path:
    ``deterministic_sample(df.where(group == g), key, frac*total/n_g)``
    per group gives EXPECTED counts with zero sorts."""
    w = Window.partitionBy(group_col) \
        .orderBy(F.md5(F.col(key_col).cast("string")), key_col)
    keep = None
    for g, frac in sorted(targets.items()):
        n = int(frac * total)
        keep = (F.when(F.col(group_col) == g, F.lit(n)) if keep is None
                else keep.when(F.col(group_col) == g, F.lit(n)))
    keep = keep.otherwise(F.lit(0))
    return (df.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") <= keep).drop("__rn"))


def sql_stratified_mix(table: str, group_col: str, targets: dict,
                       total: int, key_col: str = "doc_id") -> str:
    cases = " ".join(
        f"WHEN '{g}' THEN {int(frac * total)}"
        for g, frac in sorted(targets.items()))
    return f"""
    SELECT * EXCLUDE (__rn) FROM (
        SELECT *, row_number() OVER (
            PARTITION BY {group_col}
            ORDER BY md5(CAST({key_col} AS VARCHAR)), {key_col}) AS __rn
        FROM {table})
    WHERE __rn <= CASE {group_col} {cases} ELSE 0 END
    """
