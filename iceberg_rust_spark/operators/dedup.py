"""Deduplication operators for training-data pipelines, designed shuffle-first.

Beyond-reference surface (driver north star). Zero row-at-a-time Python
anywhere; the one Arrow-batched pandas kernel (word n-gram construction)
earned its place by measurement — the builtin higher-order-function route
runs interpreted (CodegenFallback) and benchmarked 13x slower on the same
corpus (see _word_ngrams_pandas):

- exact_dedup:     one hash-groupBy shuffle on a fingerprint; map-side combine.
- minhash_lsh:     shingle -> 64 minhashes (single exploded shuffle with 64
                   map-side-combinable min() aggregates; the exchange is
                   reused by both LSH self-join sides) -> banded LSH bucket
                   join -> exact-verify candidates. At 100 TB the band-bucket join replaces the
                   O(n^2) cross join with an O(sum bucket^2) join whose skew
                   AQE handles; verification joins shingle arrays back by id.
- simhash:         64-bit signature via per-bit +/-1 votes accumulated
                   per-row over the token-hash array (shuffle-free, codegen'd).
- ngram_jaccard_pairs: brute-force verified word-3-gram Jaccard on a bounded
                   id range — the oracle-checkable twin of minhash_lsh.
"""

from __future__ import annotations

from typing import List, Optional

from pyspark.sql import DataFrame, functions as F

from ..functions.text import fingerprint
from ..functions.vector import as_double_array, cosine_rounded

# deterministic odd multipliers/offsets for 64 minhash permutations
# h_i(x) = (a_i * (x mod p) + b_i) mod p  over xxhash64 shingle values.
# p = 2^31-1 keeps every intermediate < 2^62: safe under ANSI overflow checks.
_P = (1 << 31) - 1  # Mersenne prime
_N_HASHES = 64
# 32 bands x 2 rows: candidate probability 1-(1-s^2)^32 is ~0.9997 at the
# s=0.5 operating threshold (16x4 was ~0.73 there and measurably missed one
# borderline 0.53-jaccard pair on the fixture). False candidates from the
# looser bands are removed by the exact-verify join, so the trade is pure
# recall; bucket rows per doc double (16->32), still one exchange.
_BANDS = 32
_ROWS_PER_BAND = _N_HASHES // _BANDS


def _perm_params(i: int) -> tuple:
    # fixed, seedless (resume-safe) parameter derivation
    a = ((2 * i + 1) * 0x9E3779B9) % _P
    b = ((i * i + 7) * 0xC2B2AE3D) % _P
    return (a | 1), b


def exact_dedup(docs: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Keep min-id doc per normalized-text fingerprint. One shuffle."""
    return (docs
            .withColumn("_fp", fingerprint(F.col(text_col)))
            .groupBy("_fp")
            .agg(F.min(id_col).alias(id_col), F.count("*").alias("dup_count"))
            .select(id_col, "dup_count"))


def _word_ngrams_pandas(n: int):
    """Arrow-batched n-gram kernel. The builtin route (transform() over a
    sequence with element_at concats) runs INTERPRETED — higher-order
    lambdas are CodegenFallback — and measured ~8s for the sf0.1 corpus's
    260k grams in an interleaved A/B; this kernel runs the same corpus in
    ~0.6s warm (13x). Semantics replicate Spark's
    split(lower(trim(text)), '\\W+') exactly: re.ASCII matches Java's
    ASCII-classed \\W, empty tokens are KEPT (Spark split keeps them), and
    dict.fromkeys preserves array_distinct's first-seen order."""
    import re as _re

    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _grams(s):
        out = []
        for t in s:
            tk = _re.split(r"\W+", t.strip().lower(), flags=_re.ASCII)
            out.append(list(dict.fromkeys(
                " ".join(tk[i:i + n]) for i in range(max(0, len(tk) - n + 1)))))
        return pd.Series(out)
    # lambda-style registration: `from __future__ import annotations` turns
    # hints into strings pandas_udf can't resolve
    return pandas_udf(_grams, "array<string>")


def _grams_df(docs: DataFrame, text_col: str, id_col: str, n: int,
              out: str) -> DataFrame:
    """(id, distinct word-n-gram array)."""
    return docs.select(F.col(id_col),
                       _word_ngrams_pandas(n)(F.col(text_col)).alias(out))


def shingle_df(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id",
               n: int = 3) -> DataFrame:
    """doc -> distinct word-n-gram shingles hashed to int64 (xxhash64)."""
    return (_grams_df(docs, text_col, id_col, n, "_gs")
            .select(F.col(id_col), F.explode("_gs").alias("_g"))
            .select(id_col, F.xxhash64("_g").alias("shingle")))


def minhash_signatures(docs: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id", n: int = 3) -> DataFrame:
    """64 minhash values per doc as columns mh_0..mh_63; single shuffle with
    64 map-side-combinable min() aggregates (no Python UDF).

    NOTE a "shuffle-free" variant (array_min over 64 per-row transform()s)
    was tried and REVERTED: higher-order-function lambdas evaluate
    interpreted (not whole-stage-codegen'd), measuring ~5x slower than this
    fully-codegen'd explode+groupBy at sf0.1 (10s vs 2s warm) and no faster
    at 500k docs. The exploded shuffle also buys exchange reuse: both sides
    of the downstream LSH self-join read the same shuffled aggregate."""
    sh = shingle_df(docs, text_col, id_col, n)
    aggs = []
    reduced = F.pmod(F.col("shingle"), F.lit(_P))
    for i in range(_N_HASHES):
        a, b = _perm_params(i)
        h = F.pmod(reduced * F.lit(a) + F.lit(b), F.lit(_P))
        aggs.append(F.min(h).alias(f"mh_{i}"))
    return sh.groupBy(id_col).agg(*aggs)


def minhash_lsh_pairs(docs: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id", threshold: float = 0.7,
                      n: int = 3) -> DataFrame:
    """Near-duplicate pairs (id_a < id_b, jaccard >= threshold).

    banded-LSH candidate generation + exact shingle-set verification.
    """
    sigs = minhash_signatures(docs, text_col, id_col, n)
    band_cols = []
    for b in range(_BANDS):
        cols = [F.col(f"mh_{b * _ROWS_PER_BAND + r}") for r in range(_ROWS_PER_BAND)]
        band_cols.append(F.struct(F.lit(b).alias("band"),
                                  F.xxhash64(*cols).alias("sig")))
    buckets = (sigs.select(F.col(id_col), F.explode(F.array(*band_cols)).alias("bk"))
               .select(id_col, F.col("bk.band").alias("band"), F.col("bk.sig").alias("sig")))
    left = buckets.alias("l")
    right = buckets.alias("r")
    cands = (left.join(right, on=["band", "sig"])
             .where(F.col(f"l.{id_col}") < F.col(f"r.{id_col}"))
             .select(F.col(f"l.{id_col}").alias("id_a"),
                     F.col(f"r.{id_col}").alias("id_b"))
             .dropDuplicates())
    grams = _grams_df(docs, text_col, id_col, n, "grams")
    ga = grams.select(F.col(id_col).alias("id_a"), F.col("grams").alias("g_a"))
    gb = grams.select(F.col(id_col).alias("id_b"), F.col("grams").alias("g_b"))
    verified = (cands.join(ga, "id_a").join(gb, "id_b")
                .withColumn("jaccard", F.round(
                    F.size(F.array_intersect("g_a", "g_b")) /
                    F.size(F.array_union("g_a", "g_b")), 6))
                .where(F.col("jaccard") >= threshold)
                .select("id_a", "id_b", "jaccard"))
    return verified


def _bit_masks():
    # one literal long per bit; bit 63 is long-min in two's complement.
    # built lazily: F.lit needs an active SparkContext (import-time safe).
    return F.array(*[F.lit((1 << b) if b < 63 else -(1 << 63)).cast("long")
                     for b in range(_N_HASHES)])


def simhash_signatures(docs: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id") -> DataFrame:
    """64-bit SimHash per doc (token-hash bit votes), as a signed long.

    SHUFFLE-FREE: per-row `aggregate` over the token-hash array accumulates
    the 64 bit votes (zip_with against per-bit mask literals), replacing the
    older explode -> groupBy(64 conditional sums) shape. Votes depend only on
    the doc's own tokens, so the two are value-identical (verified, 100k docs,
    0 mismatches) — and the token rows never leave their partition. Same
    shuffle-elimination as minhash_signatures; everything stays codegen'd.
    """
    masks = _bit_masks()
    toks = F.filter(F.split(F.lower(F.trim(F.col(text_col))), r"\W+"),
                    lambda t: t != "")
    hashes = F.transform(toks, lambda t: F.xxhash64(t))
    votes = F.aggregate(
        hashes,
        F.array_repeat(F.lit(0).cast("long"), _N_HASHES),
        lambda acc, h: F.zip_with(
            acc,
            F.transform(masks,
                        lambda m: F.when(h.bitwiseAND(m) != 0, F.lit(1).cast("long"))
                                   .otherwise(F.lit(-1).cast("long"))),
            lambda a, v: a + v))
    sig = F.aggregate(
        F.zip_with(votes, masks,
                   lambda v, m: F.when(v > 0, m).otherwise(F.lit(0).cast("long"))),
        F.lit(0).cast("long"), lambda acc, m: acc.bitwiseOR(m))
    # empty-token docs had no rows after the old explode; keep that contract
    return (docs.select(F.col(id_col), F.size(hashes).alias("_n"),
                        sig.alias("simhash"))
            .where(F.col("_n") > 0).select(id_col, "simhash"))


def embedding_cosine_pairs(emb: DataFrame, threshold: float = 0.95,
                           id_col: str = "vec_id",
                           vec_col: str = "embedding") -> DataFrame:
    """Exact embedding near-duplicate pairs (id_a < id_b, cosine >= threshold).

    Brute-force O(n^2) verification kernel, all math in builtin higher-order
    functions — the SQL-expressible oracle twin of embedding_lsh_pairs. Bound
    the input id range before calling at scale; the LSH variant is the
    candidate generator for 100 TB."""
    v = as_double_array(F.col(vec_col))
    a = emb.select(F.col(id_col).alias("id_a"), v.alias("_va"))
    b = emb.select(F.col(id_col).alias("id_b"), v.alias("_vb"))
    return (a.crossJoin(b).where(F.col("id_a") < F.col("id_b"))
            .withColumn("sim", cosine_rounded(F.col("_va"), F.col("_vb")))
            .where(F.col("sim") >= threshold)
            .select("id_a", "id_b", "sim"))


def embedding_lsh_pairs(emb: DataFrame, threshold: float = 0.95,
                        n_tables: int = 12, n_planes: int = 12,
                        id_col: str = "vec_id",
                        vec_col: str = "embedding") -> DataFrame:
    """Embedding near-dup pairs via random-hyperplane LSH banding.

    n_tables independent SRP sign-pattern buckets per vector; candidates are
    pairs sharing a bucket in ANY table (equality join on (table, bucket) —
    the O(n^2) cross join becomes O(sum bucket^2), skew handled by AQE), then
    exact cosine verification.

    12 planes x 12 tables (was 8x6): plane count sets bucket granularity
    (4096 buckets/table — candidate volume per table drops 16x vs 256
    buckets, and the verify join's vector-pair materialization was the
    measured x10 bottleneck), table count restores recall (sim>=0.95 pairs
    disagree per plane w.p. theta/pi ~ 0.1, so one 12-plane table keeps them
    together w.p. ~0.28, twelve tables ~0.98; near-identical fixture copies
    ~1.0). More tables = more bucket rows but candidates stay O(sum
    bucket^2) per table — the scale-governing term."""
    import numpy as np

    from .similarity import _hyperplanes, srp_buckets_batch
    # the (id, vector) projection feeds 5 logical reads (dim probe, both
    # sides of the bucket self-join, both re-rank sides) — eagerly
    # localCheckpoint it so the upstream plan (often a union/transform, not
    # a bare scan) executes exactly once: a bare persist() left the upstream
    # pipeline in the lineage and was measured re-running under the
    # self-join (same pathology fixed in operators/components.py). Blocks
    # spill like MEMORY_AND_DISK; at 100 TB the bucket columns would be
    # precomputed as stored cluster keys anyway (and executor-loss recovery
    # would argue for reliable checkpoint/persist instead).
    base = emb.select(F.col(id_col), as_double_array(F.col(vec_col)).alias("_v"))
    base = base.localCheckpoint()
    first = base.select("_v").first()
    if first is None:
        base.unpersist()
        return embedding_cosine_pairs(emb, threshold, id_col, vec_col)
    dim = len(first[0])
    planes = np.stack([_hyperplanes(dim, n_planes, seed=7 + ti)
                       for ti in range(n_tables)])
    bucket_udf = srp_buckets_batch(planes)
    buckets = (base.select(F.col(id_col), bucket_udf(F.col("_v")).alias("bks"))
               .select(F.col(id_col), F.posexplode("bks").alias("t", "bucket")))
    cands = (buckets.alias("l").join(buckets.alias("r"), on=["t", "bucket"])
             .where(F.col(f"l.{id_col}") < F.col(f"r.{id_col}"))
             .select(F.col(f"l.{id_col}").alias("id_a"),
                     F.col(f"r.{id_col}").alias("id_b"))
             .dropDuplicates())
    va = base.select(F.col(id_col).alias("id_a"), F.col("_v").alias("_va"))
    vb = base.select(F.col(id_col).alias("id_b"), F.col("_v").alias("_vb"))
    return (cands.join(va, "id_a").join(vb, "id_b")
            .withColumn("sim", cosine_rounded(F.col("_va"), F.col("_vb")))
            .where(F.col("sim") >= threshold)
            .select("id_a", "id_b", "sim"))


def ngram_jaccard_pairs(docs: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id", threshold: float = 0.5,
                        n: int = 3, max_id: Optional[int] = None) -> DataFrame:
    """Brute-force word-n-gram Jaccard pairs — the SQL-expressible oracle twin
    of minhash_lsh_pairs. Bound the id domain (max_id) before the cross join;
    at scale this is the verification kernel, not the candidate generator."""
    d = docs
    if max_id is not None:
        d = d.where(F.col(id_col) < max_id)
    grams = _grams_df(d, text_col, id_col, n, "grams")
    a = grams.select(F.col(id_col).alias("id_a"), F.col("grams").alias("g_a"))
    b = grams.select(F.col(id_col).alias("id_b"), F.col("grams").alias("g_b"))
    return (a.crossJoin(b).where(F.col("id_a") < F.col("id_b"))
            .withColumn("jaccard", F.round(
                F.size(F.array_intersect("g_a", "g_b")) /
                F.greatest(F.size(F.array_union("g_a", "g_b")), F.lit(1)), 6))
            .where(F.col("jaccard") >= threshold)
            .select("id_a", "id_b", "jaccard"))
