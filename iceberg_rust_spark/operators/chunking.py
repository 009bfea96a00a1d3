"""Document chunking for training-data pipelines: split each document into
overlapping token-window chunks.

Beyond-reference surface (the reference has no text pipeline), same class as
operators/dedup.py. Everything is builtin Spark expressions — split +
sequence + posexplode + slice — so the whole operator stays in whole-stage
codegen, shuffles nothing, and scales linearly with the corpus: each document
expands to its own chunks inside its partition (one narrow 1->N map, the same
execution shape Spark gives explode).

Chunk math (tokens = whitespace split, consistent with functions/text.py
token_count): with window W and overlap V, stride S = W - V; chunk i covers
tokens [i*S, i*S + W); chunks = 1 + max(0, ceil((n_tokens - W) / S)).
The last chunk may be shorter, never empty; documents shorter than W yield
exactly one chunk. Deterministic — a DuckDB oracle reproduces it in SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def chunk_documents(docs: DataFrame, window: int = 64, overlap: int = 16,
                    id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """(id, chunk_no, chunk_text, n_tokens) — one row per chunk."""
    if not 0 <= overlap < window:
        raise ValueError(f"need 0 <= overlap({overlap}) < window({window})")
    stride = window - overlap
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    n = F.size(toks)
    n_chunks = (F.lit(1) + F.greatest(
        F.lit(0), F.ceil((n - F.lit(window)) / F.lit(stride)))).cast("int")
    d = (docs.select(F.col(id_col), toks.alias("_toks"), n.alias("_n"),
                     n_chunks.alias("_nc"))
         .where(F.col("_n") > 0)
         .select(F.col(id_col), "_toks", "_n",
                 F.posexplode(F.sequence(F.lit(0), F.col("_nc") - 1))
                 .alias("chunk_no", "_i")))
    start = F.col("chunk_no") * stride  # 0-based token offset
    chunk_toks = F.slice(F.col("_toks"), start + 1, window)
    return (d.select(
        F.col(id_col), F.col("chunk_no"),
        F.array_join(chunk_toks, " ").alias("chunk_text"),
        F.least(F.lit(window), F.col("_n") - start).cast("int")
        .alias("n_tokens")))


def sql_chunk_documents(table: str = "documents", window: int = 64,
                        overlap: int = 16, id_col: str = "doc_id",
                        text_col: str = "text") -> str:
    """DuckDB oracle twin of chunk_documents (same math in list functions)."""
    stride = window - overlap
    return f"""
    WITH toks AS (
        SELECT {id_col},
               regexp_split_to_array(trim({text_col}), '\\s+') AS t,
               len(regexp_split_to_array(trim({text_col}), '\\s+')) AS n
        FROM {table}
    ), nc AS (
        SELECT *, CAST(1 + greatest(0, ceil((n - {window}) / {stride}.0)) AS INT) AS n_chunks
        FROM toks WHERE n > 0
    )
    SELECT {id_col},
           CAST(i AS INT) AS chunk_no,
           array_to_string(t[i*{stride} + 1 : i*{stride} + {window}], ' ') AS chunk_text,
           CAST(least({window}, n - i*{stride}) AS INT) AS n_tokens
    FROM nc, UNNEST(range(n_chunks)) AS u(i)
    """


def remove_repeated_spans(docs: DataFrame, sep: str = "\n",
                          text_col: str = "text",
                          id_col: str = "doc_id") -> DataFrame:
    """Intra-document repetition removal: drop duplicate ``sep``-separated
    spans (paragraphs/lines), keeping each span's FIRST occurrence in
    order — the standard boilerplate/repeated-paragraph cleanup in
    training-data pipelines.

    All builtins: split -> posexplode -> per-(doc, span) min position ->
    order-preserving reassembly via array_sort over (pos, span) structs.
    One shuffle on (doc_id, span) + one on doc_id; no Python."""
    spans = (docs.select(F.col(id_col),
                         F.posexplode(F.split(F.col(text_col), sep))
                         .alias("pos", "span")))
    firsts = (spans.groupBy(id_col, "span")
              .agg(F.min("pos").alias("first_pos"),
                   F.count(F.lit(1)).alias("n_occ")))
    return (firsts.groupBy(id_col)
            .agg(F.array_join(
                     F.transform(
                         F.array_sort(F.collect_list(
                             F.struct(F.col("first_pos"), F.col("span")))),
                         lambda s: s["span"]),
                     sep).alias("cleaned_text"),
                 (F.sum("n_occ") - F.count(F.lit(1))).cast("long")
                 .alias("n_removed")))


def sql_remove_repeated_spans(table: str = "documents", sep: str = "\n",
                              id_col: str = "doc_id",
                              text_col: str = "text") -> str:
    """DuckDB oracle twin: zipped unnest(list, subscripts) gives (span,
    pos); min(pos) per span; ordered string_agg rebuilds the text."""
    esc = sep.replace("\\", "\\\\").replace("'", "''")
    return f"""
    WITH spans AS (
        SELECT {id_col},
               unnest(string_split({text_col}, '{esc}')) AS span,
               unnest(range(1, len(string_split({text_col}, '{esc}')) + 1))
                   AS pos
        FROM {table}
    ), firsts AS (
        SELECT {id_col}, span, min(pos) AS first_pos,
               count(*) AS n_occ
        FROM spans GROUP BY {id_col}, span
    )
    SELECT {id_col},
           string_agg(span, '{esc}' ORDER BY first_pos) AS cleaned_text,
           CAST(sum(n_occ) - count(*) AS BIGINT) AS n_removed
    FROM firsts GROUP BY {id_col}
    """


def remove_frequent_lines(docs: DataFrame, min_docs: int = 5,
                          sep: str = "\n", text_col: str = "text",
                          id_col: str = "doc_id") -> DataFrame:
    """CORPUS-level boilerplate removal (the C4/CCNet line-dedup rule):
    drop every line that occurs in >= ``min_docs`` DISTINCT documents,
    keeping remaining lines in order. Complements remove_repeated_spans
    (intra-document) — this one needs corpus-global line frequencies.

    Scale shape: explode -> one map-side-combinable shuffle on line for
    the distinct-doc counts; the >=min_docs survivors are heavy hitters
    (a SMALL set by construction) so the removal join is a broadcast
    left_anti — the 100 TB line stream is never shuffled a second time;
    reassembly is one shuffle on doc_id. Returns every input doc (docs
    that were pure boilerplate come back with empty cleaned text).
    """
    lines = (docs.select(F.col(id_col),
                         F.posexplode(F.split(F.col(text_col), sep))
                         .alias("pos", "line")))
    frequent = (lines.groupBy("line")
                .agg(F.countDistinct(id_col).alias("n_docs"))
                .filter(F.col("n_docs") >= min_docs)
                .select("line", F.lit(True).alias("__freq")))
    # broadcast LEFT join flags frequent lines in place, so ONE groupBy on
    # doc_id rebuilds text and counts both kept and dropped (collect_list
    # skips the NULL entries the when() leaves for dropped lines) — 2
    # shuffles total instead of count/rebuild/total/join = 4
    flagged = lines.join(F.broadcast(frequent), "line", "left")
    return (flagged.groupBy(id_col)
            .agg(F.array_join(
                     F.transform(
                         F.array_sort(F.collect_list(
                             F.when(F.col("__freq").isNull(),
                                    F.struct(F.col("pos"), F.col("line"))))),
                         lambda s: s["line"]),
                     sep).alias("cleaned_text"),
                 F.sum(F.when(F.col("__freq").isNull(), 1).otherwise(0))
                 .cast("long").alias("n_lines_kept"),
                 F.sum(F.when(F.col("__freq").isNotNull(), 1).otherwise(0))
                 .cast("long").alias("n_lines_dropped")))


def sql_remove_frequent_lines(table: str = "documents", min_docs: int = 5,
                              sep: str = "\n", id_col: str = "doc_id",
                              text_col: str = "text") -> str:
    esc = sep.replace("\\", "\\\\").replace("'", "''")
    return f"""
    WITH lines AS (
        SELECT {id_col},
               unnest(string_split({text_col}, '{esc}')) AS line,
               unnest(range(1, len(string_split({text_col}, '{esc}')) + 1))
                   AS pos
        FROM {table}
    ), frequent AS (
        SELECT line FROM lines
        GROUP BY line HAVING count(DISTINCT {id_col}) >= {min_docs}
    ), kept AS (
        SELECT * FROM lines WHERE line NOT IN (SELECT line FROM frequent)
    ), rebuilt AS (
        SELECT {id_col},
               string_agg(line, '{esc}' ORDER BY pos) AS cleaned_text,
               count(*) AS n_lines_kept
        FROM kept GROUP BY {id_col}
    ), totals AS (
        SELECT {id_col}, count(*) AS n_lines_total
        FROM lines GROUP BY {id_col}
    )
    SELECT t.{id_col} AS {id_col},
           coalesce(r.cleaned_text, '') AS cleaned_text,
           CAST(coalesce(r.n_lines_kept, 0) AS BIGINT) AS n_lines_kept,
           CAST(t.n_lines_total - coalesce(r.n_lines_kept, 0) AS BIGINT)
               AS n_lines_dropped
    FROM totals t LEFT JOIN rebuilt r ON t.{id_col} = r.{id_col}
    """


def dedup_paragraphs_global(docs: DataFrame, sep: str = "\n",
                            min_chars: int = 16,
                            text_col: str = "text",
                            id_col: str = "doc_id") -> DataFrame:
    """CORPUS-wide exact paragraph dedup: every ``sep``-separated span that
    appears anywhere else in the corpus keeps only its FIRST occurrence
    (ordered by (doc_id, position)); later copies are dropped and each
    document is reassembled from its surviving spans. This is the
    paragraph-level exact-dedup step of large-scale training-data
    pipelines, complementing remove_frequent_lines (which drops only
    heavy-hitter boilerplate) — here even a paragraph duplicated twice
    loses its second copy.

    Spans shorter than ``min_chars`` characters (blank lines, separators,
    list bullets) are exempt — deduping those would delete almost all
    document structure for no dedup value.

    Scale shape: explode -> ONE map-side-combinable min-aggregate keyed on
    the span (the winner per distinct paragraph), then a semi-join of the
    span stream against the winners on the same key — Catalyst reuses the
    hash exchange, so the corpus-sized stream shuffles ONCE on span and
    once more on doc_id for reassembly. min(struct) beats a row_number
    window here: hot paragraphs (the whole point of dedup) would pile
    into one window partition, while partial min folds them map-side.
    Returns every input doc; all-duplicate docs come back empty.
    """
    lines = docs.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), sep)).alias("pos", "para"))
    dedupable = lines.filter(F.length("para") >= min_chars)
    winners = (dedupable.groupBy("para")
               .agg(F.min(F.struct(F.col(id_col), F.col("pos")))
                    .alias("w"))
               .select("para", F.col(f"w.{id_col}").alias("__wid"),
                       F.col("w.pos").alias("__wpos")))
    # keep/drop decided IN PLACE on the left-joined stream and totals
    # folded into the SAME reassembly aggregate (r14, guide §2.4): the
    # former kept-filter + separate totals aggregate + outer join
    # referenced `lines` THREE times, and Catalyst duplicates each
    # reference — the corpus was scanned and re-exploded three times
    # (runtime-verified: 3 parquet scans / 3 Generates, 0 ReusedExchange).
    # collect_list skips the NULLs the when() leaves for dropped spans
    # (the remove_frequent_lines trick), count(*) is the per-doc total,
    # and every doc survives because no row is filtered before the
    # groupBy — so the outer join and its exchange disappear with the
    # third pass.
    keep = ((F.length("para") < min_chars)
            | ((F.col(id_col) == F.col("__wid"))
               & (F.col("pos") == F.col("__wpos"))))
    flagged = lines.join(winners, "para", "left")
    return (flagged.groupBy(id_col)
            .agg(F.array_join(
                     F.transform(
                         F.array_sort(F.collect_list(
                             F.when(keep,
                                    F.struct(F.col("pos"), F.col("para"))))),
                         lambda s: s["para"]),
                     sep).alias("cleaned_text"),
                 F.sum(F.when(keep, 1).otherwise(0))
                 .cast("long").alias("n_paras_kept"),
                 F.sum(F.when(keep, 0).otherwise(1))
                 .cast("long").alias("n_paras_dropped")))


def sql_dedup_paragraphs_global(table: str = "documents", sep: str = "\n",
                                min_chars: int = 16, id_col: str = "doc_id",
                                text_col: str = "text") -> str:
    esc = sep.replace("\\", "\\\\").replace("'", "''")
    return f"""
    WITH lines AS (
        SELECT {id_col},
               unnest(string_split({text_col}, '{esc}')) AS para,
               unnest(range(1, len(string_split({text_col}, '{esc}')) + 1))
                   AS pos
        FROM {table}
    ), ranked AS (
        SELECT {id_col}, pos, para,
               CASE WHEN length(para) < {min_chars} THEN 1
                    ELSE row_number() OVER (PARTITION BY para
                                            ORDER BY {id_col}, pos)
               END AS rk
        FROM lines
    ), kept AS (
        SELECT * FROM ranked WHERE rk = 1
    ), rebuilt AS (
        SELECT {id_col},
               string_agg(para, '{esc}' ORDER BY pos) AS cleaned_text,
               count(*) AS n_paras_kept
        FROM kept GROUP BY {id_col}
    ), totals AS (
        SELECT {id_col}, count(*) AS n_total FROM lines GROUP BY {id_col}
    )
    SELECT t.{id_col} AS {id_col},
           coalesce(r.cleaned_text, '') AS cleaned_text,
           CAST(coalesce(r.n_paras_kept, 0) AS BIGINT) AS n_paras_kept,
           CAST(t.n_total - coalesce(r.n_paras_kept, 0) AS BIGINT)
               AS n_paras_dropped
    FROM totals t LEFT JOIN rebuilt r ON t.{id_col} = r.{id_col}
    """


def _window_hash64_pandas(k: int):
    """Arrow kernel: text -> array<long> of 64-bit k-token-window hashes
    (null when the doc has < k tokens). Tokenization replicates
    ``split(text, ' ')`` exactly (empty tokens kept). Each distinct token
    in the batch is hashed once — murmur3_x86_32 under two seeds packed to
    64 bits — and window hashes are a degree-k polynomial combine, so the
    kernel is k vectorized passes regardless of document count."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    from ..functions.murmur3 import murmur3_32_bytes_vec

    B = np.uint64(0x9E3779B97F4A7C15)   # odd golden-ratio multiplier

    def _wh(texts):
        # null text -> no tokens -> null output row (the builtin split()
        # path it replaced propagated null the same way)
        toks_all = [t.split(" ") if isinstance(t, str) else [] for t in texts]
        flat = [w for tk in toks_all for w in tk]
        out = [None] * len(toks_all)
        if flat:
            # hash the VOCABULARY, not the occurrence stream: factorize
            # maps each occurrence to its first-seen unique (C-speed hash
            # table), and natural text repeats tokens ~30x, so the two
            # murmur passes run over thousands of uniques instead of
            # hundreds of thousands of occurrences
            codes, uniq = pd.factorize(pd.Series(flat, dtype="object"))
            ub = [u.encode("utf-8") for u in uniq]
            h1 = murmur3_32_bytes_vec(ub).view(np.uint32).astype(np.uint64)
            h2 = (murmur3_32_bytes_vec(ub, seed=0x85EBCA6B)
                  .view(np.uint32).astype(np.uint64))
            th = ((h1 << np.uint64(32)) | h2)[codes]
            pos = 0
            for i, tk in enumerate(toks_all):
                n = len(tk)
                ht = th[pos:pos + n]
                pos += n
                if n < k:
                    continue
                acc = ht[:n - k + 1].copy()
                for j in range(1, k):
                    acc = acc * B + ht[j:n - k + 1 + j]
                out[i] = acc.astype(np.int64)
        return pd.Series(out)

    return pandas_udf(_wh, "array<long>")


def repeated_window_stats(docs: DataFrame, k: int = 8,
                          min_repeats: int = 2,
                          text_col: str = "text",
                          id_col: str = "doc_id") -> DataFrame:
    """Corpus-global EXACT-SUBSTRING duplication detection — the
    k-token-window reformulation of suffix-array exact-substring dedup
    (RefinedWeb/Gopher): every k-token window is keyed by its exact text,
    and windows whose corpus-wide frequency reaches ``min_repeats`` mark
    duplicated substrings. Returns per-doc (n_windows, n_dup_windows) for
    docs with at least one window (>= k tokens).

    Scale shape: windows explode 1->n_tokens per doc (inherent to the
    algorithm — the same stream a suffix array would index), but only an
    8-byte hash of each window ever leaves the scan stage, so the one
    map-side-combinable frequency shuffle and the count-back join move
    ~5x fewer bytes than shuffling k-token strings (at 100 TB the string
    shuffle spills; the hash shuffle doesn't). A 64-bit collision
    mis-counting a window needs two distinct windows sharing a hash —
    ~n^2/2^64, negligible at any corpus size this design targets.

    Window hashes come from an Arrow kernel (r9): each TOKEN is hashed
    once (vectorized murmur3, two seeds -> 64 bits), and the k-token
    window hash is a polynomial combine of the token hashes — k numpy
    passes over the whole batch. The former builtin shape (explode a
    transform() of xxhash64 over concat_ws slices) re-materialized every
    window string and ran INTERPRETED (higher-order lambdas are
    CodegenFallback), measuring ~3x the whole query's wall at sf0.1.
    Tokens are space-free by construction (split on ' '), so the join
    string is a bijection of the token sequence and token-level hashing
    is faithful to string equality."""
    # persist: the frequency aggregate AND the count-back join both consume
    # the window stream, and their exchanges differ (partial-agg vs raw),
    # so without it the Arrow kernel runs once per side (same pattern as
    # the grams persist in minhash_lsh_pairs)
    wins = (docs.select(F.col(id_col),
                        _window_hash64_pandas(k)(F.col(text_col)).alias("ws"))
            .where(F.col("ws").isNotNull())
            .select(F.col(id_col), F.explode("ws").alias("w"))).persist()
    freq = wins.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    return (wins.join(freq, "w")
            .groupBy(id_col)
            .agg(F.count(F.lit(1)).cast("long").alias("n_windows"),
                 F.sum(F.when(F.col("c") >= min_repeats, 1).otherwise(0))
                 .cast("long").alias("n_dup_windows")))


def sql_repeated_window_stats(table: str = "documents", k: int = 8,
                              min_repeats: int = 2,
                              id_col: str = "doc_id",
                              text_col: str = "text") -> str:
    """DuckDB oracle twin: 1-based inclusive list slices rebuild the same
    exact window strings."""
    return f"""
    WITH toks AS (
        SELECT {id_col}, string_split({text_col}, ' ') AS t FROM {table}
    ), eligible AS (
        SELECT {id_col}, t, len(t) AS n FROM toks WHERE len(t) >= {k}
    ), wins AS (
        SELECT {id_col},
               array_to_string(t[i : i + {k} - 1], ' ') AS w
        FROM eligible, UNNEST(range(1, n - {k} + 2)) AS u(i)
    ), freq AS (
        SELECT w, count(*) AS c FROM wins GROUP BY w
    )
    SELECT {id_col},
           CAST(count(*) AS BIGINT) AS n_windows,
           CAST(sum(CASE WHEN c >= {min_repeats} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_dup_windows
    FROM wins JOIN freq USING (w)
    GROUP BY {id_col}
    """
