"""Text-analysis column builders — all JVM-side builtin expressions.

Beyond-reference surface (SURVEY.md §7 Phase 3 / driver north star): language
ID, quality scoring, token counting, fingerprinting for large-scale training-
data pipelines. Every function returns a ``pyspark.sql.Column`` composed of
builtin functions only (whole-stage codegen, no Python in the hot path), and
each has an exact ANSI-SQL twin used by the DuckDB oracle in
``__spark_entry__.py`` — the two must stay in lockstep.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# stopword packs for the n-gram language heuristic; \b works in both Java
# regex (Spark) and RE2 (DuckDB)
LANG_MARKERS = {
    "en": r"\b(the|and|of|to|is|was|that)\b",
    "de": r"\b(der|die|das|und|ist|nicht|ein)\b",
    "es": r"\b(el|la|los|las|que|por|una)\b",
    "fr": r"\b(le|la|les|des|est|une|dans)\b",
}

PUNCT_CLASS = r"[.,!?;:]"
WORD_SPLIT = r"\s+"
NORM_STRIP = r"[^a-z0-9 ]"

# GPT-2-pre-tokenizer-shaped pattern, restricted to constructs that behave
# identically in Java regex (Spark) and RE2 (DuckDB): contractions, letter
# runs, digit runs, symbol runs — each optionally preceded by one space.
# Alternation order matters ('s before the letter-run branch).
BPE_PATTERN = r"'s|'t|'re|'ve|'m|'ll|'d| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+"


def token_count(text: Column) -> Column:
    """Whitespace token count (empty string counts 1, same as the oracle)."""
    return F.size(F.split(F.trim(text), WORD_SPLIT))


def bpe_token_count(text: Column) -> Column:
    """BPE-ish token count: number of GPT-2-style pre-tokenizer pieces.

    A cheap, deterministic proxy for LLM token budgeting over 100 TB of text —
    one builtin regexp per row, whole-stage codegen, no Python."""
    return F.size(F.regexp_extract_all(text, F.lit(BPE_PATTERN), F.lit(0)))


def char_count(text: Column) -> Column:
    return F.length(text)


def punct_count(text: Column) -> Column:
    return F.length(text) - F.length(F.regexp_replace(text, PUNCT_CLASS, ""))


def punct_ratio(text: Column) -> Column:
    return F.round(punct_count(text) / F.greatest(F.length(text), F.lit(1)), 6)


def marker_hits(text: Column, lang: str) -> Column:
    """Count of language-marker stopwords for ``lang``."""
    return F.size(F.regexp_extract_all(F.lower(text), F.lit(LANG_MARKERS[lang]), F.lit(0)))


def lang_guess(text: Column) -> Column:
    """Argmax over marker hits, ties broken by fixed language order
    (en > de > es > fr), 'und' (undetermined) when no marker hits at all."""
    en, de, es, fr = (marker_hits(text, l) for l in ("en", "de", "es", "fr"))
    best = F.greatest(en, de, es, fr)
    return (F.when(best == 0, F.lit("und"))
             .when(en == best, F.lit("en"))
             .when(de == best, F.lit("de"))
             .when(es == best, F.lit("es"))
             .otherwise(F.lit("fr")))


def avg_word_len(text: Column) -> Column:
    """Mean token length = len(text without whitespace) / token count."""
    squeezed = F.length(F.regexp_replace(text, WORD_SPLIT, ""))
    return F.round(squeezed / F.greatest(token_count(text), F.lit(1)), 6)


def stopword_ratio(text: Column) -> Column:
    return F.round(marker_hits(text, "en") / F.greatest(token_count(text), F.lit(1)), 6)


def quality_score(text: Column) -> Column:
    """Composite [0,1]-ish quality score: favors mid-length docs with low
    punctuation density and some stopword mass (heuristic, but the SAME
    heuristic as the oracle SQL)."""
    n_tok = token_count(text)
    len_score = F.least(n_tok / F.lit(100.0), F.lit(1.0))
    return F.round(len_score * (F.lit(1.0) - punct_ratio(text))
                   * F.least(F.lit(1.0), stopword_ratio(text) * F.lit(5.0)), 6)


def normalized_text(text: Column) -> Column:
    """lower -> strip non-alnum -> collapse whitespace -> trim."""
    t = F.lower(text)
    t = F.regexp_replace(t, NORM_STRIP, "")
    t = F.regexp_replace(t, WORD_SPLIT, " ")
    return F.trim(t)


def fingerprint(text: Column) -> Column:
    """Deterministic document fingerprint: md5 of the normalized text."""
    return F.md5(F.encode(normalized_text(text), "UTF-8"))


def alpha_tokens(text: Column) -> Column:
    """All lowercase alpha tokens (non-distinct) — TF tokenizer."""
    return F.filter(F.split(F.lower(text), "[^a-z]+"), lambda t: t != "")


def ngram_tokens(text: Column) -> Column:
    """The token array word_ngrams shingles over. MATERIALIZE this in its
    own projection before calling word_ngrams_from_tokens: higher-order
    transform() lambdas run interpreted (no codegen, no common-subexpression
    elimination), so a split() referenced inline from the lambda re-runs the
    regex once per element_at — measured 16x slower (11.3s vs 0.7s for the
    sf0.1 corpus shingle count)."""
    return F.split(F.lower(F.trim(text)), r"\W+")


def word_ngrams_from_tokens(toks: Column, n: int = 3) -> Column:
    """Distinct word n-grams from an already-computed token array column
    (1-based element_at to mirror DuckDB list indexing in the oracle)."""
    # guard: sequence(1, 0) would generate a DESCENDING sequence in Spark
    idx = F.when(F.size(toks) >= n,
                 F.sequence(F.lit(1), F.size(toks) - F.lit(n - 1))
                 ).otherwise(F.expr("array()").cast("array<int>"))
    grams = F.transform(idx, lambda i: F.concat_ws(
        " ", *[F.element_at(toks, (i + F.lit(k)).cast("int")) for k in range(n)]))
    return F.array_distinct(grams)


def word_ngrams(text: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles as array<string>. Prefer the two-step
    ngram_tokens -> word_ngrams_from_tokens split across projections in hot
    paths (see ngram_tokens); this one-shot form is for small inputs."""
    return word_ngrams_from_tokens(ngram_tokens(text), n)


# ---- ANSI-SQL twins (DuckDB dialect) — keep in lockstep with the above ----

def sql_token_count(col: str) -> str:
    return f"len(string_split_regex(trim({col}), '\\s+'))"


def sql_bpe_token_count(col: str) -> str:
    pat = BPE_PATTERN.replace("'", "''")
    return f"len(regexp_extract_all({col}, '{pat}'))"


def sql_marker_hits(col: str, lang: str) -> str:
    pat = LANG_MARKERS[lang].replace("\\", "\\")
    return f"len(regexp_extract_all(lower({col}), '{pat}'))"


def sql_lang_guess(col: str) -> str:
    hits = {l: sql_marker_hits(col, l) for l in ("en", "de", "es", "fr")}
    best = f"greatest({hits['en']}, {hits['de']}, {hits['es']}, {hits['fr']})"
    return (f"CASE WHEN {best} = 0 THEN 'und' "
            f"WHEN {hits['en']} = {best} THEN 'en' "
            f"WHEN {hits['de']} = {best} THEN 'de' "
            f"WHEN {hits['es']} = {best} THEN 'es' ELSE 'fr' END")


def sql_punct_ratio(col: str) -> str:
    pc = f"(length({col}) - length(regexp_replace({col}, '[.,!?;:]', '', 'g')))"
    return f"round({pc} / greatest(length({col}), 1), 6)"


def sql_avg_word_len(col: str) -> str:
    sq = f"length(regexp_replace({col}, '\\s+', '', 'g'))"
    return f"round({sq} / greatest({sql_token_count(col)}, 1), 6)"


def sql_stopword_ratio(col: str) -> str:
    return f"round({sql_marker_hits(col, 'en')} / greatest({sql_token_count(col)}, 1), 6)"


def sql_quality_score(col: str) -> str:
    len_score = f"least({sql_token_count(col)} / 100.0, 1.0)"
    return (f"round({len_score} * (1.0 - {sql_punct_ratio(col)}) * "
            f"least(1.0, {sql_stopword_ratio(col)} * 5.0), 6)")


def sql_normalized_text(col: str) -> str:
    return (f"trim(regexp_replace(regexp_replace(lower({col}), "
            f"'[^a-z0-9 ]', '', 'g'), '\\s+', ' ', 'g'))")


def sql_fingerprint(col: str) -> str:
    return f"md5({sql_normalized_text(col)})"


def sql_tokens(col: str) -> str:
    """Token-list expression; alias it (e.g. ``AS t``) in a CTE, then build
    grams with :func:`sql_word_ngrams_over`."""
    return f"string_split_regex(lower(trim({col})), '\\W+')"


def sql_alpha_tokens(col: str) -> str:
    return (f"list_filter(string_split_regex(lower({col}), '[^a-z]+'), "
            f"t -> t <> '')")


def sql_word_ngrams_over(t: str, n: int = 3) -> str:
    """Distinct word n-grams over a token-list column named ``t`` (DuckDB
    lists are 1-based; range() end-exclusive)."""
    parts = " || ' ' || ".join(f"{t}[i+{k}]" for k in range(n))
    return (f"list_distinct(list_transform("
            f"range(1, greatest(len({t}) - {n - 2}, 1)), i -> {parts}))")


# ---- PII scrubbing (training-data redaction) ------------------------------
# Patterns deliberately stay in the Java-regex ∩ RE2 common subset (no
# backslash classes, no backrefs) so the Spark kernel and the DuckDB oracle
# compile the exact same automaton.
PII_EMAIL = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z]{2,}"
PII_PHONE = "[+][0-9]{1,2}[ ][0-9]{3}-[0-9]{3}-[0-9]{4}"
PII_IP = "([0-9]{1,3}[.]){3}[0-9]{1,3}"
_PII_ORDER = ((PII_EMAIL, "<EMAIL>"), (PII_PHONE, "<PHONE>"),
              (PII_IP, "<IP>"))


def materialize_once(c: Column) -> Column:
    """Barrier against Catalyst re-inlining an expensive computed column into
    every consumer. A filter above a projection is pushed below it by
    SUBSTITUTING the alias expression into the predicate — quality_score over
    an aliased scrub_pii chain expanded the 3-regex scrub SEVEN times (once
    per reference inside the score; measured 1.05s -> 0.38s on the sf0.1
    corpus when blocked). ``shuffle(array(c))[1]`` is the identity on a
    1-element array but ``shuffle`` is non-deterministic, which (a) cannot be
    constant-folded (a rand()>-1 wrapper was folded away and re-inlined) and
    (b) legally blocks CollapseProject/PushPredicateThroughNonJoin — the
    guide 4.4 asNondeterministic trick, applied to a builtin chain. Values
    are bit-identical; use ONLY where the consumer re-reads the column many
    times and the column is expensive (regex chains, decoded blobs)."""
    return F.element_at(F.shuffle(F.array(c)), 1)


def scrub_pii(text: Column) -> Column:
    """Replace emails, intl-format phone numbers, and IPv4 addresses with
    typed redaction tokens. Pure regexp_replace chain — JVM-side, codegen'd,
    zero shuffles; order matters (emails first so their dotted hosts are
    gone before the IP pass)."""
    out = text
    for pat, token in _PII_ORDER:
        out = F.regexp_replace(out, pat, token)
    return out


def pii_count(text: Column, pattern: str) -> Column:
    return F.size(F.regexp_extract_all(text, F.lit(pattern), F.lit(0)))


def sql_scrub_pii(col: str) -> str:
    out = col
    for pat, token in _PII_ORDER:
        out = f"regexp_replace({out}, '{pat}', '{token}', 'g')"
    return out


def sql_pii_count(col: str, pattern: str) -> str:
    return f"len(regexp_extract_all({col}, '{pattern}', 0))"
