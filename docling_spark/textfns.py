"""Text analysis column functions over the ``documents`` table.

Everything here is built from JVM-side ``pyspark.sql.functions`` (no Python
UDFs) so the expressions participate in whole-stage codegen and push down
to the scan. Each has an ANSI-SQL twin in ``__spark_entry__.oracle_sql``
(DuckDB-checkable) - keep both in sync.

Mirrors the reference's text-quality heuristics (garbage-text scoring in
``/root/reference/docling/models/stages/page_preprocessing/page_preprocessing_model.py:126-151``)
re-expressed as fleet-scale columns rather than per-page scores.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# Tiny embedded stopword lists - deterministic language-ID heuristic.
STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "was", "for"],
    "de": ["der", "die", "das", "und", "ist", "von", "nicht", "mit", "ein", "zu"],
    "fr": ["le", "la", "les", "et", "est", "des", "une", "dans", "que", "pour"],
    "es": ["el", "la", "los", "las", "es", "una", "del", "por", "con", "para"],
}


def token_count(col="text") -> Column:
    """Whitespace token count; empty/null-safe."""
    t = F.trim(F.col(col))
    return F.when(t == "", 0).otherwise(F.size(F.split(t, r"\s+")))


def char_count(col="text") -> Column:
    return F.length(F.col(col))


def avg_token_len(col="text") -> Column:
    return (F.length(F.regexp_replace(F.col(col), r"\s+", ""))
            / F.greatest(token_count(col), F.lit(1)))


def punct_ratio(col="text") -> Column:
    """Punctuation chars / total chars (0 for empty)."""
    total = F.length(F.col(col))
    punct = total - F.length(F.regexp_replace(F.col(col), r"[!-/:-@\[-`{-~]", ""))
    return F.when(total == 0, 0.0).otherwise(punct / total)


def digit_ratio(col="text") -> Column:
    total = F.length(F.col(col))
    digits = total - F.length(F.regexp_replace(F.col(col), r"[0-9]", ""))
    return F.when(total == 0, 0.0).otherwise(digits / total)


def uppercase_ratio(col="text") -> Column:
    total = F.length(F.col(col))
    uppers = total - F.length(F.regexp_replace(F.col(col), r"[A-Z]", ""))
    return F.when(total == 0, 0.0).otherwise(uppers / total)


def _word_tokens(col="text") -> Column:
    """Maximal \\w-runs of the lowercased text (equivalent to word-boundary
    matching for ASCII stopwords)."""
    return F.split(F.lower(F.col(col)), r"[^0-9a-z_]+")


def stopword_hits(col="text", lang: str = "en") -> Column:
    """Count of stopword occurrences (word-boundary matched, lowercase).

    One split + one array filter instead of 10 regexp_replace passes:
    identical counts (a stopword occurrence as a maximal word-run is
    exactly a \\b-delimited match), but the generated code stays inside
    the 64KB whole-stage-codegen budget even when four languages are
    combined in one projection (the old form tripped janino's fallback).
    """
    words = _word_tokens(col)
    return F.size(
        F.filter(words, lambda w: w.isin(*STOPWORDS[lang]))).cast("long")


def quality_score(col="text") -> Column:
    """Composite [0,1] quality score: length, punctuation sanity, stopword
    presence - a web-text quality prior in the C4/Gopher style, built from
    pure column algebra."""
    tc = token_count(col)
    length_ok = F.when(tc.between(10, 100000), 1.0).otherwise(
        F.when(tc > 0, 0.3).otherwise(0.0))
    punct_ok = F.when(punct_ratio(col) < 0.3, 1.0).otherwise(0.2)
    stop_ok = F.when(stopword_hits(col) > 0, 1.0).otherwise(0.4)
    atl = avg_token_len(col)
    token_ok = F.when(atl.between(2.0, 12.0), 1.0).otherwise(0.3)
    return (0.3 * length_ok + 0.25 * punct_ok + 0.25 * stop_ok
            + 0.2 * token_ok)


def lang_guess(col="text") -> Column:
    """Pick the language whose stopword hit count is highest (ties -> first
    in en/de/fr/es order); 'und' when nothing matches."""
    hits = [(lang, stopword_hits(col, lang)) for lang in STOPWORDS]
    best_lang = F.lit("und")
    best_hits = F.lit(0).cast("long")
    # forward order with strict '>' - a later language must strictly beat
    # the running best, so on ties the earlier language (en first) wins,
    # matching the oracle's CASE ... WHEN h_en = GREATEST(...) ordering
    for lang, h in hits:
        cond = h > best_hits
        best_lang = F.when(cond, F.lit(lang)).otherwise(best_lang)
        best_hits = F.when(cond, h).otherwise(best_hits)
    return best_lang


def fingerprint(col="text") -> Column:
    """Document fingerprint: md5 of the whitespace/case-normalized text
    (md5 exists in both Spark and DuckDB, so the oracle can recompute it)."""
    normalized = F.lower(F.regexp_replace(F.trim(F.col(col)), r"\s+", " "))
    return F.md5(normalized)


def doc_stats(documents: DataFrame) -> DataFrame:
    """The headline text-analysis projection over documents."""
    return documents.select(
        "doc_id",
        "lang",
        token_count("text").alias("n_tokens"),
        char_count("text").alias("n_chars2"),
        F.round(punct_ratio("text"), 6).alias("punct_ratio"),
        F.round(digit_ratio("text"), 6).alias("digit_ratio"),
        fingerprint("text").alias("fingerprint"),
    )


def doc_fingerprints(documents, window: int = 8, stride: int = 4,
                     k: int = 8):
    """Rolling-hash document fingerprint sketch (winnowing-style).

    md5 over every ``stride``-th ``window``-char slice of the normalized
    text; the sketch keeps the ``k`` lexicographically smallest distinct
    hashes (a deterministic min-sketch: near-identical docs share most
    sketch entries). Pure column algebra - the transform/sequence runs
    JVM-side, no Python in the hot path.

    Output: (doc_id, sketch csv, n_chars).
    """
    from pyspark.sql import functions as F
    s = F.lower(F.regexp_replace(F.trim(F.col("text")), r"\s+", " "))
    d = documents.withColumn("_s", s)
    hashes = F.expr(
        f"array_distinct(transform("
        f"  sequence(1, greatest(length(_s) - {window - 1}, 1), {stride}),"
        f"  i -> md5(substring(_s, i, {window}))))")
    guarded = F.when(F.length("_s") >= window, hashes).otherwise(
        F.expr("array()").cast("array<string>"))
    return (d.select(
        "doc_id",
        F.array_join(F.slice(F.array_sort(guarded), 1, k), ",")
         .alias("sketch"),
        F.length("_s").alias("n_chars")))
