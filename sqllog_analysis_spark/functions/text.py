"""Text-analysis functions for training-data pipelines — all pure column
expressions (JVM-side, whole-stage codegen; no Python in the hot path).

Each returns a Column so callers can compose them; each has an exact ANSI
SQL mirror used by the DuckDB oracle in __spark_entry__.py.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# A small multilingual stopword set for quality scoring (deterministic,
# mirrored 1:1 in the oracle SQL).
STOPWORDS = ("the", "a", "and", "of", "to", "in", "is", "on", "for", "with")

_WORD_RE = "[^ ]+"


def token_count(col: str = "text") -> Column:
    """Whitespace tokenization count (0 for empty/blank)."""
    trimmed = F.trim(F.col(col))
    return F.when(trimmed == "", 0).otherwise(
        F.size(F.split(trimmed, r"\s+"))
    ).cast("long")


def bpe_ish_token_count(col: str = "text") -> Column:
    """BPE-ish token estimate: count of word-piece matches
    (letters-runs, digit-runs, single punctuation) — a regex proxy for
    subword tokenizers."""
    return F.size(
        F.regexp_extract_all(F.col(col), F.lit(r"([A-Za-z]+|[0-9]+|[^A-Za-z0-9\s])"), F.lit(1))
    ).cast("long")


def punct_ratio(col: str = "text") -> Column:
    """Punctuation chars / total chars (NULL-safe, 0 for empty)."""
    total = F.length(F.col(col))
    punct = total - F.length(F.regexp_replace(F.col(col), r"[^\w\s]", ""))
    return F.when(total > 0, punct.cast("double") / total).otherwise(F.lit(0.0))


def vowel_ratio(col: str = "text") -> Column:
    # r6: translate() is a plain char map — same count as deleting the
    # [aeiou] class with regexp_replace, without the regex engine
    total = F.length(F.col(col))
    vowels = total - F.length(F.translate(F.lower(F.col(col)), "aeiou", ""))
    return F.when(total > 0, vowels.cast("double") / total).otherwise(F.lit(0.0))


def stopword_ratio(col: str = "text") -> Column:
    """Fraction of whitespace tokens that are in STOPWORDS."""
    toks = F.split(F.lower(F.trim(F.col(col))), r"\s+")
    stops = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS)))
    n = F.size(toks)
    return F.when(n > 0, stops.cast("double") / n).otherwise(F.lit(0.0))


def quality_score(col: str = "text") -> Column:
    """Composite quality in [0,1]: long enough, not punct-heavy, has some
    stopwords (prose-likeness).  Deterministic; SQL-mirrorable."""
    n = token_count(col)
    len_score = F.least(n.cast("double") / 100.0, F.lit(1.0))
    punct_pen = F.greatest(F.lit(0.0), F.lit(1.0) - punct_ratio(col) * 4.0)
    stop_score = F.least(stopword_ratio(col) * 5.0, F.lit(1.0))
    return F.round((len_score + punct_pen + stop_score) / 3.0, 6)


def lang_guess(col: str = "text") -> Column:
    """Toy n-gram/char-heuristic language ID (deterministic, mirrored in
    SQL): CJK chars → zh; else by marker-character / vowel-ratio bands.
    Real language ID would plug in here as a pandas UDF; the routing and
    aggregation around it are the engine-level concern."""
    has_cjk = F.col(col).rlike("[一-鿿]")
    vr = vowel_ratio(col)
    return (
        F.when(has_cjk, "zh")
        .when(vr >= 0.42, "fi")
        .when(vr >= 0.38, "es")
        .when(vr >= 0.34, "en")
        .when(vr >= 0.30, "de")
        .otherwise("other")
    )


def fingerprint(col: str = "text") -> Column:
    """Document fingerprint: md5 of case/whitespace-normalized text —
    the exact-dedup key."""
    norm = F.regexp_replace(F.lower(F.trim(F.col(col))), r"\s+", " ")
    return F.md5(norm)


def winnow_fingerprints(
    col: str = "text", k: int = 5, w: int = 4, hash_len: int = 16
) -> Column:
    """Winnowing fingerprints (Schleimer/Wilkerson/Aiken, the MOSS
    rolling-hash scheme): hash every character k-gram of the normalized
    text, then keep the minimum hash of each w-hash window — a
    position-robust fingerprint SET that survives insertions/deletions
    (unlike the whole-document :func:`fingerprint`, which any edit
    changes).

    Entirely narrow column expressions (sequence/transform/slice/
    array_min) — no explode, no shuffle, no Python.  Hashes are hex
    prefixes of md5 compared lexicographically (hex order == numeric
    order), so a foreign SQL engine reproduces them bit-for-bit for the
    driver-contract oracle.  Returns a sorted de-duplicated array of hex
    fingerprints.
    """
    t = F.regexp_replace(F.lower(F.trim(F.col(col))), r"\s+", " ")
    n = F.length(t)
    gram_idx = F.sequence(F.lit(1), F.greatest(n - (k - 1), F.lit(1)))
    grams = F.transform(
        gram_idx,
        lambda i: F.substring(F.md5(F.substring(t, i, k)), 1, hash_len),
    )
    n_g = F.size(grams)
    win_idx = F.sequence(F.lit(1), F.greatest(n_g - (w - 1), F.lit(1)))
    mins = F.transform(
        win_idx, lambda j: F.array_min(F.slice(grams, j, w))
    )
    return F.array_sort(F.array_distinct(mins))
