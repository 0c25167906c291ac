"""Text-analysis functions for training-data pipelines — all pure column
expressions (JVM-side, whole-stage codegen; no Python in the hot path).

Each returns a Column so callers can compose them; each has an exact ANSI
SQL mirror used by the DuckDB oracle in __spark_entry__.py.
"""

from __future__ import annotations

from functools import reduce

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


def bind_once(expr: Column, body) -> Column:
    """Evaluate ``expr`` exactly once per row and pass it to ``body`` as a
    bound lambda variable.

    Interpreted higher-order functions re-evaluate their argument
    expressions on EVERY element visit — ``transform(idx, j ->
    f(heavy_array, j))`` rebuilds ``heavy_array`` per element, turning a
    linear projection quadratic (r6: measured 255 s for winnowing 100
    docs under a noop sink).  Wrapping the heavy expression in a
    one-element array and transforming over it binds the value once;
    every reference inside ``body`` is then an O(1) variable lookup.
    ``element_at(..., 1)`` is ANSI-safe: the array always has exactly one
    element."""
    return F.element_at(F.transform(F.array(expr), body), 1)


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
    zip_with) — no explode, no shuffle, no Python.  Hashes are hex
    prefixes of md5 compared lexicographically (hex order == numeric
    order), so a foreign SQL engine reproduces them bit-for-bit for the
    driver-contract oracle.  Returns a sorted de-duplicated array of hex
    fingerprints.

    r6: the window minima are a :func:`least`-fold over ``w`` shifted
    slices of the ONCE-BOUND gram array instead of per-window
    ``array_min(slice(grams, j, w))`` — the latter re-evaluates the
    whole gram transform (O(n) md5 calls) per window, i.e. O(n²) md5
    work per document.  Equivalence: for window j, least over
    {g[j..j+w-1]} == array_min(slice(g, j, w)); short arrays (n_g < w)
    produce one window over all elements in both forms (missing shifted
    slots arrive as zip_with's null padding, which ``least`` skips).
    """
    # Gram build is O(n·k) over a ONCE-BOUND per-code-point char array.
    # The former ``substring(t, i, k)`` per gram position walks the UTF8
    # byte buffer from the start on every call (code-point indexing), an
    # O(n²) byte scan per document on top of the lambda re-evaluating the
    # O(n) normalization itself — together the build-side twins of the
    # window-minima quadratic.  ``split(t, '')`` yields one element per
    # code point (Java zero-width matches advance by code point, so
    # surrogate pairs stay whole — pinned on an adversarial corpus incl.
    # astral-plane emoji); the ``slice(…, 1, length(t))`` drops the
    # trailing empty element Spark's limit=-1 split keeps, making the
    # array length exactly the code-point count.  Explicit branches
    # reproduce the substring formulation's edges: NULL text → [NULL]
    # (greatest() skips nulls, so the old gram_idx was [1] and the gram
    # NULL), empty text → one md5('') gram.
    def build_grams(t: Column) -> Column:
        def from_chars(ch: Column) -> Column:
            m = F.size(ch)
            gram_idx = F.sequence(F.lit(1), F.greatest(m - (k - 1), F.lit(1)))
            return F.transform(
                gram_idx,
                lambda i: F.substring(
                    F.md5(F.concat_ws("", F.slice(ch, i, k))), 1, hash_len
                ),
            )

        return (
            F.when(t.isNull(), F.array(F.lit(None).cast("string")))
            .when(
                F.length(t) == 0,
                F.array(F.substring(F.md5(F.lit("")), 1, hash_len)),
            )
            .otherwise(
                bind_once(F.slice(F.split(t, ""), 1, F.length(t)), from_chars)
            )
        )

    grams = bind_once(
        F.regexp_replace(F.lower(F.trim(F.col(col))), r"\s+", " "), build_grams
    )

    def mins(g: Column) -> Column:
        n_win = F.greatest(F.size(g) - (w - 1), F.lit(1))
        shifted = [F.slice(g, j + 1, n_win) for j in range(w)]
        folded = reduce(
            lambda a, b: F.zip_with(a, b, lambda x, y: F.least(x, y)), shifted
        )
        return F.array_sort(F.array_distinct(folded))

    return bind_once(grams, mins)
