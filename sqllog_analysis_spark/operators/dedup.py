"""Deduplication operators for large-scale training-data pipelines.

All four variants are shuffle-conscious Spark-native compositions (no
Python UDFs):

- exact:       hash-groupBy on a normalized fingerprint — one shuffle.
- minhash LSH: shingle → 64 minhashes (min over F.hash(shingle, seed)) →
               band buckets → bucket self-join.  The explode/groupBy is the
               classic map-side-combinable shape; candidate pairs are only
               generated within buckets, never all-pairs.
- simhash:     per-bit weighted sign aggregation → 64-bit signature;
               near-dups share signatures (or differ in few bits).
- n-gram Jaccard: exact similarity on LSH candidates (or small inputs).

At 100 TB the only all-to-all structure is the band-bucket shuffle, whose
keys are (band_idx, band_hash) — fine-grained and uniform by construction;
hot buckets (boilerplate docs) are capped with a per-bucket size limit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from sqllog_analysis_spark.functions.text import fingerprint


def exact_dedup(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Keep the min-id representative per normalized-text fingerprint.
    Returns (fp, keep_id, dup_count)."""
    return (
        df.select(F.col(id_col), fingerprint(text_col).alias("fp"))
        .groupBy("fp")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count("*").alias("dup_count"),
        )
    )


def _shingles(text_col: str, k: int) -> F.Column:
    """k-word shingles of lowercased whitespace-tokenized text."""
    toks = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    n = F.size(toks)
    idx = F.sequence(F.lit(0), F.greatest(n - k, F.lit(0)))
    return F.when(
        n >= k,
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, k))),
    ).otherwise(F.array(F.concat_ws(" ", toks)))


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = 64,
    shingle_k: int = 5,
) -> DataFrame:
    """(id, h0..h{n-1}) — minhash over shingles, n_hashes seeded murmur3
    hashes computed JVM-side.  One explode + one groupBy (map-side combined
    min), no UDF."""
    ex = df.select(
        F.col(id_col), F.explode(_shingles(text_col, shingle_k)).alias("shingle")
    )
    aggs = [
        F.min(F.hash(F.col("shingle"), F.lit(i))).alias(f"h{i}")
        for i in range(n_hashes)
    ]
    return ex.groupBy(id_col).agg(*aggs)


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = 64,
    bands: int = 16,
    shingle_k: int = 5,
    max_bucket: int = 200,
) -> DataFrame:
    """Candidate near-duplicate pairs (a < b) via banded minhash LSH.

    Docs sharing any band bucket become a candidate pair.  ``max_bucket``
    caps degenerate buckets (e.g. empty docs) so the self-join can't
    quadratically explode — the dropped buckets are exact-duplicate
    clusters better handled by exact_dedup.
    """
    rows_per_band = n_hashes // bands
    sig = minhash_signatures(df, id_col, text_col, n_hashes, shingle_k)
    band_cols = [
        F.struct(
            F.lit(b).alias("band"),
            F.hash(*[F.col(f"h{b * rows_per_band + r}") for r in range(rows_per_band)]).alias(
                "bucket"
            ),
        )
        for b in range(bands)
    ]
    buckets = sig.select(
        F.col(id_col), F.explode(F.array(*band_cols)).alias("bb")
    ).select(id_col, F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))

    counts = buckets.groupBy("band", "bucket").agg(F.count("*").alias("c"))
    small = buckets.join(
        counts.filter(F.col("c") <= max_bucket).select("band", "bucket"),
        ["band", "bucket"],
    )
    a = small.select(F.col("band"), F.col("bucket"), F.col(id_col).alias("a"))
    b = small.select(F.col("band"), F.col("bucket"), F.col(id_col).alias("b"))
    return (
        a.join(b, ["band", "bucket"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )


def simhash(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", bits: int = 64
) -> DataFrame:
    """64-bit SimHash per document: sign of per-bit sums of token hashes.
    Explode tokens once; 64 conditional sums aggregate map-side."""
    toks = df.select(
        F.col(id_col),
        F.explode(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")).alias("tok"),
    ).withColumn("th", F.hash("tok").cast("long"))
    aggs = [
        F.sum(
            F.when(F.shiftright(F.col("th"), i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"b{i}")
        for i in range(bits)
    ]
    per_bit = toks.groupBy(id_col).agg(*aggs)
    sig = F.lit(0).cast("long")
    for i in range(bits):
        bit = F.shiftleft(F.lit(1).cast("long"), i)  # bit 63 wraps signed, as intended
        sig = sig + F.when(F.col(f"b{i}") > 0, bit).otherwise(F.lit(0).cast("long"))
    return per_bit.select(F.col(id_col), sig.alias("simhash"))


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.8,
    max_freq: int = 1000,
) -> DataFrame:
    """Exact n-gram Jaccard similarity for pairs sharing ≥1 n-gram.

    (a, b, jaccard) for jaccard ≥ threshold.  ``max_freq`` drops stop-grams
    (n-grams in too many docs) before the pair join — the standard guard
    against quadratic blowup on boilerplate.
    """
    grams = (
        df.select(F.col(id_col), F.explode(_shingles(text_col, n)).alias("g"))
        .distinct()
    )
    sizes = grams.groupBy(id_col).agg(F.count("*").alias("sz"))
    gfreq = grams.groupBy("g").agg(F.count("*").alias("df"))
    grams_f = grams.join(gfreq.filter(F.col("df") <= max_freq).select("g"), "g")
    a = grams_f.select(F.col("g"), F.col(id_col).alias("a"))
    b = grams_f.select(F.col("g"), F.col(id_col).alias("b"))
    common = (
        a.join(b, "g")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count("*").alias("common"))
    )
    sa = sizes.select(F.col(id_col).alias("a"), F.col("sz").alias("sza"))
    sb = sizes.select(F.col(id_col).alias("b"), F.col("sz").alias("szb"))
    return (
        common.join(sa, "a")
        .join(sb, "b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("common") / (F.col("sza") + F.col("szb") - F.col("common")), 6
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("a", "b", "jaccard")
    )
