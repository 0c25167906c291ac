"""Deterministic synthetic DOCUMENTS corpus for dedup-at-scale benches.

Unlike the transcripts corpus (driver-side pandas, sources/transcripts.py
— fine at 2M short rows), a documents corpus carries real text volume, so
generation here is SPARK-SIDE: every doc's text is a pure column
expression over ``spark.range`` (md5-derived pseudo-random words), which
generates in parallel on executors and would generate a 100 TB corpus the
same way.  Same (n_docs, seed) ⇒ identical corpus, no external data.

The planted BOILERPLATE CLUSTER is the shape that motivates
``minhash_lsh_pairs``'s ``max_bucket`` cap: ``boilerplate_frac`` of all
docs share one near-identical template (a fixed word sequence plus one
per-doc trailing word), so at scale they flood their band buckets — an
uncapped LSH self-join would go quadratic in the cluster size (5% of 2M
docs ⇒ 10^10 candidate pairs from one template).  The cap drops those
buckets; exact/near-exact boilerplate is handled by ``exact_dedup`` or a
representative sample, not all-pairs.  Reference analog: none — the
reference engine (C++/Rust log parser) has no dedup layer; this is part
of the training-data extension the graft adds.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession, functions as F


def _boiler_words(n_words: int, seed: int) -> list[str]:
    """The fixed boilerplate template: md5-derived words (deterministic,
    engine-independent)."""
    return [
        hashlib.md5(f"boiler:{seed}:{j}".encode()).hexdigest()[:8]
        for j in range(n_words)
    ]


def documents_df(
    spark: SparkSession,
    n_docs: int,
    seed: int = 42,
    n_words: int = 40,
    boilerplate_frac: float = 0.05,
    dup_frac: float = 0.0,
    dup_cluster_size: int = 5,
) -> DataFrame:
    """(doc_id long, text string): ``boilerplate_frac`` near-identical
    boilerplate docs (doc_id < n·frac; template + one per-doc word, so
    pairwise shingle Jaccard ≈ 0.8 — near-dup, NOT exact-dup), then
    ``dup_frac`` of docs in SMALL near-dup clusters of
    ``dup_cluster_size`` (per-cluster template + per-doc word — the
    realistic web-dedup tail: millions of tiny clusters whose buckets fit
    comfortably under the cap, the work connected components actually
    does at scale), and the rest unique pseudo-random text.  All column
    expressions — generates on executors, no driver data path."""
    n_boiler = int(n_docs * boilerplate_frac)
    n_dup = int(n_docs * dup_frac)
    sid = F.col("doc_id").cast("string")

    def word(tag: str, key: F.Column | None = None) -> F.Column:
        return F.substring(
            F.md5(F.concat_ws(":", F.lit(f"{tag}:{seed}"), key if key is not None else sid)),
            1,
            8,
        )

    uniq = F.concat_ws(
        " ", *[word(f"w{j}") for j in range(n_words)]
    )
    boiler = F.concat_ws(
        " ", F.lit(" ".join(_boiler_words(n_words - 1, seed))), word("tail")
    )
    # small clusters: template words keyed on the cluster id, not the doc
    grp = ((F.col("doc_id") - n_boiler) / dup_cluster_size).cast("long").cast("string")
    small = F.concat_ws(
        " ",
        *[word(f"g{j}", key=grp) for j in range(n_words - 1)],
        word("tail"),
    )
    return (
        spark.range(n_docs)
        .withColumnRenamed("id", "doc_id")
        .select(
            "doc_id",
            F.when(F.col("doc_id") < n_boiler, boiler)
            .when(F.col("doc_id") < n_boiler + n_dup, small)
            .otherwise(uniq)
            .alias("text"),
        )
    )


def write_documents(
    spark: SparkSession,
    path: str,
    n_docs: int,
    seed: int = 42,
    n_words: int = 40,
    boilerplate_frac: float = 0.05,
    dup_frac: float = 0.0,
    dup_cluster_size: int = 5,
    shards: int = 32,
) -> str:
    """Materialize the corpus to a sharded parquet directory (executor-
    parallel write; the realistic multi-file shape a distributed writer
    produces)."""
    (
        documents_df(
            spark, n_docs, seed, n_words, boilerplate_frac, dup_frac, dup_cluster_size
        )
        .repartition(shards)
        .write.mode("overwrite")
        .parquet(path)
    )
    return path
