"""Corpus deduplication CLI — the training-data dedup family as a user
surface, end-to-end:

    python -m sqllog_analysis_spark.dedup_cli \
        --input documents.parquet --output <dir> --method minhash

Reads a documents table (``id_col``, ``text_col`` and/or ``vec_col``),
generates candidate near-duplicate pairs with the chosen method, chains
them into clusters (connected components), and writes:

- ``<dir>/pairs/``     candidate pairs parquet (a, b[, score]);
- ``<dir>/clusters/``  (doc_id, cluster_id) for every doc in some pair;
- ``<dir>/deduped/``   the input minus non-representative cluster members
                       (one min-id representative per duplicate group) —
                       the actual dedup product a training pipeline
                       consumes (skip with ``--no-deduped``);

and prints a one-line JSON summary on stdout.

Every method keeps the library operators' scale shape (bucketed
self-joins with per-bucket caps, never all-pairs; one shuffle per
exchange) — this is a thin argument-parsing veneer, all semantics live in
``operators/dedup.py`` / ``operators/similarity.py``.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

METHODS = ("exact", "minhash", "simhash", "ngram", "embedding")


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="sqllog_analysis_spark.dedup_cli")
    ap.add_argument("--input", required=True, help="documents parquet path")
    ap.add_argument("--output", required=True, help="output directory")
    ap.add_argument("--method", required=True, choices=METHODS)
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--vec-col", default="embedding",
                    help="embedding method: array<float/double> column")
    ap.add_argument("--threshold", type=float, default=None,
                    help="ngram: min Jaccard (default 0.8); "
                         "embedding: min cosine (default 0.9)")
    ap.add_argument("--n-hashes", type=int, default=64, help="minhash: signature length")
    ap.add_argument("--bands", type=int, default=None,
                    help="minhash LSH bands (default 16); simhash bands (default 4)")
    ap.add_argument("--shingle-k", type=int, default=5,
                    help="minhash: character-shingle length")
    ap.add_argument("--ngram-n", type=int, default=3, help="ngram: n-gram length")
    ap.add_argument("--hamming", type=int, default=3, help="simhash: max bit distance")
    ap.add_argument("--bits", type=int, default=None,
                    help="simhash: signature bits (default 64); "
                         "embedding: hyperplane count (default 8)")
    ap.add_argument("--seeds", type=int, default=1,
                    help="embedding: independent plane sets to union (recall)")
    ap.add_argument("--max-bucket", type=int, default=None,
                    help="per-bucket candidate cap (minhash default 200, "
                         "simhash/embedding default 1000)")
    ap.add_argument("--no-deduped", action="store_true",
                    help="skip writing <output>/deduped")
    ap.add_argument("--index", default=None,
                    help="minhash only: banded-bucket index directory. If it "
                         "exists, run INCREMENTALLY (pairs touching --input "
                         "vs the indexed history, never old-vs-old); if not, "
                         "build it from --input. Signature params live in "
                         "the index's _params.json")
    ap.add_argument("--update-index", action="store_true",
                    help="with --index: append --input's buckets to the "
                         "index after pairing, so the next increment dedups "
                         "against this batch too")
    ap.add_argument("--prev-clusters", default=None,
                    help="with an existing --index: previous run's clusters/ "
                         "directory; the increment's pairs MERGE into those "
                         "assignments (union-find over star edges) instead "
                         "of clustering in isolation, and <output>/clusters "
                         "holds the merged result for the next day. Assumes "
                         "increment ids sort after history ids (the natural "
                         "ingest order), so representatives stay in history")
    ap.add_argument("--cores", type=int, default=None, help="local[N] cores")
    args = ap.parse_args(argv)

    if not os.path.exists(args.input):
        print(f"error: input not found: {args.input}", file=sys.stderr)
        return 2
    if (args.index or args.update_index) and args.method != "minhash":
        print("error: --index/--update-index require --method minhash",
              file=sys.stderr)
        return 2
    if args.prev_clusters and args.method == "exact":
        print("error: --prev-clusters requires a pair-based method",
              file=sys.stderr)
        return 2

    from pyspark.sql import functions as F

    from sqllog_analysis_spark.operators import dedup as DD
    from sqllog_analysis_spark.operators.similarity import lsh_near_dup_pairs
    from sqllog_analysis_spark.session import get_spark

    spark = get_spark("dedup_cli", cores=args.cores)
    docs = spark.read.parquet(args.input)
    n_docs = docs.count()
    idc = args.id_col

    if args.method == "exact":
        # no pair stage: fingerprint groups ARE the clusters
        groups = DD.exact_dedup(docs, idc, args.text_col)
        clusters = (
            docs.select(idc, DD.fingerprint(args.text_col).alias("fp"))
            .join(groups.select("fp", "keep_id"), "fp")
            .select(F.col(idc).alias("doc_id"), F.col("keep_id").alias("cluster_id"))
        )
        pairs = None
    else:
        if args.method == "minhash":
            if args.index and os.path.exists(args.index):
                pairs = DD.minhash_lsh_pairs_incremental(
                    docs, args.index, idc, args.text_col,
                    max_bucket=args.max_bucket or 200,
                ).select("a", "b")
            else:
                pairs = DD.minhash_lsh_pairs(
                    docs, idc, args.text_col, n_hashes=args.n_hashes,
                    bands=args.bands or 16, shingle_k=args.shingle_k,
                    max_bucket=args.max_bucket or 200,
                )
        elif args.method == "simhash":
            pairs = DD.simhash_near_dup_pairs(
                docs, idc, args.text_col, bits=args.bits or 64,
                bands=args.bands or 4, hamming=args.hamming,
                max_bucket=args.max_bucket or 1000,
            )
        elif args.method == "ngram":
            pairs = DD.ngram_jaccard_pairs(
                docs, idc, args.text_col, n=args.ngram_n,
                threshold=args.threshold if args.threshold is not None else 0.8,
            )
        else:  # embedding
            dim = docs.select(F.size(args.vec_col).alias("d")).first()["d"]
            pairs = lsh_near_dup_pairs(
                docs, dim=int(dim),
                threshold=args.threshold if args.threshold is not None else 0.9,
                bits=args.bits or 8, seeds=args.seeds,
                max_bucket=args.max_bucket or 1000,
                id_col=idc, vec_col=args.vec_col,
            )
    os.makedirs(args.output, exist_ok=True)
    if pairs is not None:
        # stage pairs ONCE, then cluster from the staged parquet: leaving
        # the pair plan lazy would re-run the whole candidate generator
        # (minhash/banding/self-join) for the cluster pass too
        pairs.write.mode("overwrite").parquet(os.path.join(args.output, "pairs"))
        pairs = spark.read.parquet(os.path.join(args.output, "pairs"))
        n_pairs = pairs.count()
        if args.prev_clusters:
            clusters = DD.dup_clusters_incremental(
                pairs.select("a", "b"), spark.read.parquet(args.prev_clusters)
            )
        else:
            clusters = DD.dup_clusters(pairs.select("a", "b"))
    else:
        n_pairs = 0

    if args.index:
        # AFTER the staged pair write: the incremental pair plan reads the
        # index lazily, so appending first would pair the batch against
        # its own buckets twice
        if not os.path.exists(args.index):
            DD.write_minhash_index(
                docs, args.index, idc, args.text_col,
                n_hashes=args.n_hashes, bands=args.bands or 16,
                shingle_k=args.shingle_k,
            )
        elif args.update_index:
            # the sidecar's params are the source of truth for appends
            with open(os.path.join(args.index, "_params.json")) as f:
                p = json.load(f)
            DD.write_minhash_index(
                docs, args.index, idc, args.text_col, mode="append", **p
            )
    clusters.write.mode("overwrite").parquet(os.path.join(args.output, "clusters"))
    clusters = spark.read.parquet(os.path.join(args.output, "clusters"))
    n_clusters = clusters.select("cluster_id").distinct().count()
    n_members = clusters.count()

    kept = n_docs
    if not args.no_deduped:
        # drop cluster members that are not their cluster's representative;
        # docs in no cluster (singletons) pass through the anti-join untouched
        drop = clusters.filter(F.col("doc_id") != F.col("cluster_id")).select(
            F.col("doc_id").alias(idc)
        )
        deduped = docs.join(drop, idc, "left_anti")
        deduped.write.mode("overwrite").parquet(os.path.join(args.output, "deduped"))
        kept = spark.read.parquet(os.path.join(args.output, "deduped")).count()

    summary = {
        "method": args.method,
        "docs": n_docs,
        "candidate_pairs": n_pairs,
        "dup_clusters": n_clusters,
        "docs_in_clusters": n_members,
        "docs_kept": kept,
        "removed": n_docs - kept,
    }
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    sys.exit(main())
