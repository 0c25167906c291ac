"""Similarity search over embedding columns (array<float/double>).

- brute_force_topk: exact cosine top-k for a (small, broadcast) probe set —
  the correctness baseline.  Dot products run JVM-side via
  F.aggregate(F.zip_with(...)), inside whole-stage codegen; no Python.
- lsh_topk: random-hyperplane LSH — corpus is bucketed by sign bits, probes
  only join their own bucket (plus optional multi-probe neighbors).  This
  is the scale path: the per-probe candidate set shrinks by ~2^bits.

At 100 TB the corpus side stays partitioned; only probes (small) broadcast.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x)
    )


def cosine_col(a, b):
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_topk(
    corpus: DataFrame,
    probes: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k neighbors per probe.

    Returns (probe_id, neighbor_id, cosine, rank); self-matches excluded;
    ties broken by neighbor id for determinism.
    """
    p = probes.select(
        F.col(id_col).alias("probe_id"), F.col(vec_col).alias("pvec")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cvec")
    )
    scored = (
        c.join(F.broadcast(p))
        .filter(F.col("neighbor_id") != F.col("probe_id"))
        .withColumn("cosine", F.round(cosine_col(F.col("pvec"), F.col("cvec")), 6))
    )
    w = Window.partitionBy("probe_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("probe_id", "neighbor_id", "cosine", "rank")
    )


def hyperplanes(dim: int, bits: int = 12, seed: int = 42) -> list[list[float]]:
    """Deterministic random hyperplanes (driver-side, broadcast as literals)."""
    rng = np.random.default_rng(seed)
    return rng.standard_normal((bits, dim)).tolist()


# Above this many inlined literals the sign-plane expression tree stops
# being a codegen win and becomes a quadratic plan-size hazard; switch to
# the Arrow-vectorized matmul UDF instead (numpy does (n, dim) @ (dim,
# bits) per batch — one closure-captured plane matrix, constant plan size).
_MAX_PLANE_LITERALS = 2048


def bucket_ids(vec_col, planes: list[list[float]]):
    """Sign-bit bucket id of a vector under the given hyperplanes.

    Small plane sets inline as JVM column expressions (whole-stage
    codegen); larger ones dispatch to a pandas UDF automatically — same
    buckets, constant plan size at any ``bits``.
    """
    bits = len(planes)
    if bits > 62:
        raise ValueError(f"bits={bits} exceeds the 63-bit bucket id")
    col = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    if bits * len(planes[0]) > _MAX_PLANE_LITERALS:
        return _bucket_ids_udf(planes)(col)
    bucket = F.lit(0).cast("long")
    for i, h in enumerate(planes):
        arr = F.array(*[F.lit(float(v)) for v in h])
        bucket = bucket + F.when(
            _dot(col, arr) > 0, F.shiftleft(F.lit(1).cast("long"), i)
        ).otherwise(F.lit(0).cast("long"))
    return bucket


def _bucket_ids_udf(planes: list[list[float]]):
    from pyspark.sql.functions import pandas_udf

    mat = np.asarray(planes, dtype=np.float64)  # (bits, dim)
    weights = (np.int64(1) << np.arange(mat.shape[0], dtype=np.int64))

    @pandas_udf("long")
    def _buckets(v: pd.Series) -> pd.Series:
        m = np.stack(v.to_numpy())  # (n, dim)
        signs = (m @ mat.T) > 0  # (n, bits)
        return pd.Series((signs @ weights).astype(np.int64))

    return _buckets


def lsh_topk(
    corpus: DataFrame,
    probes: DataFrame,
    dim: int,
    k: int = 5,
    bits: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate cosine top-k: join probes to corpus rows in the SAME
    hyperplane-sign bucket only, then exact-rank within candidates."""
    planes = hyperplanes(dim, bits, seed)
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cvec"),
        bucket_ids(vec_col, planes).alias("bucket"),
    )
    p = probes.select(
        F.col(id_col).alias("probe_id"),
        F.col(vec_col).alias("pvec"),
        bucket_ids(vec_col, planes).alias("bucket"),
    )
    scored = (
        c.join(F.broadcast(p), "bucket")
        .filter(F.col("neighbor_id") != F.col("probe_id"))
        .withColumn("cosine", F.round(cosine_col(F.col("pvec"), F.col("cvec")), 6))
    )
    w = Window.partitionBy("probe_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("probe_id", "neighbor_id", "cosine", "rank")
    )
