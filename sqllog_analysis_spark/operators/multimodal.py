"""Multimodal (image/audio/video) column plumbing.

Media ride through the engine as opaque ``binary`` payloads with typed
metadata; decode / feature-extract / resize / frame-sample run as
Arrow-batched pandas functions over ``mapInPandas`` so each task processes
whole batches with bounded memory.  The decode step itself is STUBBED
(image/audio libraries are not in this container): ``decoder=None`` uses a
deterministic fake (byte-statistics features) and a real decoder (PIL,
torchaudio, ...) can be injected without touching the Spark plumbing —
the schema, partitioning, UDF signature, and batch shapes are real and
tested.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("sha1", T.StringType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


def _fake_decode_features(payload: bytes, dim: int = 16) -> np.ndarray:
    """Deterministic stand-in for a real decoder: normalized byte histogram
    folded to ``dim`` buckets.  Replace with a real decode when media
    libraries are available."""
    if not payload:
        return np.zeros(dim, dtype=np.float32)
    arr = np.frombuffer(payload, dtype=np.uint8)
    hist = np.bincount(arr % dim, minlength=dim).astype(np.float32)
    s = hist.sum()
    return hist / s if s else hist


def extract_features(
    media: DataFrame,
    decoder: Callable[[bytes], np.ndarray] | None = None,
    dim: int = 16,
) -> DataFrame:
    """binary payload → fixed-dim feature vector, Arrow-batched."""
    decode = decoder or (lambda b: _fake_decode_features(b, dim))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": payloads.map(lambda b: len(b) if b is not None else 0),
                    "sha1": payloads.map(
                        lambda b: hashlib.sha1(b).hexdigest() if b is not None else None
                    ),
                    "feature": payloads.map(
                        lambda b: decode(bytes(b)).tolist() if b is not None else None
                    ),
                }
            )

    cols = ["media_id", "kind", "payload"]
    return media.select(*cols).mapInPandas(run, schema=FEATURE_SCHEMA)


def real_decode_stub(payload: bytes) -> np.ndarray:
    """The injection point for an actual decoder.  Not available in this
    container — kept as an explicit, documented stub."""
    raise NotImplementedError(
        "media decoding requires image/audio libraries not present in this "
        "environment; inject a decoder via extract_features(decoder=...)"
    )
