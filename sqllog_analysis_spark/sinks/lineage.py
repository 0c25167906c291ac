"""Post-write lineage from file metadata — no recompute, no data scan.

The manifest records per-stage, per-file row counts.  Round 1 (and early
round 2) computed these by re-running the stage's DataFrame through a
``groupBy(spark_partition_id())`` after the write — a full extra job per
stage.  Parquet already stores the row count of every file in its footer,
so lineage of what was ACTUALLY written is a driver-side metadata read:
O(#files) footer fetches, zero executor work.  (This is also the more
trustworthy number: it describes the committed output, not a recompute
that could theoretically diverge.)

JSONL sinks have no footer; their lineage records file sizes, and the row
count comes from a ``df.observe()`` counter attached to the write job —
again zero extra jobs.
"""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq


def parquet_lineage(path: str) -> list[dict]:
    """Per-file {file, row_count} from parquet footers (recursive); accepts
    a dataset directory or a single parquet file."""
    if os.path.isfile(path):
        return [
            {
                "file": os.path.basename(path),
                "row_count": pq.ParquetFile(path).metadata.num_rows,
            }
        ]
    out = []
    for fp in sorted(
        glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)
    ):
        out.append(
            {
                "file": os.path.relpath(fp, path),
                "row_count": pq.ParquetFile(fp).metadata.num_rows,
            }
        )
    return out


def jsonl_lineage(path: str) -> list[dict]:
    """Per-file {file, bytes} for JSONL sinks (no footers; the stage row
    count comes from the write job's observe() counter)."""
    out = []
    for fp in sorted(glob.glob(os.path.join(path, "*.json"))):
        out.append(
            {"file": os.path.relpath(fp, path), "bytes": os.path.getsize(fp)}
        )
    return out
