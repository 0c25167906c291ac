"""Sink maintenance: small-file compaction and dt-partition retention.

The bounded-files sink write (writers.py) caps files per (category, dt)
partition per RUN — but a long-lived warehouse accumulates runs, and at
10^12 turns the records sink collects the classic small-files problem:
commit walks, lineage reads, and every downstream scan pay per file.
These are the two maintenance jobs a production table needs (what
Iceberg ships as ``rewriteDataFiles`` and ``expireSnapshots`` /
partition-level retention; the reference has no analog — its warehouse
is a single DuckDB file):

- :func:`compact_sink` — rewrite fragmented (category, dt) partitions
  into ~``target_mb`` files, preserving the (session, thread, trx_id)
  sort that stands in for the reference's deferred indexes
  (duckdb_impl.rs:124-136).
- :func:`expire_partitions` — drop dt= partitions older than a cutoff,
  a pure metadata delete (partition pruning makes age-out free; no data
  scan, no rewrite).

Both go through ``pyarrow.fs`` (same as lineage.py) so s3://-style URIs
take the identical code path, and both swap directories via rename with
underscore-prefixed staging names — Spark ignores ``_*`` paths, so a
reader never sees a half-written partition and a crash leaves either the
old or the new layout visible, never a mix.
"""

from __future__ import annotations

import posixpath
from concurrent.futures import ThreadPoolExecutor

from pyspark.sql import SparkSession

from sqllog_analysis_spark.sinks.lineage import _list_files, _resolve


def _partition_dirs(fs, records_root: str) -> list[str]:
    """category=<c>/dt=<d> directories under the records sink."""
    from pyarrow import fs as pafs

    out = []
    sel = pafs.FileSelector(records_root, recursive=False, allow_not_found=True)
    for cat in fs.get_file_info(sel):
        if cat.type != pafs.FileType.Directory or not posixpath.basename(
            cat.path
        ).startswith("category="):
            continue
        for dt in fs.get_file_info(pafs.FileSelector(cat.path, recursive=False)):
            if dt.type == pafs.FileType.Directory and posixpath.basename(
                dt.path
            ).startswith("dt="):
                out.append(dt.path)
    return sorted(out)


def compact_sink(
    spark: SparkSession,
    out_dir: str,
    target_mb: int = 128,
    min_files: int = 2,
    max_concurrency: int = 4,
) -> list[dict]:
    """Rewrite fragmented (category, dt) partitions of the records sink
    into ``ceil(bytes / target_mb)`` files each.

    Partitions already at or under their target file count (or with
    fewer than ``min_files`` files) are left untouched — compaction is
    idempotent and a second run is a metadata-only no-op.

    Returns one stats dict per REWRITTEN partition:
    ``{partition, files_before, files_after, bytes}``.

    Scale shape: planning is a metadata walk (file listings — the same
    O(#files) cost lineage already pays); each rewrite is an independent
    distributed job over ONE partition directory (coalesce, no shuffle —
    the partition's rows are already co-located), and rewrites of
    different partitions run concurrently from driver threads.  At
    10^12 turns this is exactly Iceberg's ``rewriteDataFiles`` plan:
    per-partition jobs, never a global shuffle of the table.
    """
    records_root = posixpath.join(out_dir.rstrip("/"), "records")
    fs, root = _resolve(records_root)
    stats: list[dict] = []
    jobs = []
    for part_dir in _partition_dirs(fs, root):
        files = _list_files(fs, part_dir, ".parquet", recursive=False)
        if len(files) < min_files:
            continue
        total = sum((fs.get_file_info(f).size or 0) for f in files)
        want = max(1, -(-total // (target_mb * (1 << 20))))
        if want >= len(files):
            continue
        jobs.append((part_dir, files, total, want))

    def rewrite(job):
        part_dir, files, total, want = job
        # read THIS partition's files only; partition values come from the
        # directory name, so writing them back is unnecessary — the swapped
        # directory keeps its category=/dt= path
        df = spark.read.parquet(*files)
        tmp = posixpath.join(
            posixpath.dirname(part_dir),
            "_compact_" + posixpath.basename(part_dir),
        )
        fs.delete_dir_contents(tmp, accept_root_dir=True, missing_dir_ok=True)
        (
            df.coalesce(want)
            .sortWithinPartitions("session", "thread", "trx_id")
            .write.mode("overwrite")
            .parquet(tmp)
        )
        old = posixpath.join(
            posixpath.dirname(part_dir),
            "_old_" + posixpath.basename(part_dir),
        )
        fs.move(part_dir, old)
        fs.move(tmp, part_dir)
        fs.delete_dir(old)
        after = _list_files(fs, part_dir, ".parquet", recursive=False)
        return {
            "partition": _rel_to_root(part_dir, root),
            "files_before": len(files),
            "files_after": len(after),
            "bytes": total,
        }

    with ThreadPoolExecutor(max_workers=max_concurrency) as ex:
        stats = [f.result() for f in [ex.submit(rewrite, j) for j in jobs]]
    return sorted(stats, key=lambda s: s["partition"])


def _rel_to_root(path: str, root: str) -> str:
    root = root.rstrip("/")
    return path[len(root) + 1 :] if path.startswith(root + "/") else path


def expire_partitions(
    out_dir: str,
    older_than_days: int,
    now: str | None = None,
) -> list[str]:
    """Delete records-sink dt= partitions strictly older than
    ``now - older_than_days`` — partition-level retention as a pure
    metadata operation (no scan, no rewrite; partition pruning is what
    makes age-out free on a partitioned sink).

    ``now`` is an ISO date for deterministic tests; default = today
    (UTC).  Returns the deleted partition paths (relative to the sink).
    """
    import datetime as dt

    today = (
        dt.date.fromisoformat(now)
        if now
        else dt.datetime.now(dt.timezone.utc).date()
    )
    cutoff = today - dt.timedelta(days=older_than_days)
    records_root = posixpath.join(out_dir.rstrip("/"), "records")
    fs, root = _resolve(records_root)
    deleted = []
    for part_dir in _partition_dirs(fs, root):
        val = posixpath.basename(part_dir).split("=", 1)[1]
        try:
            day = dt.date.fromisoformat(val)
        except ValueError:
            continue  # non-date partition value: never age out silently
        if day < cutoff:
            fs.delete_dir(part_dir)
            deleted.append(_rel_to_root(part_dir, root))
    return sorted(deleted)
