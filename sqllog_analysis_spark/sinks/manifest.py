"""Checkpoint manifest — idempotent, resumable stage commits.

The reference has no resume: a restart reruns everything (temp DBs are
deleted, duckdb_impl.rs:583-596).  The north rule requires per-stage
lineage + row-count metrics and mid-pipeline resume, so every sink write
goes through this manifest:

  1. compute a fingerprint of (input description, stage config);
  2. if a committed manifest entry for the stage has the same fingerprint,
     SKIP the stage (output is already on disk, atomically committed);
  3. otherwise run the write, then atomically record
     {stage, fingerprint, row_count, partitions[], committed} via
     write-to-temp + rename.

Sink writes themselves are idempotent because they are mode="overwrite"
into a stage-owned directory — a re-run after a mid-write crash replaces
the partial output rather than duplicating rows (the Iceberg-snapshot
analog available with plain parquet).
"""

from __future__ import annotations

import hashlib
import json
import os
import tempfile


class Manifest:
    def __init__(self, manifest_dir: str):
        self.dir = manifest_dir
        os.makedirs(manifest_dir, exist_ok=True)

    def _path(self, stage: str) -> str:
        return os.path.join(self.dir, f"{stage}.json")

    def read(self, stage: str) -> dict | None:
        p = self._path(stage)
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return json.load(f)

    def is_committed(self, stage: str, fingerprint: str) -> bool:
        e = self.read(stage)
        return bool(e and e.get("committed") and e.get("fingerprint") == fingerprint)

    def commit(
        self,
        stage: str,
        fingerprint: str,
        row_count: int,
        partitions: list[dict] | None = None,
        extra: dict | None = None,
    ) -> None:
        entry = {
            "stage": stage,
            "fingerprint": fingerprint,
            "row_count": row_count,
            "partitions": partitions or [],
            "committed": True,
        }
        if extra:
            entry.update(extra)
        fd, tmp = tempfile.mkstemp(dir=self.dir, prefix=f".{stage}.")
        with os.fdopen(fd, "w") as f:
            json.dump(entry, f, ensure_ascii=False)
        os.replace(tmp, self._path(stage))  # atomic commit


def fingerprint_input(path: str, conf: dict | None = None) -> str:
    """Cheap driver-side input fingerprint: file names + sizes + mtimes of
    the input (file or directory) plus the stage config — no data scan.
    Remote URIs (s3://, hdfs://…) list through pyarrow.fs, so the resume
    gate works wherever the data lives."""
    h = hashlib.sha256()
    entries = []
    if "://" in path:
        from pyarrow import fs as pafs

        fs, p = pafs.FileSystem.from_uri(path)
        info = fs.get_file_info(p)
        if info.type == pafs.FileType.File:
            infos = [info]
        elif info.type == pafs.FileType.Directory:
            infos = [
                i
                for i in fs.get_file_info(pafs.FileSelector(p, recursive=True))
                if i.type == pafs.FileType.File
            ]
        else:
            infos = []
        for i in sorted(infos, key=lambda i: i.path):
            mtime = int(i.mtime.timestamp()) if i.mtime else 0
            entries.append((i.path[len(p) :].lstrip("/") or i.base_name, i.size, mtime))
    elif os.path.isdir(path):
        for root, _, files in os.walk(path):
            for fn in sorted(files):
                fp = os.path.join(root, fn)
                st = os.stat(fp)
                entries.append((os.path.relpath(fp, path), st.st_size, int(st.st_mtime)))
    elif os.path.exists(path):
        st = os.stat(path)
        entries.append((os.path.basename(path), st.st_size, int(st.st_mtime)))
    h.update(json.dumps({"files": entries, "conf": conf or {}}, sort_keys=True).encode())
    return h.hexdigest()[:16]
