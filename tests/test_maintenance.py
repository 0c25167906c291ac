"""Sink maintenance (sinks/maintenance.py): small-file compaction and
dt-partition retention over a real pipeline output.

Fixtures fragment / back-date the sink by copying real parquet files —
a small corpus writes one tidy file per partition, while production
accumulates many per partition across runs; the copies reproduce that
state (including duplicate rows, which compaction must preserve
bit-for-bit, not dedupe)."""

from __future__ import annotations

import glob
import os
import shutil

import pytest

from sqllog_analysis_spark.plans.pipeline import PipelineConfig, run_pipeline
from sqllog_analysis_spark.sinks.maintenance import compact_sink, expire_partitions
from sqllog_analysis_spark.sinks.writers import read_sink
from sqllog_analysis_spark.sources.transcripts import write_transcripts


def _files(out: str) -> list[str]:
    return sorted(glob.glob(os.path.join(out, "records", "**", "*.parquet"), recursive=True))


def _rowset(spark, out: str):
    return sorted(
        map(
            tuple,
            read_sink(spark, out)
            .select("conv_id", "turn_idx", "rec_idx", "category", "dt")
            .collect(),
        )
    )


def _fragment(out: str, copies: int = 3) -> None:
    """Simulate accumulation: each partition file is copied ``copies``
    times under fresh names (rows duplicate — compaction must keep them)."""
    for f in _files(out):
        for i in range(copies):
            shutil.copy(f, f.replace(".parquet", f".copy{i}.parquet"))


def _pipeline(spark, tmp_path, n=800, seed=3) -> str:
    inp = str(tmp_path / "t.parquet")
    out = str(tmp_path / "out")
    write_transcripts(inp, n, seed=seed)
    run_pipeline(spark, PipelineConfig(input_path=inp, output_dir=out, resume=False))
    return out


def test_compact_preserves_rows_and_reduces_files(spark, tmp_path):
    out = _pipeline(spark, tmp_path, n=1500)
    _fragment(out, copies=3)

    before_files = _files(out)
    before_rows = _rowset(spark, out)
    stats = compact_sink(spark, out, target_mb=128)

    after_files = _files(out)
    assert len(after_files) < len(before_files)
    assert _rowset(spark, out) == before_rows  # duplicates preserved verbatim
    assert stats and all(s["files_after"] < s["files_before"] for s in stats)
    assert all(s["files_after"] == 1 for s in stats)  # tiny partitions → 1 file
    # no staging/backup dirs left behind
    assert not glob.glob(os.path.join(out, "records", "**", "_compact_*"), recursive=True)
    assert not glob.glob(os.path.join(out, "records", "**", "_old_*"), recursive=True)


def test_compact_second_run_is_noop(spark, tmp_path):
    out = _pipeline(spark, tmp_path, n=800, seed=5)
    _fragment(out, copies=2)
    assert compact_sink(spark, out) != []
    assert compact_sink(spark, out) == []  # idempotent: nothing left to do


def test_compact_respects_target_size(spark, tmp_path):
    """A partition whose bytes exceed target_mb splits into exactly
    ceil(bytes / target) files (repartition guarantees the count even
    when the scan bin-packs the small inputs into one split)."""
    out = _pipeline(spark, tmp_path, n=1500, seed=7)
    _fragment(out, copies=20)  # chat partition → ~2.6MB: splits at 1MB
    stats = compact_sink(spark, out, target_mb=1)
    assert stats
    for s in stats:
        want = max(1, -(-s["bytes"] // (1 << 20)))
        if want < s["files_before"]:
            assert s["files_after"] == want
    # the fixture's biggest partition really exercises the multi-file path
    assert any(s["files_after"] >= 2 for s in stats)


def test_compact_repairs_interrupted_swap(spark, tmp_path):
    """Crash states self-heal: a partition parked under _old_ (crash
    between the two renames) is restored; a completed-swap leftover
    (_old_ next to a live dir) and stale _compact_ staging are dropped."""
    out = _pipeline(spark, tmp_path, n=800, seed=11)
    before_rows = _rowset(spark, out)
    cat_dirs = sorted(glob.glob(os.path.join(out, "records", "category=*")))
    parked = sorted(glob.glob(os.path.join(cat_dirs[0], "dt=*")))[0]
    # crash between move(live→old) and move(tmp→live): live dir missing
    os.rename(parked, os.path.join(cat_dirs[0], "_old_" + os.path.basename(parked)))
    # a completed swap whose _old_ cleanup didn't run, plus stale staging
    live2 = sorted(glob.glob(os.path.join(cat_dirs[1], "dt=*")))[0]
    shutil.copytree(live2, os.path.join(cat_dirs[1], "_old_" + os.path.basename(live2)))
    shutil.copytree(live2, os.path.join(cat_dirs[1], "_compact_" + os.path.basename(live2)))

    compact_sink(spark, out)  # repair runs before planning

    assert _rowset(spark, out) == before_rows  # parked partition restored
    assert not glob.glob(os.path.join(out, "records", "**", "_old_*"), recursive=True)
    assert not glob.glob(os.path.join(out, "records", "**", "_compact_*"), recursive=True)


def test_compact_repair_is_conservative_on_partial_move(spark, tmp_path):
    """r6 (ADVICE r5): a crash mid-directory-move (the copy+delete
    emulation of rename) leaves the partition's files SPLIT between the
    live dir and _old_.  Repair must never read that as 'swap completed'
    and drop _old_ — it merges the parked files back and loses no row."""
    out = _pipeline(spark, tmp_path, n=800, seed=11)
    before_rows = _rowset(spark, out)
    cat_dirs = sorted(glob.glob(os.path.join(out, "records", "category=*")))
    live = sorted(glob.glob(os.path.join(cat_dirs[0], "dt=*")))[0]
    old = os.path.join(cat_dirs[0], "_old_" + os.path.basename(live))
    os.makedirs(old)
    files = sorted(glob.glob(os.path.join(live, "*.parquet")))
    assert files
    # half moved, half still live — plus one file present on BOTH sides
    # under the same name (its copy completed, its delete didn't): the
    # worst interleaving of a per-object copy+delete "rename"
    moved = files[: max(1, len(files) // 2)]
    for f in moved:
        os.rename(f, os.path.join(old, os.path.basename(f)))
    still_live = sorted(glob.glob(os.path.join(live, "*.parquet")))
    if still_live:
        shutil.copy2(still_live[0], os.path.join(old, os.path.basename(still_live[0])))

    compact_sink(spark, out)

    assert _rowset(spark, out) == before_rows  # nothing lost, nothing doubled
    assert not glob.glob(os.path.join(out, "records", "**", "_old_*"), recursive=True)


def test_compact_refuses_non_atomic_rename_fs(spark, tmp_path, monkeypatch):
    """The swap protocol is guarded to rename-atomic filesystems — an
    object-store fs kind is rejected up front (r6, ADVICE r5)."""
    import pyarrow.fs as pafs

    from sqllog_analysis_spark.sinks import maintenance as M

    out = _pipeline(spark, tmp_path, n=400, seed=11)

    class FakeS3(pafs.PyFileSystem):
        pass

    real_resolve = M._resolve

    def fake_resolve(path):
        fs, root = real_resolve(path)

        class Wrapper:
            type_name = "s3"

            def __getattr__(self, name):
                return getattr(fs, name)

        return Wrapper(), root

    monkeypatch.setattr(M, "_resolve", fake_resolve)
    with pytest.raises(ValueError, match="atomic directory rename"):
        compact_sink(spark, out)


def test_compact_preserves_index_sort(spark, tmp_path):
    """The rewritten files keep the (session, thread, trx_id) within-file
    ordering — the parquet min/max data-skipping contract (the deferred-
    index analog) must survive maintenance."""
    out = _pipeline(spark, tmp_path, n=1000, seed=7)
    _fragment(out, copies=2)
    compact_sink(spark, out)
    import pyarrow.parquet as pq

    f = _files(out)[0]
    pdf = pq.read_table(f, columns=["session", "thread", "trx_id"]).to_pandas()
    key = list(
        zip(
            pdf["session"].fillna(""),
            pdf["thread"].fillna(""),
            pdf["trx_id"].fillna(""),
        )
    )
    assert key == sorted(key)


def test_compact_accepts_uri_out_dir(spark, tmp_path):
    """The scheme-qualified code path (s3://-style) exercised via
    file://: pyarrow gets fs-native paths, Spark gets URI paths, and the
    swap happens on the right filesystem."""
    out = _pipeline(spark, tmp_path, n=800, seed=13)
    _fragment(out, copies=2)
    before = _rowset(spark, out)
    stats = compact_sink(spark, "file://" + out)
    assert stats and all(s["files_after"] < s["files_before"] for s in stats)
    assert _rowset(spark, out) == before


def _backdate(out: str, days: list[str]) -> None:
    """Copy the first real dt= partition to older dt= values."""
    cat_dirs = sorted(glob.glob(os.path.join(out, "records", "category=*")))
    src = sorted(glob.glob(os.path.join(cat_dirs[0], "dt=*")))[0]
    for d in days:
        shutil.copytree(src, os.path.join(cat_dirs[0], f"dt={d}"))


def test_expire_partitions_cutoff_and_reads(spark, tmp_path):
    out = _pipeline(spark, tmp_path, n=800, seed=3)
    _backdate(out, ["2025-09-01", "2025-09-10", "2025-09-15"])

    deleted = expire_partitions(out, older_than_days=3, now="2025-09-16")
    # strictly older than 2025-09-13 goes; 2025-09-15 and the live day stay
    assert [p.split("dt=")[1] for p in deleted] == ["2025-09-01", "2025-09-10"]
    remaining = {
        str(r["dt"]) for r in read_sink(spark, out).select("dt").distinct().collect()
    }
    assert "2025-09-15" in remaining and "2025-09-01" not in remaining
    # the sink stays readable after the metadata delete
    assert read_sink(spark, out).count() > 0


def test_expire_boundary_is_exclusive(spark, tmp_path):
    out = _pipeline(spark, tmp_path, n=600, seed=9)
    _backdate(out, ["2025-09-13"])
    # cutoff day itself (now - 3 = 09-13) is KEPT: deletion is strict '<'
    assert expire_partitions(out, older_than_days=3, now="2025-09-16") == []
