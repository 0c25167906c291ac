"""Build the spark-submit --py-files package (north rule: 'ships as a
spark-submit --py-files package').

    python tools/make_pyfiles.py            # → dist/sqllog_analysis_spark.zip

The zip contains the ``sqllog_analysis_spark`` package only (no tests, no
bench harnesses); spark-submit distributes it to every executor's
PYTHONPATH and, in client mode, to the driver's sys.path as well — so the
only file shipped beside it is the thin ``submit_main.py`` driver script:

    spark-submit --master <cluster-master> \
        --py-files dist/sqllog_analysis_spark.zip \
        submit_main.py --input <transcripts.parquet> --output <dir>

Deterministic: fixed timestamps and sorted entries, so re-zipping an
unchanged tree is byte-identical (plays well with cluster file caches).
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "sqllog_analysis_spark"


def build(out_path: str | None = None) -> str:
    out_path = out_path or os.path.join(REPO, "dist", f"{PKG}.zip")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    entries = []
    for root, _, files in os.walk(os.path.join(REPO, PKG)):
        if "__pycache__" in root:
            continue
        for fn in files:
            if fn.endswith((".py", ".toml")):
                fp = os.path.join(root, fn)
                entries.append((os.path.relpath(fp, REPO), fp))
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for arcname, fp in sorted(entries):
            with open(fp, "rb") as f:
                data = f.read()
            info = zipfile.ZipInfo(arcname, date_time=(2020, 1, 1, 0, 0, 0))
            info.compress_type = zipfile.ZIP_DEFLATED
            info.external_attr = 0o644 << 16
            zf.writestr(info, data)
    return out_path


if __name__ == "__main__":
    p = build(sys.argv[1] if len(sys.argv) > 1 else None)
    print(p)
