"""Driver-style correctness check: run each __spark_entry__ query in Spark
AND its oracle SQL in DuckDB, compare row count + column names +
order-insensitive values.  Usage: python tools/check_entry.py [sf_dir]
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm_cell(x):
    import datetime

    import numpy as np
    import pandas as pd

    if x is None or x is pd.NA:
        return None
    if isinstance(x, float) and math.isnan(x):
        return None
    if isinstance(x, (bool, np.bool_)):
        return bool(x)
    if isinstance(x, (int, np.integer)):
        return int(x)
    if isinstance(x, (float, np.floating)):
        x = float(x)
        return round(x, 9)
    if isinstance(x, (pd.Timestamp, datetime.datetime)):
        return pd.Timestamp(x).isoformat()
    return str(x)


def frame_sig(pdf):
    cols = sorted(pdf.columns)
    rows = sorted(
        (tuple(norm_cell(r[c]) for c in cols) for _, r in pdf.iterrows()),
        key=repr,  # None-safe, mixed-type-safe total order (cube/rollup rows)
    )
    return cols, rows


def main(sf_dir: str, only: set[str] | None = None) -> int:
    from sqllog_analysis_spark.session import get_spark

    sys.path.insert(0, "/root/repo")
    import importlib.util

    spec = importlib.util.spec_from_file_location("entry_mod", "/root/repo/__spark_entry__.py")
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    spark = get_spark("check_entry", cores=8, shuffle_partitions=8)
    qs, oracles = m.queries(), m.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"{name}: SPARK FAIL {str(e)[:200]}")
            failures += 1
            continue
        if name not in oracles:
            print(f"{name}: rows-only OK ({len(sdf)} rows)")
            continue
        odf = con.execute(oracles[name]).df()
        sc, sr = frame_sig(sdf)
        oc, orows = frame_sig(odf)
        if sc != oc:
            print(f"{name}: SCHEMA MISMATCH spark={sc} oracle={oc}")
            failures += 1
        elif len(sr) != len(orows):
            print(f"{name}: ROWCOUNT MISMATCH spark={len(sr)} oracle={len(orows)}")
            failures += 1
        elif sr != orows:
            bad = [i for i, (a, b) in enumerate(zip(sr, orows)) if a != b]
            print(f"{name}: VALUE MISMATCH {len(bad)}/{len(sr)} rows; first: ")
            print("  spark :", sr[bad[0]])
            print("  oracle:", orows[bad[0]])
            failures += 1
        else:
            print(f"{name}: OK ({len(sr)} rows)")
    print("failures:", failures)
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(
        main(
            sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001",
            set(sys.argv[2].split(",")) if len(sys.argv) > 2 else None,
        )
    )
