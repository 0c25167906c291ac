from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from sqllog_analysis_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="tests", cores=4, shuffle_partitions=8)
    yield s
    s.stop()


def norm_cell(x):
    """NA-safe scalar normalization for Spark↔oracle comparisons."""
    import numpy as np
    import pandas as pd

    if x is None or x is pd.NA:
        return None
    if isinstance(x, float) and x != x:
        return None
    if isinstance(x, (bool, np.bool_)):
        return bool(x)
    if isinstance(x, (int, np.integer)):
        return int(x)
    if isinstance(x, float):
        return int(x) if x.is_integer() else round(x, 9)
    return str(x)


def rows_as_sets(df_pandas, cols):
    return sorted(
        tuple(norm_cell(r[c]) for c in cols) for _, r in df_pandas.iterrows()
    )
