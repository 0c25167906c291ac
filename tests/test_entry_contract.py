"""Driver-contract shape checks: every oracle key has a query, entry()
runs, and a sample of query/oracle pairs matches at sf0.001 (the full
sweep lives in tools/check_entry.py; the driver runs it at sf0.01)."""

from __future__ import annotations

import importlib.util

import duckdb
import pytest

SF = "/root/testdata/sf0.001"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


@pytest.fixture(scope="module")
def entry_mod():
    spec = importlib.util.spec_from_file_location("entry_mod", "/root/repo/__spark_entry__.py")
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


def test_oracle_keys_subset_of_queries(entry_mod):
    qs, os_ = set(entry_mod.queries()), set(entry_mod.oracle_sql())
    assert os_ <= qs
    assert len(qs) >= 25


def test_entry_returns_rows(spark, entry_mod):
    df = entry_mod.entry(spark)
    assert df.count() > 0


@pytest.mark.parametrize("name", ["pricing_summary", "regex_route", "exact_dedup", "cosine_topk"])
def test_query_matches_oracle_sample(spark, entry_mod, name):
    from tests.conftest import norm_cell

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    got = entry_mod.queries()[name](spark, SF).toPandas()
    want = con.execute(entry_mod.oracle_sql()[name]).df()
    cols = sorted(got.columns)
    assert cols == sorted(want.columns)
    g = sorted(tuple(norm_cell(r[c]) for c in cols) for _, r in got.iterrows())
    w = sorted(tuple(norm_cell(r[c]) for c in cols) for _, r in want.iterrows())
    assert g == w
