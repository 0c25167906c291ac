"""Drift guard for the hard-oracle constants: the committed
contract_expected.py must match what tools/gen_contract_expected.py
would generate TODAY.  A semantic change to the corpus generator, the
parser, the routing rules, or the shape normalizer that isn't followed
by a regeneration fails here instead of failing the driver's DuckDB
hash check a round later."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from sqllog_analysis_spark.contract_expected import EXPECTED  # noqa: E402


def test_committed_constants_match_generator():
    from gen_contract_expected import expected_for

    # the 2,000-turn leg regenerates in seconds and exercises every rule
    # (sink counts, degenerate errors, conv buckets, shapes, latency)
    assert expected_for(2000) == EXPECTED[2000]


def test_all_contract_sizes_present():
    assert set(EXPECTED) == {2000, 20000, 200000}
    for n, e in EXPECTED.items():
        assert {
            "sink_counts",
            "n_errors",
            "conv_buckets_by_category",
            "sql_shapes_top15",
            "sql_shape_exemplars_top5",
            "reply_latency",
        } <= set(e), n
        assert len(e["sql_shapes_top15"]) == 15
        assert len(e["sql_shape_exemplars_top5"]) == 5
