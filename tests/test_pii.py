"""PII scrub / URL extraction unit tests (functions/pii.py).

Pure column expressions — the assertions pin the exact redaction output,
replacement order, and domain normalization on crafted strings, plus the
contract queries' internal consistency on the synthetic corpus.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F  # noqa: E402

from sqllog_analysis_spark.functions import pii  # noqa: E402

SAMPLES = [
    # (text, n_emails, n_ips, n_phones, scrubbed)
    (
        "mail a.b+c@ex-1.org then 10.0.0.1 then +1 (206) 555-0042 done",
        1, 1, 1,
        "mail <EMAIL> then <IP> then <PHONE> done",
    ),
    ("no pii here at all", 0, 0, 0, "no pii here at all"),
    # two emails, adjacent IPs; bare digit runs are NOT phones
    (
        "x@y.io z@w.dev 1.2.3.4 5.6.7.8 call 2065550042",
        2, 2, 0,
        "<EMAIL> <EMAIL> <IP> <IP> call 2065550042",
    ),
    # version strings: 1.2.3 is not an IPv4 (needs four octet groups)
    ("upgrade to v1.2.3 now", 0, 0, 0, "upgrade to v1.2.3 now"),
    ("", 0, 0, 0, ""),
]


def test_scrub_and_counts(spark):
    df = spark.createDataFrame(
        [(i, t) for i, (t, *_rest) in enumerate(SAMPLES)], "i int, text string"
    )
    rows = (
        df.select(
            "i",
            pii.email_count("text").alias("e"),
            pii.ipv4_count("text").alias("ip"),
            pii.phone_count("text").alias("ph"),
            pii.scrub_pii("text").alias("s"),
        )
        .orderBy("i")
        .collect()
    )
    for r, (_t, ne, nip, nph, scrubbed) in zip(rows, SAMPLES):
        assert (r.e, r.ip, r.ph, r.s) == (ne, nip, nph, scrubbed)


def test_scrub_is_idempotent(spark):
    df = spark.createDataFrame([(t,) for t, *_ in SAMPLES], "text string")
    once = df.select(pii.scrub_pii("text").alias("s"))
    twice = once.select(pii.scrub_pii("s").alias("s"))
    assert [r.s for r in once.collect()] == [r.s for r in twice.collect()]


def test_url_domains_sorted_distinct(spark):
    df = spark.createDataFrame(
        [
            (
                "see https://b.com/x and https://a.com/y plus "
                "https://b.com/z and http://a.com:8080/q",
            )
        ],
        "text string",
    )
    row = df.select(
        pii.extract_urls("text").alias("u"), pii.url_domains("text").alias("d")
    ).first()
    assert row.u == [
        "https://b.com/x", "https://a.com/y", "https://b.com/z",
        "http://a.com:8080/q",
    ]
    assert row.d == ["a.com", "b.com"]  # distinct, sorted, port stripped


def test_contract_queries_consistent(spark):
    """pii_scrub / url_extract over the synthetic corpus: every doc gains
    exactly one planted email/IP/phone, and blocked ⇔ doc_id % 3 == 0."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "entry_pii", str(Path(__file__).resolve().parents[1] / "__spark_entry__.py")
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    sf = "/root/testdata/sf0.001"

    scrub = m.q_pii_scrub(spark, sf)
    bad = scrub.filter(
        (F.col("n_emails") < 1) | (F.col("n_ips") < 1) | (F.col("n_phones") < 1)
        | ~F.col("scrubbed").contains("<EMAIL>")
        | ~F.col("scrubbed").contains("<IP>")
        | ~F.col("scrubbed").contains("<PHONE>")
    ).count()
    assert bad == 0

    urls = m.q_url_extract(spark, sf)
    mismatched = urls.filter(
        F.col("blocked") != (F.col("doc_id") % 3 == 0)
    ).count()
    assert mismatched == 0
    assert urls.filter(F.col("n_urls") < 1).count() == 0
