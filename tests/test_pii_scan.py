"""PII surface scan + redaction (plans/profiling.py, r12).

The fixture corpus is PII-free (the registry oracle verifies the
all-zero frame); the CAPABILITY is pinned here on planted documents:
hand-expected counts, Spark-vs-DuckDB engine parity on the same
planted parquet (the Java-vs-RE2 dialect subset actually agrees), and
the redaction transform."""

from __future__ import annotations

import duckdb

from ai_powered_e_commerce_analytics_spark.plans.profiling import (
    DOC_PII_SCAN_SQL,
    doc_pii_scan,
    redact_pii,
)

_DOCS = [
    (1, "web", "contact bob.smith+x@example.co.uk or https://a.io/p?q=1 now"),
    (2, "web", "call 5551234567 or 1234567890 ext 12345"),
    (3, "books", "plain text with no identifiers at all"),
    (4, "web", "a@b.io a@b.io http://x.y 999999"),
    (5, "books", None),
]
# hand counts: (emails, urls, long_digits)
_WANT = {1: (1, 1, 0), 2: (0, 0, 2), 3: (0, 0, 0), 4: (2, 1, 1)}


def _write(spark, tmp_path):
    spark.createDataFrame(
        _DOCS, "doc_id long, source string, text string"
    ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")


def test_planted_counts_and_engine_parity(spark, tmp_path):
    _write(spark, tmp_path)
    rows = {
        r["doc_id"]: r for r in doc_pii_scan(spark, str(tmp_path)).collect()
    }
    for did, (ne, nu, nd) in _WANT.items():
        r = rows[did]
        assert (r["n_emails"], r["n_urls"], r["n_long_digits"]) == (
            ne, nu, nd,
        ), r
        assert r["pii_flag"] == ((ne + nu + nd) > 0)
    # null text -> null counts, null flag (no crash, no false positive)
    assert rows[5]["n_emails"] is None and rows[5]["pii_flag"] is None

    con = duckdb.connect()
    con.execute(
        # Spark wrote a directory; glob its part files
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path}/documents.parquet/*.parquet')"
    )
    spark_rows = sorted(
        tuple(r) for r in doc_pii_scan(spark, str(tmp_path)).collect()
    )
    duck_rows = sorted(tuple(r) for r in con.execute(DOC_PII_SCAN_SQL).fetchall())
    assert spark_rows == duck_rows


def test_redaction(spark, tmp_path):
    _write(spark, tmp_path)
    from pyspark.sql import functions as F

    red = {
        r["doc_id"]: r["red"]
        for r in spark.read.parquet(f"{tmp_path}/documents.parquet")
        .select("doc_id", redact_pii("text").alias("red"))
        .collect()
    }
    assert red[1] == "contact <email> or <url> now"
    assert red[2] == "call <long_digit> or <long_digit> ext 12345"
    assert red[3] == "plain text with no identifiers at all"
    # email containing digits redacts as ONE email tag (pattern order)
    assert red[4] == "<email> <email> <url> <long_digit>"
