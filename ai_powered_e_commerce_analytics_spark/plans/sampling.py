"""Deterministic sampling & split operators over the ``documents`` table.

The sampling machinery a training-data pipeline actually ships:
reproducible subsetting and train/val/test assignment that is stable
across runs, engines, partitionings, AND dataset growth — which is why
everything here derives from a content hash (``portable_hash64``), never
from ``rand()`` / ``TABLESAMPLE``:

- rand()-based sampling differs per partition layout and retry (a
  recomputed task resamples — rows can appear twice or vanish);
- hash-gate sampling is a pure per-row map: no shuffle, no state, the
  same row lands in the same split on every engine and every scale;
- membership is decided row-locally, so a 100 TB corpus samples in one
  scan with full predicate pushdown of everything else.

All three queries are DuckDB-oracle hash-gated (the hash IS portable).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions import portable_hash64
from ..functions.core import portable_hash64_sql
from .spec import QuerySpec, t

SAMPLE_PCT = 10          # stratified sample keeps ~10% per source
SPLIT_SEED = 7           # salt: decouples split from sample membership
TRAIN_PCT, VAL_PCT = 80, 10   # remainder is test
PER_SOURCE_K = 25        # exact-k deterministic sample per source


def _gate(col, seed: int = 0):
    """Uniform [0, 10000) gate value from the row's content hash."""
    return F.pmod(portable_hash64(col, seed=seed), F.lit(10_000))


def _gate_sql(expr: str, seed: int = 0) -> str:
    # portable_hash64 is non-negative (60-bit), so % == pmod here.
    return f"({portable_hash64_sql(expr, seed=seed)} % 10000)"


def stratified_sample_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """~SAMPLE_PCT% per-row deterministic sample: keep rows whose hash
    gate falls under the threshold. Per-source proportions follow from
    hash uniformity; membership is content-addressed (adding new rows
    never flips existing members in or out)."""
    docs = t(spark, sf_dir, "documents")
    return (
        docs.withColumn("__g", _gate(F.col("doc_id").cast("string")))
        .where(F.col("__g") < SAMPLE_PCT * 100)
        .select("doc_id", "source", "lang", "n_chars")
    )


STRATIFIED_SAMPLE_SQL = f"""
SELECT doc_id, source, lang, n_chars FROM documents
WHERE {_gate_sql("doc_id::VARCHAR")} < {SAMPLE_PCT * 100}
"""


def train_test_split_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """80/10/10 train/val/test assignment from a SALTED hash gate (the
    salt decouples split assignment from any sampling gate so the two
    decisions are independent). Emits the per-doc assignment — the
    thing a pipeline joins against — plus the gate for auditability."""
    docs = t(spark, sf_dir, "documents")
    g = _gate(F.col("doc_id").cast("string"), seed=SPLIT_SEED)
    split = (
        F.when(g < TRAIN_PCT * 100, F.lit("train"))
        .when(g < (TRAIN_PCT + VAL_PCT) * 100, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return docs.select(
        "doc_id",
        "source",
        g.alias("gate"),
        split.alias("split"),
    )


TRAIN_TEST_SPLIT_SQL = f"""
SELECT doc_id, source,
       {_gate_sql("doc_id::VARCHAR", SPLIT_SEED)} AS gate,
       CASE WHEN {_gate_sql("doc_id::VARCHAR", SPLIT_SEED)} < {TRAIN_PCT * 100}
                 THEN 'train'
            WHEN {_gate_sql("doc_id::VARCHAR", SPLIT_SEED)} < {(TRAIN_PCT + VAL_PCT) * 100}
                 THEN 'val'
            ELSE 'test' END AS split
FROM documents
"""


def per_source_topk_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-K deterministic sample per source: rank rows inside each
    source by (hash gate, doc_id) and keep the first K — a fixed-size
    quota sample with reservoir-sampling statistics but zero state and
    full reproducibility.

    Scale shape: one shuffle on ``source`` for the ranking window; at
    very high cardinality per group, swap the window for the same
    mapInPandas local-top-k contraction used by
    ``embedding_knn_partial_topk`` (bounded shuffle); shape documented
    there."""
    docs = t(spark, sf_dir, "documents")
    g = _gate(F.col("doc_id").cast("string"))
    w = Window.partitionBy("source").orderBy("gate", "doc_id")
    return (
        docs.select("doc_id", "source", "n_chars", g.alias("gate"))
        .withColumn("rk", F.row_number().over(w).cast("long"))
        .where(F.col("rk") <= PER_SOURCE_K)
    )


PER_SOURCE_TOPK_SQL = f"""
SELECT doc_id, source, n_chars, gate, rk FROM (
    SELECT doc_id, source, n_chars,
           {_gate_sql("doc_id::VARCHAR")} AS gate,
           row_number() OVER (
               PARTITION BY source
               ORDER BY {_gate_sql("doc_id::VARCHAR")}, doc_id
           ) AS rk
    FROM documents
) WHERE rk <= {PER_SOURCE_K}
"""


SAMPLING_SPECS = [
    QuerySpec(
        "stratified_sample_documents",
        stratified_sample_documents,
        STRATIFIED_SAMPLE_SQL,
        ("sample-hash-gate",),
    ),
    QuerySpec(
        "train_test_split_assignment",
        train_test_split_assignment,
        TRAIN_TEST_SPLIT_SQL,
        ("train-test-split",),
    ),
    QuerySpec(
        "per_source_topk_sample",
        per_source_topk_sample,
        PER_SOURCE_TOPK_SQL,
        ("quota-sample",),
    ),
]
