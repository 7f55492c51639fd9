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


TOKEN_BUDGET = 500       # per-source curriculum token budget (selective
                         # even at sf0.01: ~25 docs x ~50 tokens per source)


def token_budget_curriculum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-ordered token-budget selection: per source, take documents
    in descending quality (text_quality's score; doc_id tiebreak) until
    the cumulative token count reaches the budget — the "fill each
    source's token quota with its best documents" step of pretraining
    curriculum construction.

    A doc is selected iff the budget was not yet exhausted when it
    starts (``cum − own < budget``), so the last selected doc may
    straddle the boundary — deterministic, and the downstream chunker
    (pretrain.doc_chunk_tokens) handles trimming.

    Scale: one window shuffle on ``source``; the quality score and token
    count are per-row maps. Ordering is deterministic cross-engine: the
    score is an exact-integer-derived double (bit-identical in both
    engines), ties broken by doc_id.

    Source cardinality is LOW (tens), so at 100 TB each window partition
    is corpus-scale — the production swap is the two-pass contraction
    documented at :func:`per_source_topk_sample`: per-partition local
    (quality, n_tokens) top segments via mapInPandas, then a driver-size
    merge of per-partition boundaries to find each source's quality
    cutoff, then one filter pass. Same result, bounded shuffle; the
    window form is the oracle-checkable small/medium-cardinality path.
    """
    from .textops import STOPWORDS

    from ..functions import tokens

    docs = t(spark, sf_dir, "documents")
    toks = tokens("text")
    n = F.size(toks).cast("long")
    stop_ratio = (
        F.size(F.filter(toks, lambda x: x.isin(*STOPWORDS))).cast("double")
        / F.size(toks)
    )
    quality = F.least(F.lit(1.0), F.size(toks) / F.lit(100.0)) * (1 - stop_ratio)
    scored = docs.select(
        "doc_id",
        "source",
        n.alias("n_tokens"),
        quality.alias("quality_score"),
    )
    w = (
        Window.partitionBy("source")
        .orderBy(F.desc("quality_score"), "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        scored.withColumn("cum_tokens", F.sum("n_tokens").over(w))
        .where(F.col("cum_tokens") - F.col("n_tokens") < TOKEN_BUDGET)
    )


# Shared with textops: same tokenization + quality formula (oracle twins).
from .textops import _STOP_SQL as _CURR_STOP_SQL  # noqa: E402
from .textops import _TOKS_SQL as _CURR_TOKS_SQL  # noqa: E402

TOKEN_BUDGET_CURRICULUM_SQL = f"""
WITH s AS (
    SELECT doc_id, source, len(toks)::BIGINT AS n_tokens,
           least(1.0, len(toks) / 100.0)
             * (1 - len(list_filter(toks, x -> x IN {_CURR_STOP_SQL}))::DOUBLE
                    / len(toks)) AS quality_score
    FROM (SELECT doc_id, source, {_CURR_TOKS_SQL} AS toks FROM documents)
), c AS (
    SELECT *, sum(n_tokens) OVER (
        PARTITION BY source ORDER BY quality_score DESC, doc_id
        ROWS UNBOUNDED PRECEDING
    )::BIGINT AS cum_tokens FROM s
)
SELECT doc_id, source, n_tokens, quality_score, cum_tokens
FROM c WHERE cum_tokens - n_tokens < {TOKEN_BUDGET}
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
    QuerySpec(
        "token_budget_curriculum",
        token_budget_curriculum,
        TOKEN_BUDGET_CURRICULUM_SQL,
        ("curriculum-token-budget",),
    ),
]
