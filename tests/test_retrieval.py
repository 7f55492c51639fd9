"""BM25 retrieval ranking: plan shape + semantic sanity.

Value-level correctness is covered by the DuckDB oracle battery
(test_queries_oracle.py); here we pin the scale-relevant plan properties
and the ranking semantics.
"""

from __future__ import annotations

from ai_powered_e_commerce_analytics_spark.plans.retrieval import (
    BM25_QUERY_TERMS,
    BM25_TOP_K,
    bm25_rank_topk,
)


def test_bm25_plan_shape(spark, sf_dir):
    df = bm25_rank_topk(spark, sf_dir)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    # global top-K must be the engine's bounded TakeOrderedAndProject,
    # never a window (single-task corpus sort) — and no Python islands.
    assert "TakeOrderedAndProject" in plan, plan
    assert "Window" not in plan, plan
    assert "MapInPandas" not in plan, plan


def test_bm25_one_tokenization_pass(spark, sf_dir):
    # stats agg and scoring probe must share ONE tokenize exchange: the
    # final adaptive plan reuses the repartition stage.
    df = bm25_rank_topk(spark, sf_dir)
    df.collect()
    executed = df._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in executed
    assert "ReusedExchange" in executed or "ReusedQueryStage" in executed, (
        executed
    )


def test_bm25_ranking_semantics(spark, sf_dir):
    rows = bm25_rank_topk(spark, sf_dir).collect()
    assert 0 < len(rows) <= BM25_TOP_K
    # emitted in no guaranteed order after the payload join — sort here
    ranked = sorted(rows, key=lambda r: (-r.score, r.doc_id))
    scores = [r.score for r in ranked]
    assert scores == sorted(scores, reverse=True)
    assert all(0 <= r.n_terms_matched <= len(BM25_QUERY_TERMS) for r in rows)
    # every positive score implies at least one matched term
    assert all(r.n_terms_matched > 0 for r in rows if r.score > 0)
