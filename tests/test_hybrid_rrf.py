"""Hybrid lexical+semantic retrieval via Reciprocal Rank Fusion."""

from __future__ import annotations

from ai_powered_e_commerce_analytics_spark.plans.retrieval import (
    BM25_QUERY_TERMS,
    HYBRID_TOP_K,
    RRF_K,
    hybrid_search_rrf,
)

from conftest import SF_DIR


def test_hybrid_rrf_fixture_invariants(spark):
    rows = hybrid_search_rrf(spark, SF_DIR).collect()
    assert len(rows) == HYBRID_TOP_K
    by_rank = sorted(rows, key=lambda r: r["fused_rank"])
    assert [r["fused_rank"] for r in by_rank] == list(
        range(1, HYBRID_TOP_K + 1)
    )
    # the emitted score IS the recomputed RRF of the emitted ranks
    for r in rows:
        want = 0.0
        if r["lex_rank"] is not None:
            want += 1.0 / (float(RRF_K) + float(r["lex_rank"]))
        if r["sem_rank"] is not None:
            want += 1.0 / (float(RRF_K) + float(r["sem_rank"]))
        assert r["rrf_score"] == want, r
        assert r["lex_rank"] is not None or r["sem_rank"] is not None
    # fused order is (rrf desc, doc_id asc)
    keys = [(-r["rrf_score"], r["doc_id"]) for r in by_rank]
    assert keys == sorted(keys)


def test_hybrid_rrf_both_legs_beat_single_leg(spark, tmp_path):
    """A planted corpus where doc 5 tops BOTH legs: it must fuse at
    rank 1, above the lexical-only and semantic-only specialists."""
    sf = str(tmp_path)
    terms = " ".join(BM25_QUERY_TERMS)
    texts = {5: (terms + " ") * 6, 7: terms, 9: "unrelated words here"}
    docs = [
        (i, texts.get(i, f"filler text number {i}"), "srcA")
        for i in range(12)
    ]
    spark.createDataFrame(
        docs, "doc_id long, text string, source string"
    ).coalesce(1).write.parquet(f"{sf}/documents.parquet")

    # embeddings: vec 5 duplicates the query vector (vec 0) exactly;
    # vec 9 is very close; the rest point elsewhere
    def vec(seed, close_to_q=False, equal_q=False):
        base = [1.0] + [0.0] * 15
        if equal_q:
            return base
        if close_to_q:
            return [1.0, 0.05] + [0.0] * 14
        return [0.0] * seed + [1.0] + [0.0] * (15 - seed)

    emb = [
        (0, vec(0, equal_q=True)),
        (5, vec(0, equal_q=True)),
        (9, vec(0, close_to_q=True)),
    ] + [(i, vec(i % 14 + 1)) for i in range(12) if i not in (0, 5, 9)]
    spark.createDataFrame(
        emb, "vec_id long, embedding array<float>"
    ).coalesce(1).write.parquet(f"{sf}/embeddings.parquet")

    rows = {r["doc_id"]: r for r in hybrid_search_rrf(spark, sf).collect()}
    assert rows[5]["fused_rank"] == 1
    assert rows[5]["lex_rank"] == 1 and rows[5]["sem_rank"] == 1
    # the single-leg specialists are present but fused below doc 5
    assert rows[7]["lex_rank"] is not None
    assert rows[9]["sem_rank"] == 2
    assert rows[7]["fused_rank"] > 1 and rows[9]["fused_rank"] > 1
