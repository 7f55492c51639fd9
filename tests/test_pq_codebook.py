"""Product-quantization trainer (VERDICT r10 #7).

The oracle battery (test_queries_oracle.py) covers Spark-vs-DuckDB
parity of ``embedding_pq_codebook``; here an INDEPENDENT numpy replay
re-derives the sub-codebooks and codes from the raw parquet with plain
float arithmetic on the same fixed-point grid, and the codebook
artifact's contract is pinned (shape, deterministic seeding, codes are
genuinely nearest-centroid, reconstruction error is the summed
subspace distance).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ai_powered_e_commerce_analytics_spark.plans.simsearch import (
    KMEANS_FP,
    PQ_K,
    PQ_M,
    PQ_SUBDIM,
    PQ_UPDATES,
    _INERTIA_GRID,
    embedding_pq_codebook,
    pq_codebook,
)

from conftest import SF_DIR


def _numpy_train(emb: np.ndarray):
    """Reference replay: per-subspace Lloyd with fixed-point centroid
    sums, seeding from vec_id < PQ_K (rows are vec_id-ordered)."""
    cents = {
        m: {
            cid: emb[cid, m * PQ_SUBDIM:(m + 1) * PQ_SUBDIM].copy()
            for cid in range(PQ_K)
        }
        for m in range(PQ_M)
    }
    for _ in range(PQ_UPDATES):
        nxt = {}
        for m in range(PQ_M):
            sub = emb[:, m * PQ_SUBDIM:(m + 1) * PQ_SUBDIM]
            d = np.stack(
                [((sub - cents[m][c]) ** 2).sum(axis=1) for c in
                 sorted(cents[m])],
                axis=1,
            )
            # argmin with cid tiebreak = numpy argmin (first minimum)
            assign = d.argmin(axis=1)
            nxt[m] = {}
            for c in sorted(cents[m]):
                mask = assign == c
                if not mask.any():
                    continue
                # HALF-AWAY-FROM-ZERO like Spark/DuckDB round(); the
                # embeddings land EXACTLY on 2^20-grid half boundaries,
                # where numpy's banker's rounding would diverge
                x = sub[mask] * KMEANS_FP
                fp = (np.sign(x) * np.floor(np.abs(x) + 0.5)).astype(
                    np.int64
                )
                nxt[m][c] = fp.sum(axis=0) / mask.sum() / KMEANS_FP
        cents = nxt
    return cents


def test_pq_codes_match_numpy_replay(spark):
    pdf = pd.read_parquet(f"{SF_DIR}/embeddings.parquet").sort_values(
        "vec_id"
    )
    emb = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
    cents = _numpy_train(emb)

    rows = {
        int(r["vec_id"]): r
        for r in embedding_pq_codebook(spark, SF_DIR).collect()
    }
    assert len(rows) == len(pdf)
    vec_ids = pdf["vec_id"].to_numpy()
    for m in range(PQ_M):
        sub = emb[:, m * PQ_SUBDIM:(m + 1) * PQ_SUBDIM]
        cids = sorted(cents[m])
        d = np.stack(
            [((sub - cents[m][c]) ** 2).sum(axis=1) for c in cids], axis=1
        )
        want = d.argmin(axis=1)
        for i, vid in enumerate(vec_ids):
            assert rows[int(vid)][f"code_{m}"] == cids[want[i]], (m, vid)
    # reconstruction error = summed per-subspace micro distances
    # (HALF_UP like Spark's round(); Python round() is half-to-even)
    import math

    for i, vid in enumerate(vec_ids):
        micro = 0
        for m in range(PQ_M):
            sub = emb[i, m * PQ_SUBDIM:(m + 1) * PQ_SUBDIM]
            c = cents[m][rows[int(vid)][f"code_{m}"]]
            micro += int(math.floor(((sub - c) ** 2).sum()
                                    * _INERTIA_GRID + 0.5))
        assert rows[int(vid)]["recon_err_micro"] == micro, vid
        assert rows[int(vid)]["recon_err"] == micro / float(_INERTIA_GRID)


def test_pq_codebook_artifact(spark):
    cb = pq_codebook(spark, SF_DIR).collect()
    assert len(cb) == PQ_M * PQ_K
    for r in cb:
        assert 0 <= r["m"] < PQ_M and 0 <= r["cid"] < PQ_K
        assert len(r["cemb"]) == PQ_SUBDIM
    # deterministic: a second training run emits the identical codebook
    again = pq_codebook(spark, SF_DIR).collect()
    assert sorted(map(tuple, cb)) == sorted(map(tuple, again))


def test_pca_top_component_matches_numpy(spark):
    from ai_powered_e_commerce_analytics_spark.plans.simsearch import (
        pca_top_component,
    )

    res = pca_top_component(spark, SF_DIR)
    pdf = pd.read_parquet(f"{SF_DIR}/embeddings.parquet")
    emb = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
    # reference covariance on the SAME fixed-point grid the query uses
    x = np.sign(emb * KMEANS_FP) * np.floor(np.abs(emb * KMEANS_FP) + 0.5)
    x = x / KMEANS_FP
    cov = np.cov(x, rowvar=False, bias=True)
    w, v = np.linalg.eigh(cov)
    top_val, top_vec = w[-1], v[:, -1]
    assert abs(res["eigenvalue"] - top_val) < 1e-9
    got = np.array(res["component"])
    # eigenvectors are sign-ambiguous; tolerance reflects the near-flat
    # spectrum of random embeddings (vec error ~ gap-conditioned)
    assert min(
        np.abs(got - top_vec).max(), np.abs(got + top_vec).max()
    ) < 1e-4
    assert 0.0 < res["explained"] < 1.0


def test_rerank_recall_dominates_adc(spark):
    """Two-stage search guarantee (VERDICT r11 #3): the exact re-rank
    over the R ADC candidates can never LOSE recall vs the ADC top-k —
    the re-rank uses the exact baseline's own total order (rounded
    cosine DESC, neighbor_id), so every exact-top-k member inside the
    candidate set ranks above every non-member. Asserted per query,
    plus the set-containment facts the argument rests on."""
    from ai_powered_e_commerce_analytics_spark.plans.simsearch import (
        ADC_RERANK_R,
        KNN_K,
        _ivfpq_adc,
        simsearch_ivfpq_recall,
        simsearch_ivfpq_rerank,
        simsearch_ivfpq_topk,
    )

    rows = simsearch_ivfpq_recall(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r["recall_rerank"] >= r["recall_adc"], r
        assert r["n_hits_rerank"] >= r["n_hits_adc"], r

    # containment: ADC top-k is a subset of the R-candidate pool, and
    # the reranked top-k draws only from that pool
    pool = {
        (r["query_id"], r["neighbor_id"])
        for r in _ivfpq_adc(spark, SF_DIR, k=ADC_RERANK_R).collect()
    }
    adc_topk = {
        (r["query_id"], r["neighbor_id"])
        for r in simsearch_ivfpq_topk(spark, SF_DIR).collect()
    }
    rr_topk = {
        (r["query_id"], r["neighbor_id"])
        for r in simsearch_ivfpq_rerank(spark, SF_DIR).collect()
    }
    assert adc_topk <= pool
    assert rr_topk <= pool
    # per-query output is capped at k
    import collections

    per_q = collections.Counter(q for q, _ in rr_topk)
    assert all(n <= KNN_K for n in per_q.values())
