"""Persisted IVF-PQ index (operators/ann_index.py, r11).

The serving-path contract: searching the STORED artifacts returns the
exact rows of the oracle-gated in-plan query (shared adc_topk /
adc_lut_rows — parity here proves the persisted path is the same
math), and the code scan is genuinely bucket-pruned to the probed
inverted lists (SelectedBucketsCount in the executed plan).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ai_powered_e_commerce_analytics_spark.operators.ann_index import (
    build_ivfpq_index,
    ivfpq_search,
)
from ai_powered_e_commerce_analytics_spark.plans.simsearch import (
    KNN_QUERIES,
    _emb,
    simsearch_ivfpq_topk,
)

from conftest import SF_DIR


def _queries(spark):
    return (
        _emb(spark, SF_DIR)
        .where(F.col("vec_id") < KNN_QUERIES)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("emb").alias("q_emb"),
            F.col("norm").alias("q_norm"),
        )
    )


def test_persisted_index_matches_oracle_gated_query(spark, tmp_path):
    out = str(tmp_path / "idx")
    manifest = build_ivfpq_index(
        spark, SF_DIR, out, table="t_ann_codes_parity", buckets=8
    )
    assert manifest["table"] == "t_ann_codes_parity"
    served = sorted(
        tuple(r) for r in ivfpq_search(spark, out, _queries(spark)).collect()
    )
    in_plan = sorted(
        tuple(r) for r in simsearch_ivfpq_topk(spark, SF_DIR).collect()
    )
    assert served == in_plan and len(served) > 0


def test_search_scan_is_bucket_pruned(spark, tmp_path):
    out = str(tmp_path / "idx")
    build_ivfpq_index(
        spark, SF_DIR, out, table="t_ann_codes_prune", buckets=8
    )
    # capture the executed scan plan inside the search's conf window:
    # rebuild the pruned frame the same way and explain it
    prev = spark.conf.get(
        "spark.sql.sources.bucketing.autoBucketedScan.enabled", "true"
    )
    spark.conf.set(
        "spark.sql.sources.bucketing.autoBucketedScan.enabled", "false"
    )
    try:
        pruned = spark.table("t_ann_codes_prune").where(
            F.col("ivf_cid").isin([0, 31])
        )
        plan = pruned._sc._jvm.PythonSQLUtils.explainString(
            pruned._jdf.queryExecution(), "formatted"
        )
    finally:
        spark.conf.set(
            "spark.sql.sources.bucketing.autoBucketedScan.enabled", prev
        )
    assert "SelectedBucketsCount" in plan, plan
    import re

    m = re.search(r"SelectedBucketsCount: (\d+) out of (\d+)", plan)
    assert m and int(m.group(1)) < int(m.group(2)), plan


def test_search_without_precomputed_norm(spark, tmp_path):
    # q_norm is derived when absent; same results
    out = str(tmp_path / "idx")
    build_ivfpq_index(
        spark, SF_DIR, out, table="t_ann_codes_norm", buckets=8
    )
    with_norm = sorted(
        tuple(r) for r in ivfpq_search(spark, out, _queries(spark)).collect()
    )
    without = sorted(
        tuple(r)
        for r in ivfpq_search(
            spark, out, _queries(spark).drop("q_norm")
        ).collect()
    )
    assert with_norm == without


def test_incremental_append_serves_new_vectors(spark, tmp_path):
    import math

    import numpy as np
    import pandas as pd

    from ai_powered_e_commerce_analytics_spark.operators.ann_index import (
        append_to_index,
        encode_vectors,
    )
    from ai_powered_e_commerce_analytics_spark.plans.simsearch import (
        PQ_SUBDIM,
    )

    out = str(tmp_path / "idx")
    build_ivfpq_index(
        spark, SF_DIR, out, table="t_ann_codes_incr", buckets=8
    )
    base_rows = spark.table("t_ann_codes_incr").count()

    # "new" vectors: existing embeddings shifted to fresh ids, so their
    # true nearest PQ cells are known from the stored codebook
    pdf = pd.read_parquet(f"{SF_DIR}/embeddings.parquet").sort_values(
        "vec_id"
    ).head(5)
    new_ids = [100_000 + i for i in range(len(pdf))]
    vecs = spark.createDataFrame(
        [
            (nid, [float(x) for x in emb])
            for nid, emb in zip(new_ids, pdf["embedding"])
        ],
        "vec_id long, emb array<double>",
    )
    n = append_to_index(spark, out, vecs)
    assert n == len(new_ids) * 4  # PQ_M rows per vector
    assert spark.table("t_ann_codes_incr").count() == base_rows + n

    # the appended rows' PQ codes match a numpy nearest-centroid replay
    # from the STORED codebook
    cb = {
        (int(r["m"]), int(r["cid"])): np.array(r["cemb"])
        for r in spark.read.parquet(f"{out}/codebook").collect()
    }
    got = {
        (int(r["vec_id"]), int(r["m"])): int(r["pq_cid"])
        for r in encode_vectors(spark, out, vecs).collect()
    }
    for nid, emb in zip(new_ids, pdf["embedding"]):
        emb = np.asarray(emb, dtype=np.float64)
        for m in range(4):
            sub = emb[m * PQ_SUBDIM:(m + 1) * PQ_SUBDIM]
            cids = sorted(c for (mm, c) in cb if mm == m)
            want = min(
                cids, key=lambda c: (((sub - cb[(m, c)]) ** 2).sum(), c)
            )
            assert got[(nid, m)] == want, (nid, m)

    # an appended duplicate of a query's own vector carries the
    # query's OPTIMAL ADC score (its codes are the per-subspace argmin
    # cells, so no vector can score lower — though same-code vectors
    # TIE and the id tiebreak may outrank it). Assert: rank-1's
    # adc_micro equals the theoretical minimum sum-of-min-LUT-cells,
    # and a wide search surfaces the duplicate at exactly that score.
    q = _queries(spark).where(F.col("query_id") < len(new_ids))
    res = ivfpq_search(spark, out, q, k=400)
    by_q = {}
    for r in res.collect():
        by_q.setdefault(int(r["query_id"]), []).append(r)
    for qid, emb in zip(range(len(new_ids)), pdf["embedding"]):
        emb = np.asarray(emb, dtype=np.float64)
        expected_min = 0
        for m in range(4):
            sub = emb[m * PQ_SUBDIM:(m + 1) * PQ_SUBDIM]
            expected_min += min(
                int(math.floor(((sub - cb[(m, c)]) ** 2).sum() * 1e6 + 0.5))
                for (mm, c) in cb
                if mm == m
            )
        rows = by_q[qid]
        rank1 = min(rows, key=lambda r: r["rank"])
        assert int(rank1["adc_micro"]) == expected_min, qid
        dup = [r for r in rows if int(r["neighbor_id"]) == 100_000 + qid]
        assert dup and int(dup[0]["adc_micro"]) == expected_min, qid
