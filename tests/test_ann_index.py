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


def _shifted_vectors(spark, n=8, shift=5.0, id_base=200_000):
    """Planted drift: existing embeddings translated far from the
    trained codebook's support — they encode under the frozen artifacts
    (append contract) but the codes can no longer discriminate them."""
    import pandas as pd

    pdf = pd.read_parquet(f"{SF_DIR}/embeddings.parquet").sort_values(
        "vec_id"
    ).head(n)
    return spark.createDataFrame(
        [
            (id_base + i, [float(x) + shift for x in emb])
            for i, emb in enumerate(pdf["embedding"])
        ],
        "vec_id long, emb array<double>",
    )


def test_compaction_bounds_files_and_preserves_search(spark, tmp_path):
    """VERDICT r11 #4: N appends -> compact -> search bit-identical +
    bounded file count; the superseded generation survives the swap
    (retention grace) and is swept by the NEXT compaction."""
    import os

    from ai_powered_e_commerce_analytics_spark.operators.ann_index import (
        append_to_index,
        compact_index,
        index_code_files,
    )

    out = str(tmp_path / "idx")
    manifest = build_ivfpq_index(
        spark, SF_DIR, out, table="t_ann_codes_compact", buckets=8
    )
    for i in range(3):
        append_to_index(
            spark, out, _shifted_vectors(spark, n=4, id_base=300_000 + 10 * i)
        )
    pre_files = index_code_files(out)
    pre = sorted(
        tuple(r)
        for r in ivfpq_search(spark, out, _queries(spark), k=25).collect()
    )

    m1 = compact_index(spark, out)
    assert m1["generation"] == 1 and m1["table"] == "t_ann_codes_compact__g1"
    post_files = index_code_files(out)
    post = sorted(
        tuple(r)
        for r in ivfpq_search(spark, out, _queries(spark), k=25).collect()
    )
    assert post == pre, "search changed across compaction"
    assert len(post_files) < len(pre_files)
    # ~one file per non-empty bucket after the bucket-keyed repartition
    assert len(post_files) <= m1["buckets"]
    # retention grace: generation 0 still on disk for in-flight readers
    assert os.path.isdir(manifest["codes_path"])
    assert m1["pending_gc"][0]["path"] == manifest["codes_path"]

    m2 = compact_index(spark, out)
    assert m2["generation"] == 2
    assert not os.path.isdir(manifest["codes_path"]), "g0 not swept"
    post2 = sorted(
        tuple(r)
        for r in ivfpq_search(spark, out, _queries(spark), k=25).collect()
    )
    assert post2 == pre


def test_recall_monitor_from_persisted_index_matches_in_plan(
    spark, tmp_path
):
    """VERDICT r11 #8: pointing the recall monitor at a freshly built
    index artifact returns exactly the in-plan monitor's ADC columns —
    the production check measures the SERVED index, same math."""
    from ai_powered_e_commerce_analytics_spark.operators.ann_index import (
        ivfpq_recall_from_index,
    )
    from ai_powered_e_commerce_analytics_spark.plans.simsearch import (
        simsearch_ivfpq_recall,
    )

    out = str(tmp_path / "idx")
    build_ivfpq_index(
        spark, SF_DIR, out, table="t_ann_codes_monitor", buckets=8
    )
    from_index = sorted(
        tuple(r)
        for r in ivfpq_recall_from_index(spark, SF_DIR, out).collect()
    )
    in_plan = sorted(
        (r["query_id"], r["n_hits_adc"], r["recall_adc"])
        for r in simsearch_ivfpq_recall(spark, SF_DIR).collect()
    )
    assert from_index == in_plan and len(from_index) > 0


def test_health_check_flags_planted_drift(spark, tmp_path):
    """VERDICT r11 #4 (policy half): the health check's recall over a
    drifted corpus drops below the clean index's, and the retrain flag
    fires at a floor between the two. Planted drift = the corpus was
    RE-EMBEDDED under the stale index (the classic upstream
    model-version bump): the id<->vector association rotates, so the
    exact ground truth relabels while the stored codes still rank the
    old geometry — recall collapses, which is exactly what the monitor
    exists to catch."""
    from ai_powered_e_commerce_analytics_spark.operators.ann_index import (
        check_index_health,
    )
    from ai_powered_e_commerce_analytics_spark.plans.simsearch import (
        KNN_QUERIES,
    )

    out = str(tmp_path / "idx")
    build_ivfpq_index(
        spark, SF_DIR, out, table="t_ann_codes_health", buckets=8
    )
    base_corpus = _emb(spark, SF_DIR).select("vec_id", "emb")
    n_corpus = base_corpus.count()
    clean_queries = _queries(spark).select("query_id", "q_emb")
    clean = check_index_health(
        spark, out, clean_queries, base_corpus, recall_floor=0.0
    )
    assert clean["n_queries"] == KNN_QUERIES

    # re-embedded corpus: every id now carries another id's vector
    drift_corpus = base_corpus.select(
        ((F.col("vec_id") + 101) % n_corpus).alias("vec_id"), "emb"
    )
    drift_queries = drift_corpus.where(
        F.col("vec_id") < KNN_QUERIES
    ).select(F.col("vec_id").alias("query_id"), F.col("emb").alias("q_emb"))
    bad = check_index_health(
        spark, out, drift_queries, drift_corpus, recall_floor=0.0
    )
    assert bad["recall"] < clean["recall"], (bad["recall"], clean["recall"])

    floor = (bad["recall"] + clean["recall"]) / 2
    assert check_index_health(
        spark, out, drift_queries, drift_corpus, recall_floor=floor
    )["retrain_needed"]
    assert not check_index_health(
        spark, out, clean_queries, base_corpus, recall_floor=floor
    )["retrain_needed"]


def test_serving_path_rerank_matches_in_plan(spark, tmp_path):
    """Two-stage search through the PERSISTED index equals the
    oracle-gated in-plan rerank row-for-row on a fresh index."""
    from ai_powered_e_commerce_analytics_spark.operators.ann_index import (
        ivfpq_search_rerank,
    )
    from ai_powered_e_commerce_analytics_spark.plans.simsearch import (
        simsearch_ivfpq_rerank,
    )

    out = str(tmp_path / "idx")
    build_ivfpq_index(
        spark, SF_DIR, out, table="t_ann_codes_rerank", buckets=8
    )
    vectors = _emb(spark, SF_DIR).select("vec_id", "emb")
    served = sorted(
        tuple(r)
        for r in ivfpq_search_rerank(
            spark, out, _queries(spark), vectors
        ).collect()
    )
    in_plan = sorted(
        tuple(r) for r in simsearch_ivfpq_rerank(spark, SF_DIR).collect()
    )
    assert served == in_plan and len(served) > 0


def test_opq_index_roundtrip_and_serving(spark, tmp_path):
    """r12 OPQ-rotated index: PQ trains/encodes in rotated coordinates,
    the rotation persists as a fourth artifact, and build / append /
    search stay mutually consistent:

    - encode_vectors over the ORIGINAL corpus reproduces the stored
      code rows exactly (build-side and append-side rotation agree);
    - an appended duplicate of a query's own vector achieves the
      minimum ADC score among all returned candidates (per-subspace
      argmin cells in rotated space x rotated-query LUT);
    - compaction preserves search results on the opq flavor too.
    """
    import os

    from ai_powered_e_commerce_analytics_spark.operators.ann_index import (
        append_to_index,
        compact_index,
        encode_vectors,
        ivfpq_search,
    )

    out = str(tmp_path / "idx")
    manifest = build_ivfpq_index(
        spark, SF_DIR, out, table="t_ann_codes_opq", buckets=8, opq=True
    )
    assert manifest["opq"] is True
    assert os.path.isdir(f"{out}/rotation")

    # round-trip: re-encoding the corpus reproduces the stored codes
    corpus = _emb(spark, SF_DIR).select("vec_id", "emb")
    stored = sorted(
        (int(r["vec_id"]), int(r["m"]), int(r["pq_cid"]), int(r["ivf_cid"]))
        for r in spark.table("t_ann_codes_opq").collect()
    )
    reencoded = sorted(
        (int(r["vec_id"]), int(r["m"]), int(r["pq_cid"]), int(r["ivf_cid"]))
        for r in encode_vectors(spark, out, corpus).collect()
    )
    assert reencoded == stored and len(stored) > 0

    # appended self-duplicates score at the ADC minimum for their query
    import pandas as pd

    pdf = pd.read_parquet(f"{SF_DIR}/embeddings.parquet").sort_values(
        "vec_id"
    ).head(3)
    dup_ids = {i: 400_000 + i for i in range(len(pdf))}
    append_to_index(
        spark,
        out,
        spark.createDataFrame(
            [
                (dup_ids[i], [float(x) for x in emb])
                for i, emb in enumerate(pdf["embedding"])
            ],
            "vec_id long, emb array<double>",
        ),
    )
    q = _queries(spark).where(F.col("query_id") < len(pdf))
    rows = ivfpq_search(spark, out, q, k=400).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(int(r["query_id"]), []).append(r)
    for qid, dup_id in dup_ids.items():
        scores = {int(r["neighbor_id"]): int(r["adc_micro"]) for r in by_q[qid]}
        assert dup_id in scores, qid
        assert scores[dup_id] == min(scores.values()), qid

    # compaction keeps the opq search bit-identical
    pre = sorted(tuple(r) for r in ivfpq_search(spark, out, q, k=25).collect())
    compact_index(spark, out)
    post = sorted(tuple(r) for r in ivfpq_search(spark, out, q, k=25).collect())
    assert post == pre


def test_codes_table_reregisters_from_manifest(spark, tmp_path):
    """r12: the artifacts (files + manifest), not the session catalog,
    are the index's durable truth — a serving session that never built
    the index (simulated by DROPping the catalog entry) re-registers
    the bucketed table from the manifest and serves identically, with
    the bucket spec (and therefore pruning) intact."""
    out = str(tmp_path / "idx")
    build_ivfpq_index(
        spark, SF_DIR, out, table="t_ann_codes_rereg", buckets=8
    )
    expected = sorted(
        tuple(r) for r in ivfpq_search(spark, out, _queries(spark)).collect()
    )
    spark.sql("DROP TABLE t_ann_codes_rereg")
    assert not spark.catalog.tableExists("t_ann_codes_rereg")
    served = sorted(
        tuple(r) for r in ivfpq_search(spark, out, _queries(spark)).collect()
    )
    assert served == expected and len(served) > 0
    # the re-registered entry is bucketed (DESCRIBE shows the spec)
    desc = "\n".join(
        f"{r['col_name']} {r['data_type']}"
        for r in spark.sql("DESCRIBE EXTENDED t_ann_codes_rereg").collect()
    )
    assert "Num Buckets 8" in desc and "ivf_cid" in desc, desc


def test_stale_same_name_catalog_entry_is_not_trusted(spark, tmp_path):
    """ADVICE r12: two indexes built under the SAME table name into
    different out_dirs — the later build leaves the catalog entry
    pointing at ITS files, so serving the earlier index by name alone
    would silently read the wrong data. _ensure_table now verifies the
    catalog location against the manifest's codes_path and recreates
    the entry on mismatch (a sentinel appended only to index B must
    never surface from index A's search)."""
    from ai_powered_e_commerce_analytics_spark.operators.ann_index import (
        append_to_index,
    )

    out_a = str(tmp_path / "idx_a")
    out_b = str(tmp_path / "idx_b")
    build_ivfpq_index(spark, SF_DIR, out_a, table="t_ann_codes_stale", buckets=8)
    build_ivfpq_index(spark, SF_DIR, out_b, table="t_ann_codes_stale", buckets=8)
    # sentinel only in B: a duplicate of query 0's vector under a fresh id
    import pandas as pd

    emb = (
        pd.read_parquet(f"{SF_DIR}/embeddings.parquet")
        .sort_values("vec_id")["embedding"]
        .iloc[0]
    )
    append_to_index(
        spark,
        out_b,
        spark.createDataFrame(
            [(900_000, [float(x) for x in emb])], "vec_id long, emb array<double>"
        ),
    )
    q = _queries(spark).where(F.col("query_id") == 0)
    # catalog entry currently points at B (the later build) — serving A
    # must re-point it at A's files, where the sentinel does not exist
    a_ids = {
        int(r["neighbor_id"])
        for r in ivfpq_search(spark, out_a, q, k=400).collect()
    }
    assert 900_000 not in a_ids and a_ids
    b_ids = {
        int(r["neighbor_id"])
        for r in ivfpq_search(spark, out_b, q, k=400).collect()
    }
    assert 900_000 in b_ids


def test_rebuild_carries_pending_gc_no_leak(spark, tmp_path):
    """ADVICE r12: rebuilding into an out_dir that already holds a
    compacted index must not leak the old generation dirs — they carry
    into the new manifest's pending_gc (retention grace) and the next
    compaction sweeps them; entries naming the live generation's path
    or table are filtered so the sweep can never delete the new index."""
    import os

    from ai_powered_e_commerce_analytics_spark.operators.ann_index import (
        append_to_index,
        compact_index,
    )

    out = str(tmp_path / "idx")
    build_ivfpq_index(spark, SF_DIR, out, table="t_ann_codes_rebuild", buckets=8)
    append_to_index(spark, out, _shifted_vectors(spark, n=2, id_base=500_000))
    m1 = compact_index(spark, out)  # g1 live, g0 tombstoned
    g1_path = m1["codes_path"]
    assert os.path.isdir(g1_path)

    m_re = build_ivfpq_index(
        spark, SF_DIR, out, table="t_ann_codes_rebuild", buckets=8
    )
    # old g1 generation carried into pending_gc; nothing names the new
    # live codes dir
    carried = {v["path"] for v in m_re["pending_gc"]}
    assert g1_path in carried
    assert all(
        os.path.abspath(p) != os.path.abspath(m_re["codes_path"])
        for p in carried
    )
    expected = sorted(
        tuple(r)
        for r in ivfpq_search(spark, out, _queries(spark), k=25).collect()
    )

    m2 = compact_index(spark, out)  # sweeps the carried g1
    assert not os.path.isdir(g1_path), "rebuild leaked the old generation"
    post = sorted(
        tuple(r)
        for r in ivfpq_search(spark, out, _queries(spark), k=25).collect()
    )
    assert post == expected
    # and the live generation is intact on disk
    assert os.path.isdir(m2["codes_path"])


def test_append_racing_compaction_reappends_into_new_generation(
    spark, tmp_path, monkeypatch
):
    """ADVICE r12 (medium): an append that writes into generation g
    AFTER a concurrent compaction scanned g would land its rows in the
    tombstoned directory and lose them to the next retention sweep.
    append_to_index now re-reads the manifest after its write and
    re-appends rows missing from the live generation. Simulated race:
    the append's FIRST manifest read is patched to return the stale g0
    manifest while compaction has already published g1 — exactly the
    interleaving where the insert lands in the dead generation."""
    from ai_powered_e_commerce_analytics_spark.operators import ann_index

    out = str(tmp_path / "idx")
    build_ivfpq_index(spark, SF_DIR, out, table="t_ann_codes_race", buckets=8)
    stale = ann_index._load_manifest(out)  # generation 0
    live = ann_index.compact_index(spark, out)  # generation 1 live
    assert live["generation"] == 1

    real_load = ann_index._load_manifest
    calls = {"n": 0}

    def racy_load(out_dir):
        calls["n"] += 1
        return dict(stale) if calls["n"] == 1 else real_load(out_dir)

    # append two duplicates of query 0's own vector: their coarse cell
    # is certainly probed by query 0, so the post-compaction search
    # below must surface them
    import pandas as pd

    emb0 = (
        pd.read_parquet(f"{SF_DIR}/embeddings.parquet")
        .sort_values("vec_id")["embedding"]
        .iloc[0]
    )
    dup = spark.createDataFrame(
        [(600_000 + i, [float(x) for x in emb0]) for i in range(2)],
        "vec_id long, emb array<double>",
    )
    monkeypatch.setattr(ann_index, "_load_manifest", racy_load)
    n = ann_index.append_to_index(spark, out, dup)
    monkeypatch.undo()
    assert n == 2 * 4 and calls["n"] >= 2

    # the appended rows live in the g1 table (not only the tombstoned g0)
    g1_ids = {
        int(r["vec_id"])
        for r in spark.table(live["table"])
        .where(F.col("vec_id") >= 600_000)
        .collect()
    }
    assert g1_ids == {600_000, 600_001}

    # and they survive the next compaction's sweep of g0
    ann_index.compact_index(spark, out)
    q = _queries(spark).where(F.col("query_id") == 0)
    ids = {
        int(r["neighbor_id"])
        for r in ann_index.ivfpq_search(spark, out, q, k=500).collect()
    }
    assert {600_000, 600_001} <= ids
