"""Bradley-Terry aggregation of pairwise judgments (LLM-judge / RLHF
preference primitive)."""

from __future__ import annotations

from ai_powered_e_commerce_analytics_spark.plans.profiling import (
    _bt_mm,
    llm_judge_bradley_terry,
)

from conftest import SF_DIR


def _reference_mm(items, sym, wins, rounds=200):
    """Textbook unquantized MM to (near) convergence — the ground truth
    the micro fixed-point loop must approximate."""
    p = {i: 1.0 for i in items}
    for _ in range(rounds):
        s = {}
        for i, j, n in sym:
            s[i] = s.get(i, 0.0) + n / (p[i] + p[j])
        q = {i: wins.get(i, 0) / s[i] for i in items}
        mean = sum(q.values()) / len(items)
        p = {i: q[i] / mean for i in items}
    return p


def test_bt_mm_matches_textbook_on_planted_matrix():
    """Transitive planted tournament a >> b >> c: the fixed-point loop
    lands within a micro-grid whisker of the converged textbook MM, and
    the strength order follows the dominance order."""
    items = ["a", "b", "c"]
    # a beats b 9:1, b beats c 9:1, a beats c 9:1 (10 games per pair)
    pairs = {("a", "b"): 10, ("b", "c"): 10, ("a", "c"): 10}
    wins = {"a": 18, "b": 10, "c": 2}
    sym = []
    for (i, j), n in pairs.items():
        sym += [(i, j, n), (j, i, n)]
    # at convergence depth the fixed-point loop lands within a
    # micro-grid whisker of the textbook values
    got = _bt_mm(items, sym, wins, rounds=100)
    ref = _reference_mm(items, sym, wins)
    for i in items:
        assert abs(got[i] / 1e6 - ref[i]) < 5e-3, (i, got[i], ref[i])
    assert got["a"] > got["b"] > got["c"]
    # the mean-1e6 normalization pins the free scale
    assert abs(sum(got.values()) / len(items) - 1_000_000) <= len(items)
    # the registry's default depth already ranks correctly and is
    # within a few percent of converged on this skewed matrix
    at_default = _bt_mm(items, sym, wins)
    assert at_default["a"] > at_default["b"] > at_default["c"]
    for i in items:
        assert abs(at_default[i] / 1e6 - ref[i]) < 0.1


def test_bt_never_wins_item_scores_zero():
    items = ["a", "z"]
    sym = [("a", "z", 10), ("z", "a", 10)]
    got = _bt_mm(items, sym, {"a": 10})
    assert got["z"] == 0
    assert got["a"] == 2_000_000  # mean normalization over two items


def test_bt_query_fixture_invariants(spark):
    rows = llm_judge_bradley_terry(spark, SF_DIR).collect()
    assert len(rows) == 20
    # exact accounting: total wins == total judgments == half the
    # symmetric comparison mass
    n_wins = sum(r["n_wins"] for r in rows)
    n_comp = sum(r["n_comparisons"] for r in rows)
    assert n_comp == 2 * n_wins and n_wins > 0
    # scale pinned to mean 1.0 within rounding
    assert abs(sum(r["bt_micro"] for r in rows) / len(rows) - 1_000_000) <= 20
    for r in rows:
        assert r["bt_score"] == r["bt_micro"] / 1e6
        assert 0 <= r["n_wins"] <= r["n_comparisons"]
    # strength correlates with win rate at the extremes: the best
    # win-rate source outranks the worst
    by_wr = sorted(rows, key=lambda r: r["n_wins"] / r["n_comparisons"])
    assert by_wr[-1]["bt_micro"] > by_wr[0]["bt_micro"]


def test_calibration_matches_duckdb_oracle(spark):
    """llm_judge_calibration vs its unrolled-MM DuckDB oracle,
    bit-exact on every column — the same gate the driver runs, exercised
    in-suite because the QuerySpec registers in r15 (the r14 driver
    window is exactly full; see the function's registry note)."""
    import duckdb
    import numpy as np

    from ai_powered_e_commerce_analytics_spark.plans.profiling import (
        _bt_calibration_sql,
        llm_judge_calibration,
    )

    sdf = llm_judge_calibration(spark, SF_DIR).toPandas()
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF_DIR}/documents.parquet')"
    )
    odf = con.execute(_bt_calibration_sql()).df()
    cols = sorted(sdf.columns)
    a = sdf[cols].sort_values(cols).reset_index(drop=True)
    b = odf[cols].sort_values(cols).reset_index(drop=True)
    assert a.shape == b.shape and a.shape[0] >= 3
    for c in cols:
        assert np.array_equal(a[c].to_numpy(), b[c].to_numpy()), c


def test_calibration_invariants(spark):
    """Reliability-diagram semantics: predicted is the BT model's own
    win probability for the favored side, so it must rise with the gap
    bucket and stay in [0.5, 1]; counts must conserve against the BT
    leaderboard's comparison totals (each unordered pair counted once
    here, twice in the per-source totals)."""
    from ai_powered_e_commerce_analytics_spark.plans.profiling import (
        llm_judge_bradley_terry,
        llm_judge_calibration,
    )

    rows = sorted(
        llm_judge_calibration(spark, SF_DIR).collect(),
        key=lambda r: r["gap_bucket"],
    )
    assert rows
    preds = [r["predicted"] for r in rows]
    assert all(0.5 <= p <= 1.0 for p in preds), preds
    assert preds == sorted(preds), preds  # monotone in the gap
    for r in rows:
        assert 0.0 <= r["observed"] <= 1.0
        assert r["n_comparisons"] >= r["n_pairs"] >= 1
        assert 0 <= r["fav_wins"] <= r["n_comparisons"]
    bt = llm_judge_bradley_terry(spark, SF_DIR).collect()
    assert sum(r["n_comparisons"] for r in rows) * 2 == sum(
        r["n_comparisons"] for r in bt
    )


def test_position_bias_matches_duckdb_oracle(spark):
    """llm_judge_position_bias vs its DuckDB oracle, bit-exact on every
    column — exercised in-suite ahead of its r16 registration (the r15
    window is exactly full; see the function's registry note)."""
    import duckdb
    import numpy as np

    from ai_powered_e_commerce_analytics_spark.plans.profiling import (
        _bt_position_bias_sql,
        llm_judge_position_bias,
    )

    for sf_dir in (SF_DIR, "/root/testdata/sf0.01"):
        sdf = llm_judge_position_bias(spark, sf_dir).toPandas()
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{sf_dir}/documents.parquet')"
        )
        odf = con.execute(_bt_position_bias_sql()).df()
        cols = sorted(sdf.columns)
        a = sdf[cols].sort_values(cols).reset_index(drop=True)
        b = odf[cols].sort_values(cols).reset_index(drop=True)
        assert a.shape == b.shape and a.shape[0] >= 3, sf_dir
        for c in cols:
            assert np.array_equal(a[c].to_numpy(), b[c].to_numpy()), (
                sf_dir, c,
            )


def test_position_bias_consistent_with_bt_fold(spark):
    """The monitor re-derives the (winner, loser) contraction and the
    MM scores from its slot-preserving grain; both must equal
    _bt_collect_fold's on the same corpus (the audit cannot
    desynchronize from the judgments it audits), and its comparison
    totals must conserve against the calibration fold's pair counts."""
    from ai_powered_e_commerce_analytics_spark.plans.profiling import (
        _bt_collect_fold,
        _bt_slot_judgments,
        llm_judge_position_bias,
    )
    import pyspark.sql.functions as F

    wl_ref, _, und_ref, _, _, _ = _bt_collect_fold(spark, SF_DIR)
    rows = (
        _bt_slot_judgments(spark, SF_DIR)
        .groupBy("src_a", "src_b")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("a_won").cast("long")).alias("n_a_wins"),
        )
        .collect()
    )
    wl = {}
    for r in rows:
        aw, bw = int(r["n_a_wins"]), int(r["n"]) - int(r["n_a_wins"])
        if aw:
            wl[(r["src_a"], r["src_b"])] = (
                wl.get((r["src_a"], r["src_b"]), 0) + aw
            )
        if bw:
            wl[(r["src_b"], r["src_a"])] = (
                wl.get((r["src_b"], r["src_a"]), 0) + bw
            )
    assert wl == wl_ref
    out = llm_judge_position_bias(spark, SF_DIR).collect()
    got_pairs = {(r.s_lo, r.s_hi): r.n_comparisons for r in out}
    assert got_pairs == und_ref
    for r in out:
        assert 0 <= r.n_first_wins <= r.n_comparisons
        assert 0.0 <= r.predicted <= 1.0 and 0.0 <= r.observed <= 1.0


def test_position_bias_neutral_on_planted_alternating_tournament(
    spark, tmp_path
):
    """Exactness check with a known answer: sources S (always longer)
    and T alternate slots, S wins every judgment. BT then puts ALL
    strength on S (a never-winner scores exactly zero on the micro
    grid), so the predicted first-slot wins are exactly the judgments
    where S sat in slot A — predicted == observed, a perfectly
    position-neutral reading, with no tolerance needed."""
    from ai_powered_e_commerce_analytics_spark.plans.profiling import (
        llm_judge_position_bias,
    )

    docs = spark.createDataFrame(
        [
            (i, "ST"[i % 2], 100 if i % 2 == 0 else 50)
            for i in range(11)
        ],
        "doc_id long, source string, n_chars long",
    )
    docs.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    rows = llm_judge_position_bias(spark, str(tmp_path)).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.s_lo, r.s_hi) == ("S", "T")
    assert r.n_comparisons == 10
    # S sits in slot A in the 5 even-start pairs and wins all of them
    assert r.n_first_wins == 5
    assert r.pred_first_micro == 5_000_000
    assert r.predicted == r.observed == 0.5
