"""Cohen's kappa annotator-agreement query (VERDICT r12 #5): the
hand-computed-example contract, plus the exact-rational identity the
emission relies on."""

from __future__ import annotations

from fractions import Fraction

from ai_powered_e_commerce_analytics_spark.plans.profiling import (
    sentiment_annotator_kappa,
)

# texts → (annotator A label, annotator B label), worked by hand from
# the lexicons: A pos={fast,big} neg={slow,small}; B pos={fast} neg={slow}
_DOCS = [
    "fast big",        # (pos, pos)
    "fast",            # (pos, pos)
    "slow small",      # (neg, neg)
    "big",             # (pos, neu)
    "small",           # (neg, neu)
    "word",            # (neu, neu)
    "fast slow",       # (neu, neu)  1-1 ties both sides
    "big small",       # (neu, neu)  A ties, B sees nothing
    "slow",            # (neg, neg)
    "fast fast slow",  # (pos, pos)  2-1 both sides
]
# confusion: (pos,pos)=3 (neg,neg)=2 (neu,neu)=3 (pos,neu)=1 (neg,neu)=1
# N=10, po_num=8; row A: pos 4, neg 3, neu 3; col B: pos 3, neg 2, neu 5
# pe_num = 4*3 + 3*2 + 3*5 = 33
# kappa = (8*10 - 33) / (100 - 33) = 47/67


def test_kappa_hand_computed_example(spark, tmp_path):
    sf = str(tmp_path)
    spark.createDataFrame(
        [(i, s) for i, s in enumerate(_DOCS)], "doc_id long, text string"
    ).coalesce(1).write.parquet(f"{sf}/documents.parquet")

    rows = sentiment_annotator_kappa(spark, sf).collect()
    cells = {(r["label_a"], r["label_b"]): r["n"] for r in rows}
    assert cells == {
        ("pos", "pos"): 3,
        ("neg", "neg"): 2,
        ("neu", "neu"): 3,
        ("pos", "neu"): 1,
        ("neg", "neu"): 1,
    }
    r = rows[0]
    assert r["n_docs"] == 10 and r["po_num"] == 8 and r["pe_num"] == 33
    assert r["kappa_num"] == 47 and r["kappa_den"] == 67
    assert r["kappa"] == 47 / 67
    assert r["po"] == 0.8 and r["pe"] == 0.33
    # marginals ride every cell row
    by_a = {r["label_a"]: r["row_total"] for r in rows}
    by_b = {r["label_b"]: r["col_total"] for r in rows}
    assert by_a == {"pos": 4, "neg": 3, "neu": 3}
    assert by_b == {"pos": 3, "neg": 2, "neu": 5}
    # the scalar columns are constant across rows
    for r2 in rows:
        assert (r2["kappa_num"], r2["kappa_den"]) == (47, 67)


def test_kappa_rational_identity_matches_textbook_formula(spark, tmp_path):
    """The emitted integer rational equals the textbook
    (po − pe)/(1 − pe) computed in exact fractions."""
    sf = str(tmp_path)
    spark.createDataFrame(
        [(i, s) for i, s in enumerate(_DOCS)], "doc_id long, text string"
    ).coalesce(1).write.parquet(f"{sf}/documents.parquet")
    r = sentiment_annotator_kappa(spark, sf).collect()[0]
    n = r["n_docs"]
    po = Fraction(r["po_num"], n)
    pe = Fraction(r["pe_num"], n * n)
    assert Fraction(r["kappa_num"], r["kappa_den"]) == (po - pe) / (1 - pe)


def test_kappa_perfect_agreement_is_one(spark, tmp_path):
    sf = str(tmp_path)
    spark.createDataFrame(
        [(0, "fast"), (1, "slow"), (2, "word")],
        "doc_id long, text string",
    ).coalesce(1).write.parquet(f"{sf}/documents.parquet")
    rows = sentiment_annotator_kappa(spark, sf).collect()
    assert all(r["label_a"] == r["label_b"] for r in rows)
    assert all(r["kappa"] == 1.0 for r in rows)


def test_kappa_degenerate_single_class_is_null(spark, tmp_path):
    """pe = 1 (all mass in one cell both sides) → kappa undefined:
    emitted NULL, never a divide-by-zero."""
    sf = str(tmp_path)
    spark.createDataFrame(
        [(0, "word"), (1, "other")], "doc_id long, text string"
    ).coalesce(1).write.parquet(f"{sf}/documents.parquet")
    rows = sentiment_annotator_kappa(spark, sf).collect()
    assert len(rows) == 1 and rows[0]["kappa_den"] == 0
    assert rows[0]["kappa"] is None
