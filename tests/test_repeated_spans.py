"""ExactSubstr-style repeated-span detection (Lee et al. 2022)."""

from __future__ import annotations

from ai_powered_e_commerce_analytics_spark.plans.textops import (
    REPEAT_NGRAM_N,
    dedup_repeated_ngram_spans,
)


def _write_docs(spark, tmp_path, docs):
    sf = str(tmp_path)
    spark.createDataFrame(
        [(i, s) for i, s in enumerate(docs)], "doc_id long, text string"
    ).coalesce(1).write.parquet(f"{sf}/documents.parquet")
    return sf


def test_shared_passage_flagged_in_both_docs_and_merged(spark, tmp_path):
    """A 12-token passage shared by two documents: its 8 overlapping
    5-gram shingles must merge into ONE island per doc covering exactly
    the passage's token range."""
    passage = "alpha beta gamma delta epsilon zeta eta theta iota kappa lam mu"
    assert len(passage.split()) == 12
    doc_a = "unique one two three " + passage + " tail tokens here"
    doc_b = passage + " completely different trailing words follow now"
    doc_c = "nothing shared in this document at all whatsoever"
    sf = _write_docs(spark, tmp_path, [doc_a, doc_b, doc_c])

    rows = dedup_repeated_ngram_spans(spark, sf).collect()
    spans = {r["doc_id"]: (r["span_start"], r["span_end"], r["n_shingles"])
             for r in rows}
    assert set(spans) == {0, 1}
    # doc 0: passage starts at token 4, covers [4, 16)
    assert spans[0] == (4, 16, 12 - REPEAT_NGRAM_N + 1)
    # doc 1: passage starts at token 0, covers [0, 12)
    assert spans[1] == (0, 12, 12 - REPEAT_NGRAM_N + 1)


def test_intra_document_repetition_flagged(spark, tmp_path):
    """A document repeating its OWN phrase is memorization fuel too —
    both occurrences flag, as separate islands when they don't touch."""
    phrase = "red orange yellow green blue"  # exactly N tokens
    doc = phrase + " filler filler filler filler filler " + phrase
    sf = _write_docs(
        spark, tmp_path, [doc, "completely unrelated text goes here okay"]
    )
    rows = sorted(
        (r["span_start"], r["span_end"])
        for r in dedup_repeated_ngram_spans(spark, sf).collect()
    )
    assert rows == [(0, 5), (10, 15)]


def test_unique_corpus_yields_no_spans(spark, tmp_path):
    sf = _write_docs(
        spark,
        tmp_path,
        [
            "one two three four five six seven",
            "eight nine ten eleven twelve thirteen fourteen",
        ],
    )
    assert dedup_repeated_ngram_spans(spark, sf).count() == 0


def test_adjacent_repeats_merge_into_one_span(spark, tmp_path):
    """Two repeated runs that touch end-to-start merge into one island
    (pos == prev_end is contiguous coverage, not a gap)."""
    run1 = "a b c d e"
    run2 = "f g h i j"
    doc_x = run1 + " " + run2 + " unique1 unique2 unique3"
    doc_y = run1 + " stop " + run2 + " other words entirely"
    sf = _write_docs(spark, tmp_path, [doc_x, doc_y])
    rows = {
        (r["doc_id"], r["span_start"], r["span_end"])
        for r in dedup_repeated_ngram_spans(spark, sf).collect()
    }
    # doc 0: runs at [0,5) and [5,10) are adjacent -> one span [0,10)
    assert (0, 0, 10) in rows
    # doc 1: separated by 'stop' -> two spans
    assert (1, 0, 5) in rows and (1, 6, 11) in rows
