"""BPE-merge tokenizer trainer: fold/oracle/reference equivalence.

The trainer's correctness rests on two claims proven here:

1. The Spark ``aggregate`` fold in ``_bpe_apply_merge`` and the DuckDB
   oracle's serialized ``|l||r|`` string-replace both implement greedy
   left-to-right non-overlapping merge application — property-tested
   against a pure-Python reference scan over adversarial inputs
   (single-char alphabet forces ``l == r`` run overlaps).
2. The full trainer (pair counting with Sennrich's overlapping
   adjacent-pair convention + deterministic tiebreak + application)
   matches a pure-Python reference BPE trainer end-to-end on a planted
   corpus, through the real parquet-table entry point.
"""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from ai_powered_e_commerce_analytics_spark.plans.pretrain import (
    BPE_MERGES,
    _bpe_apply_merge,
    bpe_merges_topn,
    bpe_token_counts,
)

SETTINGS = dict(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _ref_apply(syms: list[str], l: str, r: str) -> list[str]:
    """Reference greedy left-to-right non-overlapping merge scan."""
    out: list[str] = []
    i = 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
            out.append(l + r)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def _ref_train(word_freqs: dict[str, int], n: int) -> list[tuple]:
    """Reference BPE trainer: overlapping adjacent-pair counts
    (Sennrich get_stats), (count DESC, l ASC, r ASC) selection, greedy
    application."""
    state = [([*w], f) for w, f in sorted(word_freqs.items())]
    merges: list[tuple] = []
    for k in range(1, n + 1):
        counts: dict[tuple, int] = {}
        for syms, f in state:
            for pair in zip(syms, syms[1:]):
                counts[pair] = counts.get(pair, 0) + f
        if not counts:
            break
        (l, r), c = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((k, l, r, l + r, c))
        state = [(_ref_apply(s, l, r), f) for s, f in state]
    return merges


# small alphabet: runs (aaa) and re-mergeable tails are common
words = st.lists(
    st.text(alphabet="ab", min_size=1, max_size=8), min_size=1, max_size=12
)
merge_l = st.sampled_from(["a", "b", "aa", "ab", "ba"])
merge_r = st.sampled_from(["a", "b", "aa", "ab", "ba"])


@settings(**SETTINGS)
@given(ws=words, l=merge_l, r=merge_r)
def test_apply_merge_fold_matches_reference_and_oracle(spark, ws, l, r):
    # one DataFrame per example batch: each row is one word's symbol
    # sequence; symbols may be MULTI-char (as after earlier merges) when
    # l/r are two-char, exercising the composed-merge regime
    df = spark.createDataFrame(
        [([*w],) for w in ws], "syms array<string>"
    )
    got = [
        list(row["m"])
        for row in df.select(
            _bpe_apply_merge(l, r).alias("m")
        ).collect()
    ]
    expected = [_ref_apply([*w], l, r) for w in ws]
    assert got == expected

    # DuckDB serialized-replace twin (the oracle's apply step)
    con = duckdb.connect()
    for w, exp in zip(ws, expected):
        serialized = "|" + "||".join([*w]) + "|"
        out = con.execute(
            "SELECT string_split(trim(replace(?, ?, ?), '|'), '||')",
            [serialized, f"|{l}||{r}|", f"|{l}{r}|"],
        ).fetchone()[0]
        assert out == exp, (w, l, r)


def test_trainer_matches_reference_end_to_end(spark, tmp_path):
    # planted corpus with ties (broken by lex order), runs, and words
    # that compose merged tokens across rounds
    docs = [
        (1, "banana banana bandana", "en", "s1", 0),
        (2, "aaaa aaa banana abab", "en", "s1", 0),
        (3, "Drop2 th1s and KEEP lowercase only", "en", "s2", 0),
        (4, "abab abab cab cab cab", "en", "s2", 0),
        (None, "null doc_id row is excluded entirely", "en", "s2", 0),
    ]
    sf = str(tmp_path)
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(f"{sf}/documents.parquet")

    word_freqs: dict[str, int] = {}
    for doc_id, text, *_ in docs:
        if doc_id is None:
            continue
        for w in text.split():
            if w.isascii() and w.isalpha() and w.islower():
                word_freqs[w] = word_freqs.get(w, 0) + 1
    expected = _ref_train(word_freqs, BPE_MERGES)

    got = sorted(
        tuple(r) for r in bpe_merges_topn(spark, sf).collect()
    )
    assert got == sorted(expected)
    ranks = [r[0] for r in got]
    assert ranks == list(range(1, len(got) + 1))

    # resulting token counts under the trained vocabulary (the second
    # artifact): replay the reference merges over the word state and
    # fold occurrence counts
    state = {w: [*w] for w in word_freqs}
    for _, l, r, _, _ in expected:
        state = {w: _ref_apply(s, l, r) for w, s in state.items()}
    exp_counts: dict[str, list[int]] = {}
    for w, syms in state.items():
        for s in syms:
            tot = exp_counts.setdefault(s, [0, 0])
            tot[0] += word_freqs[w]
            tot[1] += 1
    got_counts = sorted(
        tuple(r) for r in bpe_token_counts(spark, sf).collect()
    )
    assert got_counts == sorted(
        (t, occ, forms) for t, (occ, forms) in exp_counts.items()
    )
