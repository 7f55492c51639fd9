"""Unigram-LM hard-EM round (VERDICT r12 #8): independent Python
replay of seed→Viterbi→re-estimate on a planted corpus, plus the
structural invariants of a segmentation-derived count table."""

from __future__ import annotations

import math
from collections import Counter

from ai_powered_e_commerce_analytics_spark.plans.pretrain import (
    UNI_MAX_PIECE,
    unigram_lm_em_round,
)

from conftest import SF_DIR


def _replay(word_freq: dict[str, int]):
    """Plain-Python mirror of the query: seed counts over all substrings
    of length 1..UNI_MAX_PIECE, micro-nat seed log-probs, Viterbi with
    (max score, then smallest start) tie-break, piece counts. Also
    returns each word's final Viterbi score and its piece count (the
    doc-perplexity inputs)."""
    seed: Counter = Counter()
    for w, f in word_freq.items():
        n = len(w)
        for j in range(n):
            for i in range(j + 1, min(n, j + UNI_MAX_PIECE) + 1):
                seed[w[j:i]] += f
    t0 = sum(seed.values())

    def lp(p):
        x = math.log(seed[p] / t0) * 1e6
        return -int(math.floor(abs(x) + 0.5)) if x < 0 else int(
            math.floor(x + 0.5)
        )

    counts: Counter = Counter()
    wscore: dict[str, int] = {}
    wpieces: dict[str, int] = {}
    for w, f in word_freq.items():
        n = len(w)
        best = [(0, -1)] + [None] * n
        for i in range(1, n + 1):
            cands = []
            for j in range(max(0, i - UNI_MAX_PIECE), i):
                cands.append((-(best[j][0] + lp(w[j:i])), j))
            ns, j = min(cands)
            best[i] = (-ns, j)
        wscore[w] = best[n][0]
        pos = n
        np = 0
        while pos > 0:
            j = best[pos][1]
            counts[w[j:pos]] += f
            np += 1
            pos = j
        wpieces[w] = np
    return seed, counts, wscore, wpieces


def test_unigram_round_matches_python_replay(spark, tmp_path):
    docs = [
        "abab abc cab",
        "abab abab xyz",
        "cab abc abab",
        "zq abc",
    ]
    sf = str(tmp_path)
    spark.createDataFrame(
        [(i, s) for i, s in enumerate(docs)], "doc_id long, text string"
    ).coalesce(1).write.parquet(f"{sf}/documents.parquet")

    wf = Counter(w for s in docs for w in s.split())
    seed, counts, _, _ = _replay(dict(wf))
    t1 = sum(counts.values())

    rows = unigram_lm_em_round(spark, sf).collect()
    got = {r["piece"]: r for r in rows}
    assert set(got) == set(counts), (set(got) ^ set(counts))
    for p, r in got.items():
        assert r["viterbi_count"] == counts[p], p
        assert r["seed_count"] == seed[p], p
        assert r["n_total"] == t1
        assert r["prob"] == counts[p] / t1
        # micro-nat log-prob within one grid cell of the replay
        x = math.log(counts[p] / t1) * 1e6
        replay_micro = (
            -int(math.floor(abs(x) + 0.5)) if x < 0 else int(
                math.floor(x + 0.5)
            )
        )
        assert abs(r["logprob_micro"] - replay_micro) <= 1, p


def test_unigram_round_invariants_on_fixture(spark):
    rows = unigram_lm_em_round(spark, SF_DIR).collect()
    assert rows
    t1 = rows[0]["n_total"]
    assert sum(r["viterbi_count"] for r in rows) == t1
    assert abs(sum(r["prob"] for r in rows) - 1.0) < 1e-9
    for r in rows:
        assert 1 <= len(r["piece"]) <= UNI_MAX_PIECE
        assert 0 < r["viterbi_count"] <= r["seed_count"] or len(
            r["piece"]
        ) == UNI_MAX_PIECE
        assert r["logprob_micro"] < 0


def test_unigram_prefers_frequent_whole_pieces(spark, tmp_path):
    """A word that IS a frequent <=4-char piece segments as itself, so
    its Viterbi count stays at its word frequency — the EM round must
    not shred dominant whole-word pieces into characters."""
    sf = str(tmp_path)
    docs = [("join " * 20).strip(), "join scan", "scan join"]
    spark.createDataFrame(
        [(i, s) for i, s in enumerate(docs)], "doc_id long, text string"
    ).coalesce(1).write.parquet(f"{sf}/documents.parquet")
    got = {
        r["piece"]: r["viterbi_count"]
        for r in unigram_lm_em_round(spark, sf).collect()
    }
    assert got.get("join") == 22 and got.get("scan") == 2
    # nothing was segmented below the whole words
    assert set(got) == {"join", "scan"}


# ------------------------------------------------------- doc perplexity


def test_doc_perplexity_matches_python_replay(spark, tmp_path):
    from ai_powered_e_commerce_analytics_spark.plans.pretrain import (
        doc_unigram_perplexity,
    )

    docs = [
        "abab abc cab 42!",      # one OOV token ('42!')
        "abab abab xyz",
        "cab abc abab zq",
    ]
    sf = str(tmp_path)
    spark.createDataFrame(
        [(i, s) for i, s in enumerate(docs)], "doc_id long, text string"
    ).coalesce(1).write.parquet(f"{sf}/documents.parquet")

    wf = Counter(
        w for s in docs for w in s.split() if w.isalpha() and w.islower()
    )
    _, _, wscore, wpieces = _replay(dict(wf))

    got = {r["doc_id"]: r for r in doc_unigram_perplexity(spark, sf).collect()}
    assert set(got) == {0, 1, 2}
    for i, s in enumerate(docs):
        toks = s.split()
        scored = [w for w in toks if w in wscore]
        r = got[i]
        assert r["n_scored"] == len(scored)
        assert r["n_oov"] == len(toks) - len(scored)
        assert r["sum_logprob_micro"] == sum(wscore[w] for w in scored)
        assert r["n_pieces"] == sum(wpieces[w] for w in scored)
        avg = (r["sum_logprob_micro"] / r["n_pieces"]) / 1e6
        assert r["avg_logprob_per_piece"] == avg
        assert abs(r["ppl"] - math.exp(-avg)) <= 1e-6
    assert got[0]["n_oov"] == 1


def test_doc_perplexity_ranks_junk_above_natural(spark, tmp_path):
    """The filter's raison d'etre: a document of corpus-typical words
    scores LOW perplexity; a document of one-off gibberish words
    segments into rare pieces and scores HIGH."""
    from ai_powered_e_commerce_analytics_spark.plans.pretrain import (
        doc_unigram_perplexity,
    )

    natural = "join hash row scan merge join hash row scan merge"
    docs = [natural] * 6 + ["zqxv kwjy vvqz xjqk pzwq"]
    sf = str(tmp_path)
    spark.createDataFrame(
        [(i, s) for i, s in enumerate(docs)], "doc_id long, text string"
    ).coalesce(1).write.parquet(f"{sf}/documents.parquet")
    got = {
        r["doc_id"]: r["ppl"]
        for r in doc_unigram_perplexity(spark, sf).collect()
    }
    junk, natural_ppl = got[6], got[0]
    assert junk > 2 * natural_ppl, (junk, natural_ppl)
