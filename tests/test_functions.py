"""Column functions + skew helpers: equivalence and property tests.

The property tests batch every hypothesis example list into ONE
DataFrame per case (a Spark round-trip per generated row would be
minutes per property), and check the Spark column expressions against
independent pure-Python references — and, for the portable hash, against
the DuckDB oracle twin, since cross-engine agreement is what the
correctness harness depends on.
"""

from __future__ import annotations

import hashlib
import re

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from ai_powered_e_commerce_analytics_spark.functions import (
    jaccard,
    portable_hash64,
    salted_collect_set,
    salted_join,
    word_shingles,
)
from ai_powered_e_commerce_analytics_spark.functions.core import (
    portable_hash64_sql,
)

SETTINGS = dict(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# Printable-ish text without NUL (parquet/duckdb-safe), incl. whitespace.
texts = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",), blacklist_characters="\x00"),
    max_size=60,
)


# ---------------------------------------------------------------------------
# skew helpers: equivalence with the plain forms on skewed data
# ---------------------------------------------------------------------------


def _skewed_frames(spark):
    # 'hot' carries 90% of left rows; right has matched + unmatched keys.
    left = spark.createDataFrame(
        [("hot", i) for i in range(900)]
        + [(f"k{i % 7}", i) for i in range(100)],
        "k string, v long",
    )
    right = spark.createDataFrame(
        [("hot", "H"), ("k1", "A"), ("k3", "B"), ("absent", "Z")],
        "k string, payload string",
    )
    return left, right


@pytest.mark.parametrize("how", ["inner", "left"])
def test_salted_join_matches_plain_join(spark, how):
    left, right = _skewed_frames(spark)
    want = sorted(
        map(tuple, left.join(right, "k", how).collect())
    )
    got = sorted(
        map(tuple, salted_join(left, right, "k", buckets=8, how=how).collect())
    )
    assert got == want


def test_salted_join_rejects_unsupported_how(spark):
    left, right = _skewed_frames(spark)
    with pytest.raises(ValueError):
        salted_join(left, right, "k", how="right")


def test_salted_collect_set_matches_plain(spark):
    left, _ = _skewed_frames(spark)
    want = {
        r.k: sorted(r.s)
        for r in left.groupBy("k").agg(F.collect_set("v").alias("s")).collect()
    }
    got = {
        r.k: sorted(r.v_set)
        for r in salted_collect_set(left, "k", "v", buckets=8).collect()
    }
    assert got == want


# ---------------------------------------------------------------------------
# property tests: Spark expressions vs pure-Python references
# ---------------------------------------------------------------------------


# tokens() contract = Spark `split(trim(x), '\s+')` ≡ DuckDB
# `string_split_regex(trim(x), '\s+')`: trim strips ONLY 0x20 spaces, and
# Java/DuckDB `\s` is exactly [ \t\n\x0b\f\r] — unlike Python's
# str.split(), which also splits on \x1c-\x1f, NBSP, etc. (a real
# difference this property test caught when its reference used .split()).
_JAVA_WS = re.compile(r"[ \t\n\x0b\f\r]+")


def _py_tokens(s: str) -> list[str]:
    return _JAVA_WS.split(s.strip(" "))


def _py_shingles(s: str, k: int = 3) -> list[str]:
    t = _py_tokens(s)
    return [" ".join(t[i : i + k]) for i in range(len(t) - k + 1)]


@given(st.lists(texts, min_size=1, max_size=25))
@settings(**SETTINGS)
def test_word_shingles_matches_python(spark, docs):
    df = spark.createDataFrame([(i, s) for i, s in enumerate(docs)], "i long, t string")
    got = {
        r.i: list(r.sh)
        for r in df.select("i", word_shingles("t", 3).alias("sh")).collect()
    }
    assert got == {i: _py_shingles(s) for i, s in enumerate(docs)}


@given(
    st.lists(
        st.tuples(
            st.lists(texts, max_size=8), st.lists(texts, max_size=8)
        ),
        min_size=1,
        max_size=20,
    )
)
@settings(**SETTINGS)
def test_jaccard_matches_python_sets(spark, pairs):
    df = spark.createDataFrame(
        [(i, a, b) for i, (a, b) in enumerate(pairs)],
        "i long, a array<string>, b array<string>",
    )
    got = {
        r.i: r.j
        for r in df.select(
            "i", jaccard(F.col("a"), F.col("b")).alias("j")
        ).collect()
    }
    for i, (a, b) in enumerate(pairs):
        sa, sb = set(a), set(b)
        want = len(sa & sb) / len(sa | sb) if sa | sb else 0.0
        assert got[i] == pytest.approx(want), (a, b)
        assert 0.0 <= got[i] <= 1.0


def test_minhash_signature_matches_python(spark):
    from ai_powered_e_commerce_analytics_spark.functions import (
        minhash_signature,
    )

    rows = [(0, ["a b c", "b c d"]), (1, ["x y z"]), (2, [])]
    df = spark.createDataFrame(rows, "i long, sh array<string>")
    got = {
        r.i: r.sig
        for r in df.select(
            "i", minhash_signature(F.col("sh"), num_hashes=4).alias("sig")
        ).collect()
    }

    def h(s, seed):
        return int(hashlib.md5(f"{s}#{seed}".encode()).hexdigest()[:15], 16)

    for i, sh in rows:
        if not sh:
            assert got[i] == [None] * 4  # empty set -> null entries
        else:
            assert got[i] == [min(h(s, j + 1) for s in sh) for j in range(4)]


@given(st.lists(texts.filter(lambda s: "\x00" not in s), min_size=1, max_size=20))
@settings(**SETTINGS)
def test_portable_hash64_matches_duckdb_and_md5(spark, strings):
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(strings)], "i long, s string"
    )
    got = {
        r.i: (r.h0, r.h7)
        for r in df.select(
            "i",
            portable_hash64("s").alias("h0"),
            portable_hash64("s", seed=7).alias("h7"),
        ).collect()
    }
    con = duckdb.connect()
    for i, s in enumerate(strings):
        # python md5 reference
        want0 = int(hashlib.md5(s.encode()).hexdigest()[:15], 16)
        want7 = int(hashlib.md5(f"{s}#7".encode()).hexdigest()[:15], 16)
        assert got[i] == (want0, want7), s
        # duckdb oracle twin (same expression the correctness SQL uses)
        d0, d7 = con.execute(
            f"SELECT {portable_hash64_sql('s')}, {portable_hash64_sql('s', seed=7)} "
            "FROM (SELECT ? AS s)",
            [s],
        ).fetchone()
        assert (d0, d7) == (want0, want7), s


def test_hash_mode_xxhash64_pipeline(spark, monkeypatch):
    # Production hash mode: same pipeline shape, native xxhash64 values.
    # LSH candidates differ per hash family, but VERIFIED pairs are always
    # a subset of the exact all-pairs Jaccard truth (verification is on
    # shingles, independent of the hash), and the planted near-dups at
    # sf0.001 must still be recalled.
    from ai_powered_e_commerce_analytics_spark.plans.textops import (
        dedup_minhash_lsh,
        dedup_ngram_jaccard,
    )

    sf = "/root/testdata/sf0.001"
    truth = {
        (r.doc_a, r.doc_b) for r in dedup_ngram_jaccard(spark, sf).collect()
    }
    monkeypatch.setenv("SPARK_GRAFT_HASH_MODE", "xxhash64")
    got = {
        (r.doc_a, r.doc_b) for r in dedup_minhash_lsh(spark, sf).collect()
    }
    assert got, "xxhash64-mode LSH found no pairs"
    assert got <= truth, f"false positives past verification: {got - truth}"
    assert len(got) >= 0.8 * len(truth), (len(got), len(truth))


def test_hash_mode_default_is_portable(spark, monkeypatch):
    from ai_powered_e_commerce_analytics_spark.functions.core import (
        hash_mode,
        portable_hash64,
    )

    monkeypatch.delenv("SPARK_GRAFT_HASH_MODE", raising=False)
    assert hash_mode() == "portable"
    df = spark.createDataFrame([("abc",)], "s string")
    v = df.select(portable_hash64("s").alias("h")).collect()[0].h
    # md5('abc')[:15] = 900150983cd24fb: stable portable value
    assert v == int("900150983cd24fb", 16)


def test_event_ts_us_equivalent_across_encodings(spark, tmp_path):
    # The driver's testdata generator has encoded events.ts three ways
    # across rounds: TIMESTAMP_NTZ µs (current), int64 nanoseconds
    # surfaced via nanosAsLong (rounds 1-3), and instant-typed TIMESTAMP.
    # spec.event_ts_us must yield IDENTICAL epoch-µs longs for the same
    # wall-clock instants under every encoding — and independently of the
    # session timezone (the driver's harness session is not ours).
    import datetime

    import pyarrow as pa
    import pyarrow.parquet as pq

    from ai_powered_e_commerce_analytics_spark.plans.spec import event_ts_us

    instants = [
        datetime.datetime(2024, 1, 1, 0, 0, 7, 179575),
        datetime.datetime(2024, 6, 30, 23, 59, 59, 999999),
        datetime.datetime(1999, 12, 31, 12, 0, 0, 1),
        datetime.datetime(2024, 2, 29, 6, 30, 15, 500000),
    ]
    expected = [
        int(i.replace(tzinfo=datetime.timezone.utc).timestamp() * 1_000_000)
        for i in instants
    ]

    paths = {}
    for name, unit in [("ntz", "us"), ("nanos", "ns")]:
        table = pa.table({"ts": pa.array(instants, type=pa.timestamp(unit))})
        p = str(tmp_path / f"{name}.parquet")
        pq.write_table(table, p)
        paths[name] = p

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    old_tz = spark.conf.get("spark.sql.session.timeZone")
    try:
        for tz in ("UTC", "America/New_York"):
            spark.conf.set("spark.sql.session.timeZone", tz)
            for name, p in paths.items():
                df = spark.read.parquet(p)
                got = [
                    r.us for r in
                    df.select(event_ts_us(df).alias("us")).collect()
                ]
                assert sorted(got) == sorted(expected), (name, tz)
    finally:
        spark.conf.set("spark.sql.session.timeZone", old_tz)


# ---------------------------------------------------------------------------
# simhash64 band-LSH completeness invariant (pigeonhole)
# ---------------------------------------------------------------------------

def _bands60(sig: int):
    from ai_powered_e_commerce_analytics_spark.plans.textops import (
        SIMHASH64_BANDS,
        _S64_BAND_BITS,
    )

    mask = (1 << _S64_BAND_BITS) - 1
    return [
        (b, (sig >> (b * _S64_BAND_BITS)) & mask)
        for b in range(SIMHASH64_BANDS)
    ]


def test_simhash64_pigeonhole_constants():
    # The completeness argument in dedup_simhash64's docstring requires
    # the bands to tile the signature exactly and the verify radius to
    # be < the band count (>= bands differing bands => hamming >= bands).
    from ai_powered_e_commerce_analytics_spark.plans.textops import (
        SIMHASH64_BANDS,
        SIMHASH64_BITS,
        SIMHASH_MAX_HAMMING,
        _S64_BAND_BITS,
    )

    assert SIMHASH64_BANDS * _S64_BAND_BITS == SIMHASH64_BITS
    assert SIMHASH_MAX_HAMMING < SIMHASH64_BANDS


@given(
    st.integers(min_value=0, max_value=(1 << 60) - 1),
    st.sets(st.integers(min_value=0, max_value=59), max_size=3),
)
@settings(**SETTINGS)
def test_simhash64_radius3_pair_always_shares_a_band(sig, flip_bits):
    # Flipping <= SIMHASH_MAX_HAMMING bits can touch at most 3 of the 4
    # bands, so every pair the verify stage would accept shares at least
    # one (band, value) key — the band join NEVER misses a true pair.
    other = sig
    for b in flip_bits:
        other ^= 1 << b
    assert set(_bands60(sig)) & set(_bands60(other))


@given(
    st.lists(
        st.lists(
            st.integers(min_value=-(1 << 40), max_value=1 << 40),
            max_size=12,
            unique=True,
        ),
        min_size=1,
        max_size=8,
    )
)
@settings(**SETTINGS)
def test_unordered_pair_rows_matches_python(spark, sets):
    # The codegen posexplode+slice expansion (optimization r15) must
    # emit exactly the {(a, b) : a, b in set, a < b} multiset the old
    # interpreted transform x transform + filter spelling produced —
    # including empty and singleton arrays (no rows).
    from collections import Counter

    from ai_powered_e_commerce_analytics_spark.functions.core import (
        unordered_pair_rows,
    )

    df = spark.createDataFrame(
        [(s,) for s in sets], "parts array<long>"
    )
    got = Counter(
        (r["a"], r["b"])
        for r in unordered_pair_rows(df, "parts", "a", "b").collect()
    )
    want = Counter(
        (a, b) for s in sets for a in s for b in s if a < b
    )
    assert got == want


def test_unordered_pair_rows_requires_distinct_elements(spark):
    # ADVICE r15, pinned divergence: the posexplode+slice form emits
    # (x, x) self-pairs and inflated multiplicities when the input
    # array has duplicates — NOT the old a < b filter's semantics.
    # Every production call site satisfies the distinct-elements
    # contract (collect_set / array_distinct / distinct-sig buckets);
    # an in-helper array_distinct guard was measured at +7% on the
    # isolated copurchase_pairs and rejected (r16). This test exists so
    # a future caller reaching for collect_list output hits a
    # documented, asserted divergence instead of a silent wrong answer:
    # if this test ever FAILS, the helper's duplicate behavior changed
    # and both this test and the docstring must be revisited.
    from collections import Counter

    from ai_powered_e_commerce_analytics_spark.functions.core import (
        unordered_pair_rows,
    )

    df = spark.createDataFrame(
        [([3, 1, 3],)], "parts array<long>"
    )
    got = Counter(
        (r["a"], r["b"])
        for r in unordered_pair_rows(df, "parts", "a", "b").collect()
    )
    # sorted [1, 3, 3] enumerates (1,3), (1,3), (3,3): the (3,3)
    # self-pair and the doubled (1,3) are exactly what the distinct
    # contract exists to exclude.
    assert got == Counter({(1, 3): 2, (3, 3): 1})
