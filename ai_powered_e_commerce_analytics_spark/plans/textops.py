"""Text-analysis + deduplication battery over the ``documents`` table.

Beyond-reference training-data-pipeline operators (BASELINE.json north
star): exact dedup, MinHash+LSH near-dup, SimHash near-dup, n-gram
Jaccard, language-ID heuristic, quality scoring, token counting, document
fingerprinting. Everything is pure Column expressions (whole-stage
codegen; zero Python in the hot path) built on the portable md5-based
hash so DuckDB oracles can replay the exact values.

Scale design:
- Shingling/minhash/simhash are per-row maps over an array column — no
  explode, no shuffle; 100 TB of documents costs one scan.
- Near-dup candidate generation is LSH band-bucketing: shuffle keyed on
  (band, signature) touches ~rows x bands narrow rows, then exact
  verification runs only on bucket-mates. The all-pairs Jaccard query
  exists as the small-data oracle/verifier; LSH is the scale path.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import jaccard, portable_hash64, tokens, word_shingles
from ..functions.core import portable_hash64_sql
from .spec import QuerySpec, t

STOPWORDS = ("the", "a", "of", "and", "in")
SHINGLE_K = 3
JACCARD_THRESHOLD = 0.1   # yields the planted near-dup pairs at sf0.01
MINHASH_HASHES = 12
LSH_BANDS = 3             # 12 hashes -> 3 bands x 4 rows
SIMHASH_BITS = 16
SIMHASH_MAX_HAMMING = 3

# Universal-hash minhash scheme: ONE md5 per shingle (h = md5-hash mod
# 2^30), then MINHASH_HASHES cheap integer derivations
# h_j = (A[j]*h + B[j]) mod MERSENNE61 — exact long arithmetic, identical
# in Spark and DuckDB, ~12x fewer md5 evaluations than per-seed salting.
MERSENNE61 = (1 << 61) - 1
_MH_A = [
    int(hashlib.md5(f"mh_a{j}".encode()).hexdigest()[:7], 16) * 2 + 1
    for j in range(MINHASH_HASHES)
]
_MH_B = [
    int(hashlib.md5(f"mh_b{j}".encode()).hexdigest()[:7], 16)
    for j in range(MINHASH_HASHES)
]

_STOP_SQL = "('" + "','".join(STOPWORDS) + "')"
_TOKS_SQL = "string_split_regex(trim(text), '\\s+')"
_SHINGLES_SQL = (
    f"list_distinct(list_transform(range(len({_TOKS_SQL}) - {SHINGLE_K - 1}), "
    "i -> "
    + " || ' ' || ".join(f"{_TOKS_SQL}[i + {k + 1}]" for k in range(SHINGLE_K))
    + "))"
)


def _doc_shingles(df: DataFrame) -> DataFrame:
    return df.select(
        "doc_id", F.array_distinct(word_shingles("text", SHINGLE_K)).alias("sh")
    )


# ---------------------------------------------------------------------------
# Text analysis
# ---------------------------------------------------------------------------


def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    toks = tokens("text")
    n = F.size(toks).cast("long")
    stop_hits = F.size(
        F.filter(toks, lambda x: x.isin(*STOPWORDS))
    ).cast("long")
    stop_ratio = stop_hits.cast("double") / n
    return t(spark, sf_dir, "documents").select(
        "doc_id",
        F.length("text").cast("long").alias("n_chars"),
        n.alias("n_tokens"),
        (
            F.aggregate(
                F.transform(toks, F.length), F.lit(0), lambda acc, x: acc + x
            ).cast("double")
            / n
        ).alias("avg_token_len"),
        stop_ratio.alias("stopword_ratio"),
        # exact-integer-derived doubles multiply bit-identically -> raw emit
        (F.least(F.lit(1.0), n / F.lit(100.0)) * (1 - stop_ratio)).alias(
            "quality_score"
        ),
    )


TEXT_QUALITY_SQL = f"""
WITH s AS (SELECT doc_id, length(text) AS n_chars, {_TOKS_SQL} AS toks FROM documents)
SELECT doc_id, n_chars::BIGINT AS n_chars, len(toks)::BIGINT AS n_tokens,
       list_sum(list_transform(toks, x -> length(x)))::DOUBLE / len(toks)
           AS avg_token_len,
       len(list_filter(toks, x -> x IN {_STOP_SQL}))::DOUBLE / len(toks)
           AS stopword_ratio,
       least(1.0, len(toks) / 100.0)
             * (1 - len(list_filter(toks, x -> x IN {_STOP_SQL}))::DOUBLE / len(toks))
           AS quality_score
FROM s
"""


def lang_id_heuristic(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Stopword-vote language ID. The synthetic corpus shares one
    # vocabulary across langs, so this is operator plumbing (deterministic
    # scoring + argmax), not a real classifier — swap marker lists for
    # real per-language stopword tables in production.
    toks = tokens("text")
    n = F.size(toks).cast("double")
    en_ratio = F.size(F.filter(toks, lambda x: x.isin("the", "a"))) / n
    return t(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        en_ratio.alias("en_score"),
        F.when(en_ratio > 0.02, F.lit("en")).otherwise(F.lit("und")).alias(
            "predicted_lang"
        ),
        (
            F.when(en_ratio > 0.02, F.lit("en")).otherwise(F.lit("und"))
            == F.col("lang")
        ).alias("is_match"),
    )


LANG_ID_SQL = f"""
WITH s AS (
    SELECT doc_id, lang,
           len(list_filter({_TOKS_SQL}, x -> x IN ('the','a')))::DOUBLE
               / len({_TOKS_SQL}) AS en_ratio
    FROM documents
)
SELECT doc_id, lang, en_ratio AS en_score,
       CASE WHEN en_ratio > 0.02 THEN 'en' ELSE 'und' END AS predicted_lang,
       (CASE WHEN en_ratio > 0.02 THEN 'en' ELSE 'und' END) = lang AS is_match
FROM s
"""


def token_stats_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = F.size(tokens("text")).cast("long")
    return (
        t(spark, sf_dir, "documents")
        .select("source", n.alias("n"))
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n").alias("total_tokens"),
            (F.sum("n").cast("double") / F.count("*")).alias("avg_tokens"),
        )
    )


TOKEN_STATS_SQL = f"""
SELECT source, count(*)::BIGINT AS n_docs,
       sum(len({_TOKS_SQL}))::BIGINT AS total_tokens,
       sum(len({_TOKS_SQL}))::DOUBLE / count(*) AS avg_tokens
FROM documents GROUP BY source
"""


def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Canonical fingerprint: md5 of whitespace-normalized lowercase text,
    # plus a 64-bit prefix hash (first-SHINGLE_K-tokens rolling key).
    norm = F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
    prefix = F.concat_ws(" ", F.slice(tokens("text"), 1, SHINGLE_K))
    return t(spark, sf_dir, "documents").select(
        "doc_id",
        F.md5(norm).alias("fingerprint"),
        portable_hash64(prefix).alias("prefix_hash"),
    )


DOC_FINGERPRINT_SQL = f"""
SELECT doc_id,
       md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fingerprint,
       {portable_hash64_sql(f"array_to_string(list_slice({_TOKS_SQL}, 1, {SHINGLE_K}), ' ')")}
           AS prefix_hash
FROM documents
"""


# ---------------------------------------------------------------------------
# Deduplication
# ---------------------------------------------------------------------------


def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Exact dedup = hash-groupBy on the canonical fingerprint; keep the
    # min doc_id as representative. One shuffle on a 32-byte key.
    norm = F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
    return (
        t(spark, sf_dir, "documents")
        .select(F.md5(norm).alias("fingerprint"), "doc_id")
        .groupBy("fingerprint")
        .agg(
            F.min("doc_id").alias("representative_doc_id"),
            F.count("*").alias("group_size"),
        )
    )


DEDUP_EXACT_SQL = """
SELECT md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fingerprint,
       min(doc_id) AS representative_doc_id,
       count(*)::BIGINT AS group_size
FROM documents GROUP BY 1
"""


def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    # All-pairs n-gram Jaccard >= tau. Quadratic — this is the exact
    # verifier / small-data path; dedup_minhash_lsh is the scale path
    # whose candidates are a superset of these pairs w.h.p.
    sh = _doc_shingles(t(spark, sf_dir, "documents"))
    a = sh.alias("a")
    b = sh.alias("b")
    j = jaccard(F.col("a.sh"), F.col("b.sh"))
    return (
        a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            j.alias("jaccard"),
        )
        .where(F.col("jaccard") >= JACCARD_THRESHOLD)
    )


DEDUP_NGRAM_JACCARD_SQL = f"""
WITH sh AS (SELECT doc_id, {_SHINGLES_SQL} AS sh FROM documents),
p AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CASE WHEN len(list_distinct(a.sh || b.sh)) = 0 THEN 0.0
                ELSE len(list_intersect(a.sh, b.sh))::DOUBLE
                     / len(list_distinct(a.sh || b.sh)) END AS j
    FROM sh a JOIN sh b ON a.doc_id < b.doc_id
)
SELECT doc_a, doc_b, j AS jaccard
FROM p WHERE j >= {JACCARD_THRESHOLD}
"""


def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash + LSH banding (shingle→minhash→band→bucket→verify).

    Plan shape (the 100 TB path):
      1. per-row map: shingles, ONE md5 hash per shingle, then the 12
         minhashes via universal-hash integer derivations (A*h+B mod
         2^61-1) — md5 is the expensive part, so it runs once per
         shingle, not once per (shingle, seed). The ``repartition`` is a
         deliberate exchange barrier: HOF lambdas are codegen-fallback
         and CollapseProject would otherwise inline the shingle+hash
         construction into every downstream transform (measured ~10x
         blowup); ReuseExchange also dedupes the three downstream
         references (signature + both verify probes) into ONE compute.
      2. explode to LSH_BANDS narrow (band, sig, doc_id) rows — no
         arrays carried through the shuffle.
      3. bucket pairs via groupBy(band, sig) + collect_list — one
         shuffle on the bucket key and NO self-join. LSH bucket sizes
         are O(dups), so per-bucket pair expansion is tiny.
      4. exact-Jaccard verify on distinct candidate pairs, probing the
         reused exchange twice.
    """
    hashed = (
        _doc_shingles(t(spark, sf_dir, "documents"))
        .where(F.size("sh") > 0)
        .select(
            "doc_id",
            "sh",
            F.transform(
                F.col("sh"), lambda x: F.pmod(portable_hash64(x), F.lit(1 << 30))
            ).alias("hs"),
        )
        .repartition("doc_id")
    )
    rows_per_band = MINHASH_HASHES // LSH_BANDS

    def minhash(j):
        return F.array_min(
            F.transform(
                F.col("hs"),
                lambda x: F.pmod(
                    x * F.lit(_MH_A[j]) + F.lit(_MH_B[j]), F.lit(MERSENNE61)
                ),
            )
        )

    sig = hashed.select(
        "doc_id",
        *[
            F.concat_ws(
                "_", *[minhash(b * rows_per_band + r) for r in range(rows_per_band)]
            ).alias(f"band{b}")
            for b in range(LSH_BANDS)
        ],
    )
    bands = sig.select(
        "doc_id",
        F.posexplode(F.array(*[F.col(f"band{b}") for b in range(LSH_BANDS)])).alias(
            "band", "band_sig"
        ),
    )
    buckets = (
        bands.groupBy("band", "band_sig")
        .agg(F.collect_list("doc_id").alias("ids"))
        .where(F.size("ids") > 1)
    )
    pair = F.explode(
        F.filter(
            F.flatten(
                F.transform(
                    F.col("ids"),
                    lambda x: F.transform(
                        F.col("ids"),
                        lambda y: F.struct(x.alias("a"), y.alias("b")),
                    ),
                )
            ),
            lambda s: s["a"] < s["b"],
        )
    )
    cand = (
        buckets.select(pair.alias("p"))
        .select(F.col("p.a").alias("doc_a"), F.col("p.b").alias("doc_b"))
        .distinct()
    )
    verified = (
        cand.join(
            hashed.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a")),
            "doc_a",
        )
        .join(
            hashed.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b")),
            "doc_b",
        )
        .select(
            "doc_a",
            "doc_b",
            jaccard(F.col("sh_a"), F.col("sh_b")).alias("jaccard"),
        )
    )
    return verified.where(F.col("jaccard") >= JACCARD_THRESHOLD)


def _minhash_sql(j: int) -> str:
    return (
        f"list_min(list_transform(hs, x -> (x * {_MH_A[j]} + {_MH_B[j]}) % {MERSENNE61}))"
    )


_ROWS_PER_BAND = MINHASH_HASHES // LSH_BANDS
_BAND_SIGS_SQL = ", ".join(
    "("
    + " || '_' || ".join(
        _minhash_sql(b * _ROWS_PER_BAND + r) for r in range(_ROWS_PER_BAND)
    )
    + f") AS band{b}"
    for b in range(LSH_BANDS)
)

DEDUP_MINHASH_LSH_SQL = f"""
WITH sh0 AS (SELECT doc_id, {_SHINGLES_SQL} AS sh FROM documents),
sh AS (SELECT doc_id, sh,
              list_transform(sh, s -> {portable_hash64_sql("s")} % {1 << 30}) AS hs
       FROM sh0 WHERE len(sh) > 0),
sig AS (SELECT doc_id, {_BAND_SIGS_SQL} FROM sh),
bands AS (
    SELECT doc_id, u.band,
           CASE u.band {" ".join(f"WHEN {b} THEN band{b}" for b in range(LSH_BANDS))} END AS band_sig
    FROM sig CROSS JOIN (SELECT unnest(range({LSH_BANDS})) AS band) u
),
cand AS (
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM bands a JOIN bands b
      ON a.band = b.band AND a.band_sig = b.band_sig AND a.doc_id < b.doc_id
),
verified AS (
    SELECT c.doc_a, c.doc_b,
           CASE WHEN len(list_distinct(sa.sh || sb.sh)) = 0 THEN 0.0
                ELSE len(list_intersect(sa.sh, sb.sh))::DOUBLE
                     / len(list_distinct(sa.sh || sb.sh)) END AS jaccard
    FROM cand c
    JOIN sh sa ON sa.doc_id = c.doc_a
    JOIN sh sb ON sb.doc_id = c.doc_b
)
SELECT doc_a, doc_b, jaccard FROM verified WHERE jaccard >= {JACCARD_THRESHOLD}
"""


def _simhash_docs(df: DataFrame) -> DataFrame:
    """(doc_id, simhash) with the token md5 hashed ONCE per token.

    Two projections with an exchange barrier between them: the first
    materializes ``hs`` (one md5 per distinct token), the second folds
    the 16 bit votes over the hs column. Without the barrier,
    CollapseProject inlines the md5 transform into every one of the 16
    vote aggregates — 16x the md5 work (measured: the signature stage
    dominated the whole query). Same pattern as the MinHash plan above.

    The bit loop is unrolled in Python (shift amounts must be literal
    ints for shiftright) — still pure Column expressions.
    """
    hs_df = df.select(
        "doc_id",
        F.transform(
            F.array_distinct(tokens("text")), lambda x: portable_hash64(x)
        ).alias("hs"),
    ).repartition("doc_id")

    def vote(j):
        return lambda acc, h: acc + (
            F.shiftright(h, j).bitwiseAND(F.lit(1)) * 2 - 1
        )

    bit_votes = [
        F.when(
            F.aggregate(F.col("hs"), F.lit(0).cast("long"), vote(j)) > 0,
            F.lit(1 << j),
        ).otherwise(F.lit(0))
        for j in range(SIMHASH_BITS)
    ]
    total = bit_votes[0]
    for v in bit_votes[1:]:
        total = total + v
    # Second barrier: without it the 16-aggregate vote fold gets inlined
    # into every consumer of ``simhash`` (the 4 band expressions x both
    # join sides = 10 copies, measured ~15 s at sf0.1 -> ~1 s with it).
    # The shuffled rows are just (doc_id, simhash) — 16 bytes each.
    return (
        hs_df.select("doc_id", total.cast("long").alias("simhash"))
        .repartition("doc_id")
    )


def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs: 16-bit signature from token-hash bit votes
    (Charikar '02), pairs at Hamming distance <= 3 via XOR+popcount.

    Plan: pair DISTINCT signatures, then expand to doc pairs.
    Signatures collapse hard (sf0.1: 995 distinct among 5,000 docs — one
    signature covers 924 docs), so the all-pairs popcount comparison runs
    on |distinct|^2/2 ≈ 0.5M tiny rows instead of |docs|^2/2 = 12.5M,
    and the doc-level result (7.3M pairs — inherently quadratic output on
    this corpus) is produced by two hash-join expansions, never a
    pair-level distinct. Measured 14 s -> ~3 s at sf0.1 vs the banded
    self-join (which was no better than all-pairs here: 4-bit bands give
    64 buckets and vocabulary-correlated signatures pile into a few of
    them, emitting 20M candidates).

    Canonical pair order without double-emission: a signature pair is
    taken once (s_a <= s_b); cross-group doc pairs emit
    (least, greatest), same-group pairs filter doc_a < doc_b.

    Scale note: the signature-group contraction is the textbook simhash
    structure — at 100 TB, dedupe keys by signature first (distinct is
    one shuffle), compare signature pairs (optionally LSH-banded once
    signatures are wide enough to spread, e.g. 64-bit), and only expand
    groups when the downstream needs doc-level pairs at all (keep/drop
    decisions usually need one exemplar per group, not the pair list).
    The md5-once / vote-once barriers live in :func:`_simhash_docs`.
    """
    docs = _simhash_docs(t(spark, sf_dir, "documents"))
    usig = docs.select("simhash").distinct()
    a, b = usig.alias("a"), usig.alias("b")
    sig_pairs = (
        a.join(b, F.col("a.simhash") <= F.col("b.simhash"))
        .select(
            F.col("a.simhash").alias("s_a"),
            F.col("b.simhash").alias("s_b"),
            F.bit_count(
                F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
            ).cast("long").alias("hamming"),
        )
        .where(F.col("hamming") <= SIMHASH_MAX_HAMMING)
    )
    da = docs.select(F.col("doc_id").alias("id_a"), F.col("simhash").alias("s_a"))
    db = docs.select(F.col("doc_id").alias("id_b"), F.col("simhash").alias("s_b"))
    return (
        sig_pairs.join(da, "s_a")
        .join(db, "s_b")
        .where((F.col("s_a") < F.col("s_b")) | (F.col("id_a") < F.col("id_b")))
        .select(
            F.least("id_a", "id_b").alias("doc_a"),
            F.greatest("id_a", "id_b").alias("doc_b"),
            "hamming",
        )
    )


_SIMHASH_SQL_COL = (
    "list_sum(list_transform(range("
    + str(SIMHASH_BITS)
    + "), j -> CASE WHEN list_sum(list_transform(hs, h -> ((h >> j) & 1) * 2 - 1)) > 0 "
    "THEN (1::BIGINT << j) ELSE 0 END))::BIGINT"
)

DEDUP_SIMHASH_SQL = f"""
WITH hs0 AS (
    SELECT doc_id,
           list_transform(list_distinct({_TOKS_SQL}), x -> {portable_hash64_sql("x")}) AS hs
    FROM documents
),
sig AS (SELECT doc_id, {_SIMHASH_SQL_COL} AS simhash FROM hs0)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       bit_count(xor(a.simhash, b.simhash))::BIGINT AS hamming
FROM sig a JOIN sig b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= {SIMHASH_MAX_HAMMING}
"""


def dedup_near_dup_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The keep/drop half of a dedup pipeline: the corpus MINUS every doc
    that appears as the higher id of a verified near-dup pair (greedy
    keep-lowest — the standard approximation; full transitive clustering
    needs iterative connected components, out of SQL's reach).

    Plan: the pair list's doc_b side is tiny relative to the corpus, so
    the anti-join broadcasts it — the corpus itself never shuffles.
    """
    pairs = dedup_minhash_lsh(spark, sf_dir).select("doc_b").distinct()
    return (
        t(spark, sf_dir, "documents")
        .select("doc_id", "n_chars")
        .join(
            F.broadcast(pairs),
            F.col("doc_id") == F.col("doc_b"),
            "left_anti",
        )
    )


DEDUP_NEAR_DUP_SURVIVORS_SQL = f"""
SELECT doc_id, n_chars FROM documents
WHERE doc_id NOT IN (SELECT DISTINCT doc_b FROM ({DEDUP_MINHASH_LSH_SQL}))
"""


TEXTOPS_SPECS = [
    QuerySpec("text_quality", text_quality, TEXT_QUALITY_SQL, ("text-quality",)),
    QuerySpec("lang_id_heuristic", lang_id_heuristic, LANG_ID_SQL, ("lang-id",)),
    QuerySpec("token_stats_by_source", token_stats_by_source, TOKEN_STATS_SQL, ("token-count",)),
    QuerySpec("doc_fingerprint", doc_fingerprint, DOC_FINGERPRINT_SQL, ("fingerprint",)),
    QuerySpec("dedup_exact", dedup_exact, DEDUP_EXACT_SQL, ("dedup-exact",)),
    QuerySpec("dedup_ngram_jaccard", dedup_ngram_jaccard, DEDUP_NGRAM_JACCARD_SQL, ("dedup-jaccard",)),
    QuerySpec("dedup_minhash_lsh", dedup_minhash_lsh, DEDUP_MINHASH_LSH_SQL, ("dedup-minhash-lsh",)),
    QuerySpec("dedup_simhash", dedup_simhash, DEDUP_SIMHASH_SQL, ("dedup-simhash",)),
    QuerySpec(
        "dedup_near_dup_survivors",
        dedup_near_dup_survivors,
        DEDUP_NEAR_DUP_SURVIVORS_SQL,
        ("dedup-survivors",),
    ),
]
