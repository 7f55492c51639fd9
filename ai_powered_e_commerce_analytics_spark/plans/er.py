"""Entity resolution / record linkage over catalog names
(beyond-reference — the fuzzy-matching layer a marketplace runs to
collapse seller-supplied product-name variants).

The shape is the canonical scalable ER pipeline:

1. **Distinct-contraction first**: pairs are generated over DISTINCT
   names, never over entity rows — the name dimension is bounded by the
   vocabulary (sf0.01: 2,000 parts -> 64 names), so the quadratic stage
   runs on the contracted set while per-entity counts ride along as
   aggregates. At 100 TB the contraction is the difference between an
   impossible row-pair join and a trivial name-pair join.
2. **Blocking, not all-pairs**: candidate pairs must share a name
   token (inverted-index equi-join on token, the textbook blocking
   key). Only blocked candidates reach the verifier. Hot tokens bound
   fan-out by token frequency; rarer compound blocking keys (token
   prefixes by global df, as in ``tfidf_top_terms``'s ordering) are the
   escalation when a token is too common.
3. **Cheap-verify**: exact token overlap / Jaccard (integer-derived)
   plus Levenshtein distance — both engine-built-ins (no UDF), computed
   ONLY on blocked pairs.

Match rule: shared token AND edit distance <= ``ER_LEV_MAX``. Evidence
columns (counts, jaccard, lev) are emitted so the threshold is
auditable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .spec import QuerySpec, t

ER_LEV_MAX = 3   # edit-distance ceiling for a candidate match


def part_name_er_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candidate same-entity pairs among distinct part names: blocked on
    a shared token, verified by Levenshtein <= ER_LEV_MAX, with exact
    token-set Jaccard and the per-name entity counts as evidence."""
    names = (
        t(spark, sf_dir, "part")
        .groupBy("p_name")
        .agg(F.count("*").alias("n_parts"))
        .withColumn("toks", F.split("p_name", " "))
    )
    tok = names.select(
        "p_name", "n_parts", "toks", F.explode("toks").alias("tk")
    )
    a, b = tok.alias("a"), tok.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.tk") == F.col("b.tk"))
            & (F.col("a.p_name") < F.col("b.p_name")),
        )
        .select(
            F.col("a.p_name").alias("name_a"),
            F.col("b.p_name").alias("name_b"),
            F.col("a.n_parts").alias("n_parts_a"),
            F.col("b.n_parts").alias("n_parts_b"),
            F.col("a.toks").alias("toks_a"),
            F.col("b.toks").alias("toks_b"),
        )
        .distinct()  # a pair sharing 2 tokens blocks twice; dedup once
    )
    shared = F.size(F.array_intersect("toks_a", "toks_b")).cast("long")
    union = F.size(F.array_union("toks_a", "toks_b")).cast("long")
    lev = F.levenshtein("name_a", "name_b").cast("long")
    return (
        cand.select(
            "name_a",
            "name_b",
            "n_parts_a",
            "n_parts_b",
            shared.alias("shared_tokens"),
            (shared.cast("double") / union).alias("token_jaccard"),
            lev.alias("lev"),
        )
        .where(F.col("lev") <= ER_LEV_MAX)
    )


PART_NAME_ER_PAIRS_SQL = f"""
WITH names AS (
    SELECT p_name, count(*)::BIGINT AS n_parts,
           string_split(p_name, ' ') AS toks
    FROM part GROUP BY p_name
),
tok AS (SELECT p_name, n_parts, toks, unnest(toks) AS tk FROM names),
cand AS (
    SELECT DISTINCT a.p_name AS name_a, b.p_name AS name_b,
           a.n_parts AS n_parts_a, b.n_parts AS n_parts_b,
           a.toks AS toks_a, b.toks AS toks_b
    FROM tok a JOIN tok b ON a.tk = b.tk AND a.p_name < b.p_name
)
SELECT name_a, name_b, n_parts_a, n_parts_b,
       len(list_intersect(toks_a, toks_b))::BIGINT AS shared_tokens,
       len(list_intersect(toks_a, toks_b))::DOUBLE
           / len(list_distinct(toks_a || toks_b)) AS token_jaccard,
       levenshtein(name_a, name_b)::BIGINT AS lev
FROM cand
WHERE levenshtein(name_a, name_b) <= {ER_LEV_MAX}
"""


ER_SPECS = [
    QuerySpec(
        "part_name_er_pairs",
        part_name_er_pairs,
        PART_NAME_ER_PAIRS_SQL,
        ("entity-resolution-blocking",),
    ),
]
