"""Large-K k-center (VERDICT r11 #7).

``kcenter_coreset`` switches from the literal-inlined K-term
min-distance expression to a broadcast-join + grouped-min once the
selected set passes ``KCENTER_INLINE_MAX`` (the codegen-method-size
crossover). Contract: the two forms compute IDENTICAL micro distances
(same doubles, same per-pair fold and rounding, same tiebreaks), so a
trace is path-independent; and the join path survives K in the
hundreds where the inlined expression would drop to interpreted mode.
"""

from __future__ import annotations

from ai_powered_e_commerce_analytics_spark.plans.simsearch import (
    KCENTER_K,
    embedding_kcenter_coreset,
    kcenter_coreset,
)

from conftest import SF_DIR


def test_join_path_trace_identical_to_literal_path(spark):
    k = 10
    literal = [
        tuple(r)
        for r in kcenter_coreset(
            spark, SF_DIR, k, inline_threshold=k + 1
        ).collect()
    ]
    joined = [
        tuple(r)
        for r in kcenter_coreset(
            spark, SF_DIR, k, inline_threshold=0
        ).collect()
    ]
    assert literal == joined
    assert len(literal) == k


def test_oracle_gated_query_unchanged_by_refactor(spark):
    via_default = [
        tuple(r) for r in embedding_kcenter_coreset(spark, SF_DIR).collect()
    ]
    explicit = [
        tuple(r) for r in kcenter_coreset(spark, SF_DIR, KCENTER_K).collect()
    ]
    assert via_default == explicit and len(via_default) == KCENTER_K


def test_large_k_through_join_path(spark):
    """K=64 >> KCENTER_INLINE_MAX: every round past the crossover runs
    the broadcast-join form. Selection invariants: ranks contiguous,
    vec_ids distinct, and the farthest-point min-distance sequence is
    non-increasing from rank 2 on (each added center can only shrink
    later candidates' distance to the selected set)."""
    k = 64
    rows = sorted(
        tuple(r) for r in kcenter_coreset(spark, SF_DIR, k).collect()
    )
    assert [r[0] for r in rows] == list(range(1, k + 1))
    assert len({r[1] for r in rows}) == k
    mds = [r[2] for r in rows][1:]  # rank 1 is the seed (md = 0)
    assert all(a >= b for a, b in zip(mds, mds[1:])), mds
