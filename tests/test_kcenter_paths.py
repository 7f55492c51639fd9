"""Large-K k-center (VERDICT r11 #7, re-cut r16 per VERDICT r15 #4).

Since optimization r16 every ``kcenter_coreset`` round — any K — scores
candidates through the ``_assign_batched`` Arrow island (the old
>16-selected broadcast-join fallback folded the interpreted ``_sqdist``
HOF per pair; the island's closure carries the already-driver-resident
selected list, so the codegen method-size crossover that motivated the
two-path split no longer exists). Contract: the trace is bit-identical
to an INDEPENDENT driver-side implementation of the same math — pure
Python left-fold squared distances in ``_sqdist``'s dimension order,
micro-quantization as HALF_UP over the shortest-decimal repr (the
``_round6_half_up`` argument at scale 0), argmax by (md DESC, vec_id
ASC) — and the island path survives K in the hundreds where the
pre-r15 inlined ``least()`` expression would have dropped to
interpreted mode.
"""

from __future__ import annotations

import decimal

from pyspark.sql import functions as F

from ai_powered_e_commerce_analytics_spark.plans.simsearch import (
    _INERTIA_GRID,
    KCENTER_K,
    embedding_kcenter_coreset,
    kcenter_coreset,
    t,
)

from conftest import SF_DIR


def _round0_half_up_long(x: float) -> int:
    """Driver replica of ``round(double, 0).cast('long')``: HALF_UP over
    the shortest-decimal repr (same argument as simsearch._round6_half_up,
    at scale 0)."""
    return int(
        decimal.Decimal(repr(x)).quantize(
            decimal.Decimal("1"), rounding=decimal.ROUND_HALF_UP
        )
    )


def _reference_trace(spark, sf_dir: str, k: int) -> list[tuple[int, int, int]]:
    """Independent greedy k-center over the collected corpus: per-pair
    squared distance as the pure-Python left-fold ``acc += (x_d - c_d)²``
    in ascending dimension order (== ``_sqdist``'s fold == the island's
    per-dimension accumulation), min over the selected set, micro
    quantization ``round(min·GRID)`` HALF_UP, argmax by (md DESC,
    vec_id ASC). No Spark expression or island code in the scoring path.
    """
    rows = sorted(
        (int(r["vec_id"]), [float(v) for v in r["emb"]])
        for r in t(spark, sf_dir, "embeddings")
        .select(
            "vec_id",
            F.transform("embedding", lambda x: x.cast("double")).alias("emb"),
        )
        .collect()
    )
    selected = [rows[0]]
    trace = [(1, rows[0][0], 0)]
    for rank in range(2, k + 1):
        sel_ids = {vid for vid, _ in selected}
        best = None
        for vid, emb in rows:
            if vid in sel_ids:
                continue
            md_raw = None
            for _svid, semb in selected:
                acc = 0.0
                for x, c in zip(emb, semb):
                    d = x - c
                    acc += d * d
                if md_raw is None or acc < md_raw:
                    md_raw = acc
            md = _round0_half_up_long(md_raw * float(_INERTIA_GRID))
            if best is None or (-md, vid) < best[0]:
                best = ((-md, vid), emb)
        (neg_md, vid), emb = best
        selected.append((vid, emb))
        trace.append((rank, vid, -neg_md))
    return trace


def test_island_trace_matches_independent_reference(spark):
    """K=20 spans both the old sub-16 regime and the old >16 fallback
    regime: every round must match the independent driver reference."""
    k = 20
    engine = [
        (int(r["sel_rank"]), int(r["vec_id"]), int(r["mindist_micro"]))
        for r in kcenter_coreset(spark, SF_DIR, k).collect()
    ]
    assert engine == _reference_trace(spark, SF_DIR, k)
    assert len(engine) == k


def test_oracle_gated_query_unchanged_by_refactor(spark):
    via_default = [
        tuple(r) for r in embedding_kcenter_coreset(spark, SF_DIR).collect()
    ]
    explicit = [
        tuple(r) for r in kcenter_coreset(spark, SF_DIR, KCENTER_K).collect()
    ]
    assert via_default == explicit and len(via_default) == KCENTER_K


def test_large_k_through_island_path(spark):
    """K=64: every round past the old crossover now runs the island.
    Selection invariants: ranks contiguous, vec_ids distinct, and the
    farthest-point min-distance sequence is non-increasing from rank 2
    on (each added center can only shrink later candidates' distance
    to the selected set)."""
    k = 64
    rows = sorted(
        tuple(r) for r in kcenter_coreset(spark, SF_DIR, k).collect()
    )
    assert [r[0] for r in rows] == list(range(1, k + 1))
    assert len({r[1] for r in rows}) == k
    mds = [r[2] for r in rows][1:]  # rank 1 is the seed (md = 0)
    assert all(a >= b for a, b in zip(mds, mds[1:])), mds
