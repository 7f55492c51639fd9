"""Driver-rotation invariants (pure Python — no SparkSession needed).

The external driver oracle-checks the FIRST 50 registry entries each
round, so the ordering IS the evidence-freshness policy. VERDICT r7
finding #1: age-only staleness let r7's plan rewrites coast on r6 green
rows; the rotation is now plan-aware via ``QuerySpec.touched_round``.
"""

from __future__ import annotations

from ai_powered_e_commerce_analytics_spark.plans import registry

WINDOW = 50


def test_registry_names_unique_and_complete():
    names = [q.name for q in registry.QUERIES]
    assert len(names) == len(set(names))
    assert len(names) >= 150


def test_last_verified_round_is_true_maximum():
    """``_last_verified_round`` must return the MOST RECENT round whose
    driver set holds the query — re-certification keeps a name in its
    older sets (r8 re-certified 40 r5 rows without pruning _R5), so the
    sets legitimately overlap and the function's newest-first check
    order carries the invariant. Enumerated generically over every
    ``_R{N}_DRIVER_VERIFIED`` attribute so a new round's set joins the
    invariant the moment it is added (an r5/r6/r7-literal disjointness
    version of this test silently aged out when r8 landed)."""
    import re

    by_round = {
        int(m.group(1)): getattr(registry, a)
        for a in dir(registry)
        if (m := re.fullmatch(r"_R(\d+)_DRIVER_VERIFIED", a))
    }
    assert len(by_round) >= 4
    names = {q.name for q in registry.QUERIES}
    seen = set().union(*by_round.values())
    # every verified name still exists in the registry
    assert seen <= names
    for n in names:
        rounds = [r for r, s in by_round.items() if n in s]
        assert registry._last_verified_round(n) == (
            max(rounds) if rounds else 0
        ), n
    # never-checked queries (new additions plus any fixed-after-error
    # re-entries) all sit at the head of the rotation
    never = names - seen
    head = {q.name for q in registry.QUERIES[: len(never)]}
    assert never == head or not never


def test_plan_touched_queries_lead_next_window():
    """Any query rewritten after its last driver check must re-enter the
    upcoming 50-query window — stale green evidence is not evidence."""
    window = {q.name for q in registry.QUERIES[:WINDOW]}
    for q in registry.QUERIES:
        if q.touched_round > registry._last_verified_round(q.name) > 0:
            assert q.name in window, (
                f"{q.name} was plan-touched in round {q.touched_round} "
                f"but is outside the driver window"
            )


def test_window_orders_by_staleness():
    keys = [registry._staleness(q) for q in registry.QUERIES]
    assert keys == sorted(keys)


def test_r15_window_composition_and_band_structure():
    """The round-15 handoff, pinned: the upcoming driver window is
    exactly the 3 r15 registrations (never driver-checked) plus the
    entire 47-row r11 band, so after r15 no row's evidence predates
    r12 — and the post-r15 band structure (r12:50, r13:46, r14:50,
    plus the 50 checked this round) means the r12 band ALONE fills a
    future 50-row window: the saturation fact the r16 budget decision
    must start from (see the llm_judge_position_bias queue comment)."""
    from collections import Counter

    names = [q.name for q in registry.QUERIES]
    assert len(names) == 196
    window = names[:WINDOW]
    rounds = Counter(
        registry._last_verified_round(n) for n in window
    )
    assert rounds == {0: 3, 11: 47}
    assert {
        "llm_judge_calibration",
        "retrieval_rank_overlap_rbo",
        "dedup_against_corpus_index",
    } <= set(window)
    # no r11-or-older evidence survives outside the window
    assert all(
        registry._last_verified_round(n) >= 12 for n in names[WINDOW:]
    )
    # band sizes the r16 plan reasons from
    all_rounds = Counter(registry._last_verified_round(n) for n in names)
    assert all_rounds[12] == 50 and all_rounds[13] == 46
