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


def test_verified_sets_partition_registry():
    """r5/r6/r7 driver sets are disjoint and (with never-checked
    additions) cover the registry — precondition for _last_verified_round
    returning the true most-recent round."""
    r5, r6, r7 = (
        registry._R5_DRIVER_VERIFIED,
        registry._R6_DRIVER_VERIFIED,
        registry._R7_DRIVER_VERIFIED,
    )
    assert not (r5 & r6) and not (r5 & r7) and not (r6 & r7)
    names = {q.name for q in registry.QUERIES}
    never = names - r5 - r6 - r7
    # every verified name still exists in the registry
    assert (r5 | r6 | r7) <= names
    # never-checked queries are exactly the post-r7 additions and all
    # sit at the head of the rotation
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
