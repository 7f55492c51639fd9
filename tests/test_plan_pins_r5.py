"""Plan-shape regression pins for the round-5 query families: the
scale arguments in their docstrings (equi-joins only, bounded
exchanges, broadcast dimensions) must stay true in the EXECUTED plan.
Value-level correctness is the oracle battery's job."""

from __future__ import annotations

import pytest

from ai_powered_e_commerce_analytics_spark.plans.er import part_name_er_pairs
from ai_powered_e_commerce_analytics_spark.plans.graph import (
    copurchase_item_similarity,
    copurchase_triangles,
)
from ai_powered_e_commerce_analytics_spark.plans.pretrain import (
    tokenizer_vocab_coverage,
)
from ai_powered_e_commerce_analytics_spark.plans.simsearch import (
    semantic_dedup_semdedup,
)
from ai_powered_e_commerce_analytics_spark.plans.temporal import (
    events_dedup_within_window,
)


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


@pytest.mark.parametrize(
    "build",
    [
        copurchase_triangles,
        copurchase_item_similarity,
        semantic_dedup_semdedup,
        part_name_er_pairs,
        tokenizer_vocab_coverage,
    ],
    ids=lambda f: f.__name__,
)
def test_no_unbounded_join_shapes(spark, sf_dir, build):
    # Every pair stage must be a keyed equi-join after its contraction
    # (blocking / clustering / orientation) — never a cartesian or a
    # nested-loop over data-sized inputs.
    plan = _plan(build(spark, sf_dir))
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_debounce_is_one_exchange(spark, sf_dir):
    # One (user_id, event_type) window shuffle and nothing else.
    import re

    plan = _plan(events_dedup_within_window(spark, sf_dir))
    assert len(re.findall(r"Exchange \(\d+\)", plan)) == 1, plan


def test_vocab_broadcast_onto_token_stream(spark, sf_dir):
    # The O(N)-row vocabulary must broadcast; the token stream must not
    # shuffle for the join.
    plan = _plan(tokenizer_vocab_coverage(spark, sf_dir))
    assert "BroadcastHashJoin" in plan, plan


def test_ri_report_scans_each_fact_once(spark, sf_dir):
    # The r7 fusion: every fact table scanned ONCE for all its FK
    # edges (5 fact + 7 dim-key scans), markers attached by equi-join
    # — no per-edge rescans, no 1-row crossJoin nested loops.
    import re

    from ai_powered_e_commerce_analytics_spark.plans.analytics import (
        referential_integrity_report,
    )

    plan = _plan(referential_integrity_report(spark, sf_dir))
    # "(N) Scan parquet" = the detail entry, once per scan node (the
    # tree section prints each node a second time).
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 12, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan
