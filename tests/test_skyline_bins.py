"""Round-10 additions: 2-D Pareto skyline + equal-frequency binning.

The driver's DuckDB oracle covers cross-engine parity
(test_queries_oracle.py auto-parametrizes both queries); these tests
pin the SEMANTICS against an independent brute force and the PLAN
shapes that make each query scale.
"""

from __future__ import annotations

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from ai_powered_e_commerce_analytics_spark.plans.analytics import (
    part_price_size_skyline,
)
from ai_powered_e_commerce_analytics_spark.plans.profiling import (
    order_value_quantile_bins,
)


def _brute_skyline(rows: list[tuple[int, float, int]]) -> set[int]:
    """O(N²) strict-dominance reference over (key, price, size)."""
    out = set()
    for k, p, s in rows:
        dominated = any(
            q <= p and z >= s and (q < p or z > s) for _, q, z in rows
        )
        if not dominated:
            out.add(k)
    return out


def _write_part(tmp_path, rows):
    pd.DataFrame(
        rows, columns=["p_partkey", "p_retailprice", "p_size"]
    ).to_parquet(tmp_path / "part.parquet", index=False)
    return str(tmp_path)


def _run_skyline(spark, tmp_path, rows):
    got = {
        r.p_partkey
        for r in part_price_size_skyline(
            spark, _write_part(tmp_path, rows)
        ).collect()
    }
    assert got == _brute_skyline(rows), rows
    return got


def test_skyline_adversarial_cases(spark, tmp_path):
    rows = [
        # frontier staircase
        (1, 10.00, 50),
        (2, 20.00, 60),
        (3, 30.00, 70),
        # dominated strictly on both axes
        (4, 25.00, 55),
        # equal price, smaller size -> dominated by 2
        (5, 20.00, 40),
        # equal size, higher price -> dominated by 2
        (6, 22.00, 60),
        # exact duplicate pair: strict dominance keeps BOTH
        (7, 10.00, 50),
        # cheapest overall always survives
        (8, 5.00, 1),
    ]
    got = _run_skyline(spark, tmp_path, rows)
    assert got == {1, 2, 3, 7, 8}


def test_skyline_degenerate_single_price(spark, tmp_path):
    # hi == lo: the bucket formula's divide-by-zero guard branch
    rows = [(1, 10.00, 5), (2, 10.00, 9), (3, 10.00, 9)]
    got = _run_skyline(spark, tmp_path, rows)
    assert got == {2, 3}


def test_skyline_nulls_dropped(spark, tmp_path):
    pd.DataFrame(
        {
            "p_partkey": [1, 2, 3],
            "p_retailprice": [10.0, None, 5.0],
            "p_size": pd.array([5, 7, None], dtype="Int64"),
        }
    ).to_parquet(tmp_path / "part.parquet", index=False)
    got = {
        r.p_partkey
        for r in part_price_size_skyline(spark, str(tmp_path)).collect()
    }
    assert got == {1}


_SKY_SETTINGS = dict(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# prices on the cent grid with heavy ties; sizes small to force ties
sky_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=12).map(lambda c: c * 0.25),
        st.integers(min_value=1, max_value=6),
    ),
    min_size=1,
    max_size=25,
)


@given(data=sky_rows)
@settings(**_SKY_SETTINGS)
def test_skyline_property_vs_bruteforce(spark, tmp_path_factory, data):
    tmp = tmp_path_factory.mktemp("sky")
    rows = [(i, p, s) for i, (p, s) in enumerate(data)]
    _run_skyline(spark, tmp, rows)


def test_skyline_plan_shape(spark):
    df = part_price_size_skyline(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    # dominance computed WITHOUT the O(N²) pair join the oracle uses
    assert "CartesianProduct" not in plan
    # frontier rejoins the scan as a broadcast, never a shuffled join
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" in plan


def test_quantile_bins_partition_the_corpus(spark, sf_dir):
    from ai_powered_e_commerce_analytics_spark.plans.spec import t

    out = {
        r.bin: r for r in order_value_quantile_bins(spark, sf_dir).collect()
    }
    assert set(out) == {1, 2, 3, 4}
    n_total = (
        t(spark, sf_dir, "orders")
        .where("o_totalprice IS NOT NULL")
        .count()
    )
    # equal-frequency bins PARTITION the corpus ...
    assert sum(r.n_orders for r in out.values()) == n_total
    # ... in value order, with no overlap between adjacent bins
    for k in (1, 2, 3):
        assert out[k].max_value <= out[k + 1].min_value
        assert out[k].min_value <= out[k].max_value
    # quartile binning is balanced to within the tie mass at a cutoff
    assert max(r.n_orders for r in out.values()) <= 2 * min(
        r.n_orders for r in out.values()
    )


def test_quantile_bins_plan_shape(spark, sf_dir):
    df = order_value_quantile_bins(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # cutoffs arrive broadcast; the corpus is never windowed or sorted
    assert "BroadcastNestedLoopJoin" in plan  # 1-row cutoff crossJoin
    assert "WindowExec" not in plan.replace("WindowGroupLimit", "")
    assert "SortMergeJoin" not in plan
