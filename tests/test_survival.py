"""Kaplan-Meier re-order survival (plans/analytics.py, r12).

The oracle battery pins Spark-vs-DuckDB parity; here the ESTIMATOR
semantics are pinned against a hand-computed example — event/censor
construction from order sequences, risk-set bookkeeping at ties, and
the d = n zero tail.
"""

from __future__ import annotations

import datetime

from ai_powered_e_commerce_analytics_spark.plans.analytics import (
    _KM_EPOCH,
    customer_reorder_survival,
)


def test_km_hand_example(spark, tmp_path):
    # customer A orders on days 0/10/30, B on days 5/25 (max day = 30):
    #   observations = gaps {10, 20, 20} (events) + censors {0, 5}
    #   t=10: n=3 at risk, d=1 -> S = 2/3
    #   t=20: n=2, d=2 (risk set empties) -> S = 0
    epoch = datetime.datetime.fromisoformat(_KM_EPOCH)
    rows = [
        (1, 101, epoch + datetime.timedelta(days=0)),
        (1, 102, epoch + datetime.timedelta(days=10)),
        (1, 103, epoch + datetime.timedelta(days=30)),
        (2, 201, epoch + datetime.timedelta(days=5)),
        (2, 202, epoch + datetime.timedelta(days=25)),
    ]
    spark.createDataFrame(
        rows, "o_custkey long, o_orderkey long, o_orderdate timestamp"
    ).write.mode("overwrite").parquet(f"{tmp_path}/orders.parquet")

    got = sorted(
        tuple(r)
        for r in customer_reorder_survival(spark, str(tmp_path)).collect()
    )
    assert got == [
        (10, 3, 1, 1.0 / 3.0, round(2.0 / 3.0, 6)),
        (20, 2, 2, 1.0, 0.0),
    ], got


def test_km_curve_invariants(spark):
    from conftest import SF_DIR

    rows = sorted(
        (r["t_days"], r["n_at_risk"], r["n_events"], r["survival"])
        for r in customer_reorder_survival(spark, SF_DIR).collect()
    )
    assert rows, "no event times"
    # survival is non-increasing in t; at-risk strictly decreases across
    # event times; hazards within (0, 1]
    surv = [s for _, _, _, s in rows]
    assert all(a >= b for a, b in zip(surv, surv[1:]))
    risk = [n for _, n, _, _ in rows]
    assert all(a > b for a, b in zip(risk, risk[1:]))
    assert all(0 < d <= n for _, n, d, _ in rows)
    assert 0.0 <= surv[-1] < surv[0] <= 1.0
