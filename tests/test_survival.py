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


import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_KM_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# small random order histories with heavy day ties (ties exercise the
# per-customer lead ordering and duration-grain grouping)
_histories = st.lists(
    st.lists(st.integers(min_value=0, max_value=20), min_size=1, max_size=6),
    min_size=1,
    max_size=6,
)


def _km_reference(histories):
    """Pure-Python KM over the same observation construction."""
    days = sorted({d for h in histories for d in h})
    max_day = max(days)
    obs = []  # (duration, event)
    for h in histories:
        hs = sorted(h)
        for a, b in zip(hs, hs[1:]):
            obs.append((b - a, 1))
        obs.append((max_day - hs[-1], 0))
    out = []
    cum_micro, zeroed = 0, False
    for t in sorted({d for d, e in obs if e == 1}):
        n = sum(1 for d, _ in obs if d >= t)
        d = sum(1 for dd, e in obs if dd == t and e == 1)
        hazard = float(d) / float(n)
        if d == n:
            zeroed = True
        elif not zeroed:
            w = math.log(1.0 - hazard) * 1_000_000
            cum_micro += int(math.floor(abs(w) + 0.5)) * (1 if w >= 0 else -1)
        surv = 0.0 if zeroed else round(math.exp(cum_micro / 1e6), 6)
        out.append((t, n, d, hazard, surv))
    return out


@given(histories=_histories)
@settings(**_KM_SETTINGS)
def test_km_property_vs_python_reference(spark, tmp_path_factory, histories):
    epoch = datetime.datetime.fromisoformat(_KM_EPOCH)
    rows = []
    key = 0
    for cust, h in enumerate(histories):
        for d in h:
            key += 1
            rows.append((cust, key, epoch + datetime.timedelta(days=int(d))))
    tmp = tmp_path_factory.mktemp("km")
    spark.createDataFrame(
        rows, "o_custkey long, o_orderkey long, o_orderdate timestamp"
    ).write.mode("overwrite").parquet(f"{tmp}/orders.parquet")
    got = sorted(
        tuple(r) for r in customer_reorder_survival(spark, str(tmp)).collect()
    )
    want = _km_reference(histories)
    # survival compared at the emission grid; ln-rounding in the engine
    # is round-half-even vs the reference's half-away only at exact .5
    # micro boundaries, which these integer-day hazards never hit
    assert [(t, n, d) for t, n, d, _, _ in got] == [
        (t, n, d) for t, n, d, _, _ in want
    ]
    for g, w in zip(got, want):
        assert abs(g[3] - w[3]) == 0.0
        assert abs(g[4] - w[4]) < 2e-6, (g, w)
