"""G-test rule significance (plans/graph.py, r12).

The oracle battery pins engine parity; here the STATISTIC is pinned:
a perfectly associated pair scores far above the chi-square(1df)
significance threshold while an independence-constructed pair scores
~0, and the micro-quantized G2 matches a pure-Python computation of
2*sum(O*ln(O/E)) on the same contingency."""

from __future__ import annotations

import math

from ai_powered_e_commerce_analytics_spark.plans.graph import (
    copurchase_rule_significance,
)


def _write_lineitem(spark, tmp_path, baskets):
    rows = [
        (ok, pk)
        for ok, parts in enumerate(baskets, start=1)
        for pk in parts
    ]
    spark.createDataFrame(
        rows, "l_orderkey long, l_partkey long"
    ).write.mode("overwrite").parquet(f"{tmp_path}/lineitem.parquet")


def _py_g2(c, n_a, n_b, n):
    cells = [
        (c, n_a, n_b),
        (n_a - c, n_a, n - n_b),
        (n_b - c, n - n_a, n_b),
        (n - n_a - n_b + c, n - n_a, n - n_b),
    ]
    micro = 0
    for o, row, col in cells:
        if o > 0:
            term = 2.0 * float(o) * math.log(
                float(o) / (float(row) * float(col) / float(n))
            )
            micro += int(math.floor(abs(term) * 1e6 + 0.5)) * (
                1 if term >= 0 else -1
            )
    return micro


def test_g2_separates_association_from_independence(spark, tmp_path):
    # 16 baskets. Parts 1 & 2 always co-occur (8 baskets, perfect
    # association). Parts 3 & 4 are constructed INDEPENDENT: 3 in 8
    # baskets, 4 in 8 baskets, overlapping in exactly 8*8/16 = 4.
    baskets = []
    for i in range(16):
        b = []
        if i < 8:
            b += [1, 2]
        if i < 8:
            b += [3]
        if i % 2 == 0:
            b += [4]
        b += [100 + i]  # filler singleton so every basket is non-empty
        baskets.append(b)
    _write_lineitem(spark, tmp_path, baskets)
    rows = {
        (r["part_a"], r["part_b"]): r
        for r in copurchase_rule_significance(spark, str(tmp_path)).collect()
    }
    strong = rows[(1, 2)]
    indep = rows[(3, 4)]
    # contingency sanity
    assert (strong["n_both"], strong["n_a"], strong["n_b"]) == (8, 8, 8)
    assert (indep["n_both"], indep["n_a"], indep["n_b"]) == (4, 8, 8)
    # chi-square(1df) reading: perfect association >> 10.83 (p<.001);
    # exact independence == 0 by construction
    assert strong["g2"] > 10.83, strong
    assert indep["g2_micro"] == 0, indep
    # micro-quantized engine value matches the pure-Python statistic
    for r in rows.values():
        assert r["g2_micro"] == _py_g2(
            r["n_both"], r["n_a"], r["n_b"], r["n_baskets"]
        ), r
