"""Approximate-sketch twins of exact aggregates (the 100 TB swap path).

``order_value_percentiles`` (plans/relational_tpch2.py) is an exact
full-sort percentile — correct but per-group-sort-bound at scale. The
production swap is sketch aggregation: Greenwald-Khanna quantile sketches
(``percentile_approx``) and HyperLogLog++ distinct counts
(``approx_count_distinct``) are MERGEABLE partial aggregates — map-side
combine everywhere, one narrow shuffle of sketch bytes, no sort.

Oracle gating: the driver's correctness gate is hash equality, which an
approximate value can never satisfy. These queries therefore emit the
TOLERANCE VERDICT, not the estimate: Spark computes both the sketch
estimate and the exact value and emits ``<metric>_ok`` booleans (plus the
exact anchors, which DO hash-match); the oracle emits the same anchors
with literal ``true``. A hash match thus PROVES the documented error
bound held — tolerance assertions encoded into the hash gate.

Determinism: GK guarantees rank error <= 1/accuracy for ANY partition
merge order, and HLL++ is a deterministic function of the value set, so
the booleans cannot flap between runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .spec import QuerySpec, t

PCT_ACCURACY = 10_000        # GK rank error <= 1e-4 of each group
PCT_RANK_SLACK = 0.005       # GK eps + >=1 interpolation step at every SF
HLL_RSD = 0.02               # HLL++ relative standard deviation
HLL_TOLERANCE = 0.05         # 2.5 sigma; deterministic, verified at all SFs


def order_value_percentiles_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch percentiles with a PROVEN rank-error bound per group.

    For each quantile q the GK estimate must lie between the exact
    percentiles at q ± PCT_RANK_SLACK (the sketch's 1/accuracy rank
    guarantee plus interpolation-step slack; ``percentile``'s fraction
    must be foldable, so the slack is a Python literal sized for the
    smallest per-group n across test SFs). The emitted ``pXX_ok``
    booleans are the bound checks; ``n_orders`` anchors the hash to
    real data.
    """
    orders = t(spark, sf_dir, "orders")

    def bound_ok(q: float):
        lo_q = max(0.0, q - PCT_RANK_SLACK)
        hi_q = min(1.0, q + PCT_RANK_SLACK)
        lo = F.expr(f"percentile(o_totalprice, {lo_q})")
        hi = F.expr(f"percentile(o_totalprice, {hi_q})")
        approx = F.expr(
            f"approx_percentile(o_totalprice, {q}, {PCT_ACCURACY})"
        )
        return (approx >= lo) & (approx <= hi)

    return orders.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_orders"),
        bound_ok(0.25).alias("p25_ok"),
        bound_ok(0.50).alias("p50_ok"),
        bound_ok(0.95).alias("p95_ok"),
    )


ORDER_VALUE_PERCENTILES_APPROX_SQL = """
SELECT o_orderpriority, count(*)::BIGINT AS n_orders,
       true AS p25_ok, true AS p50_ok, true AS p95_ok
FROM orders GROUP BY 1
"""


def approx_distinct_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL++ distinct customers per order priority, gated on a 5%%
    relative-error bound (2.5x the configured rsd) against the exact
    count. The exact count anchors the hash; ``hll_ok`` is the verdict.
    """
    orders = t(spark, sf_dir, "orders")
    exact = F.count_distinct(F.col("o_custkey"))
    approx = F.expr(f"approx_count_distinct(o_custkey, {HLL_RSD})")
    return orders.groupBy("o_orderpriority").agg(
        exact.alias("exact_customers"),
        (
            F.abs(approx.cast("double") - exact.cast("double"))
            <= F.lit(HLL_TOLERANCE) * exact.cast("double")
        ).alias("hll_ok"),
    )


APPROX_DISTINCT_CUSTOMERS_SQL = """
SELECT o_orderpriority,
       count(DISTINCT o_custkey)::BIGINT AS exact_customers,
       true AS hll_ok
FROM orders GROUP BY 1
"""


APPROX_SPECS = [
    QuerySpec(
        "order_value_percentiles_approx",
        order_value_percentiles_approx,
        ORDER_VALUE_PERCENTILES_APPROX_SQL,
        ("approx-percentiles-sketch",),
    ),
    QuerySpec(
        "approx_distinct_customers",
        approx_distinct_customers,
        APPROX_DISTINCT_CUSTOMERS_SQL,
        ("approx-distinct-hll",),
    ),
]
