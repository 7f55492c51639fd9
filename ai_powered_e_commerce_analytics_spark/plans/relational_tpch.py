"""Extended TPC-H-class battery: join/agg shapes the core registry lacks.

The reference's operator inventory (SURVEY.md §2.3-2.8) is covered by
plans/relational.py; this module widens the *engine capability* story
with the join strategies a general analytics engine must execute well —
each one oracle-gated like everything else:

- semi-join with a non-equi residual condition        (q4 shape)
- pure filter→agg with full parquet pushdown          (q6 shape)
- conditional two-way pivot aggregation               (q12 shape)
- ratio-of-conditional-sums over a broadcast join     (q14 shape)
- distinct-agg + NOT-IN rewritten as anti-join        (q16 shape)
- correlated scalar subquery → per-key agg self-join  (q17 shape)
- HAVING-subquery join (agg feeding a join)           (q18 shape)
- disjunctive OR-of-conjunctions join predicate       (q19 shape)
- multi-way join + top-k                              (q10 shape)
- global scalar subquery + filtered anti-join         (q22 shape)
- running-total window (rows unbounded preceding)     (cumulative)

The driver testdata is a reduced TPC-H (no partsupp/shipmode/container/
phone columns), so each query keeps the classic SHAPE but binds to the
columns that exist (constants tuned non-empty at sf0.01).

All money math follows the exact-cents policy (plans/spec.py): sums are
exact longs, emitted values are deterministic IEEE expressions on
identical operands in both engines — no rounding anywhere.

Scale notes (100 TB):
- lineitem⋈orders shapes shuffle both sides on the order key — sort-merge
  under AQE, co-partitionable by bucketing both tables on the key
  (functions/bucketing.py); no other shuffle in those plans.
- part/supplier/customer dimension sides are broadcast explicitly where
  they are orders-of-magnitude smaller than the fact side.
- q17's per-part average is a partial-aggregated shuffle on l_partkey
  REUSED by the join (same key), so AQE plans one exchange.
- q6 is the pushdown showcase: every predicate lands in PushedFilters,
  ReadSchema is 4 columns — at 100 TB this reads a fraction of the table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .spec import QuerySpec, cents, cents_sql, t


def _ts(s: str):
    return F.lit(s).cast("timestamp")


def _disc_e4():
    """Discounted price in exact 1e-4 units: cents * (100 - discount%)."""
    return cents("l_extendedprice") * (100 - cents("l_discount"))


_DISC_E4_SQL = (
    f"{cents_sql('l_extendedprice')} * (100 - {cents_sql('l_discount')})"
)


# ---------------------------------------------------------------------------
# q6 — pure scan: filter → global agg (predicate-pushdown showcase)
# ---------------------------------------------------------------------------


def tpch_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    # All four predicates push to the parquet scan; ReadSchema is exactly
    # the four referenced columns. One partial+final agg, no shuffle of
    # data rows (2-row exchange). The l_discount membership test is done
    # in exact cents (5..7) to dodge float-literal equality.
    li = t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= _ts("1996-01-01 00:00:00"))
        & (F.col("l_shipdate") < _ts("1997-01-01 00:00:00"))
        & (F.col("l_quantity") < 24)
    )
    dc = cents("l_discount")
    li = li.where((dc >= 5) & (dc <= 7))
    return li.agg(
        (
            F.sum(cents("l_extendedprice") * dc).cast("double") / 1e4
        ).alias("revenue"),
        F.count("*").alias("n_lines"),
    )


TPCH_Q6_SQL = f"""
SELECT sum({cents_sql('l_extendedprice')} * {cents_sql('l_discount')})::DOUBLE / 1e4
           AS revenue,
       count(*)::BIGINT AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1997-01-01'
  AND l_quantity < 24
  AND {cents_sql('l_discount')} BETWEEN 5 AND 7
"""


# ---------------------------------------------------------------------------
# q4 — EXISTS semi-join with a non-equi residual (l_shipdate > o_orderdate)
# ---------------------------------------------------------------------------


def tpch_q4_late_shipment_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    # LEFT SEMI with equi key + residual cross-side predicate: Spark plans
    # a shuffled hash/sort-merge semi-join — lineitem is never widened
    # into the output (no dedup pass needed, unlike an inner join +
    # distinct). Date filter prunes orders before the shuffle.
    orders = t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= _ts("1996-07-01 00:00:00"))
        & (F.col("o_orderdate") < _ts("1996-10-01 00:00:00"))
    )
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    hit = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > orders.o_orderdate),
        "left_semi",
    )
    return hit.groupBy("o_orderpriority").agg(F.count("*").alias("order_count"))


TPCH_Q4_SQL = """
SELECT o_orderpriority, count(*)::BIGINT AS order_count
FROM orders o
WHERE o_orderdate >= TIMESTAMP '1996-07-01'
  AND o_orderdate <  TIMESTAMP '1996-10-01'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate)
GROUP BY o_orderpriority
"""


# ---------------------------------------------------------------------------
# q12 — join + conditional two-way pivot (CASE-sum) aggregation
# ---------------------------------------------------------------------------


def tpch_q12_priority_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    # lineitem⋈orders on the order key (the one shuffle), then CASE-sums
    # pivot priority classes per returnflag — map-side combinable.
    li = t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= _ts("1996-01-01 00:00:00"))
        & (F.col("l_shipdate") < _ts("1997-01-01 00:00:00"))
    ).select("l_orderkey", "l_returnflag")
    orders = t(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(hi, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~hi, 1).otherwise(0)).alias("low_line_count"),
        )
    )


TPCH_Q12_SQL = """
SELECT l_returnflag,
       sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                THEN 1 ELSE 0 END)::BIGINT AS high_line_count,
       sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH')
                THEN 1 ELSE 0 END)::BIGINT AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1997-01-01'
GROUP BY l_returnflag
"""


# ---------------------------------------------------------------------------
# q14 — ratio of conditional sums over a broadcast dimension join
# ---------------------------------------------------------------------------


def tpch_q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    # part is broadcast (fact side never shuffles); the ratio is one IEEE
    # expression over two exact-long sums — deterministic cross-engine.
    li = t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= _ts("1996-09-01 00:00:00"))
        & (F.col("l_shipdate") < _ts("1996-10-01 00:00:00"))
    )
    part = t(spark, sf_dir, "part").select("p_partkey", "p_type")
    j = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    promo = F.sum(
        F.when(F.col("p_type") == "PROMO", _disc_e4()).otherwise(F.lit(0))
    )
    total = F.sum(_disc_e4())
    return j.agg(
        (F.lit(100.0) * promo.cast("double") / total.cast("double")).alias(
            "promo_pct"
        )
    )


TPCH_Q14_SQL = f"""
SELECT 100.0 * sum(CASE WHEN p_type = 'PROMO' THEN {_DISC_E4_SQL}
                        ELSE 0 END)::DOUBLE
             / sum({_DISC_E4_SQL})::DOUBLE AS promo_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-09-01'
  AND l_shipdate <  TIMESTAMP '1996-10-01'
"""


# ---------------------------------------------------------------------------
# q16 — distinct-count agg + NOT IN rewritten as broadcast anti-join
# ---------------------------------------------------------------------------


def tpch_q16_supplier_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The part-supplier relation is derived (DISTINCT l_partkey,l_suppkey
    # — the testdata has no partsupp). NOT IN (scalar-null-free key set)
    # is the anti-join; the exclusion set is tiny → broadcast. countDistinct
    # plans as two-phase (partial distinct per partition, exact merge).
    pairs = (
        t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey").distinct()
    )
    bad = (
        t(spark, sf_dir, "supplier")
        .where(F.col("s_acctbal") < 0)
        .select(F.col("s_suppkey").alias("l_suppkey"))
    )
    part = t(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#9")
        & F.col("p_size").isin(1, 5, 10, 15, 20, 25, 30, 35)
    )
    return (
        pairs.join(F.broadcast(bad), "l_suppkey", "left_anti")
        .join(F.broadcast(part), pairs.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


TPCH_Q16_SQL = """
WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
SELECT p_brand, p_size, count(DISTINCT l_suppkey)::BIGINT AS supplier_cnt
FROM ps JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#9'
  AND p_size IN (1, 5, 10, 15, 20, 25, 30, 35)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_size
"""


# ---------------------------------------------------------------------------
# q17 — correlated scalar subquery → per-key average join
# ---------------------------------------------------------------------------


def tpch_q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The classic correlated subquery (avg qty FOR THIS PART) re-expressed
    # Spark-first: per-part partial agg joined back on the same key,
    # filter, global sum. The avg only matters for the brand's parts, so
    # the agg input is semi-joined against the broadcast part filter
    # FIRST — at 100 TB that shrinks the shuffle by the brand selectivity
    # (~1/25 here) with identical results. At this SF the agg output is
    # small enough that AQE broadcasts it back (fact side never
    # shuffles); at scale it flips to a sort-merge join on l_partkey.
    # The threshold test runs in EXACT integers (5*qty*cnt < sum_qty ⟺
    # qty < 0.2*avg) — no float near the decision boundary in either
    # engine.
    li = t(spark, sf_dir, "lineitem")
    qty = F.round("l_quantity").cast("long")
    brand = t(spark, sf_dir, "part").where(
        F.col("p_brand") == "Brand#13"
    ).select("p_partkey")
    brand_li = li.join(
        F.broadcast(brand), li.l_partkey == brand.p_partkey, "left_semi"
    )
    per_part = brand_li.groupBy("l_partkey").agg(
        F.sum(qty).alias("sq"), F.count("*").alias("cnt")
    )
    j = (
        li.select("l_partkey", qty.alias("qty"),
                  cents("l_extendedprice").alias("pc"))
        .join(F.broadcast(brand), F.col("l_partkey") == brand.p_partkey)
        .join(per_part, "l_partkey")
        .where(5 * F.col("qty") * F.col("cnt") < F.col("sq"))
    )
    return j.agg(
        (F.sum("pc").cast("double") / 100.0 / 7.0).alias("avg_yearly"),
        F.count("*").alias("n_lines"),
    )


TPCH_Q17_SQL = f"""
WITH pa AS (
    SELECT l_partkey, sum(round(l_quantity)::BIGINT) AS sq,
           count(*) AS cnt
    FROM lineitem GROUP BY l_partkey
)
SELECT sum({cents_sql('l_extendedprice')})::DOUBLE / 100.0 / 7.0 AS avg_yearly,
       count(*)::BIGINT AS n_lines
FROM lineitem l
JOIN part ON l.l_partkey = p_partkey
JOIN pa   ON l.l_partkey = pa.l_partkey
WHERE p_brand = 'Brand#13'
  AND 5 * round(l_quantity)::BIGINT * cnt < sq
"""


# ---------------------------------------------------------------------------
# q18 — HAVING-subquery feeding a join (large-quantity orders)
# ---------------------------------------------------------------------------


def tpch_q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Aggregate lineitem on l_orderkey with HAVING, then join orders on
    # the SAME key (one shuffle, reused) and broadcast customer for the
    # name. Top-100 via TakeOrderedAndProject — no global sort.
    li = t(spark, sf_dir, "lineitem")
    qty = F.round("l_quantity").cast("long")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(qty).alias("sum_qty"))
        .where(F.col("sum_qty") > 300)
    )
    orders = t(spark, sf_dir, "orders")
    customer = t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            F.col("o_totalprice").alias("totalprice"),
            "sum_qty",
        )
        .orderBy(F.desc("totalprice"), "o_orderkey")
        .limit(100)
    )


TPCH_Q18_SQL = """
WITH big AS (
    SELECT l_orderkey, sum(round(l_quantity)::BIGINT)::BIGINT AS sum_qty
    FROM lineitem GROUP BY l_orderkey
    HAVING sum(round(l_quantity)::BIGINT) > 300
)
SELECT c_name, c_custkey, o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
       o_totalprice AS totalprice, sum_qty
FROM big
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY totalprice DESC, o_orderkey LIMIT 100
"""


# ---------------------------------------------------------------------------
# q19 — disjunctive OR-of-conjunctions join predicate
# ---------------------------------------------------------------------------


def tpch_q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The OR clauses share the equi key (partkey), so Spark still plans an
    # equi-join (broadcast hash here) with the disjunction as a residual
    # filter — NOT a cartesian. Catalyst also extracts the common
    # qty/size envelope into pushable scan filters.
    li = t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    part = t(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    qty, size, brand = F.col("l_quantity"), F.col("p_size"), F.col("p_brand")
    clause = (
        ((brand == "Brand#12") & size.between(1, 5) & qty.between(1, 11))
        | ((brand == "Brand#20") & size.between(1, 10) & qty.between(10, 20))
        | ((brand == "Brand#25") & size.between(1, 15) & qty.between(20, 30))
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .where(clause)
        .agg(
            (F.sum(_disc_e4()).cast("double") / 1e4).alias("revenue"),
            F.count("*").alias("n_lines"),
        )
    )


TPCH_Q19_SQL = f"""
SELECT sum({_DISC_E4_SQL})::DOUBLE / 1e4 AS revenue,
       count(*)::BIGINT AS n_lines
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
       AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#20' AND p_size BETWEEN 1 AND 10
       AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#25' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 20 AND 30)
"""


# ---------------------------------------------------------------------------
# q10 — multi-way join + top-k (returned-item revenue by customer)
# ---------------------------------------------------------------------------


def tpch_q10_returned_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    # lineitem('R')⋈orders shuffles on the order key; customer and nation
    # broadcast. Group on the customer grain, top-20 via TakeOrdered.
    li = t(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    orders = t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= _ts("1996-01-01 00:00:00"))
        & (F.col("o_orderdate") < _ts("1996-04-01 00:00:00"))
    )
    customer = t(spark, sf_dir, "customer")
    nation = t(spark, sf_dir, "nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg((F.sum(_disc_e4()).cast("double") / 1e4).alias("revenue"))
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


TPCH_Q10_SQL = f"""
SELECT c_custkey, c_name, c_acctbal, n_name,
       sum({_DISC_E4_SQL})::DOUBLE / 1e4 AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1996-04-01'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey LIMIT 20
"""


# ---------------------------------------------------------------------------
# q22 — global scalar subquery + filtered anti-join
# ---------------------------------------------------------------------------


def tpch_q22_idle_wealthy_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The scalar subquery (avg positive balance, exact-cents) is a 1-row
    # agg Spark broadcasts into the filter; the "no recent orders" side is
    # a left-anti against a date-pruned orders scan. Output grain is
    # nation → tiny final agg.
    customer = t(spark, sf_dir, "customer")
    avgbal = customer.where(F.col("c_acctbal") > 0.0).agg(
        (
            (F.sum(cents("c_acctbal")).cast("double") / F.count("*")) / 100.0
        ).alias("a")
    )
    recent = t(spark, sf_dir, "orders").where(
        F.col("o_orderdate") >= _ts("1999-01-01 00:00:00")
    ).select(F.col("o_custkey").alias("c_custkey"))
    rich = customer.join(F.broadcast(avgbal)).where(
        F.col("c_acctbal") > F.col("a")
    )
    return (
        rich.join(recent, "c_custkey", "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count("*").alias("numcust"),
            (F.sum(cents("c_acctbal")).cast("double") / 100.0).alias("totacctbal"),
        )
    )


TPCH_Q22_SQL = f"""
WITH avgbal AS (
    SELECT (sum({cents_sql('c_acctbal')})::DOUBLE / count(*)) / 100.0 AS a
    FROM customer WHERE c_acctbal > 0.0
)
SELECT c_nationkey, count(*)::BIGINT AS numcust,
       sum({cents_sql('c_acctbal')})::DOUBLE / 100.0 AS totacctbal
FROM customer, avgbal
WHERE c_acctbal > a
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '1999-01-01')
GROUP BY c_nationkey
"""


# ---------------------------------------------------------------------------
# Cumulative window — running revenue per customer
# ---------------------------------------------------------------------------


def running_revenue_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    # ROWS UNBOUNDED PRECEDING running sum in exact cents (long adds are
    # associative — any frame evaluation order gives the same bits).
    # Partitioned window: shuffles once on o_custkey, sorts per key —
    # scales (no global single-task funnel; key grain is customers).
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return t(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        (F.sum(cents("o_totalprice")).over(w).cast("double") / 100.0).alias(
            "running_spent"
        ),
    )


RUNNING_REVENUE_SQL = f"""
SELECT o_custkey, o_orderkey,
       sum({cents_sql('o_totalprice')}) OVER (
           PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
           ROWS UNBOUNDED PRECEDING)::DOUBLE / 100.0 AS running_spent
FROM orders
"""


RELATIONAL_TPCH_SPECS = [
    QuerySpec("tpch_q4_late_shipment_semi", tpch_q4_late_shipment_semi,
              TPCH_Q4_SQL, ("semi-join-nonequi",)),
    QuerySpec("tpch_q6_forecast_revenue", tpch_q6_forecast_revenue,
              TPCH_Q6_SQL, ("scan-pushdown-agg",)),
    QuerySpec("tpch_q10_returned_revenue", tpch_q10_returned_revenue,
              TPCH_Q10_SQL, ("multi-join-topk",)),
    QuerySpec("tpch_q12_priority_pivot", tpch_q12_priority_pivot,
              TPCH_Q12_SQL, ("case-pivot-agg",)),
    QuerySpec("tpch_q14_promo_revenue", tpch_q14_promo_revenue,
              TPCH_Q14_SQL, ("ratio-of-sums",)),
    QuerySpec("tpch_q16_supplier_variety", tpch_q16_supplier_variety,
              TPCH_Q16_SQL, ("distinct-agg", "not-in-anti-join")),
    QuerySpec("tpch_q17_small_quantity_revenue", tpch_q17_small_quantity_revenue,
              TPCH_Q17_SQL, ("correlated-scalar-subquery",)),
    QuerySpec("tpch_q18_large_orders", tpch_q18_large_orders,
              TPCH_Q18_SQL, ("having-subquery-join",)),
    QuerySpec("tpch_q19_disjunctive_revenue", tpch_q19_disjunctive_revenue,
              TPCH_Q19_SQL, ("disjunctive-join-predicate",)),
    QuerySpec("tpch_q22_idle_wealthy_customers", tpch_q22_idle_wealthy_customers,
              TPCH_Q22_SQL, ("scalar-subquery", "filtered-anti-join")),
    QuerySpec("running_revenue_per_customer", running_revenue_per_customer,
              RUNNING_REVENUE_SQL, ("window-cumulative",)),
]
