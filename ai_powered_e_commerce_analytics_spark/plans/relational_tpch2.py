"""TPC-H battery II: the remaining classic query shapes.

Together with plans/relational.py (q1/q3/q5) and plans/relational_tpch.py
(q4/q6/q10/q12/q14/q16/q17/q18/q19/q22) this completes every TPC-H query
shape expressible on the driver testdata (no partsupp table, no
comment/phone/receiptdate columns — each query keeps the classic SHAPE
and binds to the columns that exist; partsupp is derived as the DISTINCT
(l_partkey, l_suppkey) relation where needed):

- q2  min-cost-supplier: correlated MIN subquery over a derived partsupp
- q7  two-nation volume: double dimension chain + year bucketing
- q8  market share: ratio of conditional sums per year
- q9  product profit: expression combining two money columns, nation/year
- q11 important parts: group agg gated by a global-scalar HAVING
- q13 order-count distribution: outer join + two-level aggregation
- q15 top supplier: agg joined against its own global MAX (ties kept)
- q20 excess-share suppliers: two-level agg + threshold semi-join chain
- q21 sole-late-supplier: multi-EXISTS/NOT-EXISTS re-expressed as one
      grouped pass over the fact table (no self-joins)

All money math follows the exact-cents policy (plans/spec.py): sums and
threshold comparisons happen in integer cents / 1e-4 units; emitted
doubles are deterministic IEEE expressions on identical operands.

Scale notes (100 TB):
- Every dimension chain (nation/region/supplier/customer/part) is
  broadcast — the lineitem/orders fact sides never shuffle for them.
- q2/q16/q20's derived partsupp is a DISTINCT/agg shuffle on
  (l_partkey, l_suppkey); its consumers join on the same leading key so
  AQE reuses the exchange rather than re-partitioning.
- q13 shuffles orders once on o_custkey; the second aggregation
  (distribution over counts) is over ≤|customers| rows.
- q21 replaces the textbook double self-join of lineitem with ONE
  groupBy(l_orderkey): at 100 TB that's one shuffle of the filtered
  fact table instead of three, with identical semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .spec import QuerySpec, cents, cents_sql, t


def _ts(s: str):
    return F.lit(s).cast("timestamp")


def _disc_e4():
    return cents("l_extendedprice") * (100 - cents("l_discount"))


_DISC_E4_SQL = (
    f"{cents_sql('l_extendedprice')} * (100 - {cents_sql('l_discount')})"
)

_EUROPE = "EUROPE"


def _nation_region(spark, sf_dir):
    nation = t(spark, sf_dir, "nation")
    region = t(spark, sf_dir, "region")
    return nation.join(
        F.broadcast(region), nation.n_regionkey == region.r_regionkey
    )


# ---------------------------------------------------------------------------
# q2 — min-cost supplier per part (correlated MIN subquery)
# ---------------------------------------------------------------------------


def tpch_q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    # partsupp is derived: per (part, supplier) the minimum unit price
    # seen on any line (exact cents → MIN is engine-order-independent).
    # The correlated subquery "cost = (SELECT min(cost) ... same part)"
    # becomes a per-part MIN agg joined back on the SAME key — the
    # groupBy((part,supp)) exchange already clusters by part, so the
    # per-part MIN and the join back are near-free under AQE.
    li = t(spark, sf_dir, "lineitem")
    ps = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(cents("l_extendedprice")).alias("cost_c")
    )
    eu_supp = (
        t(spark, sf_dir, "supplier")
        .join(
            F.broadcast(
                _nation_region(spark, sf_dir).where(F.col("r_name") == _EUROPE)
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    ps_eu = ps.join(
        F.broadcast(eu_supp), ps.l_suppkey == F.col("s_suppkey")
    )
    min_cost = ps_eu.groupBy("l_partkey").agg(F.min("cost_c").alias("min_c"))
    part = (
        t(spark, sf_dir, "part")
        .where((F.col("p_type") == "LARGE") & (F.col("p_size") < 25))
        .select("p_partkey", "p_brand", "p_size")
    )
    return (
        ps_eu.join(min_cost, "l_partkey")
        .where(F.col("cost_c") == F.col("min_c"))
        .join(F.broadcast(part), ps_eu.l_partkey == part.p_partkey)
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            "p_partkey",
            "p_brand",
            "p_size",
            (F.col("cost_c").cast("double") / 100.0).alias("supply_cost"),
        )
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


TPCH_Q2_SQL = f"""
WITH ps AS (
    SELECT l_partkey, l_suppkey,
           min({cents_sql('l_extendedprice')}) AS cost_c
    FROM lineitem GROUP BY 1, 2
),
eu AS (
    SELECT s_suppkey, s_name, s_acctbal, n_name
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
                  JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = '{_EUROPE}'
),
ps_eu AS (SELECT * FROM ps JOIN eu ON l_suppkey = s_suppkey)
SELECT s_acctbal, s_name, n_name, p_partkey, p_brand, p_size,
       cost_c::DOUBLE / 100.0 AS supply_cost
FROM ps_eu
JOIN part ON l_partkey = p_partkey
WHERE p_type = 'LARGE' AND p_size < 25
  AND cost_c = (SELECT min(cost_c) FROM ps_eu i
                WHERE i.l_partkey = ps_eu.l_partkey)
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey LIMIT 100
"""


# ---------------------------------------------------------------------------
# q7 — volume shipping between two nations, by year
# ---------------------------------------------------------------------------


def tpch_q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Supplier nation rides the lineitem side, customer nation rides the
    # orders side; both nation lookups broadcast. The only data shuffle
    # is lineitem⋈orders on the order key. The (A,B)|(B,A) pair filter
    # is a residual on broadcast columns.
    n1, n2 = "NATION_1", "NATION_2"
    nation = t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    supp = (
        t(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
        .where(F.col("supp_nation").isin(n1, n2))
    )
    cust = (
        t(spark, sf_dir, "customer")
        .join(F.broadcast(nation), F.col("c_nationkey") == nation.n_nationkey)
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
        .where(F.col("cust_nation").isin(n1, n2))
    )
    li = t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= _ts("1996-01-01 00:00:00"))
        & (F.col("l_shipdate") < _ts("1998-01-01 00:00:00"))
    )
    orders = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    return (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .where(
            ((F.col("supp_nation") == n1) & (F.col("cust_nation") == n2))
            | ((F.col("supp_nation") == n2) & (F.col("cust_nation") == n1))
        )
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
        )
        .agg((F.sum(_disc_e4()).cast("double") / 1e4).alias("revenue"))
    )


TPCH_Q7_SQL = f"""
SELECT supp_nation, cust_nation, l_year,
       sum(volume)::DOUBLE / 1e4 AS revenue
FROM (
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           year(l_shipdate)::INT AS l_year, {_DISC_E4_SQL} AS volume
    FROM lineitem
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    JOIN nation n1 ON s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c_nationkey = n2.n_nationkey
    WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      AND l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
) GROUP BY 1, 2, 3
"""


# ---------------------------------------------------------------------------
# q8 — market share of one nation within a region, by order year
# ---------------------------------------------------------------------------


def tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Ratio of conditional exact-long sums per year: both numerator and
    # denominator aggregate in the same pass (single shuffle on the
    # group key after the fact-fact join).
    target = "NATION_3"  # a EUROPE nation
    nation = t(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    eu_cust = (
        t(spark, sf_dir, "customer")
        .join(
            F.broadcast(
                _nation_region(spark, sf_dir).where(F.col("r_name") == _EUROPE)
            ),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select("c_custkey")
    )
    supp = (
        t(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    part = t(spark, sf_dir, "part").where(F.col("p_type") == "ECONOMY").select(
        "p_partkey"
    )
    orders = t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= _ts("1996-01-01 00:00:00"))
        & (F.col("o_orderdate") < _ts("1998-01-01 00:00:00"))
    )
    li = t(spark, sf_dir, "lineitem")
    vol = _disc_e4()
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(eu_cust), orders.o_custkey == eu_cust.c_custkey)
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            (
                F.sum(
                    F.when(F.col("supp_nation") == target, vol).otherwise(
                        F.lit(0)
                    )
                ).cast("double")
                / F.sum(vol).cast("double")
            ).alias("mkt_share")
        )
    )


TPCH_Q8_SQL = f"""
SELECT year(o_orderdate)::INT AS o_year,
       sum(CASE WHEN n1.n_name = 'NATION_3' THEN {_DISC_E4_SQL}
                ELSE 0 END)::DOUBLE
         / sum({_DISC_E4_SQL})::DOUBLE AS mkt_share
FROM lineitem
JOIN part     ON p_partkey = l_partkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN orders   ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
JOIN region   ON n2.n_regionkey = r_regionkey
WHERE r_name = '{_EUROPE}' AND p_type = 'ECONOMY'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1998-01-01'
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# q9 — product-line profit by supplier nation and year
# ---------------------------------------------------------------------------


def tpch_q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Profit = discounted revenue − retail cost of the shipped quantity,
    # combined in exact 1e-4 units BEFORE summing (one long column, one
    # sum). p_retailprice stands in for ps_supplycost (no partsupp).
    nation = t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    supp = (
        t(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .select("s_suppkey", "n_name")
    )
    part = (
        t(spark, sf_dir, "part")
        .where(F.col("p_name").like("%widget%"))
        .select("p_partkey", "p_retailprice")
    )
    li = t(spark, sf_dir, "lineitem")
    qty = F.round("l_quantity").cast("long")
    profit_e4 = _disc_e4() - 100 * cents("p_retailprice") * qty
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("l_shipdate").alias("o_year"),
        )
        .agg((F.sum(profit_e4).cast("double") / 1e4).alias("sum_profit"))
    )


TPCH_Q9_SQL = f"""
SELECT n_name AS nation, year(l_shipdate)::INT AS o_year,
       sum({_DISC_E4_SQL}
           - 100 * {cents_sql('p_retailprice')}
                 * round(l_quantity)::BIGINT)::DOUBLE / 1e4 AS sum_profit
FROM lineitem
JOIN part     ON p_partkey = l_partkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation   ON s_nationkey = n_nationkey
WHERE p_name LIKE '%widget%'
GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# q11 — important parts (HAVING gated by a global scalar subquery)
# ---------------------------------------------------------------------------


def tpch_q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Per-part value for one nation's suppliers, kept only where it
    # exceeds a global-scalar threshold (1.5× the average per-part
    # value — scale-free, unlike TPC-H's SF-dependent fraction). The
    # global total is a second agg over the same per-part frame,
    # broadcast back as a 1-row cross join. Threshold test runs on
    # exact longs: value_c * n_parts * 10 > total_c * 15.
    nation_supp = (
        t(spark, sf_dir, "supplier")
        .join(
            F.broadcast(
                t(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_4")
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey")
    )
    li = t(spark, sf_dir, "lineitem")
    val = cents("l_extendedprice") * F.round("l_quantity").cast("long")
    per_part = (
        li.join(F.broadcast(nation_supp), li.l_suppkey == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(F.sum(val).alias("value_c"))
    )
    total = per_part.agg(
        F.sum("value_c").alias("total_c"), F.count("*").alias("n_parts")
    )
    return (
        per_part.join(F.broadcast(total))
        .where(
            F.col("value_c") * F.col("n_parts") * 10 > F.col("total_c") * 15
        )
        .select(
            "l_partkey", (F.col("value_c").cast("double") / 100.0).alias("value")
        )
    )


TPCH_Q11_SQL = f"""
WITH pp AS (
    SELECT l_partkey,
           sum({cents_sql('l_extendedprice')}
               * round(l_quantity)::BIGINT) AS value_c
    FROM lineitem
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    WHERE n_name = 'NATION_4'
    GROUP BY 1
)
SELECT l_partkey, value_c::DOUBLE / 100.0 AS value
FROM pp
WHERE value_c * (SELECT count(*) FROM pp) * 10
      > (SELECT sum(value_c) FROM pp) * 15
"""


# ---------------------------------------------------------------------------
# q13 — customer order-count distribution (outer join + double agg)
# ---------------------------------------------------------------------------


def tpch_q13_order_count_distribution(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    # LEFT OUTER join keeps zero-order customers (count=0 bucket); the
    # filter lives in the join's right input, not a WHERE (which would
    # drop the NULL rows). First agg shuffles on o_custkey; the second
    # agg input is one row per customer — trivial.
    cust = t(spark, sf_dir, "customer").select("c_custkey")
    orders = (
        t(spark, sf_dir, "orders")
        .where(F.col("o_orderpriority") != "1-URGENT")
        .select("o_custkey", "o_orderkey")
    )
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
    )


TPCH_Q13_SQL = """
SELECT c_count, count(*)::BIGINT AS custdist
FROM (
    SELECT c_custkey, count(o_orderkey)::BIGINT AS c_count
    FROM customer LEFT JOIN orders
      ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
    GROUP BY c_custkey
)
GROUP BY c_count
"""


# ---------------------------------------------------------------------------
# q15 — top supplier(s): agg joined against its own global MAX
# ---------------------------------------------------------------------------


def tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Quarterly revenue per supplier in exact 1e-4 longs; the MAX is a
    # 1-row agg broadcast back, and the equality match is long==long —
    # deterministic cross-engine (a double revenue would make the
    # "ties kept" contract float-fragile).
    li = t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= _ts("1996-01-01 00:00:00"))
        & (F.col("l_shipdate") < _ts("1996-04-01 00:00:00"))
    )
    rev = li.groupBy("l_suppkey").agg(F.sum(_disc_e4()).alias("rev_e4"))
    mx = rev.agg(F.max("rev_e4").alias("max_e4"))
    supplier = t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.join(F.broadcast(mx))
        .where(F.col("rev_e4") == F.col("max_e4"))
        .join(F.broadcast(supplier), rev.l_suppkey == supplier.s_suppkey)
        .select(
            "s_suppkey",
            "s_name",
            (F.col("rev_e4").cast("double") / 1e4).alias("total_revenue"),
        )
    )


TPCH_Q15_SQL = f"""
WITH rev AS (
    SELECT l_suppkey, sum({_DISC_E4_SQL}) AS rev_e4
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1996-04-01'
    GROUP BY 1
)
SELECT s_suppkey, s_name, rev_e4::DOUBLE / 1e4 AS total_revenue
FROM rev JOIN supplier ON l_suppkey = s_suppkey
WHERE rev_e4 = (SELECT max(rev_e4) FROM rev)
"""


# ---------------------------------------------------------------------------
# q20 — suppliers holding an excess share of a part's shipments
# ---------------------------------------------------------------------------


def tpch_q20_excess_share_suppliers(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    # q20's nested-IN chain re-expressed: per-(part,supp) 1996 shipped
    # qty vs 0.5× the part's total (exact longs: 2*pair > total), then
    # the qualifying suppkey set semi-joins supplier. The per-pair and
    # per-part aggs share the l_partkey leading key — one shuffle,
    # reused. Part name filter prunes before any shuffle.
    widget_parts = (
        t(spark, sf_dir, "part")
        .where(F.col("p_name").like("%widget%"))
        .select("p_partkey")
    )
    li = t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= _ts("1996-01-01 00:00:00"))
        & (F.col("l_shipdate") < _ts("1997-01-01 00:00:00"))
    )
    qty = F.round("l_quantity").cast("long")
    shipped = (
        li.join(F.broadcast(widget_parts), li.l_partkey == F.col("p_partkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(qty).alias("pair_qty"))
    )
    part_total = shipped.groupBy("l_partkey").agg(
        F.sum("pair_qty").alias("part_qty")
    )
    excess = (
        shipped.join(part_total, "l_partkey")
        .where(2 * F.col("pair_qty") > F.col("part_qty"))
        .select("l_suppkey")
        .distinct()
    )
    supplier = t(spark, sf_dir, "supplier")
    nation = t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        supplier.join(excess, supplier.s_suppkey == excess.l_suppkey, "left_semi")
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .select("s_suppkey", "s_name", "n_name")
    )


TPCH_Q20_SQL = """
WITH shipped AS (
    SELECT l_partkey, l_suppkey, sum(round(l_quantity)::BIGINT) AS pair_qty
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_name LIKE '%widget%'
      AND l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
    GROUP BY 1, 2
),
totals AS (SELECT l_partkey, sum(pair_qty) AS part_qty FROM shipped GROUP BY 1)
SELECT s_suppkey, s_name, n_name
FROM supplier JOIN nation ON s_nationkey = n_nationkey
WHERE s_suppkey IN (
    SELECT l_suppkey FROM shipped JOIN totals USING (l_partkey)
    WHERE 2 * pair_qty > part_qty
)
"""


# ---------------------------------------------------------------------------
# q21 — sole late supplier on multi-supplier orders
# ---------------------------------------------------------------------------


def tpch_q21_sole_late_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Textbook q21 is lineitem semi-joined AND anti-joined against
    # itself (exists other supplier; not exists other LATE supplier).
    # Re-expressed as ONE grouped pass per (orderkey, suppkey) with
    # per-order supplier/late-supplier distinct counts — identical
    # semantics, one shuffle instead of three fact-table joins.
    # "Late" = shipped >60 days after the order date (testdata has no
    # commit/receipt dates).
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    orders = t(spark, sf_dir, "orders").where(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey", "o_orderdate")
    j = li.join(orders, li.l_orderkey == orders.o_orderkey)
    late = F.col("l_shipdate") > F.expr("o_orderdate + INTERVAL 60 DAYS")
    per_pair = j.groupBy("l_orderkey", "l_suppkey").agg(
        F.max(late.cast("int")).alias("pair_late")
    )
    per_order = per_pair.groupBy("l_orderkey").agg(
        F.count("*").alias("n_supps"),
        F.sum("pair_late").alias("n_late_supps"),
    )
    supplier = t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        per_pair.where(F.col("pair_late") == 1)
        .join(per_order, "l_orderkey")
        .where((F.col("n_supps") > 1) & (F.col("n_late_supps") == 1))
        .join(F.broadcast(supplier), F.col("l_suppkey") == supplier.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(100)
    )


TPCH_Q21_SQL = """
WITH pair AS (
    SELECT l_orderkey, l_suppkey,
           max(CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY
                    THEN 1 ELSE 0 END) AS pair_late
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE o_orderstatus = 'F'
    GROUP BY 1, 2
),
per_order AS (
    SELECT l_orderkey, count(*) AS n_supps, sum(pair_late) AS n_late_supps
    FROM pair GROUP BY 1
)
SELECT s_name, count(*)::BIGINT AS numwait
FROM pair
JOIN per_order USING (l_orderkey)
JOIN supplier ON l_suppkey = s_suppkey
WHERE pair_late = 1 AND n_supps > 1 AND n_late_supps = 1
GROUP BY s_name
ORDER BY numwait DESC, s_name LIMIT 100
"""


# ---------------------------------------------------------------------------
# ROLLUP / CUBE / exact percentiles — agg shapes beyond plain GROUP BY
# ---------------------------------------------------------------------------


def rollup_revenue_by_flag_status(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    # ROLLUP = hierarchical subtotals + grand total in one pass; Spark
    # expands to a single Expand+agg (rows replicated per grouping set,
    # still map-side combinable). grouping_id disambiguates NULL-as-
    # subtotal from NULL data.
    li = t(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        (F.sum(cents("l_extendedprice")).cast("double") / 100.0).alias(
            "revenue"
        ),
        F.count("*").alias("n_lines"),
        F.grouping_id().alias("gid"),
    )


ROLLUP_REVENUE_SQL = f"""
SELECT l_returnflag, l_linestatus,
       sum({cents_sql('l_extendedprice')})::DOUBLE / 100.0 AS revenue,
       count(*)::BIGINT AS n_lines,
       grouping(l_returnflag, l_linestatus)::BIGINT AS gid
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


def cube_orders_by_status_priority(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    # CUBE over two low-cardinality dims: all four grouping sets in one
    # Expand+agg pass.
    orders = t(spark, sf_dir, "orders")
    return orders.cube("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("n_orders"),
        (F.sum(cents("o_totalprice")).cast("double") / 100.0).alias(
            "total_value"
        ),
        F.grouping_id().alias("gid"),
    )


CUBE_ORDERS_SQL = f"""
SELECT o_orderstatus, o_orderpriority,
       count(*)::BIGINT AS n_orders,
       sum({cents_sql('o_totalprice')})::DOUBLE / 100.0 AS total_value,
       grouping(o_orderstatus, o_orderpriority)::BIGINT AS gid
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
"""


def order_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    # EXACT linear-interpolation percentiles (both engines implement the
    # same continuous quantile: a + frac*(b-a) over the sorted values).
    # Spark's percentile is a full-sort-per-group exact agg — fine at
    # KPI-table grain; approx_percentile is the documented 100 TB swap
    # (t-digest, mergeable, no per-group sort).
    # Interpolation output is float-accumulated → round(…,6) per policy.
    orders = t(spark, sf_dir, "orders")
    pct = lambda p: F.round(  # noqa: E731
        F.expr(f"percentile(o_totalprice, {p})"), 6
    )
    return orders.groupBy("o_orderpriority").agg(
        pct(0.25).alias("p25"),
        pct(0.5).alias("p50"),
        pct(0.75).alias("p75"),
        pct(0.95).alias("p95"),
        F.count("*").alias("n_orders"),
    )


ORDER_VALUE_PERCENTILES_SQL = """
SELECT o_orderpriority,
       round(quantile_cont(o_totalprice, 0.25), 6) AS p25,
       round(quantile_cont(o_totalprice, 0.50), 6) AS p50,
       round(quantile_cont(o_totalprice, 0.75), 6) AS p75,
       round(quantile_cont(o_totalprice, 0.95), 6) AS p95,
       count(*)::BIGINT AS n_orders
FROM orders GROUP BY 1
"""


RELATIONAL_TPCH2_SPECS = [
    QuerySpec("tpch_q2_min_cost_supplier", tpch_q2_min_cost_supplier,
              TPCH_Q2_SQL, ("correlated-min-subquery",)),
    QuerySpec("tpch_q7_nation_volume", tpch_q7_nation_volume,
              TPCH_Q7_SQL, ("multi-dim-join-year-agg",)),
    QuerySpec("tpch_q8_market_share", tpch_q8_market_share,
              TPCH_Q8_SQL, ("conditional-ratio-by-year",)),
    QuerySpec("tpch_q9_product_profit", tpch_q9_product_profit,
              TPCH_Q9_SQL, ("multi-column-expression-agg",)),
    QuerySpec("tpch_q11_important_parts", tpch_q11_important_parts,
              TPCH_Q11_SQL, ("global-scalar-having",)),
    QuerySpec("tpch_q13_order_count_distribution",
              tpch_q13_order_count_distribution,
              TPCH_Q13_SQL, ("outer-join-double-agg",)),
    QuerySpec("tpch_q15_top_supplier", tpch_q15_top_supplier,
              TPCH_Q15_SQL, ("agg-max-self-join",)),
    QuerySpec("tpch_q20_excess_share_suppliers", tpch_q20_excess_share_suppliers,
              TPCH_Q20_SQL, ("nested-agg-threshold-semi-join",)),
    QuerySpec("tpch_q21_sole_late_supplier", tpch_q21_sole_late_supplier,
              TPCH_Q21_SQL, ("multi-exists-grouped-rewrite",)),
    QuerySpec("rollup_revenue_by_flag_status", rollup_revenue_by_flag_status,
              ROLLUP_REVENUE_SQL, ("rollup-grouping-sets",)),
    QuerySpec("cube_orders_by_status_priority", cube_orders_by_status_priority,
              CUBE_ORDERS_SQL, ("cube-grouping-sets",)),
    QuerySpec("order_value_percentiles", order_value_percentiles,
              ORDER_VALUE_PERCENTILES_SQL, ("exact-percentiles",)),
]
