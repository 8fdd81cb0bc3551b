"""Extended TPC-H-shaped suite (Q2/Q4/Q7–Q9/Q12–Q22 shapes, adapted to the
driver's star schema — no partsupp/phone/shipmode columns exist, so each
query keeps its canonical *plan shape* (semi/anti/outer joins, correlated
scalar subqueries, disjunctive pushdown, self-join aggregation) against the
available columns.

Joins are surplus capability vs the reference (CQL has none — SURVEY §2.3;
README.asc "SQL minus joins and subqueries"), but they're what the driver's
correctness suite grades and where 100 TB plans are won or lost.

Scale notes (apply throughout):
- always-tiny dimensions (region=5, nation=25 rows; 1-row scalar frames)
  broadcast unconditionally; sf-scaling dimensions (customer/supplier/
  part) go through `maybe_broadcast` — hinted only while the planner's
  size estimate is small, so at 100 TB the hint vanishes and AQE picks
  the join strategy instead of force-collecting a 100 GB table;
- fact-fact joins (lineitem⋈orders) shuffle-hash on orderkey with AQE skew
  splitting; at 100 TB both sides would be bucketed by orderkey to make
  this co-located;
- correlated scalar subqueries are rewritten as aggregate-then-broadcast-
  join (the per-part avg is tiny after groupBy);
- double sums decimal-accumulate (order-independent ⇒ identical answers at
  any parallelism, and bit-equal to the DuckDB oracle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cassandra_pmem_spark.catalog import load_table
from cassandra_pmem_spark.plans.hints import maybe_broadcast

_DEC = "decimal(30,10)"


def _rev() -> F.Column:
    return (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(_DEC)


# --- Q2 shape: min-cost supplier per part (correlated MIN subquery) ----------

def tpch_q2_min_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For each LARGE part of size < 10, the cheapest supplier that shipped
    it (min s_acctbal, tie-break s_suppkey). Correlated-min rewritten as
    window rank over the deduped part↔supplier pairs."""
    part = load_table(spark, "part", sf_dir).filter(
        (F.col("p_size") < 10) & (F.col("p_type") == "LARGE")
    )
    supp = load_table(spark, "supplier", sf_dir)
    li = load_table(spark, "lineitem", sf_dir).select("l_partkey", "l_suppkey").distinct()
    w = Window.partitionBy("p_partkey").orderBy("s_acctbal", "s_suppkey")
    return (
        li.join(maybe_broadcast(part), li.l_partkey == part.p_partkey)
        .join(maybe_broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") == 1)
        .select("p_partkey", "p_name", "s_suppkey", "s_name", "s_acctbal")
    )


# --- Q4 shape: order-priority checking (EXISTS semi join) --------------------

def tpch_q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders in 1996-Q3 having at least one lineitem shipped after the
    order date (EXISTS → left-semi join), counted by priority."""
    orders = load_table(spark, "orders", sf_dir).filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01"))
        & (F.col("o_orderdate") < F.lit("1996-10-01"))
    )
    li = load_table(spark, "lineitem", sf_dir)
    return (
        orders.join(
            li,
            (orders.o_orderkey == li.l_orderkey) & (li.l_shipdate > orders.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


# --- Q7 shape: volume shipping between two nations ---------------------------

def tpch_q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue shipped between NATION_9 and NATION_11 (both directions),
    by supplier nation, customer nation, and ship year."""
    nation = load_table(spark, "nation", sf_dir)
    supp = load_table(spark, "supplier", sf_dir)
    cust = load_table(spark, "customer", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    li = load_table(spark, "lineitem", sf_dir).filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01")) & (F.col("l_shipdate") < F.lit("1998-01-01"))
    )
    n1 = nation.select(F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation"))
    n2 = nation.select(F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation"))
    pair = (
        (F.col("supp_nation") == "NATION_9") & (F.col("cust_nation") == "NATION_11")
    ) | ((F.col("supp_nation") == "NATION_11") & (F.col("cust_nation") == "NATION_9"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(maybe_broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(maybe_broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n1), supp.s_nationkey == F.col("s_nk"))
        .join(F.broadcast(n2), cust.c_nationkey == F.col("c_nk"))
        .filter(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(F.sum(_rev()).cast("double").alias("revenue"))
    )


# --- Q8 shape: national market share -----------------------------------------

def tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NATION_9's share of ECONOMY-part revenue delivered into ASIA, by
    order year. Conditional-sum-over-sum on doubles from exact decimals."""
    region = load_table(spark, "region", sf_dir).filter(F.col("r_name") == "ASIA")
    nation = load_table(spark, "nation", sf_dir)
    cust = load_table(spark, "customer", sf_dir)
    supp = load_table(spark, "supplier", sf_dir)
    part = load_table(spark, "part", sf_dir).filter(F.col("p_type") == "ECONOMY")
    orders = load_table(spark, "orders", sf_dir)
    li = load_table(spark, "lineitem", sf_dir)
    sn = nation.select(F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation"))
    return (
        li.join(maybe_broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(maybe_broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .join(maybe_broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(sn), supp.s_nationkey == F.col("s_nk"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            (
                F.sum(F.when(F.col("supp_nation") == "NATION_9", _rev()).otherwise(F.lit(0).cast(_DEC))).cast("double")
                / F.sum(_rev()).cast("double")
            ).alias("mkt_share")
        )
    )


# --- Q9 shape: product-type profit -------------------------------------------

def tpch_q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Profit (revenue − retailprice·qty) on parts named like '%gear%' by
    supplier nation and order year. partsupp.supplycost → p_retailprice."""
    nation = load_table(spark, "nation", sf_dir)
    supp = load_table(spark, "supplier", sf_dir)
    part = load_table(spark, "part", sf_dir).filter(F.col("p_name").like("%gear%"))
    orders = load_table(spark, "orders", sf_dir)
    li = load_table(spark, "lineitem", sf_dir)
    profit = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.col("p_retailprice") * F.col("l_quantity")
    ).cast(_DEC)
    return (
        li.join(maybe_broadcast(part), li.l_partkey == part.p_partkey)
        .join(maybe_broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year"))
        .agg(F.sum(profit).cast("double").alias("sum_profit"))
    )


# --- Q11 shape: important stock (scalar-subquery HAVING) ---------------------

def tpch_q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parts whose revenue exceeds 0.07% of total revenue — the
    HAVING-against-global-scalar shape (partsupp value → lineitem revenue).
    The scalar total is a 1-row broadcast onto the per-part rollup."""
    from decimal import Decimal

    li = load_table(spark, "lineitem", sf_dir)
    per_part = li.groupBy("l_partkey").agg(F.sum(_rev()).alias("val"))
    # keep the threshold comparison in exact decimal: decimal→double
    # conversion may round differently across engines at the boundary
    total = per_part.agg((F.sum("val") * F.lit(Decimal("0.0007"))).alias("cut"))
    return (
        per_part.join(F.broadcast(total))
        .filter(F.col("val") > F.col("cut"))
        .select("l_partkey", F.col("val").cast("double").alias("value"))
    )


# --- Q12 shape: late-shipment priority classes -------------------------------

def tpch_q12_late_shipments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lineitems shipped > 60 days after order date, by ship year: count
    critical (URGENT/HIGH) vs other priorities. commitdate/receiptdate →
    shipdate vs orderdate + interval."""
    orders = load_table(spark, "orders", sf_dir)
    li = load_table(spark, "lineitem", sf_dir)
    crit = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .groupBy(F.year("l_shipdate").alias("l_year"))
        .agg(
            F.sum(F.when(crit, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(crit, 0).otherwise(1)).alias("low_line_count"),
        )
    )


# --- Q13 shape: customer order-count distribution (left outer join) ----------

def tpch_q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogram of orders-per-customer, keeping zero-order customers via
    LEFT OUTER join with an ON-clause filter (not a WHERE — that's the Q13
    trap) excluding URGENT orders."""
    cust = load_table(spark, "customer", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    per_cust = (
        cust.join(
            orders,
            (cust.c_custkey == orders.o_custkey) & (orders.o_orderpriority != "1-URGENT"),
            "left_outer",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


# --- Q14 shape: promo revenue share ------------------------------------------

def tpch_q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percentage of 1997-H1 revenue from PROMO-type parts."""
    part = load_table(spark, "part", sf_dir)
    li = load_table(spark, "lineitem", sf_dir).filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01")) & (F.col("l_shipdate") < F.lit("1997-07-01"))
    )
    return (
        li.join(maybe_broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            (
                F.lit(100.0)
                * F.sum(F.when(F.col("p_type") == "PROMO", _rev()).otherwise(F.lit(0).cast(_DEC))).cast("double")
                / F.sum(_rev()).cast("double")
            ).alias("promo_revenue")
        )
    )


# --- Q15 shape: top supplier(s) ----------------------------------------------

def tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier(s) with max revenue in 1997-Q1 (view + scalar-max subquery →
    agg then global-max window over the tiny per-supplier rollup)."""
    supp = load_table(spark, "supplier", sf_dir)
    li = load_table(spark, "lineitem", sf_dir).filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01")) & (F.col("l_shipdate") < F.lit("1997-04-01"))
    )
    rev = li.groupBy("l_suppkey").agg(F.sum(_rev()).cast("double").alias("total_revenue"))
    top = rev.withColumn("mx", F.max("total_revenue").over(Window.partitionBy())).filter(
        F.col("total_revenue") == F.col("mx")
    )
    return top.join(maybe_broadcast(supp), top.l_suppkey == supp.s_suppkey).select(
        "s_suppkey", "s_name", "total_revenue"
    )


# --- Q16 shape: supplier counts by part attrs (NOT IN anti join) -------------

def tpch_q16_part_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct suppliers per (brand, type, size) for sizes in a set,
    excluding Brand#1/PROMO parts and suppliers with negative balance
    (NOT IN → left-anti join)."""
    part = load_table(spark, "part", sf_dir).filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45)
    )
    bad_supp = (
        load_table(spark, "supplier", sf_dir)
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    pairs = load_table(spark, "lineitem", sf_dir).select("l_partkey", "l_suppkey").distinct()
    return (
        pairs.join(maybe_broadcast(bad_supp), pairs.l_suppkey == bad_supp.s_suppkey, "left_anti")
        .join(maybe_broadcast(part), pairs.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


# --- Q17 shape: small-quantity revenue (correlated AVG subquery) -------------

def tpch_q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly revenue lost if Brand#3 orders below 50% of the part's average
    quantity were dropped. Correlated avg → per-part aggregate joined back
    onto the fact scan. The aggregate is computed only over Brand#3
    partkeys (semi-join first): restricting the partkey domain cannot
    change a per-partkey average, and it bounds the aggregate to the
    filtered-part cardinality instead of every part in the corpus — the
    round-1 plan broadcast the full-domain aggregate, which at 100 TB is a
    multi-GB forced broadcast. The join back is left unhinted: AQE
    broadcast-converts it at runtime when it measures small."""
    part_keys = (
        load_table(spark, "part", sf_dir)
        .filter(F.col("p_brand") == "Brand#3")
        .select("p_partkey")
    )
    li = load_table(spark, "lineitem", sf_dir)
    li_b3 = li.join(maybe_broadcast(part_keys), li.l_partkey == F.col("p_partkey"), "left_semi")
    avg_qty = (
        li_b3.groupBy(F.col("l_partkey").alias("ap_partkey"))
        .agg(F.avg(F.col("l_quantity").cast("decimal(30,6)")).cast("double").alias("avg_qty"))
    )
    return (
        li_b3.join(avg_qty, F.col("l_partkey") == F.col("ap_partkey"))
        .filter(F.col("l_quantity") < 0.5 * F.col("avg_qty"))
        .agg(
            (F.sum(F.col("l_extendedprice").cast(_DEC)).cast("double") / F.lit(7.0)).alias(
                "avg_weekly"
            )
        )
    )


# --- Q18 shape: large-volume customers (HAVING + IN subquery) ----------------

def tpch_q18_large_volume_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders whose total quantity exceeds 300, with their customer —
    IN-(HAVING subquery) → aggregate-filter then join."""
    cust = load_table(spark, "customer", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    li = load_table(spark, "lineitem", sf_dir)
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(30,6)")).cast("double").alias("total_qty"))
        .filter(F.col("total_qty") > 300)
    )
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(maybe_broadcast(cust), orders.o_custkey == cust.c_custkey)
        .select("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice", "total_qty")
    )


# --- Q19 shape: disjunctive predicate revenue --------------------------------

def tpch_q19_disjunctive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three OR-ed brand/size/quantity bands — the disjunctive-pushdown
    benchmark; Catalyst turns the common l_partkey join into one hash join
    with the residual OR filter."""
    part = load_table(spark, "part", sf_dir)
    li = load_table(spark, "lineitem", sf_dir)
    j = li.join(maybe_broadcast(part), li.l_partkey == part.p_partkey)
    band = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("l_quantity").between(1, 11)
            & F.col("p_size").between(1, 5)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("l_quantity").between(10, 20)
            & F.col("p_size").between(1, 10)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("l_quantity").between(20, 30)
            & F.col("p_size").between(1, 15)
        )
    )
    return j.filter(band).agg(F.sum(_rev()).cast("double").alias("revenue"))


# --- Q20 shape: promotion-candidate suppliers (nested semi joins) ------------

def tpch_q20_promo_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers in NATION_9 who shipped > 100 units of PROMO parts in 1997
    (nested IN subqueries → aggregate + semi-join chain)."""
    nation = load_table(spark, "nation", sf_dir).filter(F.col("n_name") == "NATION_9")
    supp = load_table(spark, "supplier", sf_dir)
    part = load_table(spark, "part", sf_dir).filter(F.col("p_type") == "PROMO")
    li = load_table(spark, "lineitem", sf_dir).filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01")) & (F.col("l_shipdate") < F.lit("1998-01-01"))
    )
    qualifying = (
        li.join(maybe_broadcast(part.select("p_partkey")), li.l_partkey == F.col("p_partkey"), "left_semi")
        .groupBy("l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(30,6)")).cast("double").alias("qty"))
        .filter(F.col("qty") > 100)
    )
    return (
        supp.join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey, "left_semi")
        .join(qualifying, supp.s_suppkey == qualifying.l_suppkey)
        .select("s_suppkey", "s_name", "qty")
    )


# --- Q21 shape: sole-returning supplier on multi-supplier orders -------------

def tpch_q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers who were the *only* one with returned items ('R') on orders
    involving ≥2 suppliers. The EXISTS/NOT-EXISTS double self-join is
    rewritten as one grouped pass over lineitem (no self-join at all —
    the aggregation form shuffles lineitem once on orderkey)."""
    supp = load_table(spark, "supplier", sf_dir)
    li = load_table(spark, "lineitem", sf_dir)
    # pre-aggregate to (order, supplier) grain first: two plain hash
    # aggregates instead of one multi-countDistinct (which Expand-multiplies
    # every shuffle row ×3 — at 100 TB that triples the shuffle volume)
    per_os = li.groupBy("l_orderkey", "l_suppkey").agg(
        F.max(F.when(F.col("l_returnflag") == "R", 1).otherwise(0)).alias("has_r")
    )
    per_order = per_os.groupBy("l_orderkey").agg(
        F.count("*").alias("n_supp"),
        F.sum("has_r").alias("n_ret"),
        F.max(F.when(F.col("has_r") == 1, F.col("l_suppkey"))).alias("ret_supp"),
    )
    blamed = per_order.filter((F.col("n_supp") >= 2) & (F.col("n_ret") == 1))
    return (
        blamed.groupBy("ret_supp")
        .agg(F.count("*").alias("numwait"))
        .join(maybe_broadcast(supp), F.col("ret_supp") == supp.s_suppkey)
        .select("s_name", "numwait")
        .orderBy(F.col("numwait").desc(), F.col("s_name"))
        .limit(20)
    )


# --- Q22 shape: dormant high-balance customers (anti join + scalar avg) ------

def tpch_q22_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with above-average positive balance and no orders since
    1999: scalar-avg subquery (broadcast 1-row) + NOT EXISTS (left-anti),
    grouped by nation-key band (phone country code analog)."""
    cust = load_table(spark, "customer", sf_dir)
    recent = (
        load_table(spark, "orders", sf_dir)
        .filter(F.col("o_orderdate") >= F.lit("1999-01-01"))
        .select("o_custkey")
        .distinct()
    )
    avg_bal = cust.filter(F.col("c_acctbal") > 0).agg(
        F.avg(F.col("c_acctbal").cast("decimal(30,6)")).cast("double").alias("avg_bal")
    )
    return (
        cust.join(recent, cust.c_custkey == recent.o_custkey, "left_anti")
        .join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .groupBy((F.col("c_nationkey") % 5).cast("int").alias("cntry_band"))
        .agg(
            F.count("*").alias("numcust"),
            F.sum(F.col("c_acctbal").cast(_DEC)).cast("double").alias("totacctbal"),
        )
    )


_D = "CAST(CAST(SUM(CAST({expr} AS DECIMAL(30,10))) AS VARCHAR) AS DOUBLE)"
_REV_D = _D.format(expr="l_extendedprice*(1-l_discount)")

QUERIES = {
    "tpch_q2_min_supplier": (
        tpch_q2_min_supplier,
        """
        SELECT p_partkey, p_name, s_suppkey, s_name, s_acctbal FROM (
          SELECT p_partkey, p_name, s_suppkey, s_name, s_acctbal,
                 row_number() OVER (PARTITION BY p_partkey
                                    ORDER BY s_acctbal, s_suppkey) AS rnk
          FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
          JOIN part ON l_partkey = p_partkey
          JOIN supplier ON l_suppkey = s_suppkey
          WHERE p_size < 10 AND p_type = 'LARGE'
        ) WHERE rnk = 1
        """,
    ),
    "tpch_q4_order_priority": (
        tpch_q4_order_priority,
        """
        SELECT o_orderpriority, count(*) AS order_count FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-07-01'
          AND o_orderdate < TIMESTAMP '1996-10-01'
          AND EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
        GROUP BY o_orderpriority
        """,
    ),
    "tpch_q7_volume_shipping": (
        tpch_q7_volume_shipping,
        f"""
        SELECT supp_nation, cust_nation, l_year, {_REV_D} AS revenue FROM (
          SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                 year(l_shipdate) AS l_year, l_extendedprice, l_discount
          FROM lineitem JOIN orders ON l_orderkey = o_orderkey
          JOIN customer ON o_custkey = c_custkey
          JOIN supplier ON l_suppkey = s_suppkey
          JOIN nation n1 ON s_nationkey = n1.n_nationkey
          JOIN nation n2 ON c_nationkey = n2.n_nationkey
          WHERE l_shipdate >= TIMESTAMP '1996-01-01'
            AND l_shipdate < TIMESTAMP '1998-01-01'
            AND ((n1.n_name = 'NATION_9' AND n2.n_name = 'NATION_11')
              OR (n1.n_name = 'NATION_11' AND n2.n_name = 'NATION_9'))
        ) GROUP BY supp_nation, cust_nation, l_year
        """,
    ),
    "tpch_q8_market_share": (
        tpch_q8_market_share,
        f"""
        SELECT year(o_orderdate) AS o_year,
          {_D.format(expr="CASE WHEN n1.n_name = 'NATION_9' THEN l_extendedprice*(1-l_discount) ELSE 0 END")}
            / {_REV_D} AS mkt_share
        FROM lineitem JOIN part ON l_partkey = p_partkey
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        JOIN region ON n2.n_regionkey = r_regionkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        WHERE p_type = 'ECONOMY' AND r_name = 'ASIA'
        GROUP BY year(o_orderdate)
        """,
    ),
    "tpch_q9_product_profit": (
        tpch_q9_product_profit,
        f"""
        SELECT n_name AS nation, year(o_orderdate) AS o_year,
          {_D.format(expr="l_extendedprice*(1-l_discount) - p_retailprice*l_quantity")} AS sum_profit
        FROM lineitem JOIN part ON l_partkey = p_partkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN orders ON l_orderkey = o_orderkey
        JOIN nation ON s_nationkey = n_nationkey
        WHERE p_name LIKE '%gear%'
        GROUP BY n_name, year(o_orderdate)
        """,
    ),
    "tpch_q11_important_parts": (
        tpch_q11_important_parts,
        f"""
        WITH per_part AS (
          SELECT l_partkey, SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(30,10))) AS val
          FROM lineitem GROUP BY l_partkey
        )
        SELECT l_partkey, CAST(CAST(val AS VARCHAR) AS DOUBLE) AS value FROM per_part
        WHERE val > (SELECT SUM(val) * CAST(0.0007 AS DECIMAL(5,4)) FROM per_part)
        """,
    ),
    "tpch_q12_late_shipments": (
        tpch_q12_late_shipments,
        """
        SELECT year(l_shipdate) AS l_year,
          CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
          CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
        GROUP BY year(l_shipdate)
        """,
    ),
    "tpch_q13_customer_distribution": (
        tpch_q13_customer_distribution,
        """
        SELECT c_count, count(*) AS custdist FROM (
          SELECT c_custkey, count(o_orderkey) AS c_count
          FROM customer LEFT OUTER JOIN orders
            ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
          GROUP BY c_custkey
        ) GROUP BY c_count
        """,
    ),
    "tpch_q14_promo_revenue": (
        tpch_q14_promo_revenue,
        f"""
        SELECT 100.0
          * {_D.format(expr="CASE WHEN p_type = 'PROMO' THEN l_extendedprice*(1-l_discount) ELSE 0 END")}
          / {_REV_D} AS promo_revenue
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-07-01'
        """,
    ),
    "tpch_q15_top_supplier": (
        tpch_q15_top_supplier,
        f"""
        WITH rev AS (
          SELECT l_suppkey, {_REV_D} AS total_revenue
          FROM lineitem
          WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-04-01'
          GROUP BY l_suppkey
        )
        SELECT s_suppkey, s_name, total_revenue FROM rev JOIN supplier ON l_suppkey = s_suppkey
        WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
        """,
    ),
    "tpch_q16_part_supplier_counts": (
        tpch_q16_part_supplier_counts,
        """
        SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
        FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
        JOIN part ON l_partkey = p_partkey
        WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
          AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
          AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        GROUP BY p_brand, p_type, p_size
        """,
    ),
    "tpch_q17_small_qty_revenue": (
        tpch_q17_small_qty_revenue,
        """
        SELECT CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,10))) AS VARCHAR) AS DOUBLE)
               / 7.0 AS avg_weekly
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE p_brand = 'Brand#3'
          AND l_quantity < 0.5 * (
            SELECT CAST(CAST(AVG(CAST(l2.l_quantity AS DECIMAL(30,6))) AS VARCHAR) AS DOUBLE)
            FROM lineitem l2 WHERE l2.l_partkey = lineitem.l_partkey)
        """,
    ),
    "tpch_q18_large_volume_customer": (
        tpch_q18_large_volume_customer,
        """
        WITH big AS (
          SELECT l_orderkey,
            CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(30,6))) AS VARCHAR) AS DOUBLE) AS total_qty
          FROM lineitem GROUP BY l_orderkey
          HAVING CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(30,6))) AS VARCHAR) AS DOUBLE) > 300
        )
        SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice, total_qty
        FROM big JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        """,
    ),
    "tpch_q19_disjunctive": (
        tpch_q19_disjunctive,
        f"""
        SELECT {_REV_D} AS revenue
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE (p_brand = 'Brand#12' AND l_quantity BETWEEN 1 AND 11 AND p_size BETWEEN 1 AND 5)
           OR (p_brand = 'Brand#23' AND l_quantity BETWEEN 10 AND 20 AND p_size BETWEEN 1 AND 10)
           OR (p_brand = 'Brand#3' AND l_quantity BETWEEN 20 AND 30 AND p_size BETWEEN 1 AND 15)
        """,
    ),
    "tpch_q20_promo_suppliers": (
        tpch_q20_promo_suppliers,
        """
        WITH qualifying AS (
          SELECT l_suppkey,
            CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(30,6))) AS VARCHAR) AS DOUBLE) AS qty
          FROM lineitem
          WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_type = 'PROMO')
            AND l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
          GROUP BY l_suppkey
          HAVING CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(30,6))) AS VARCHAR) AS DOUBLE) > 100
        )
        SELECT s_suppkey, s_name, qty FROM supplier JOIN qualifying ON s_suppkey = l_suppkey
        WHERE s_nationkey IN (SELECT n_nationkey FROM nation WHERE n_name = 'NATION_9')
        """,
    ),
    "tpch_q21_waiting_supplier": (
        tpch_q21_waiting_supplier,
        """
        WITH per_order AS (
          SELECT l_orderkey, count(DISTINCT l_suppkey) AS n_supp,
            count(DISTINCT CASE WHEN l_returnflag = 'R' THEN l_suppkey END) AS n_ret,
            max(CASE WHEN l_returnflag = 'R' THEN l_suppkey END) AS ret_supp
          FROM lineitem GROUP BY l_orderkey
        )
        SELECT s_name, count(*) AS numwait FROM per_order
        JOIN supplier ON ret_supp = s_suppkey
        WHERE n_supp >= 2 AND n_ret = 1
        GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 20
        """,
    ),
    "tpch_q22_dormant_customers": (
        tpch_q22_dormant_customers,
        """
        SELECT CAST(c_nationkey % 5 AS INT) AS cntry_band, count(*) AS numcust,
          CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(30,10))) AS VARCHAR) AS DOUBLE) AS totacctbal
        FROM customer
        WHERE c_acctbal > (
            SELECT CAST(CAST(AVG(CAST(c_acctbal AS DECIMAL(30,6))) AS VARCHAR) AS DOUBLE)
            FROM customer WHERE c_acctbal > 0)
          AND NOT EXISTS (
            SELECT 1 FROM orders WHERE o_custkey = c_custkey
              AND o_orderdate >= TIMESTAMP '1999-01-01')
        GROUP BY CAST(c_nationkey % 5 AS INT)
        """,
    ),
}
