"""TPC-H-shaped relational coverage, part 2: the remaining classic query
shapes (Q2/Q4/Q5/Q6/Q7/Q8/Q9/Q11/Q13/Q14/Q15/Q19/Q20/Q22 analogues)
adapted to the driver's synthetic star schema (no partsupp / shipmode
columns — see TESTDATA.md), each with a DuckDB oracle.

Why these shapes matter at 100 TB (each pins a distinct optimizer
pattern, asserted where load-bearing in tests/test_plan_shapes.py):
- Q14: broadcast dim join + conditional decimal aggregate (one fact scan).
- Q13: LEFT join with a compound (equi + residual) condition, then a
  re-aggregation of an aggregate — two shuffles, both on pruned columns.
- Q15: aggregate reused twice (revenue view + its max) — a rank window
  over the aggregate keeps the fact scanned once (Catalyst does NOT
  reuse the exchange across the broadcast boundary, so the naive
  agg-vs-its-own-max form rescans; asserted single-scan in tests).
- Q19: disjunctive OR-of-ANDs predicate — partial pushdown (the
  supersets of each disjunct reach the scan) + broadcast join.
- Q22: anti join + a scalar-subquery threshold computed from a second
  pruned scan of the same table.
- Q7/Q8/Q9: multi-way star joins where every dim side is broadcast and
  the single fact shuffle carries only the group-by columns.
- Q11: same-table aggregate vs aggregate-of-total comparison — window
  grand total over the per-key aggregate, one fact scan, no join.
- Q2: correlated MIN subquery decorrelated into a per-key window min
  (one fact scan; dim-filtered before the window shuffle).
- Q5 (r10): the cross-dimension equality constraint (customer nation ==
  supplier nation) — TWO independent dim paths meet at the fact row,
  so the filter can only apply post-join; one fact shuffle on the
  order key, both dim paths region-pruned before they touch the fact.
- Q20 (r10): nested semi-join gated by an aggregate threshold — the
  inner block aggregates the FACT per (supplier, part) and its integer
  predicate decides outer-relation membership; the outer side never
  rescans the fact.

Exactness follows the queries.py rules: decimal sums cast to double,
single final double division, int32→long where DuckDB yields BIGINT.

Reference parity note: the reference's own models only exercise the
simpler shapes (SURVEY.md §2.3-2.4); these rows are the engine-hardening
superset a BigQuery-replacing Spark engine must cover.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dbt_repo_spark.queries import dec, q, t

DISC_PRICE_SQL = (
    "CAST(CAST(l_extendedprice AS DECIMAL(14,2))"
    " * (1 - CAST(l_discount AS DECIMAL(12,2))) AS DECIMAL(18,4))"
)


def _disc_price() -> F.Column:
    ep = dec("l_extendedprice", 14, 2)
    disc = dec("l_discount", 12, 2)
    return (ep * (F.lit(1) - disc)).cast("decimal(18,4)")


@q(
    "promo_revenue_share",
    f"""
    SELECT date_trunc('month', l_shipdate) AS ship_month,
           CAST(SUM(CASE WHEN p_type = 'PROMO' THEN {DISC_PRICE_SQL}
                         ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
             / CAST(SUM({DISC_PRICE_SQL}) AS DOUBLE) * 100 AS promo_share_pct,
           COUNT(*) AS n_lines
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY 1
    """,
)
def promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q14-shaped: promo revenue share per ship month. The part dim
    broadcasts (only p_partkey/p_type survive pruning); the conditional
    and unconditional decimal sums come out of ONE map-side partial
    aggregate, so the fact is scanned and shuffled exactly once.
    """
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part").select("p_partkey", "p_type")
    dp = _disc_price()
    zero = F.lit(0).cast("decimal(18,4)")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy(F.date_trunc("month", "l_shipdate").alias("ship_month"))
        .agg(
            (
                F.sum(F.when(F.col("p_type") == "PROMO", dp).otherwise(zero)).cast("double")
                / F.sum(dp).cast("double")
                * 100
            ).alias("promo_share_pct"),
            F.count("*").alias("n_lines"),
        )
    )


@q(
    "customer_order_distribution",
    """
    WITH per_cust AS (
      SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer LEFT JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey)
    SELECT c_count, COUNT(*) AS custdist
    FROM per_cust GROUP BY c_count
    """,
)
def customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q13-shaped: order-count distribution over ALL customers,
    zero-order customers included. The join condition is equi + residual
    (the priority filter must live IN the join, not under it, to keep
    left rows); COUNT(o_orderkey) counts only matched rows. Second
    aggregate regroups ~|customers| rows by count — cheap by then.
    """
    c = t(spark, sf_dir, "customer").select("c_custkey")
    o = t(spark, sf_dir, "orders").select("o_custkey", "o_orderkey", "o_orderpriority")
    per_cust = (
        c.join(
            o,
            (c.c_custkey == o.o_custkey) & (o.o_orderpriority != "1-URGENT"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


@q(
    "top_revenue_supplier",
    f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             CAST(SUM({DISC_PRICE_SQL}) AS DOUBLE) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY l_suppkey)
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    """,
)
def top_revenue_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q15-shaped: supplier(s) hitting the quarter's max revenue.

    rank()==1 over an unordered-partition window is just a MAX, so the
    r8 re-plan (r8 verdict ask #1) drops the window entirely: the
    post-aggregate relation is pinned once (localCheckpoint — lineitem
    is still scanned exactly once, asserted in tests/test_plan_shapes.py
    ::test_top_revenue_supplier_single_fact_scan; the naive
    aggregate-vs-its-own-max formulation rescans it per use because
    Catalyst does not reuse the exchange across the broadcast boundary),
    the scalar max comes from a plain two-level partial→global
    aggregate, and a broadcast equality filter keeps every tied supplier
    — identical semantics to the SQL scalar subquery, with NO
    single-task sort of the |suppliers| relation anywhere (the old
    window funneled it through one task: fine at millions of suppliers,
    a structural ceiling beyond). Equality on total_revenue is safe
    because both sides read the SAME materialized doubles."""
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    revenue = (
        li.groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(F.sum(_disc_price()).cast("double").alias("total_revenue"))
        .localCheckpoint(eager=True)
    )
    mx = revenue.agg(F.max("total_revenue").alias("__max_rev"))
    top = (
        revenue.join(
            F.broadcast(mx),
            revenue["total_revenue"] == F.col("__max_rev"),
        )
        .drop("__max_rev")
    )
    s = t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return s.join(F.broadcast(top), s.s_suppkey == top.supplier_no).select(
        "s_suppkey", "s_name", "total_revenue"
    )


@q(
    "disjunctive_predicate_revenue",
    f"""
    SELECT CAST(SUM({DISC_PRICE_SQL}) AS DOUBLE) AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#11' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#22' AND p_size BETWEEN 1 AND 25
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#15' AND p_size BETWEEN 1 AND 35
           AND l_quantity BETWEEN 20 AND 30)
    """,
)
def disjunctive_predicate_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q19-shaped: OR-of-ANDs over join columns from both sides.
    Catalyst pushes the per-side supersets below the join (lineitem scan
    gets `l_quantity BETWEEN 1 AND 30`-ish residuals, part gets the
    brand/size union) so the broadcast join sees pre-filtered inputs;
    the full disjunction is evaluated as the join residual.
    """
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    joined = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    qty = F.col("l_quantity")
    cond = (
        ((F.col("p_brand") == "Brand#11") & F.col("p_size").between(1, 15) & qty.between(1, 11))
        | ((F.col("p_brand") == "Brand#22") & F.col("p_size").between(1, 25) & qty.between(10, 20))
        | ((F.col("p_brand") == "Brand#15") & F.col("p_size").between(1, 35) & qty.between(20, 30))
    )
    return joined.filter(cond).agg(
        F.sum(_disc_price()).cast("double").alias("revenue"),
        F.count("*").alias("n_lines"),
    )


@q(
    "idle_customer_outreach",
    """
    SELECT substr(c_name, 16, 3) AS cust_bucket,
           COUNT(*) AS numcust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(14,2))) AS DOUBLE) AS totacctbal
    FROM customer c
    WHERE c_acctbal > (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(14,2))) AS DOUBLE)
                              / COUNT(*)
                       FROM customer WHERE c_acctbal > 0)
      AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    GROUP BY 1
    """,
)
def idle_customer_outreach(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q22-shaped: above-average-balance customers with no orders,
    bucketed by a name substring. The avg threshold is a broadcast
    single-row cross join (second pruned scan of customer reads one
    column); NOT EXISTS is a left-anti join against the pruned
    o_custkey set. Threshold doubles match DuckDB bit-for-bit
    (decimal sum / bigint count, one division).
    """
    c = t(spark, sf_dir, "customer")
    thr = (
        c.filter(F.col("c_acctbal") > 0)
        .agg((F.sum(dec("c_acctbal", 14, 2)).cast("double") / F.count("*")).alias("avg_bal"))
    )
    o_keys = t(spark, sf_dir, "orders").select(F.col("o_custkey").alias("c_custkey"))
    return (
        c.join(F.broadcast(thr))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(o_keys, "c_custkey", "left_anti")
        .groupBy(F.substring("c_name", 16, 3).alias("cust_bucket"))
        .agg(
            F.count("*").alias("numcust"),
            F.sum(dec("c_acctbal", 14, 2)).cast("double").alias("totacctbal"),
        )
    )


@q(
    "nation_pair_trade",
    f"""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS l_year,
           CAST(SUM({DISC_PRICE_SQL}) AS DOUBLE) AS revenue
    FROM supplier, lineitem, orders, customer, nation n1, nation n2
    WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
      AND c_custkey = o_custkey
      AND s_nationkey = n1.n_nationkey AND c_nationkey = n2.n_nationkey
      AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
    GROUP BY 1, 2, 3
    """,
)
def nation_pair_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q7-shaped: bilateral trade volume by year between two
    nations. All dims broadcast; the nation-name filters push into the
    supplier/customer broadcast sides, so the fact join output is
    pre-shrunk to the two nations before the group-by shuffle. The
    lineitem-orders join is the only big exchange.
    """
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    n = t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    pair = F.col("n_name").isin("NATION_1", "NATION_2")
    s = (
        t(spark, sf_dir, "supplier")
        .join(F.broadcast(n.filter(pair)), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    c = (
        t(spark, sf_dir, "customer")
        .join(F.broadcast(n.filter(pair)), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    return (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(F.sum(_disc_price()).cast("double").alias("revenue"))
    )


@q(
    "national_market_share",
    f"""
    SELECT l_year,
           CAST(SUM(CASE WHEN nation = 'NATION_5' THEN volume
                         ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
             / CAST(SUM(volume) AS DOUBLE) AS mkt_share
    FROM (
      SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS l_year,
             {DISC_PRICE_SQL} AS volume,
             n2.n_name AS nation
      FROM part, supplier, lineitem, orders, customer, nation n1, nation n2, region
      WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
        AND l_orderkey = o_orderkey AND o_custkey = c_custkey
        AND c_nationkey = n1.n_nationkey AND n1.n_regionkey = r_regionkey
        AND r_name = 'ASIA' AND s_nationkey = n2.n_nationkey
        AND p_type = 'ECONOMY')
    GROUP BY l_year
    """,
)
def national_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q8-shaped: one supplier nation's share of ECONOMY-part
    revenue sold into ASIA, per order year. Five broadcast dims hang off
    the lineitem-orders exchange; the p_type and region filters prune
    their broadcast sides before the join, and the share is a
    conditional/unconditional decimal-sum pair from one partial agg.
    """
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY").select("p_partkey")
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    n = t(spark, sf_dir, "nation").select("n_nationkey", "n_name", "n_regionkey")
    r = t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA").select("r_regionkey")
    asia_cust = (
        t(spark, sf_dir, "customer")
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("c_custkey")
    )
    supp = (
        t(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("nation"))
    )
    vol = _disc_price()
    zero = F.lit(0).cast("decimal(18,4)")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(asia_cust), o.o_custkey == asia_cust.c_custkey)
        .groupBy(F.year("o_orderdate").cast("long").alias("l_year"))
        .agg(
            (
                F.sum(F.when(F.col("nation") == "NATION_5", vol).otherwise(zero)).cast("double")
                / F.sum(vol).cast("double")
            ).alias("mkt_share")
        )
    )


@q(
    "product_profit_by_nation_year",
    f"""
    SELECT n_name AS nation,
           CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
           CAST(SUM(CAST({DISC_PRICE_SQL}
                 - CAST(CAST(p_retailprice AS DECIMAL(14,2))
                        * CAST(l_quantity AS DECIMAL(12,2))
                        * CAST(0.5 AS DECIMAL(2,1)) AS DECIMAL(18,4))
                 AS DECIMAL(20,4))) AS DOUBLE) AS sum_profit
    FROM part, supplier, lineitem, orders, nation
    WHERE s_suppkey = l_suppkey AND p_partkey = l_partkey
      AND o_orderkey = l_orderkey AND s_nationkey = n_nationkey
      AND p_name LIKE '%red%'
    GROUP BY 1, 2
    """,
)
def product_profit_by_nation_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q9-shaped: profit (discounted revenue minus half retail
    cost) for red parts, by supplier nation and order year. The LIKE
    filter prunes the broadcast part side; profit stays decimal through
    the subtraction so the sum is order-independent and cross-engine
    exact (retailprice stands in for the absent ps_supplycost).
    """
    li = t(spark, sf_dir, "lineitem")
    p = (
        t(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%red%"))
        .select("p_partkey", "p_retailprice")
    )
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    n = t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    s = (
        t(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("nation"))
    )
    cost = (
        dec("p_retailprice", 14, 2)
        * dec("l_quantity", 12, 2)
        * F.lit(0.5).cast("decimal(2,1)")
    ).cast("decimal(18,4)")
    profit = (_disc_price() - cost).cast("decimal(20,4)")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("nation", F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(F.sum(profit).cast("double").alias("sum_profit"))
    )


@q(
    "important_parts_share",
    """
    WITH partval AS (
      SELECT l_partkey AS part_key,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,2))) AS DOUBLE) AS part_value
      FROM lineitem GROUP BY l_partkey)
    SELECT part_key, part_value
    FROM partval
    WHERE part_value > (SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,2)))
                                    AS DOUBLE) * 0.002
                        FROM lineitem)
    """,
)
def important_parts_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q11-shaped: parts whose traded value exceeds a fixed
    fraction of total traded value. The fact is scanned ONCE: the
    per-part decimal aggregate feeds both the output value and — via a
    window sum over the aggregated relation — the grand total (decimal
    addition is associative, so summing the per-part decimal partials
    equals the direct decimal total bit-for-bit; both cast to double
    only at the end, and threshold double*0.002 is one double multiply
    of identical operands → identical bits cross-engine). The window's
    single partition holds |parts| aggregated rows, never fact rows —
    the trade vs a second full fact scan favors the window while |parts|
    fits one task (up to tens of millions of keys). Beyond that the
    scale-out form is localCheckpoint(partval) + a two-level
    partial→global decimal sum broadcast back — still one fact scan,
    no single-task window.
    """
    from pyspark.sql import Window

    li = t(spark, sf_dir, "lineitem")
    partval = li.groupBy(F.col("l_partkey").alias("part_key")).agg(
        F.sum(dec("l_extendedprice", 14, 2)).alias("pv_dec")
    )
    total = F.sum("pv_dec").over(Window.partitionBy())
    return (
        partval.withColumn("threshold", total.cast("double") * 0.002)
        .withColumn("part_value", F.col("pv_dec").cast("double"))
        .filter(F.col("part_value") > F.col("threshold"))
        .select("part_key", "part_value")
    )


@q(
    "min_price_supplier_per_part",
    """
    SELECT DISTINCT p_partkey, p_name, s_name AS supplier_name,
           l_extendedprice / l_quantity AS unit_price
    FROM part, lineitem, supplier
    WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
      AND p_size = 10
      AND l_extendedprice / l_quantity =
          (SELECT MIN(l2.l_extendedprice / l2.l_quantity)
           FROM lineitem l2 WHERE l2.l_partkey = p_partkey)
    """,
)
def min_price_supplier_per_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q2-shaped: for every size-10 part, the supplier(s) offering
    its minimum unit price — a correlated MIN subquery, decorrelated
    into a per-key window min (ONE fact scan, one shuffle on the part
    key) instead of agg + self-join-back (which scans the fact twice).
    The size filter semi-reduces the fact through the broadcast part dim
    BEFORE the window, so only surviving parts' rows shuffle — same
    result (the subquery is correlated to surviving parts only) but
    ~1/50th the window input. Unit price is one double division,
    identical in both engines; equality on it is exact.
    """
    from pyspark.sql import Window

    li = t(spark, sf_dir, "lineitem").withColumn(
        "unit_price", F.col("l_extendedprice") / F.col("l_quantity")
    )
    p = t(spark, sf_dir, "part").filter(F.col("p_size") == 10).select("p_partkey", "p_name")
    s = t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    li10 = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    w = Window.partitionBy("l_partkey")
    return (
        li10.withColumn("min_unit_price", F.min("unit_price").over(w))
        .filter(F.col("unit_price") == F.col("min_unit_price"))
        .join(F.broadcast(s), li10.l_suppkey == s.s_suppkey)
        .select(
            "p_partkey",
            "p_name",
            F.col("s_name").alias("supplier_name"),
            "unit_price",
        )
        .distinct()
    )

@q(
    "returned_item_report",
    """
    SELECT c_custkey, c_name, n_name, c_acctbal,
           CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(14,2))
                         * (1 - CAST(l_discount AS DECIMAL(12,2)))
                         AS DECIMAL(18,4))) AS DOUBLE) AS revenue
    FROM customer, orders, lineitem, nation
    WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
      AND l_returnflag = 'R' AND c_nationkey = n_nationkey
    GROUP BY c_custkey, c_name, n_name, c_acctbal
    ORDER BY revenue DESC, c_custkey LIMIT 20
    """,
)
def returned_item_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q10-shaped: top-20 customers by revenue lost to returned
    items in one quarter, with nation context — the classic churn-risk
    report. Both selective predicates (the quarter, returnflag='R')
    push down to their scans BEFORE the fact-fact join, so the orders
    side shrinks ~25× and the lineitem side 3× at the parquet reader;
    the surviving orders broadcast into the lineitem join (quarter-sized
    — bounded by the date predicate regardless of total history), then
    customer/nation dims broadcast onto the |returned-orders| aggregate.
    Top-20 plans as TakeOrderedAndProject with a c_custkey tie-break on
    the exact-decimal revenue (deterministic cut).
    """
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    od = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    cu = t(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey", "c_acctbal"
    )
    na = t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    rev = (
        li.join(F.broadcast(od), li.l_orderkey == od.o_orderkey)
        .groupBy("o_custkey")
        .agg(F.sum(_disc_price()).cast("double").alias("revenue"))
    )
    return (
        rev.join(F.broadcast(cu), rev.o_custkey == cu.c_custkey)
        .join(F.broadcast(na), cu.c_nationkey == na.n_nationkey)
        .select("c_custkey", "c_name", "n_name", "c_acctbal", "revenue")
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


@q(
    "order_priority_late_check",
    """
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1996-10-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
    GROUP BY o_orderpriority
    """,
)
def order_priority_late_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q4-shaped: order-priority counts for one quarter's orders
    that have at least one LATE line. The fixture has no
    l_commitdate/l_receiptdate (TESTDATA.md), so lateness is witnessed by
    ``l_shipdate > o_orderdate + 60 days`` — same correlated-EXISTS-with-
    non-equi-residual decorrelation stressor as the official query.

    100 TB shape: the quarter predicate prunes orders at the scan
    (~1/28th of history here, bounded regardless of total history), and
    that pruned side BROADCASTS into the lineitem probe — the fact table
    is scanned once and never shuffled. The EXISTS materializes as
    distinct surviving (orderkey, priority) pairs, a shuffle bounded by
    quarter order count, then a tiny 5-group aggregate. A left_semi with
    lineitem as the build side would instead shuffle the whole fact —
    deliberately avoided.
    """
    odq = (
        t(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderdate") >= F.lit("1996-07-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1996-10-01").cast("timestamp"))
        )
        .select("o_orderkey", "o_orderdate", "o_orderpriority")
    )
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        li.join(
            F.broadcast(odq),
            (li.l_orderkey == odq.o_orderkey)
            & (li.l_shipdate > odq.o_orderdate + F.expr("INTERVAL 60 DAYS")),
        )
        .select("o_orderkey", "o_orderpriority")
        .distinct()
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


@q(
    "local_supplier_revenue",
    f"""
    SELECT n_name,
           CAST(SUM({DISC_PRICE_SQL}) AS DOUBLE) AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM customer, orders, lineitem, supplier, nation, region
    WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      AND r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n_name
    """,
)
def local_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q5-shaped: revenue per nation from LOCAL trade — lineitems
    whose supplier sits in the same nation as the ordering customer,
    within one region and a two-year order window. The distinguishing
    stressor is the cross-dimension equality (c_nationkey ==
    s_nationkey): customer and supplier reach the fact row through two
    INDEPENDENT join paths, so the constraint can only be applied after
    both have landed — no single dim filter can prune it.

    100 TB shape: region+date predicates prune both dim paths before
    they touch the fact — nation⋈region (broadcast, 5 rows) restricts
    customer and supplier to one region's nations; orders carries the
    pushed date range. The fact is scanned once and shuffles ONCE (on
    the order key, against the date-bounded orders⋈customer composite);
    the supplier side broadcasts (dim-sized). Revenue stays decimal
    through the sum with one final double cast (queries.py rules).
    """
    li = t(spark, sf_dir, "lineitem")
    rg = t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    na = (
        t(spark, sf_dir, "nation")
        .join(F.broadcast(rg), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("n_nationkey", "n_name")
    )
    cu = (
        t(spark, sf_dir, "customer")
        .join(
            F.broadcast(na.select("n_nationkey")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select("c_custkey", "c_nationkey")
    )
    od = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    oc = od.join(cu, od.o_custkey == cu.c_custkey).select(
        "o_orderkey", "c_nationkey"
    )
    su = (
        t(spark, sf_dir, "supplier")
        .join(F.broadcast(na), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_nationkey", "n_name")
    )
    return (
        li.join(F.broadcast(su), li.l_suppkey == su.s_suppkey)
        .join(oc, li.l_orderkey == oc.o_orderkey)
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .groupBy("n_name")
        .agg(
            F.sum(_disc_price()).cast("double").alias("revenue"),
            F.count("*").cast("long").alias("n_lines"),
        )
    )


@q(
    "concentrated_supply_parts",
    """
    WITH agg AS (
      SELECT l_suppkey, l_partkey,
             SUM(CASE WHEN l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
                       AND l_shipdate <  TIMESTAMP '2000-01-01 00:00:00'
                      THEN CAST(l_quantity AS BIGINT) ELSE 0 END) AS qw,
             SUM(CAST(l_quantity AS BIGINT)) AS qall
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE p_name LIKE 'red %'
      GROUP BY 1, 2),
    qual AS (
      SELECT DISTINCT l_suppkey FROM agg
      WHERE 2 * qw > qall AND qall >= 100)
    SELECT s_suppkey, s_name, n_name
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    WHERE s_suppkey IN (SELECT l_suppkey FROM qual)
    """,
)
def concentrated_supply_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q20-shaped: suppliers whose red-part supply CONCENTRATED
    into the 1997-1999 window — for some substantial (supplier, part)
    pair (lifetime volume ≥ 100 units), more than half that volume
    shipped inside the window. The stressor is the nested semi-join
    gated by an AGGREGATE threshold: membership of the outer supplier
    relation is decided by a per-(supplier, part) aggregate over the
    fact, not by any stored attribute (the fixture has no partsupp, so
    the windowed-share predicate stands in for availqty vs shipped;
    both predicates are exact integer comparisons — cross-engine
    deterministic even for pairs sitting on the boundary).

    100 TB shape: the name filter prunes the broadcast part dim before
    the fact join, so the fact is scanned once and shuffles once on
    (suppkey, partkey) into the aggregate; the qualifying-supplier set
    (bounded by the aggregate, far smaller than the fact) then
    LEFT-SEMI joins the supplier dim — the outer side never rescans or
    reshuffles the fact, and duplicate qualifying pairs collapse before
    the semi-join probes.
    """
    li = t(spark, sf_dir, "lineitem")
    p = (
        t(spark, sf_dir, "part")
        .filter(F.col("p_name").like("red %"))
        .select("p_partkey")
    )
    qty = F.col("l_quantity").cast("long")
    in_window = (
        F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp")
    ) & (F.col("l_shipdate") < F.lit("2000-01-01").cast("timestamp"))
    agg = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("l_suppkey", "l_partkey")
        .agg(
            F.sum(F.when(in_window, qty).otherwise(F.lit(0))).alias("qw"),
            F.sum(qty).alias("qall"),
        )
    )
    qual = (
        agg.filter((2 * F.col("qw") > F.col("qall")) & (F.col("qall") >= 100))
        .select("l_suppkey")
        .distinct()
    )
    sup = (
        t(spark, sf_dir, "supplier")
        .join(
            F.broadcast(t(spark, sf_dir, "nation")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "s_name", "n_name")
    )
    return sup.join(
        qual, sup.s_suppkey == qual.l_suppkey, "left_semi"
    ).select("s_suppkey", "s_name", "n_name")


@q(
    "forecast_revenue_change",
    f"""
    SELECT CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(14,2))
                         * CAST(l_discount AS DECIMAL(12,2))
                         AS DECIMAL(18,4))) AS DOUBLE) AS revenue_delta,
           COUNT(*) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def forecast_revenue_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q6-shaped: the what-if revenue delta from dropping a
    discount band — a pure single-table GLOBAL aggregate (one output
    row), the only classic shape with no join and no grouping.

    100 TB shape: every predicate (ship-year range, discount band,
    quantity cap) reaches the parquet scan as a pushed filter, and the
    projection prunes to three columns; the aggregate is a partial
    per-partition fold plus a single-row final merge — no data shuffle
    at all beyond the scalar exchange. Exactness: the per-line product
    is computed in DECIMAL(18,4) and summed exactly, with ONE final
    cast to double (queries.py decimal rules).
    """
    li = t(spark, sf_dir, "lineitem")
    ep = dec("l_extendedprice", 14, 2)
    disc = dec("l_discount", 12, 2)
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum((ep * disc).cast("decimal(18,4)"))
            .cast("double")
            .alias("revenue_delta"),
            F.count("*").alias("n_lines"),
        )
    )

