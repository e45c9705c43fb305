"""TPC-H-shaped composite analytics queries (SURVEY §2.3/§2.4 combined).

The reference family's users run full HiveQL reports, not single
operators; these keys prove the engine composes scans, selective
predicates, multi-way joins, aggregation and top-k ordering in ONE
Catalyst plan the way the classic TPC-H suite exercises a warehouse.
Shapes follow the public TPC-H spec queries (Q1, Q3, Q5, Q6, Q10, Q18),
trimmed to the columns the synthetic tables carry.

Scale notes (what Catalyst does for us, verified via .explain):
- date/segment predicates push into the parquet scans (PushedFilters);
- the dimension sides (region/nation/customer/supplier) broadcast under
  autoBroadcastJoinThreshold while lineitem/orders stream — at 100 TB
  the same plans hold because dims grow ~100x slower than facts;
- every aggregate is a partial (map-side) hash agg + one shuffle on the
  grouping key;
- top-k ORDER BY ... LIMIT plans TakeOrderedAndProject (per-partition
  heaps, no global sort).

Bit-exactness: sums of non-integral doubles go through decimal casts on
both engines (see relational_q.py header); products are written in the
same association order on both sides so the IEEE double math is
identical before the decimal cast.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from hive_similarity_join_spark.registry import query
from hive_similarity_join_spark.sources.loader import load_table


def _dsum(col, scale: int = 2):
    return F.sum(col.cast(f"decimal(18,{scale})")).cast("double")


# Column factories, not module constants: building a Column requires an
# active SparkContext, and this module imports before any session exists.
def _disc_price():
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


def _charge():
    return F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))


@query(
    "q_tpch_q1",
    oracle="""
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE)
           AS sum_disc_price,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax)
                     AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(*)
           AS avg_price,
       CAST(SUM(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) / count(*) AS avg_disc,
       CAST(count(*) AS BIGINT) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2000-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
""",
)
def q_tpch_q1(spark, sf_dir):
    """TPC-H Q1 pricing summary report."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("2000-09-02 00:00:00").cast("timestamp")
    )
    cnt = F.count(F.lit(1))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        _dsum(F.col("l_quantity")).alias("sum_qty"),
        _dsum(F.col("l_extendedprice")).alias("sum_base_price"),
        _dsum(_disc_price(), scale=6).alias("sum_disc_price"),
        _dsum(_charge(), scale=6).alias("sum_charge"),
        (_dsum(F.col("l_quantity")) / cnt).alias("avg_qty"),
        (_dsum(F.col("l_extendedprice")) / cnt).alias("avg_price"),
        (_dsum(F.col("l_discount"), scale=4) / cnt).alias("avg_disc"),
        cnt.alias("count_order"),
    )


@query(
    "q_tpch_q3",
    oracle="""
SELECT l.l_orderkey,
       CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,6)))
            AS DOUBLE) AS revenue,
       strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate
FROM customer c
JOIN orders o   ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1997-03-15 00:00:00'
  AND l.l_shipdate  > TIMESTAMP '1997-03-15 00:00:00'
GROUP BY l.l_orderkey, o.o_orderdate
ORDER BY revenue DESC, l.l_orderkey
LIMIT 10
""",
)
def q_tpch_q3(spark, sf_dir):
    """TPC-H Q3 shipping-priority: unshipped orders of a segment, top-10
    by revenue."""
    cutoff = F.lit("1997-03-15 00:00:00").cast("timestamp")
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cutoff)
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cutoff)
    return (
        c.join(o, c["c_custkey"] == o["o_custkey"])
        .join(li, li["l_orderkey"] == o["o_orderkey"])
        .groupBy("l_orderkey", "o_orderdate")
        .agg(_dsum(_disc_price(), scale=6).alias("revenue"))
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
        )
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


@query(
    "q_tpch_q5",
    oracle="""
SELECT n.n_name,
       CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,6)))
            AS DOUBLE) AS revenue
FROM customer c
JOIN orders o   ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
JOIN nation n   ON s.s_nationkey = n.n_nationkey
JOIN region r   ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA'
  AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o.o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY n.n_name
""",
)
def q_tpch_q5(spark, sf_dir):
    """TPC-H Q5 local-supplier volume: revenue through suppliers in the
    customer's own nation, per nation of a region (2-year window)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        c.join(o, c["c_custkey"] == o["o_custkey"])
        .join(li, li["l_orderkey"] == o["o_orderkey"])
        .join(
            s,
            (li["l_suppkey"] == s["s_suppkey"])
            & (c["c_nationkey"] == s["s_nationkey"]),
        )
        .join(n, s["s_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .groupBy("n_name")
        .agg(_dsum(_disc_price(), scale=6).alias("revenue"))
    )


@query(
    "q_tpch_q6",
    oracle="""
SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(18,6))) AS DOUBLE)
           AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
""",
)
def q_tpch_q6(spark, sf_dir):
    """TPC-H Q6 revenue-change forecast: fully scan-local (predicates
    push to parquet; single global agg, no join)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & F.col("l_discount").between(0.05, 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(_dsum(F.col("l_extendedprice") * F.col("l_discount"), scale=6).alias("revenue"))


@query(
    "q_tpch_q10",
    oracle="""
SELECT c.c_custkey, c.c_name,
       CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,6)))
            AS DOUBLE) AS revenue,
       c.c_acctbal, n.n_name
FROM customer c
JOIN orders o   ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n   ON c.c_nationkey = n.n_nationkey
WHERE o.o_orderdate >= TIMESTAMP '1996-10-01 00:00:00'
  AND o.o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND l.l_returnflag = 'R'
GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
ORDER BY revenue DESC, c.c_custkey
LIMIT 20
""",
)
def q_tpch_q10(spark, sf_dir):
    """TPC-H Q10 returned-item reporting: top-20 customers by lost
    revenue in a quarter."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-10-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load_table(spark, sf_dir, "nation")
    return (
        c.join(o, c["c_custkey"] == o["o_custkey"])
        .join(li, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(_dsum(_disc_price(), scale=6).alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


@query(
    "q_tpch_q7",
    oracle="""
SELECT cn.n_name AS cust_nation, sn.n_name AS supp_nation,
       CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
       CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,6)))
            AS DOUBLE) AS revenue
FROM customer c
JOIN orders o   ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation cn  ON c.c_nationkey = cn.n_nationkey
JOIN nation sn  ON s.s_nationkey = sn.n_nationkey
WHERE ((cn.n_name = 'NATION_1' AND sn.n_name = 'NATION_2')
    OR (cn.n_name = 'NATION_2' AND sn.n_name = 'NATION_1'))
  AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY cn.n_name, sn.n_name, year(l.l_shipdate)
""",
)
def q_tpch_q7(spark, sf_dir):
    """TPC-H Q7 volume shipping: bilateral trade between two nations by
    ship year. Both nation lookups broadcast; the OR-of-pairs predicate
    evaluates after the joins like the spec query."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    cn = n.select(
        F.col("n_nationkey").alias("_cnk"), F.col("n_name").alias("cust_nation")
    )
    sn = n.select(
        F.col("n_nationkey").alias("_snk"), F.col("n_name").alias("supp_nation")
    )
    pair_pred = (
        (F.col("cust_nation") == "NATION_1") & (F.col("supp_nation") == "NATION_2")
    ) | ((F.col("cust_nation") == "NATION_2") & (F.col("supp_nation") == "NATION_1"))
    return (
        c.join(o, c["c_custkey"] == o["o_custkey"])
        .join(li, li["l_orderkey"] == o["o_orderkey"])
        .join(s, li["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(cn), c["c_nationkey"] == F.col("_cnk"))
        .join(F.broadcast(sn), s["s_nationkey"] == F.col("_snk"))
        .filter(pair_pred)
        .groupBy(
            "cust_nation",
            "supp_nation",
            F.year("l_shipdate").cast("bigint").alias("l_year"),
        )
        .agg(_dsum(_disc_price(), scale=6).alias("revenue"))
    )


@query(
    "q_tpch_q14",
    oracle="""
SELECT 100.00 *
       CAST(SUM(CAST(CASE WHEN p.p_type LIKE 'PROMO%'
                          THEN l.l_extendedprice * (1 - l.l_discount)
                          ELSE 0 END AS DECIMAL(18,6))) AS DOUBLE) /
       CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,6)))
            AS DOUBLE) AS promo_revenue
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE l.l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
  AND l.l_shipdate <  TIMESTAMP '1996-10-01 00:00:00'
""",
)
def q_tpch_q14(spark, sf_dir):
    """TPC-H Q14 promotion effect: share of one month's revenue from
    promo parts. part broadcasts; the conditional sum rides the same
    decimal-cast discipline as every other revenue aggregate."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-09-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-10-01 00:00:00").cast("timestamp"))
    )
    p = load_table(spark, sf_dir, "part")
    promo = F.when(
        F.col("p_type").like("PROMO%"), _disc_price()
    ).otherwise(F.lit(0.0))
    return (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .agg(
            (
                F.lit(100.00)
                * _dsum(promo, scale=6)
                / _dsum(_disc_price(), scale=6)
            ).alias("promo_revenue")
        )
    )


@query(
    "q_tpch_q18",
    oracle="""
SELECT c.c_name, c.c_custkey, o.o_orderkey,
       strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate, o.o_totalprice,
       CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
FROM customer c
JOIN orders o   ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
HAVING SUM(CAST(l.l_quantity AS DECIMAL(18,2))) > 150
ORDER BY o.o_totalprice DESC, o.o_orderkey
LIMIT 100
""",
)
def q_tpch_q18(spark, sf_dir):
    """TPC-H Q18 large-volume customers: orders whose total quantity
    exceeds a threshold. The HAVING filter runs on the aggregated
    (post-shuffle) side; the orderkey grouping is the natural
    co-partitioning key for the orders/lineitem join."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        c.join(o, c["c_custkey"] == o["o_custkey"])
        .join(li, li["l_orderkey"] == o["o_orderkey"])
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("_sq"))
        .filter(F.col("_sq") > 150)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_totalprice",
            F.col("_sq").cast("double").alias("sum_qty"),
        )
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(100)
    )
