"""Round 7: TPC-H Q2/Q20 subquery shapes.

Split out of the flat queries.py (VERDICT r6 #8); all entries register
into the shared ``queries._base.SPARK_QUERIES`` / ``ORACLE_SQL``.
"""

from __future__ import annotations

from queries._base import *  # noqa: F401,F403

# ===========================================================================


@q(
    "q2_min_cost_supplier",
    """
    WITH offers AS (
      SELECT l.l_partkey, l.l_extendedprice AS price, s.s_name, s.s_acctbal,
             n.n_name
      FROM lineitem l
      JOIN part p ON p.p_partkey = l.l_partkey AND p.p_name LIKE '%gear%'
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      JOIN region r ON r.r_regionkey = n.n_regionkey AND r.r_name = 'EUROPE'
    ),
    mn AS (
      SELECT *, MIN(price) OVER (PARTITION BY l_partkey) AS min_price
      FROM offers)
    SELECT DISTINCT l_partkey AS p_partkey, s_name, n_name,
           CAST(FLOOR(price * 100 + 0.5) AS BIGINT) AS price_cents,
           CAST(FLOOR(s_acctbal * 100 + 0.5) AS BIGINT) AS acctbal_cents
    FROM mn WHERE price = min_price
    ORDER BY acctbal_cents DESC NULLS LAST, s_name NULLS LAST, p_partkey
    LIMIT 100
    """,
)
def q2_min_cost_supplier(spark, sf_dir):
    """TPC-H Q2 shape — the correlated min-cost-supplier subquery: for
    every European offer of a 'gear' part, keep exactly the suppliers
    matching that part's MINIMUM price in the region, top-100 by account
    balance.  The classic correlated ``price = (SELECT MIN ...)`` is
    decorrelated the way Catalyst would plan it: ONE pass over the offer
    set with a per-part window MIN and an equality filter — one shuffle
    on l_partkey, no re-scan, no nested-loop join (plan-gated).  The
    dimension chain (part filter, supplier→nation→region) broadcasts;
    money renders as exact cents so the LIMIT tie-break is
    engine-deterministic."""
    from pyspark.sql import Window

    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part").filter(F.col("p_name").like("%gear%"))
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    eu_sup = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), F.col("n_regionkey") == r.r_regionkey)
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    offers = (
        li.join(F.broadcast(p.select("p_partkey")),
                li.l_partkey == F.col("p_partkey"))
        .join(F.broadcast(eu_sup), li.l_suppkey == F.col("s_suppkey"))
        .select(
            "l_partkey",
            F.col("l_extendedprice").alias("price"),
            "s_name", "s_acctbal", "n_name",
        )
    )
    w = Window.partitionBy("l_partkey")
    cents = lambda c: F.floor(F.col(c) * 100 + F.lit(0.5)).cast("long")  # noqa: E731
    return (
        offers.withColumn("__mn", F.min("price").over(w))
        .filter(F.col("price") == F.col("__mn"))
        .select(
            F.col("l_partkey").alias("p_partkey"),
            "s_name", "n_name",
            cents("price").alias("price_cents"),
            cents("s_acctbal").alias("acctbal_cents"),
        )
        .distinct()
        .orderBy(
            F.col("acctbal_cents").desc_nulls_last(),
            F.col("s_name").asc_nulls_last(),
            "p_partkey",
        )
        .limit(100)
    )


@q(
    "q20_excess_share_suppliers",
    """
    WITH shipped AS (
      SELECT l_suppkey, l_partkey,
             SUM(CASE WHEN l_shipdate >= TIMESTAMP '1995-01-01'
                       AND l_shipdate <  TIMESTAMP '1996-01-01'
                      THEN CAST(FLOOR(l_quantity * 100 + 0.5) AS BIGINT)
                      ELSE 0 END) AS q95,
             SUM(CAST(FLOOR(l_quantity * 100 + 0.5) AS BIGINT)) AS qall
      FROM lineitem
      WHERE l_quantity IS NOT NULL
        AND l_partkey IN (SELECT p_partkey FROM part
                          WHERE p_name LIKE 'small%')
      GROUP BY l_suppkey, l_partkey),
    hot AS (SELECT DISTINCT l_suppkey FROM shipped WHERE 4 * q95 > qall)
    SELECT s.s_suppkey, s.s_name, n.n_name
    FROM supplier s
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE n.n_regionkey IN (SELECT r_regionkey FROM region
                            WHERE r_name = 'ASIA')
      AND s.s_suppkey IN (SELECT l_suppkey FROM hot)
    ORDER BY s.s_suppkey
    """,
)
def q20_excess_share_suppliers(spark, sf_dir):
    """TPC-H Q20 shape — the nested semi-join chain: Asian suppliers who
    shipped more than a quarter of their all-time volume of 'small' parts
    during 1995 (the availqty-vs-half-demand test re-expressed on
    lineitem, since the pack has no partsupp).  Four nested membership
    levels — part-name semi-join under the aggregate, HAVING-style share
    test, supplier semi-join, region semi-join — all planned as
    broadcast/ hash semi-joins, never a nested loop (plan-gated).
    Quantities are quantized to exact centi-units so the 4·q95 > qall
    share test is pure integer math in both engines."""
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_quantity").isNotNull())
    p = t(spark, sf_dir, "part").filter(F.col("p_name").like("small%"))
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    qc = F.floor(F.col("l_quantity") * 100 + F.lit(0.5)).cast("long")
    in95 = (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp")) & (
        F.col("l_shipdate") < F.lit("1996-01-01").cast("timestamp")
    )
    shipped = (
        li.join(
            F.broadcast(p.select("p_partkey")),
            li.l_partkey == F.col("p_partkey"),
            "left_semi",
        )
        .groupBy("l_suppkey", "l_partkey")
        .agg(
            F.sum(F.when(in95, qc).otherwise(F.lit(0).cast("long"))).alias("q95"),
            F.sum(qc).alias("qall"),
        )
    )
    hot = (
        shipped.filter(F.col("q95") * 4 > F.col("qall"))
        .select("l_suppkey")
        .distinct()
    )
    return (
        s.join(
            F.broadcast(n.join(
                F.broadcast(r.select("r_regionkey")),
                n.n_regionkey == F.col("r_regionkey"),
                "left_semi",
            )),
            s.s_nationkey == F.col("n_nationkey"),
        )
        .join(hot, s.s_suppkey == hot.l_suppkey, "left_semi")
        .select("s_suppkey", "s_name", "n_name")
        .orderBy("s_suppkey")
    )


