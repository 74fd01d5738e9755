"""Flagship: the NEW_PATRONS relational chain mapped onto TPC-H columns.

Split out of the flat queries.py (VERDICT r6 #8); all entries register
into the shared ``queries._base.SPARK_QUERIES`` / ``ORACLE_SQL``.
"""

from __future__ import annotations

from queries._base import *  # noqa: F401,F403

# ===========================================================================
# Flagship: the NEW_PATRONS relational chain mapped onto TPC-H columns
# ===========================================================================


@q(
    "flagship_patron_chain",
    f"""
    WITH scan AS (
      SELECT o.o_orderkey, o.o_custkey, o.o_orderdate, o.o_totalprice,
             CASE WHEN LENGTH(TRIM(o.o_orderpriority)) = 0
                       OR TRIM(o.o_orderpriority) = 'none'
                  THEN NULL ELSE TRIM(o.o_orderpriority) END AS priority_norm
      FROM orders o
      WHERE o.o_orderdate IS NOT NULL
        AND o.o_orderdate >= TIMESTAMP '1994-01-01 00:00:00'
        AND o.o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'),
    fanout AS (
      SELECT s.*, c.c_name, c.c_mktsegment, c.c_nationkey
      FROM scan s LEFT JOIN customer c ON s.o_custkey = c.c_custkey),
    dedup AS (
      SELECT * FROM (
        SELECT f.*, ROW_NUMBER() OVER (
          PARTITION BY f.o_custkey ORDER BY f.o_orderdate, f.o_orderkey) AS rn
        FROM fanout f) WHERE rn = 1)
    SELECT CAST(d.o_custkey AS VARCHAR) AS patron_id_plaintext,
           sha256('spark-graft' || CAST(d.o_custkey AS VARCHAR)) AS patron_id,
           sha256('spark-graft' || (COALESCE(CAST(d.o_custkey AS VARCHAR), '') || '_' ||
             COALESCE(d.c_name, '') || '_' || COALESCE(d.c_mktsegment, ''))) AS address_hash,
           SUBSTRING(d.c_mktsegment, 1, 5) AS segment5,
           CAST(CAST(d.o_orderdate AT TIME ZONE 'UTC'
                AT TIME ZONE 'America/New_York' AS DATE) AS VARCHAR) AS creation_date_et,
           d.priority_norm,
           ROUND(d.o_totalprice, 2) AS total
    FROM dedup d
    """,
)
def flagship_patron_chain(spark, sf_dir):
    """SURVEY §7 step 1: the full NEW_PATRONS relational chain on TPC-H
    stand-ins — incremental range scan (S1/P5) → null-normalize (P2) → left
    join fan-out (J1) → keep-first dedup (J4) → null-safe key concat (F1) →
    keyed hash (F2, sha2 scale mode) → zip5/date casts (F5/F6) → projection.
    """
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    scan = R.range_scan(
        o, "o_orderdate", "1994-01-01 00:00:00", "1998-01-01 00:00:00"
    ).withColumn("priority_norm", R.normalize_code_col("o_orderpriority"))
    fanout = scan.join(F.broadcast(c), scan.o_custkey == c.c_custkey, "left")
    dedup = keep_first(fanout, ["o_custkey"], ["o_orderdate", "o_orderkey"])
    dedup = dedup.withColumn("patron_id_plaintext", normalize_id("o_custkey"))
    addr_key = address_key("patron_id_plaintext", ["c_name", "c_mktsegment"])
    return dedup.select(
        "patron_id_plaintext",
        obfuscate_col("patron_id_plaintext", SALT).alias("patron_id"),
        obfuscate_col(addr_key, SALT).alias("address_hash"),
        F.substring("c_mktsegment", 1, 5).alias("segment5"),
        F.to_date(F.from_utc_timestamp("o_orderdate", "America/New_York"))
        .cast("string")
        .alias("creation_date_et"),
        "priority_norm",
        F.round("o_totalprice", 2).alias("total"),
    )


