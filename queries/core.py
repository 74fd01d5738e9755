"""SURVEY §2 core: projections/joins/aggregates/functions (P/J/A/F), capability group-bys and windows, streaming-twin queries (ST1-ST5).

Split out of the flat queries.py (VERDICT r6 #8); all entries register
into the shared ``queries._base.SPARK_QUERIES`` / ``ORACLE_SQL``.
"""

from __future__ import annotations

from queries._base import *  # noqa: F401,F403

# ===========================================================================
# §2.2 Projections / filters / scalar predicates (P1-P6)
# ===========================================================================


@q(
    "p2_null_normalize",
    """
    SELECT o_orderkey,
           CASE WHEN LENGTH(TRIM(o_orderpriority)) = 0 OR TRIM(o_orderpriority) = 'none'
                THEN NULL ELSE TRIM(o_orderpriority) END AS priority_norm
    FROM orders
    """,
)
def p2_null_normalize(spark, sf_dir):
    """P2: blank/'none' → NULL normalization (reference helpers/query_helper.py:8-10)."""
    o = t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey", R.normalize_code_col("o_orderpriority").alias("priority_norm")
    )


@q(
    "p3_trim_projection",
    """
    SELECT c_custkey, TRIM(c_name) AS name_trim, TRIM(c_mktsegment) AS seg_trim
    FROM customer
    """,
)
def p3_trim_projection(spark, sf_dir):
    """P1+P3: explicit projection with TRIM (helpers/query_helper.py:11)."""
    c = t(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.trim("c_name").alias("name_trim"),
        F.trim("c_mktsegment").alias("seg_trim"),
    )


@q(
    "p4_ts_to_date",
    """
    SELECT l_orderkey, l_linenumber, CAST(CAST(l_shipdate AS DATE) AS VARCHAR) AS ship_date
    FROM lineitem
    """,
)
def p4_ts_to_date(spark, sf_dir):
    """P4: TO_DATE(CAST(ts)) truncation (helpers/query_helper.py:12)."""
    li = t(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.to_date("l_shipdate").cast("string").alias("ship_date"),
    )


@q(
    "p5_range_scan",
    """
    SELECT o_orderkey, o_custkey, CAST(o_orderdate AS VARCHAR) AS o_orderdate_s
    FROM orders
    WHERE o_orderdate IS NOT NULL
      AND o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1996-01-01 00:00:00'
    """,
)
def p5_range_scan(spark, sf_dir):
    """P5/S1: half-open incremental range scan with non-null guard
    (helpers/query_helper.py:20-23)."""
    o = t(spark, sf_dir, "orders")
    return R.range_scan(o, "o_orderdate", "1995-01-01 00:00:00", "1996-01-01 00:00:00").select(
        "o_orderkey",
        "o_custkey",
        F.col("o_orderdate").cast("string").alias("o_orderdate_s"),
    )


@q(
    "p6_in_list",
    """
    SELECT n_nationkey, n_name FROM nation WHERE n_name IN ('CHINA','FRANCE','PERU')
    """,
)
def p6_in_list(spark, sf_dir):
    """P6/S3: IN-list membership shipped as literals
    (lib/pipeline_controller.py:317-319)."""
    n = t(spark, sf_dir, "nation")
    return R.in_list_filter(n, "n_name", ["CHINA", "FRANCE", "PERU"]).select(
        "n_nationkey", "n_name"
    )


# ===========================================================================
# §2.3 Joins (J1-J9)
# ===========================================================================


@q(
    "j1_left_join_fanout",
    """
    SELECT o.o_orderkey, o.o_orderstatus, l.l_linenumber, l.l_quantity
    FROM orders o LEFT JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    """,
)
def j1_left_join_fanout(spark, sf_dir):
    """J1: deliberate 1:N fan-out left join (record_metadata × addresses,
    helpers/query_helper.py:26-27); collapsed later by J4."""
    o = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey"), "l_linenumber", "l_quantity"
    )
    return o.join(li, o.o_orderkey == li.l_orderkey, "left").select(
        "o_orderkey", "o_orderstatus", "l_linenumber", "l_quantity"
    )


@q(
    "j2_dim_chain_join",
    """
    SELECT c.c_custkey, n.n_name, r.r_name
    FROM customer c
    LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
    LEFT JOIN region r ON n.n_regionkey = r.r_regionkey
    """,
)
def j2_dim_chain_join(spark, sf_dir):
    """J2: left equi-join chain onto small dims — broadcast both
    (helpers/query_helper.py:28-29)."""
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey, "left")
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey, "left")
        .select("c_custkey", "n_name", "r_name")
    )


@q(
    "j3_anti_join",
    """
    SELECT c.c_custkey FROM customer c
    ANTI JOIN orders o ON c.c_custkey = o.o_custkey
    """,
)
def j3_anti_join(spark, sf_dir):
    """J3: anti-join vs. accumulated key state (processed_ids ~isin,
    lib/pipeline_controller.py:164-168)."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").select(F.col("o_custkey").alias("c_custkey"))
    return R.anti_join(c, o, on="c_custkey").select("c_custkey")


@q(
    "j4_keepfirst_dedup",
    """
    SELECT l_orderkey, l_linenumber, l_partkey, l_quantity FROM (
      SELECT l_orderkey, l_linenumber, l_partkey, l_quantity,
             ROW_NUMBER() OVER (PARTITION BY l_orderkey
                                ORDER BY l_linenumber, l_partkey, l_quantity) AS rn
      FROM lineitem) WHERE rn = 1
    """,
)
def j4_keepfirst_dedup(spark, sf_dir):
    """J4: deterministic keep-first-per-key via row_number over the explicit
    tiebreak (NOT dropDuplicates — SURVEY §7 risk 1;
    lib/pipeline_controller.py:176-181)."""
    li = t(spark, sf_dir, "lineitem")
    return keep_first(
        li, ["l_orderkey"], ["l_linenumber", "l_partkey", "l_quantity"]
    ).select("l_orderkey", "l_linenumber", "l_partkey", "l_quantity")


@q(
    "j5_memo_probe",
    """
    WITH cache AS (
      SELECT c_custkey, c_nationkey, c_acctbal FROM customer WHERE c_acctbal > 5000
    )
    SELECT o.o_orderkey, cache.c_nationkey AS cached_nation,
           ROUND(cache.c_acctbal, 2) AS cached_bal
    FROM orders o LEFT JOIN cache ON o.o_custkey = cache.c_custkey
    """,
)
def j5_memo_probe(spark, sf_dir):
    """J5: memoization-cache probe — broadcast left join on the derived key;
    null means 'compute it' (lib/pipeline_controller.py:311-331)."""
    o = t(spark, sf_dir, "orders")
    cache = (
        t(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 5000)
        .select(
            F.col("c_custkey"),
            F.col("c_nationkey").alias("cached_nation"),
            F.round("c_acctbal", 2).alias("cached_bal"),
        )
    )
    return R.left_join_broadcast(
        o, cache, on=o.o_custkey == cache.c_custkey
    ).select("o_orderkey", "cached_nation", "cached_bal")


@q(
    "j6_deleted_enrich",
    """
    WITH deleted AS (SELECT o_orderkey, o_orderdate FROM orders WHERE o_orderstatus = 'F')
    SELECT d.o_orderkey, CAST(d.o_orderdate AS VARCHAR) AS deleted_at,
           c.c_name, c.c_mktsegment
    FROM deleted d
    LEFT JOIN (SELECT o_orderkey, o_custkey FROM orders) oo ON d.o_orderkey = oo.o_orderkey
    LEFT JOIN customer c ON oo.o_custkey = c.c_custkey
    """,
)
def j6_deleted_enrich(spark, sf_dir):
    """J6: enrich a deleted-keys stream with the full warehouse record
    (lib/pipeline_controller.py:333-350)."""
    o = t(spark, sf_dir, "orders")
    deleted = o.filter(F.col("o_orderstatus") == "F").select(
        "o_orderkey", F.col("o_orderdate").cast("string").alias("deleted_at")
    )
    full = o.select("o_orderkey", "o_custkey")
    cust = t(spark, sf_dir, "customer")
    return (
        R.left_join_broadcast(deleted, full, on="o_orderkey")
        .join(F.broadcast(cust), F.col("o_custkey") == cust.c_custkey, "left")
        .select("o_orderkey", "deleted_at", "c_name", "c_mktsegment")
    )


@q(
    "j8_coalesce_fill",
    """
    SELECT c.c_custkey,
           COALESCE(n.n_name, 'UNKNOWN') AS nation_name
    FROM customer c
    LEFT JOIN (SELECT n_nationkey, n_name FROM nation WHERE n_nationkey < 20) n
      ON c.c_nationkey = n.n_nationkey
    """,
)
def j8_coalesce_fill(spark, sf_dir):
    """J8: dict-map join with missing-key fallback
    (lib/pipeline_controller.py:222-227,413-435)."""
    c = t(spark, sf_dir, "customer").withColumn("fallback", F.lit("UNKNOWN"))
    dim = t(spark, sf_dir, "nation").filter(F.col("n_nationkey") < 20).select(
        F.col("n_nationkey").alias("c_nationkey"), F.col("n_name")
    )
    out = R.coalesce_fill_join(
        c, dim, "c_nationkey", "n_name", "fallback", out_col="nation_name"
    )
    return out.select("c_custkey", "nation_name")


@q(
    "j9_retry_overlay",
    """
    SELECT o_orderkey,
           ROUND(COALESCE(
             CASE WHEN o_orderstatus = 'O' THEN o_totalprice END,
             CASE WHEN o_orderpriority LIKE '1%' THEN o_totalprice + 1000 END,
             0.0), 2) AS resolved
    FROM orders
    """,
)
def j9_retry_overlay(spark, sf_dir):
    """J9: multi-attempt overlay — each retry fills only still-null slots
    (Series.update at lib/pipeline_controller.py:390,406 → coalesce)."""
    o = t(spark, sf_dir, "orders")
    attempt1 = F.when(F.col("o_orderstatus") == "O", F.col("o_totalprice"))
    attempt2 = F.when(
        F.col("o_orderpriority").startswith("1"), F.col("o_totalprice") + 1000
    )
    return o.select(
        "o_orderkey",
        F.round(F.coalesce(attempt1, attempt2, F.lit(0.0)), 2).alias("resolved"),
    )


@q(
    "j7_overlay_join",
    """
    WITH upd AS (
      SELECT o_orderkey, o_totalprice * 2 AS new_price
      FROM orders WHERE o_orderstatus = 'O'
    )
    SELECT o.o_orderkey,
           ROUND(COALESCE(u.new_price, o.o_totalprice), 2) AS o_totalprice
    FROM orders o LEFT JOIN upd u ON o.o_orderkey = u.o_orderkey
    """,
)
def j7_overlay_join(spark, sf_dir):
    """J7: positional DataFrame.update → key-join + coalesce overlay
    (lib/pipeline_controller.py:217-218)."""
    o = t(spark, sf_dir, "orders")
    upd = o.filter(F.col("o_orderstatus") == "O").select(
        "o_orderkey", (F.col("o_totalprice") * 2).alias("o_totalprice")
    )
    out = R.overlay_join(o, upd, "o_orderkey", ["o_totalprice"])
    return out.select("o_orderkey", F.round("o_totalprice", 2).alias("o_totalprice"))


# ===========================================================================
# §2.4 / §2.6 Aggregates, sorts, limits (A1/A3/A5, O1)
# ===========================================================================


@q(
    "a1_stall_guard_minmax",
    """
    SELECT CAST(MIN(o_orderdate) AS VARCHAR) AS min_ts,
           CAST(MAX(o_orderdate) AS VARCHAR) AS max_ts,
           COUNT(*) AS n
    FROM orders
    """,
)
def a1_stall_guard_minmax(spark, sf_dir):
    """A1/ST5: single-pass min/max + count stall guard
    (lib/pipeline_controller.py:150-162)."""
    o = t(spark, sf_dir, "orders")
    return o.agg(
        F.min("o_orderdate").cast("string").alias("min_ts"),
        F.max("o_orderdate").cast("string").alias("max_ts"),
        F.count(F.lit(1)).alias("n"),
    )


@q(
    "a3_watermark_advance",
    """
    SELECT CAST(MAX(ts) AS VARCHAR) AS next_start FROM events
    """,
)
def a3_watermark_advance(spark, sf_dir):
    """A3/ST2: watermark advance = max(ordering col)
    (lib/pipeline_controller.py:246,454-468)."""
    e = t(spark, sf_dir, "events")
    return e.agg(F.max("ts").cast("string").alias("next_start"))


@q(
    "a5_null_rate",
    """
    SELECT ROUND(COUNT(CASE WHEN props IS NOT NULL THEN 1 END) * 1.0 / COUNT(*), 4)
             AS success_rate,
           COUNT(*) AS n
    FROM events
    """,
)
def a5_null_rate(spark, sf_dir):
    """A5: geocode success-rate count (lib/pipeline_controller.py:407-409)."""
    e = t(spark, sf_dir, "events")
    return e.agg(
        F.round(
            F.count(F.when(F.col("props").isNotNull(), 1)) / F.count(F.lit(1)), 4
        ).alias("success_rate"),
        F.count(F.lit(1)).alias("n"),
    )


@q(
    "o1_keyset_page",
    """
    SELECT o_orderkey, CAST(o_orderdate AS VARCHAR) AS o_orderdate_s
    FROM orders ORDER BY o_orderdate NULLS LAST, o_orderkey LIMIT 100
    """,
)
def o1_keyset_page(spark, sf_dir):
    """O1/ST1: ORDER BY ts LIMIT n — the micro-batch pagination unit
    (helpers/query_helper.py:24-25); physical plan is TakeOrderedAndProject."""
    o = t(spark, sf_dir, "orders")
    return R.keyset_page(o, ["o_orderdate", "o_orderkey"], 100).select(
        "o_orderkey", F.col("o_orderdate").cast("string").alias("o_orderdate_s")
    )


# ===========================================================================
# §2.8 Scalar functions (F1-F13)
# ===========================================================================


@q(
    "f1_f2_address_key_hash",
    """
    SELECT c_custkey,
           CAST(c_custkey AS VARCHAR) || '_' || COALESCE(c_name, '') || '_' ||
             COALESCE(c_mktsegment, '') AS addr_key,
           sha256('spark-graft' || (CAST(c_custkey AS VARCHAR) || '_' ||
             COALESCE(c_name, '') || '_' || COALESCE(c_mktsegment, ''))) AS addr_hash
    FROM customer
    """,
)
def f1_f2_address_key_hash(spark, sf_dir):
    """F1+F2: null-safe identity-key concat + keyed hash
    (lib/pipeline_controller.py:189-197).  sha2 mode — the scale path."""
    c = t(spark, sf_dir, "customer").withColumn(
        "c_custkey_str", F.col("c_custkey").cast("string")
    )
    key = address_key("c_custkey_str", ["c_name", "c_mktsegment"])
    return c.select(
        "c_custkey",
        key.alias("addr_key"),
        obfuscate_col(key, SALT).alias("addr_hash"),
    )


@q(
    "f3_f4_scrub_assemble",
    """
    SELECT doc_id,
           TRIM(REGEXP_REPLACE(source, '[''"\\\\]', '', 'g') || ' ' ||
                REGEXP_REPLACE(lang, '[''"\\\\]', '', 'g')) AS assembled
    FROM documents
    """,
)
def f3_f4_scrub_assemble(spark, sf_dir):
    """F3+F4: quote-strip regex + full-address space-assembly
    (lib/pipeline_controller.py:367-373)."""
    from engine.ops.address import scrub_quotes

    d = t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.trim(
            F.concat_ws(" ", scrub_quotes("source"), scrub_quotes("lang"))
        ).alias("assembled"),
    )


@q(
    "f5_f12_casts",
    """
    SELECT p_partkey,
           SUBSTRING(p_type, 1, 5) AS type5,
           CAST(CAST(p_size AS BIGINT) AS VARCHAR) AS size_str
    FROM part
    """,
)
def f5_f12_casts(spark, sf_dir):
    """F5 zip5-style truncate + F12 int→string id normalization
    (lib/pipeline_controller.py:231-232,147-148)."""
    from engine.ops.address import zip5

    p = t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        zip5("p_type").alias("type5"),
        normalize_id("p_size").alias("size_str"),
    )


@q(
    "f6_tz_local_date",
    """
    SELECT event_id,
           CAST(CAST(ts AT TIME ZONE 'UTC' AT TIME ZONE 'America/New_York' AS DATE)
                AS VARCHAR) AS et_date
    FROM events
    """,
)
def f6_tz_local_date(spark, sf_dir):
    """F6: UTC timestamp → America/New_York local date — the midnight-boundary
    semantics pinned by reference goldens (tests/test_pipeline_controller.py:116-117)."""
    e = t(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.to_date(F.from_utc_timestamp("ts", "America/New_York"))
        .cast("string")
        .alias("et_date"),
    )


@q(
    "f7_f8_geoid_assembly",
    """
    SELECT n_nationkey,
           CASE UPPER(n_name)
             WHEN 'CHINA' THEN '36061' WHEN 'FRANCE' THEN '36005'
             ELSE '36047' END ||
           LPAD(CAST(n_regionkey AS VARCHAR), 3, '0') ||
           LPAD(CAST(n_nationkey * 37 AS VARCHAR), 6, '0') AS geoid
    FROM nation
    """,
)
def f7_f8_geoid_assembly(spark, sf_dir):
    """F7+F8: literal-map lookup + zero-padded geoid concat
    (lib/census_geocoder_api_client.py:42-43; lib/nyc_geocoder_client.py:8-14)."""
    n = t(spark, sf_dir, "nation")
    fips = (
        F.when(F.upper("n_name") == "CHINA", F.lit("36061"))
        .when(F.upper("n_name") == "FRANCE", F.lit("36005"))
        .otherwise(F.lit("36047"))
    )
    return n.select(
        "n_nationkey",
        F.concat(
            fips,
            F.lpad(F.col("n_regionkey").cast("string"), 3, "0"),
            F.lpad((F.col("n_nationkey") * 37).cast("string"), 6, "0"),
        ).alias("geoid"),
    )


@q(
    "f13_json_records",
    """
    SELECT r_regionkey,
           '{' || CONCAT_WS(',',
             CASE WHEN r_regionkey IS NOT NULL
                  THEN '"r_regionkey":' || r_regionkey END,
             CASE WHEN r_name IS NOT NULL
                  THEN '"r_name":"' ||
                       REPLACE(REPLACE(REPLACE(REPLACE(REPLACE(r_name,
                         CHR(92), CHR(92) || CHR(92)),
                         '"', CHR(92) || '"'),
                         CHR(10), CHR(92) || 'n'),
                         CHR(13), CHR(92) || 'r'),
                         CHR(9), CHR(92) || 't') || '"' END) || '}' AS rec
    FROM region
    """,
)
def f13_json_records(spark, sf_dir):
    """F13: record → JSON serialization (lib/pipeline_controller.py:241-242).
    NULL fields are OMITTED (Spark to_json default); the oracle's CONCAT_WS
    mirrors that — a naive '||' chain would null the whole record — and the
    name is JSON-escaped (backslash, quote, newline/CR/tab) to match
    to_json's encoder (both fuzz-found)."""
    r = t(spark, sf_dir, "region")
    return r.select(
        "r_regionkey",
        F.to_json(F.struct("r_regionkey", "r_name")).alias("rec"),
    )


# ===========================================================================
# Engine capability: group-by / rollup / pivot / set-ops / windows
# (granted by Spark; exercised per SURVEY §2.4 note and §7 step 2)
# ===========================================================================


@q(
    "q1_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(12,2))), 2) AS DOUBLE) AS sum_qty,
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2))), 2) AS DOUBLE) AS sum_base_price,
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                          * (1 - CAST(l_discount AS DECIMAL(4,2)))), 2) AS DOUBLE)
             AS sum_disc_price,
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                          * (1 - CAST(l_discount AS DECIMAL(4,2)))
                          * (1 + CAST(l_tax AS DECIMAL(4,2)))), 2) AS DOUBLE)
             AS sum_charge,
           ROUND(AVG(l_quantity), 4) AS avg_qty,
           ROUND(AVG(l_extendedprice), 4) AS avg_price,
           ROUND(AVG(l_discount), 4) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark, sf_dir):
    """TPC-H Q1 shape — the flagship scan+agg; partial aggregation map-side,
    one shuffle on the 2-col group key.

    Money SUMs accumulate in DECIMAL (as TPC-H itself types them): double
    group-sums associate differently per engine/partitioning, and the 10×
    skew-gate showed the drift crossing ROUND boundaries once a hot group
    passes ~10⁹ in magnitude.  Inputs are 2-decimal by contract, so the
    casts are lossless and the sums bit-stable at any scale.  AVGs stay
    double: their magnitude is row-scale, leaving ~10⁷× drift headroom.

    r4 MEASUREMENT (VERDICT r3 #5, closed): long-cents accumulation
    (per-row exact integer products, SUM over long or DECIMAL(20,0)) was
    benchmarked at sf0.1 — cents 0.71-0.92 s, raw-long 0.59-1.0 s vs
    DECIMAL 0.78-0.95 s; only unsafe double sums reach ~0.30 s.  The cost
    is the per-row to-cents conversion + wider agg buffers, not decimal
    arithmetic, so long-cents buys nothing and adds a BIGINT overflow
    ceiling (sum_charge in 1e-6 units overflows a hot group at ~1e7 rows).
    DECIMAL stays."""
    li = t(spark, sf_dir, "lineitem")
    qty = F.col("l_quantity").cast("decimal(12,2)")
    price = F.col("l_extendedprice").cast("decimal(12,2)")
    disc = price * (F.lit(1) - F.col("l_discount").cast("decimal(4,2)"))
    charge = disc * (F.lit(1) + F.col("l_tax").cast("decimal(4,2)"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum(qty), 2).cast("double").alias("sum_qty"),
            F.round(F.sum(price), 2).cast("double").alias("sum_base_price"),
            F.round(F.sum(disc), 2).cast("double").alias("sum_disc_price"),
            F.round(F.sum(charge), 2).cast("double").alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@q(
    "q3_order_revenue_topk",
    """
    SELECT o.o_orderkey, CAST(o.o_orderdate AS VARCHAR) AS o_orderdate_s,
           CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
                          * (1 - CAST(l.l_discount AS DECIMAL(4,2)))), 2) AS DOUBLE)
             AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
    GROUP BY o.o_orderkey, o.o_orderdate
    ORDER BY revenue DESC, o_orderkey
    LIMIT 10
    """,
)
def q3_order_revenue_topk(spark, sf_dir):
    """TPC-H Q3 shape: selective dim filter → broadcast join → agg → top-k."""
    c = t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("o_orderkey", "o_orderdate")
        .agg(
            F.round(
                F.sum(
                    F.col("l_extendedprice").cast("decimal(12,2)")
                    * (F.lit(1) - F.col("l_discount").cast("decimal(4,2)"))
                ),
                2,
            )
            .cast("double")
            .alias("revenue")
        )
        .select(
            "o_orderkey",
            F.col("o_orderdate").cast("string").alias("o_orderdate_s"),
            "revenue",
        )
        .orderBy(F.col("revenue").desc(), "o_orderkey")
        .limit(10)
    )


@q(
    "q5_nation_revenue",
    """
    SELECT n.n_name,
           CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
                          * (1 - CAST(l.l_discount AS DECIMAL(4,2)))), 2) AS DOUBLE)
             AS revenue
    FROM lineitem l
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY n.n_name
    """,
)
def q5_nation_revenue(spark, sf_dir):
    """TPC-H Q5 shape: fact × snowflake dims, all dims broadcast.

    r12 opt (guide §3.1): the snowflake is collapsed into ONE broadcast
    dim (s_suppkey → n_name) by pre-joining supplier⋈nation⋈region on the
    dim side, so every lineitem row pays one hash probe instead of three,
    and the broadcast payload narrows from three relations to one
    two-column map.  Inner-join semantics are preserved exactly (the dim
    pre-join drops the same suppliers the chain would).  The decimal
    revenue arithmetic is the measured floor: sum/math ≈ 0.5 s of the
    1.1 s exec at sf0.1, pinned by the oracle's DECIMAL semantics — a
    long-scaled rewrite was measured (sum exchange-equal, −0.2 s) and
    REJECTED because a 64-bit sum of 1e-4-scaled revenue silently
    overflows near ~10^10 rows per group (see OPTIMIZATION_r12.md)."""
    li = t(spark, sf_dir, "lineitem")
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region")
    dim = (
        s.join(n, s.s_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .select("s_suppkey", "n_name")
    )
    return (
        li.join(F.broadcast(dim), li.l_suppkey == dim.s_suppkey)
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(
                    F.col("l_extendedprice").cast("decimal(12,2)")
                    * (F.lit(1) - F.col("l_discount").cast("decimal(4,2)"))
                ),
                2,
            )
            .cast("double")
            .alias("revenue")
        )
    )


@q(
    "rollup_revenue",
    """
    SELECT COALESCE(r.r_name, '<all>') AS region_name,
           COALESCE(n.n_name, '<all>') AS nation_name,
           ROUND(SUM(c.c_acctbal), 2) AS total_bal,
           COUNT(*) AS n_cust
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY ROLLUP(r.r_name, n.n_name)
    """,
)
def rollup_revenue(spark, sf_dir):
    """ROLLUP hierarchy aggregate (engine capability; reference has no
    group-bys — SURVEY §2.4 note)."""
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .rollup("r_name", "n_name")
        .agg(
            F.round(F.sum("c_acctbal"), 2).alias("total_bal"),
            F.count(F.lit(1)).alias("n_cust"),
        )
        .select(
            F.coalesce("r_name", F.lit("<all>")).alias("region_name"),
            F.coalesce("n_name", F.lit("<all>")).alias("nation_name"),
            "total_bal",
            "n_cust",
        )
    )


@q(
    "pivot_status_counts",
    """
    SELECT o_orderpriority,
           COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS status_F,
           COUNT(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS status_O,
           COUNT(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS status_P
    FROM orders GROUP BY o_orderpriority
    """,
)
def pivot_status_counts(spark, sf_dir):
    """Pivot (engine capability): fixed-vocabulary pivot = conditional aggs."""
    o = t(spark, sf_dir, "orders")
    p = (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
    )
    return p.select(
        "o_orderpriority",
        F.coalesce(F.col("F"), F.lit(0)).alias("status_F"),
        F.coalesce(F.col("O"), F.lit(0)).alias("status_O"),
        F.coalesce(F.col("P"), F.lit(0)).alias("status_P"),
    )


@q(
    "setops_customer_keys",
    """
    SELECT c_custkey FROM customer WHERE c_acctbal > 0
    INTERSECT
    SELECT o_custkey AS c_custkey FROM orders
    EXCEPT
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'MACHINERY'
    """,
)
def setops_customer_keys(spark, sf_dir):
    """Set operations (§2.7: none in the reference; engine capability)."""
    c = t(spark, sf_dir, "customer")
    pos = c.filter(F.col("c_acctbal") > 0).select("c_custkey")
    with_orders = t(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("c_custkey")
    )
    machinery = c.filter(F.col("c_mktsegment") == "MACHINERY").select("c_custkey")
    return pos.intersect(with_orders).exceptAll(machinery).distinct()


@q(
    "window_running_total",
    """
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate NULLS LAST, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
             AS running_total
    FROM orders
    """,
)
def window_running_total(spark, sf_dir):
    """Analytic window frame (§2.5: only ranking exists in the reference;
    engine capability).

    The accumulator is DECIMAL(18,2), not DOUBLE: windowed sums associate
    differently across engines (Spark accumulates sequentially, DuckDB uses
    a segment tree), and on a hot partition the double drift crosses
    ROUND-boundaries — the 10× skew gate caught exactly that at a 600k-row
    hot customer.  Exact decimal arithmetic is association-free, so the
    running total is bit-stable at any scale; prices are 2-decimal by
    contract, making the cast lossless."""
    o = t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("o_orderdate").asc_nulls_last(), "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .over(w)
        .cast("double")
        .alias("running_total"),
    )


@q(
    "topk_per_group",
    """
    SELECT o_custkey, o_orderkey, ROUND(o_totalprice, 2) AS o_totalprice_r FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders) WHERE rn <= 2
    """,
)
def topk_per_group(spark, sf_dir):
    """Top-k per key — the scalable form (window, no global sort)."""
    o = t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), "o_orderkey"
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 2)
        .select(
            "o_custkey", "o_orderkey", F.round("o_totalprice", 2).alias("o_totalprice_r")
        )
    )


# ===========================================================================
# §2.9 Streaming semantics, batch-checkable twins (ST1-ST5)
# ===========================================================================


@q(
    "st2_incremental_page",
    """
    SELECT event_id, CAST(ts AS VARCHAR) AS ts_s, user_id, event_type
    FROM events
    WHERE ts IS NOT NULL AND ts >= TIMESTAMP '2024-03-01 00:00:00'
    ORDER BY ts, event_id LIMIT 500
    """,
)
def st2_incremental_page(spark, sf_dir):
    """ST1+ST2: one incremental micro-batch — resume from watermark, ordered
    page (lib/pipeline_controller.py:90-125)."""
    e = t(spark, sf_dir, "events")
    scan = R.range_scan(e, "ts", "2024-03-01 00:00:00", "2100-01-01 00:00:00")
    return R.keyset_page(scan, ["ts", "event_id"], 500).select(
        "event_id", F.col("ts").cast("string").alias("ts_s"), "user_id", "event_type"
    )


@q(
    "st4_stream_dedup",
    """
    SELECT user_id, event_id, CAST(ts AS VARCHAR) AS first_ts FROM (
      SELECT user_id, event_id, ts,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts NULLS LAST, event_id) AS rn
      FROM events) WHERE rn = 1
    """,
)
def st4_stream_dedup(spark, sf_dir):
    """ST4: cross-batch dedup — first event per key (processed_ids semantics,
    deterministic batch twin of dropDuplicatesWithinWatermark)."""
    e = t(spark, sf_dir, "events")
    return keep_first(e, ["user_id"], ["ts", "event_id"]).select(
        "user_id", "event_id", F.col("ts").cast("string").alias("first_ts")
    )


@q(
    "st5_stall_detect",
    """
    SELECT event_type, COUNT(*) AS n,
           CASE WHEN MIN(ts) = MAX(ts) THEN 1 ELSE 0 END AS stalled
    FROM events GROUP BY event_type
    """,
)
def st5_stall_detect(spark, sf_dir):
    """ST5: stall guard predicate per partition-key (min==max ⇒ watermark
    cannot advance)."""
    e = t(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.when(F.min("ts") == F.max("ts"), F.lit(1)).otherwise(F.lit(0)).alias("stalled"),
    )


@q(
    "tumbling_window_agg",
    """
    SELECT CAST(DATE_TRUNC('hour', ts) AS VARCHAR) AS window_start,
           event_type, COUNT(*) AS n, ROUND(SUM(value), 2) AS total
    FROM events WHERE ts IS NOT NULL GROUP BY 1, 2
    """,
)
def tumbling_window_agg(spark, sf_dir):
    """Tumbling event-time window (engine.streaming.windows.tumbling_agg —
    same definition batch/streaming)."""
    from engine.streaming.windows import tumbling_agg

    e = t(spark, sf_dir, "events")
    out = tumbling_agg(
        e,
        "ts",
        "1 hour",
        ["event_type"],
        [F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("total")],
    )
    return out.select(
        F.col("window_start").cast("string").alias("window_start"),
        "event_type",
        "n",
        "total",
    )


@q(
    "sliding_window_agg",
    """
    WITH expanded AS (
      SELECT DATE_TRUNC('hour', ts) AS w, ts, value FROM events
        WHERE ts IS NOT NULL
      UNION ALL
      SELECT DATE_TRUNC('hour', ts) + INTERVAL 30 MINUTE AS w, ts, value FROM events
        WHERE EXTRACT(minute FROM ts) >= 30
      UNION ALL
      SELECT DATE_TRUNC('hour', ts) - INTERVAL 30 MINUTE AS w, ts, value FROM events
        WHERE EXTRACT(minute FROM ts) < 30
    )
    SELECT CAST(w AS VARCHAR) AS window_start, COUNT(*) AS n,
           ROUND(SUM(value), 2) AS total
    FROM expanded GROUP BY w
    """,
)
def sliding_window_agg(spark, sf_dir):
    """Sliding window (1h window / 30min slide): each event lands in 2
    windows."""
    from engine.streaming.windows import sliding_agg

    e = t(spark, sf_dir, "events")
    out = sliding_agg(
        e,
        "ts",
        "1 hour",
        "30 minutes",
        [],
        [F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("total")],
    )
    return out.select(
        F.col("window_start").cast("string").alias("window_start"), "n", "total"
    )


@q(
    "session_window_agg",
    """
    WITH gaps AS (
      SELECT user_id, ts, value,
             CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > INTERVAL 30 MINUTE OR
                       LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session,
             event_id
      FROM events WHERE ts IS NOT NULL),
    sessions AS (
      SELECT user_id, ts, value,
             CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                         ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
      FROM gaps)
    SELECT user_id, session_id, COUNT(*) AS n_events,
           CAST(MIN(ts) AS VARCHAR) AS session_start,
           ROUND(SUM(value), 2) AS total
    FROM sessions GROUP BY user_id, session_id
    """,
)
def session_window_agg(spark, sf_dir):
    """Sessionization (30-min gap) — lag + cumulative-sum session ids; the
    batch twin of ``session_window`` (engine.streaming.windows.session_agg)."""
    e = t(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w)
    new_sess = F.when(gap.isNull() | (gap > 30 * 60), 1).otherwise(0)
    sess_id = F.sum(new_sess).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        e.withColumn("session_id", sess_id)
        .groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").cast("string").alias("session_start"),
            F.round(F.sum("value"), 2).alias("total"),
        )
    )


