"""Pipeline mode graphs, oracle-verified end-to-end (SURVEY §3).

Split out of the flat queries.py (VERDICT r6 #8); all entries register
into the shared ``queries._base.SPARK_QUERIES`` / ``ORACLE_SQL``.
"""

from __future__ import annotations

from queries._base import *  # noqa: F401,F403

# ===========================================================================
# Pipeline mode graphs, oracle-verified end-to-end (SURVEY §3): a sierra-
# shaped source derived deterministically from orders×customer runs through
# the REAL mode graphs; the oracle replicates the whole chain in SQL.
# ===========================================================================


def _sierra_from_orders(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .select(
            F.col("o_custkey").alias("patron_id_plaintext"),
            (F.col("o_orderkey") % 5).alias("ptype_code"),
            F.lit(None).cast("long").alias("pcode3"),
            F.col("o_orderpriority").alias("patron_home_library_code"),
            F.col("c_mktsegment").alias("city"),
            F.lit("NY").alias("region"),
            F.concat(F.lpad((F.col("o_orderkey") % 89999 + 10000).cast("string"), 5, "0"),
                     F.lit("-1234")).alias("postal_code"),
            F.col("c_name").alias("address"),
            F.to_date("o_orderdate").alias("circ_active_date_et"),
            F.lit(None).cast("date").alias("deletion_date_et"),
            F.col("o_orderdate").alias("last_updated_timestamp"),
            F.col("o_orderdate").alias("creation_timestamp"),
            F.col("o_orderkey").cast("int").alias("display_order"),
            F.lit(1).alias("patron_record_address_type_id"),
        )
    )


_SIERRA_SQL = """
      SELECT o.o_custkey AS patron_id_plaintext,
             o.o_orderkey % 5 AS ptype_code,
             CAST(NULL AS BIGINT) AS pcode3,
             o.o_orderpriority AS patron_home_library_code,
             c.c_mktsegment AS city,
             'NY' AS region,
             LPAD(CAST(o.o_orderkey % 89999 + 10000 AS VARCHAR), 5, '0') || '-1234'
               AS postal_code,
             c.c_name AS address,
             CAST(o.o_orderdate AS DATE) AS circ_active_date_et,
             o.o_orderdate AS creation_timestamp,
             o.o_orderkey AS display_order
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
"""


@q(
    "pipeline_new_mode",
    f"""
    WITH sierra AS ({_SIERRA_SQL}),
    dedup AS (
      SELECT * FROM (
        SELECT s.*, ROW_NUMBER() OVER (PARTITION BY patron_id_plaintext
                                       ORDER BY display_order) AS rn
        FROM sierra s) WHERE rn = 1)
    SELECT sha256('spark-graft' || CAST(patron_id_plaintext AS VARCHAR)) AS patron_id,
           sha256('spark-graft' ||
             (CAST(patron_id_plaintext AS VARCHAR) || '_' ||
              COALESCE(address, '') || '_' || COALESCE(city, '') || '_' ||
              COALESCE(region, '') || '_' || COALESCE(postal_code, ''))) AS address_hash,
           SUBSTRING(postal_code, 1, 5) AS postal_code,
           CAST(NULL AS VARCHAR) AS geoid,
           CAST(CAST(creation_timestamp AT TIME ZONE 'UTC'
                AT TIME ZONE 'America/New_York' AS DATE) AS VARCHAR) AS creation_date_et,
           CAST(NULL AS VARCHAR) AS deletion_date_et,
           CAST(circ_active_date_et AS VARCHAR) AS circ_active_date_et,
           ptype_code,
           pcode3,
           patron_home_library_code,
           patron_home_library_code AS initial_patron_home_library_code
    FROM dedup
    """,
)
def pipeline_new_mode(spark, sf_dir):
    """The REAL new_patrons_graph (engine.pipeline) end-to-end over a
    deterministic sierra-shaped source, hash-checked against a full SQL
    replication of the chain: keep-first dedup (J4) → keyed hashes (F1/F2) →
    zip5 (F5) → ET dates (F6) → 11-field sink projection."""
    from engine.pipeline import PipelineConfig, new_patrons_graph

    src = _sierra_from_orders(spark, sf_dir)
    return new_patrons_graph(src, PipelineConfig(salt=SALT))


@q(
    "pipeline_deleted_mode",
    f"""
    WITH sierra AS ({_SIERRA_SQL}),
    dedup AS (
      SELECT * FROM (
        SELECT s.*, ROW_NUMBER() OVER (PARTITION BY patron_id_plaintext
                                       ORDER BY display_order) AS rn
        FROM sierra s) WHERE rn = 1),
    warehouse AS (
      SELECT sha256('spark-graft' || CAST(patron_id_plaintext AS VARCHAR)) AS patron_id,
             sha256('spark-graft' ||
               (CAST(patron_id_plaintext AS VARCHAR) || '_' ||
                COALESCE(address, '') || '_' || COALESCE(city, '') || '_' ||
                COALESCE(postal_code, ''))) AS address_hash,
             SUBSTRING(postal_code, 1, 5) AS postal_code,
             '36061' || LPAD(CAST(patron_id_plaintext % 1000000 AS VARCHAR), 6, '0') AS geoid,
             CAST(CAST(creation_timestamp AS DATE) AS VARCHAR) AS creation_date_et,
             CAST(circ_active_date_et AS VARCHAR) AS circ_active_date_et,
             ptype_code, pcode3, patron_home_library_code,
             patron_home_library_code AS initial_patron_home_library_code
      FROM dedup WHERE patron_id_plaintext % 2 = 0),
    deleted AS (
      SELECT DISTINCT o_custkey AS patron_id_plaintext,
             DATE '2024-06-01' AS deletion_date_et
      FROM orders WHERE o_orderstatus = 'F')
    SELECT d.patron_id, w.address_hash, w.postal_code, w.geoid,
           w.creation_date_et,
           CAST(d.deletion_date_et AS VARCHAR) AS deletion_date_et,
           w.circ_active_date_et, w.ptype_code, w.pcode3,
           CAST(NULL AS VARCHAR) AS patron_home_library_code,
           w.initial_patron_home_library_code
    FROM (SELECT patron_id_plaintext, deletion_date_et,
                 sha256('spark-graft' || CAST(patron_id_plaintext AS VARCHAR)) AS patron_id
          FROM deleted) d
    LEFT JOIN (SELECT * FROM warehouse) w ON d.patron_id = w.patron_id
    """,
)
def pipeline_deleted_mode(spark, sf_dir):
    """The REAL deleted_patrons_graph: hash deleted ids, enrich from a
    warehouse slice (J6; even custkeys cached), carry the deletion date.

    Note the warehouse address_hash uses a 3-part key (address, city,
    postal) — it is opaque cargo here, so the oracle just replicates the
    derivation; phlc is dropped by the graph (warehouse value not carried).
    """
    from engine.pipeline import PipelineConfig, deleted_patrons_graph
    from engine.ops.hashing import address_key, normalize_id, obfuscate_col
    from engine.ops.dedup import keep_first
    from engine.ops.address import zip5
    import datetime as dt

    src = _sierra_from_orders(spark, sf_dir)
    dedup = keep_first(src, ["patron_id_plaintext"], ["display_order"]).withColumn(
        "patron_id_plaintext", normalize_id("patron_id_plaintext")
    )
    warehouse = (
        dedup.filter(F.col("patron_id_plaintext").cast("long") % 2 == 0)
        .select(
            obfuscate_col("patron_id_plaintext", SALT).alias("patron_id"),
            obfuscate_col(
                address_key("patron_id_plaintext", ["address", "city", "postal_code"]),
                SALT,
            ).alias("address_hash"),
            zip5("postal_code").alias("postal_code"),
            F.concat(
                F.lit("36061"),
                F.lpad((F.col("patron_id_plaintext").cast("long") % 1000000).cast("string"), 6, "0"),
            ).alias("geoid"),
            F.to_date("creation_timestamp").cast("string").alias("creation_date_et"),
            F.col("circ_active_date_et").cast("string").alias("circ_active_date_et"),
            "ptype_code",
            "pcode3",
            "patron_home_library_code",
            F.col("patron_home_library_code").alias("initial_patron_home_library_code"),
        )
    )
    deleted = (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select(F.col("o_custkey").alias("patron_id_plaintext"))
        .distinct()
        .withColumn("deletion_date_et", F.lit(dt.date(2024, 6, 1)))
    )
    return deleted_patrons_graph(deleted, warehouse, PipelineConfig(salt=SALT))


@q(
    "pipeline_updated_mode",
    f"""
    WITH sierra AS ({_SIERRA_SQL}),
    dedup AS (
      SELECT * FROM (
        SELECT s.*, ROW_NUMBER() OVER (PARTITION BY patron_id_plaintext
                                       ORDER BY display_order) AS rn
        FROM sierra s) WHERE rn = 1),
    hashed AS (
      SELECT d.*,
             sha256('spark-graft' || CAST(patron_id_plaintext AS VARCHAR)) AS patron_id,
             sha256('spark-graft' ||
               (CAST(patron_id_plaintext AS VARCHAR) || '_' ||
                COALESCE(address, '') || '_' || COALESCE(city, '') || '_' ||
                COALESCE(region, '') || '_' || COALESCE(postal_code, ''))) AS address_hash
      FROM dedup d),
    cache AS (
      SELECT address_hash,
             '36061' || LPAD(CAST(patron_id_plaintext % 1000000 AS VARCHAR), 6, '0')
               AS cached_geoid,
             'CACHED_' || patron_home_library_code AS cached_iphlc
      FROM hashed WHERE patron_id_plaintext % 2 = 0)
    SELECT h.patron_id,
           h.address_hash,
           SUBSTRING(h.postal_code, 1, 5) AS postal_code,
           c.cached_geoid AS geoid,
           CAST(CAST(h.creation_timestamp AT TIME ZONE 'UTC'
                AT TIME ZONE 'America/New_York' AS DATE) AS VARCHAR) AS creation_date_et,
           CAST(NULL AS VARCHAR) AS deletion_date_et,
           CAST(h.circ_active_date_et AS VARCHAR) AS circ_active_date_et,
           h.ptype_code, h.pcode3, h.patron_home_library_code,
           COALESCE(c.cached_iphlc, h.patron_home_library_code)
             AS initial_patron_home_library_code
    FROM hashed h LEFT JOIN cache c ON h.address_hash = c.address_hash
    """,
)
def pipeline_updated_mode(spark, sf_dir):
    """The REAL updated_patrons_graph: memo-cache probe by address_hash (J5,
    even custkeys cached with geoids + iphlc), miss rows keep null geoid
    (no geocoder injected), iphlc backfill chain (J8: cache → warehouse →
    current phlc)."""
    from engine.pipeline import PipelineConfig, updated_patrons_graph
    from engine.ops.dedup import keep_first
    from engine.ops.hashing import address_key, normalize_id, obfuscate_col

    src = _sierra_from_orders(spark, sf_dir)
    dedup = keep_first(src, ["patron_id_plaintext"], ["display_order"]).withColumn(
        "patron_id_plaintext", normalize_id("patron_id_plaintext")
    )
    even = dedup.filter(F.col("patron_id_plaintext").cast("long") % 2 == 0)
    warehouse = even.select(
        obfuscate_col("patron_id_plaintext", SALT).alias("patron_id"),
        obfuscate_col(
            address_key(
                "patron_id_plaintext", ["address", "city", "region", "postal_code"]
            ),
            SALT,
        ).alias("address_hash"),
        F.lit(None).cast("string").alias("postal_code"),
        F.concat(
            F.lit("36061"),
            F.lpad(
                (F.col("patron_id_plaintext").cast("long") % 1000000).cast("string"),
                6,
                "0",
            ),
        ).alias("geoid"),
        F.lit(None).cast("string").alias("creation_date_et"),
        F.lit(None).cast("string").alias("circ_active_date_et"),
        F.lit(None).cast("long").alias("ptype_code"),
        F.lit(None).cast("long").alias("pcode3"),
        F.lit(None).cast("string").alias("patron_home_library_code"),
        F.concat(F.lit("CACHED_"), F.col("patron_home_library_code")).alias(
            "initial_patron_home_library_code"
        ),
    )
    return updated_patrons_graph(src, warehouse, PipelineConfig(salt=SALT))


@q(
    "corpus_curation_pipeline",
    """
    WITH filtered AS (
      SELECT doc_id, text, source FROM documents
      WHERE LENGTH(text) >= 50
        AND LENGTH(list_transform(regexp_extract_all(text, '[A-Za-z0-9'']+'), x -> LOWER(x))) >= 10
        AND LENGTH(REGEXP_REPLACE(text, '[^A-Za-z]', '', 'g')) * 1.0
            / LENGTH(text) >= 0.5),
    deduped AS (
      SELECT doc_id, text, source FROM (
        SELECT f.*, ROW_NUMBER() OVER (
          PARTITION BY MD5(LOWER(REGEXP_REPLACE(text, '[^A-Za-z0-9]', '', 'g')))
          ORDER BY doc_id) AS rn
        FROM filtered f) WHERE rn = 1),
    split AS (
      SELECT *,
        CASE WHEN CAST(('0x' || SUBSTRING(MD5(CAST(doc_id AS VARCHAR)), 1, 4))
                       AS INTEGER) < 52428 THEN 'train'
             WHEN CAST(('0x' || SUBSTRING(MD5(CAST(doc_id AS VARCHAR)), 1, 4))
                       AS INTEGER) < 58982 THEN 'val'
             ELSE 'test' END AS split
      FROM deduped)
    SELECT split, COUNT(*) AS n_docs,
           ROUND(AVG(LENGTH(text)), 2) AS avg_chars,
           CAST(SUM(LENGTH(list_transform(regexp_extract_all(text, '[A-Za-z0-9'']+'), x -> LOWER(x))))
                AS BIGINT) AS total_tokens
    FROM split GROUP BY split
    """,
)
def corpus_curation_pipeline(spark, sf_dir):
    """The full training-data curation chain as ONE declarative plan:
    quality filter → exact dedup (keep lowest id) → deterministic
    train/val/test split → per-split stats.  Composed purely from engine
    operators, so Catalyst fuses the whole thing: one scan, one dedup
    shuffle, one stats shuffle."""
    from engine.extended.dedup import exact_dedup_docs
    from engine.extended.sampling import hash_split
    from engine.extended.text import token_count

    d = t(spark, sf_dir, "documents")
    alpha_ratio = (
        F.length(F.regexp_replace(F.col("text"), "[^A-Za-z]", ""))
        / F.length("text").cast("double")
    )
    filtered = d.filter(
        (F.length("text") >= 50) & (token_count("text") >= 10) & (alpha_ratio >= 0.5)
    ).select("doc_id", "text", "source")
    deduped = exact_dedup_docs(filtered)
    split = deduped.withColumn("split", hash_split("doc_id"))
    return split.groupBy("split").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg(F.length("text")), 2).alias("avg_chars"),
        F.sum(token_count("text")).cast("long").alias("total_tokens"),
    )


@q(
    "funnel_conversion_unbounded",
    """
    WITH fv AS (
      SELECT user_id, MIN(CASE WHEN event_type = 'view' THEN ts END) AS first_view
      FROM events WHERE user_id IS NOT NULL GROUP BY user_id),
    fc AS (
      SELECT e.user_id, f.first_view,
             MIN(CASE WHEN e.event_type = 'click' AND e.ts >= f.first_view
                      THEN e.ts END) AS first_click
      FROM events e JOIN fv f ON e.user_id = f.user_id
      GROUP BY e.user_id, f.first_view),
    fp AS (
      SELECT c.user_id, c.first_view, c.first_click,
             MIN(CASE WHEN e.event_type = 'purchase' AND e.ts >= c.first_click
                      THEN e.ts END) AS first_purchase
      FROM events e JOIN fc c ON e.user_id = c.user_id
      GROUP BY c.user_id, c.first_view, c.first_click)
    SELECT COUNT(CASE WHEN first_view IS NOT NULL THEN 1 END) AS n_view,
           COUNT(CASE WHEN first_click IS NOT NULL THEN 1 END) AS n_view_click,
           COUNT(CASE WHEN first_purchase IS NOT NULL THEN 1 END) AS n_full_funnel
    FROM fp
    """,
)
def funnel_conversion_unbounded(spark, sf_dir):
    """Ordered funnel (view → click → purchase) per user with NO time bound:
    each stage's first timestamp must be at or after the previous stage's.
    Three window passes over the same user partitioning — one shuffle total,
    no self-joins.  (The 7-day-windowed cohort variant is
    ``funnel_conversion``; this one was shadowed by it in r4 — VERDICT #2 —
    and is now registered under its own name with its own oracle.)"""
    from pyspark.sql import Window as W

    # a funnel needs an identified user: NULL user_id would form a window
    # partition here but can never survive the oracle's equi-joins
    e = t(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    w = W.partitionBy("user_id")
    step1 = e.withColumn(
        "first_view", F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(w)
    )
    step2 = step1.withColumn(
        "first_click",
        F.min(
            F.when(
                (F.col("event_type") == "click") & (F.col("ts") >= F.col("first_view")),
                F.col("ts"),
            )
        ).over(w),
    )
    step3 = step2.withColumn(
        "first_purchase",
        F.min(
            F.when(
                (F.col("event_type") == "purchase")
                & (F.col("ts") >= F.col("first_click")),
                F.col("ts"),
            )
        ).over(w),
    )
    per_user = step3.groupBy("user_id").agg(
        F.max("first_view").alias("first_view"),
        F.max("first_click").alias("first_click"),
        F.max("first_purchase").alias("first_purchase"),
    )
    return per_user.agg(
        F.count(F.when(F.col("first_view").isNotNull(), 1)).alias("n_view"),
        F.count(F.when(F.col("first_click").isNotNull(), 1)).alias("n_view_click"),
        F.count(F.when(F.col("first_purchase").isNotNull(), 1)).alias("n_full_funnel"),
    )


@q(
    "stats_aggregates",
    """
    SELECT l_returnflag,
           ROUND(corr(l_quantity, l_extendedprice), 4) AS qty_price_corr,
           ROUND(covar_pop(l_quantity, l_extendedprice), 2) AS qty_price_covar,
           ROUND(stddev_samp(l_extendedprice), 2) AS price_stddev,
           ROUND(var_samp(l_quantity), 4) AS qty_var
    FROM lineitem GROUP BY l_returnflag
    """,
)
def stats_aggregates(spark, sf_dir):
    """Statistical aggregate family: correlation, population covariance,
    sample stddev/variance — all single-pass codegen aggregates."""
    li = t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.corr("l_quantity", "l_extendedprice"), 4).alias("qty_price_corr"),
        F.round(F.covar_pop("l_quantity", "l_extendedprice"), 2).alias(
            "qty_price_covar"
        ),
        F.round(F.stddev_samp("l_extendedprice"), 2).alias("price_stddev"),
        F.round(F.var_samp("l_quantity"), 4).alias("qty_var"),
    )


@q(
    "geocode_cascade_fake",
    r"""
WITH src AS (
  SELECT CAST(c_custkey AS VARCHAR) AS patron_id,
         REPLACE(REPLACE(REPLACE(CAST(c_custkey % 900 + 100 AS VARCHAR) || ' '
             || REGEXP_REPLACE(REPLACE(COALESCE(c_name, 'Main'), '#', ' '),
                               '[^ -~]', '', 'g')
             || ' St', CHR(39), ''), CHR(34), ''), CHR(92), '') AS address,
         REPLACE(REPLACE(REPLACE(REGEXP_REPLACE(c_mktsegment, '[^ -~]', '', 'g'), CHR(39), ''), CHR(34), ''), CHR(92), '') AS city,
         'NY' AS region,
         REPLACE(REPLACE(REPLACE(LPAD(CAST(c_custkey % 89999 + 10000 AS VARCHAR), 5, '0'), CHR(39), ''), CHR(34), ''), CHR(92), '') AS postal_code
  FROM customer),
base AS (
  SELECT *, TRIM(CONCAT_WS(' ', address, city, region, postal_code)) AS fa
  FROM src WHERE LENGTH(TRIM(CONCAT_WS(' ', address, city, region, postal_code))) > 0),
a1 AS (
  SELECT *,
    CASE WHEN CAST(('0x' || SUBSTRING(sha256(fa), 1, 2)) AS INTEGER) % 10 = 0
         THEN NULL
         ELSE LPAD(CAST(CAST(('0x' || SUBSTRING(sha256(fa), 3, 2)) AS INTEGER) % 56 + 1 AS VARCHAR), 2, '0')
           || LPAD(CAST(CAST(('0x' || SUBSTRING(sha256(fa), 5, 2)) AS INTEGER) % 800 AS VARCHAR), 3, '0')
           || LPAD(CAST(CAST(('0x' || SUBSTRING(sha256(fa), 7, 6)) AS BIGINT) % 1000000 AS VARCHAR), 6, '0')
    END AS geoid_a1
  FROM base),
parsed AS (
  SELECT *,
    CASE WHEN matched THEN NULLIF(regexp_extract(fa, pat, 1), '') END AS house_number,
    NULLIF(TRIM(CASE WHEN matched THEN regexp_extract(fa, pat, 2) ELSE fa END, ' ,'), '') AS street_name
  FROM (SELECT *,
          '(?i)^\s*(\d+[A-Za-z]?(?:-\d+)?)?\s*([^,#]*?)(?:\s*(?:#|APT\.?|UNIT|STE\.?|SUITE|FL\.?|RM\.?)\s*([\w-]+))?\s*$' AS pat,
          regexp_matches(fa, '(?i)^\s*(\d+[A-Za-z]?(?:-\d+)?)?\s*([^,#]*?)(?:\s*(?:#|APT\.?|UNIT|STE\.?|SUITE|FL\.?|RM\.?)\s*([\w-]+))?\s*$') AS matched
        FROM a1 WHERE geoid_a1 IS NULL)),
a2 AS (
  SELECT *,
    CASE WHEN fa2 = '' THEN NULL
         WHEN CAST(('0x' || SUBSTRING(sha256(fa2), 1, 2)) AS INTEGER) % 10 = 0
         THEN NULL
         ELSE LPAD(CAST(CAST(('0x' || SUBSTRING(sha256(fa2), 3, 2)) AS INTEGER) % 56 + 1 AS VARCHAR), 2, '0')
           || LPAD(CAST(CAST(('0x' || SUBSTRING(sha256(fa2), 5, 2)) AS INTEGER) % 800 AS VARCHAR), 3, '0')
           || LPAD(CAST(CAST(('0x' || SUBSTRING(sha256(fa2), 7, 6)) AS BIGINT) % 1000000 AS VARCHAR), 6, '0')
    END AS geoid_a2
  FROM (SELECT *,
          TRIM(CONCAT_WS(' ', COALESCE(house_number, ''), COALESCE(street_name, ''),
                         city, region, SUBSTRING(postal_code, 1, 5))) AS fa2
        FROM parsed)),
a3 AS (
  SELECT patron_id AS p3,
    CASE WHEN house_number IS NULL OR street_name IS NULL
              OR NULLIF(SUBSTRING(postal_code, 1, 5), '') IS NULL THEN NULL
         ELSE (['36061','36005','36047','36081','36085'])
                [CAST(('0x' || SUBSTRING(gh, 1, 2)) AS INTEGER) % 5 + 1]
           || LPAD(CAST(CAST(('0x' || SUBSTRING(gh, 3, 6)) AS BIGINT) % 1000000 AS VARCHAR), 6, '0')
    END AS geoid_a3
  FROM (SELECT *,
          sha256(COALESCE(house_number, '') || '|' || COALESCE(street_name, '')
                 || '|' || SUBSTRING(postal_code, 1, 5)) AS gh
        FROM a2 WHERE geoid_a2 IS NULL
          AND house_number IS NOT NULL AND street_name IS NOT NULL
          AND postal_code IS NOT NULL))
SELECT b.patron_id,
       COALESCE(b.geoid_a1, a2.geoid_a2, a3.geoid_a3) AS geoid
FROM a1 b
LEFT JOIN a2 ON a2.patron_id = b.patron_id
LEFT JOIN a3 ON a3.p3 = b.patron_id
ORDER BY b.patron_id
    """,
)
def geocode_cascade_fake(spark, sf_dir):
    """The full three-attempt geocode cascade (S5 census → reparse+retry →
    S6 Geosupport, J9 overlay) over customer-derived addresses, with the
    deterministic fake transports — the mapInPandas enrichment seam run
    through the driver contract.

    Oracle-paired in r8 (the 7th rows-only upgrade): the fakes are sha256
    string arithmetic, so the twin replays scrub → assembly → attempt 1 →
    the _ADDR_RE reparse (same pattern under RE2 — the corpus is ASCII by
    construction, where Python re and RE2 agree) → attempt 2 → Geosupport
    borough/tract → the coalesce overlay, byte for byte.  Assumes unique
    c_custkey (true of every gate fixture); duplicate keys would fan the
    Spark-side overlay joins where the oracle computes inline."""
    from engine.ops.geocode import (
        fake_census_transport,
        fake_geosupport,
        geocode_cascade,
    )

    c = t(spark, sf_dir, "customer")
    # input normalization up front (the reference unidecodes before
    # geocoding): ASCII strip keeps the cascade's per-attempt arithmetic
    # in the regime where Python re and RE2 agree, and '#' becomes a
    # space so the reparse regex can actually MATCH TPC-H names — without
    # it every row took the no-match fall-through and the Geosupport leg
    # was structurally dead on every gate corpus (r8 review catch); the
    # transliteration path itself stays golden-pinned in tests
    ascii_ = lambda col: F.regexp_replace(col, "[^ -~]", "")  # noqa: E731
    addresses = c.select(
        F.col("c_custkey").cast("string").alias("patron_id"),
        F.concat(
            (F.col("c_custkey") % 900 + 100).cast("string"),
            F.lit(" "),
            ascii_(
                F.regexp_replace(
                    F.coalesce(F.col("c_name"), F.lit("Main")), "#", " "
                )
            ),
            F.lit(" St"),
        ).alias("address"),
        ascii_(F.col("c_mktsegment")).alias("city"),
        F.lit("NY").alias("region"),
        F.lpad((F.col("c_custkey") % 89999 + 10000).cast("string"), 5, "0").alias(
            "postal_code"
        ),
    )
    out = geocode_cascade(
        addresses, fake_census_transport(), fake_geosupport()
    )
    return out.select("patron_id", "geoid").orderBy("patron_id")


@q(
    "address_parse",
    r"""
WITH src AS (
  SELECT c_custkey,
         CAST(c_custkey % 9000 + 1000 AS VARCHAR) || ' '
           || REGEXP_REPLACE(REPLACE(COALESCE(c_name, 'Elm'), '#', ' '),
                             '[^ -~]', '', 'g')
           || ' Ave Apt ' || CAST(c_custkey % 50 AS VARCHAR) AS a
  FROM customer),
pat AS (
  SELECT c_custkey, a,
         '(?i)^\s*(\d+[A-Za-z]?(?:-\d+)?)?\s*([^,#]*?)(?:\s*(?:#|APT\.?|UNIT|STE\.?|SUITE|FL\.?|RM\.?)\s*([\w-]+))?\s*$' AS p,
         regexp_matches(a, '(?i)^\s*(\d+[A-Za-z]?(?:-\d+)?)?\s*([^,#]*?)(?:\s*(?:#|APT\.?|UNIT|STE\.?|SUITE|FL\.?|RM\.?)\s*([\w-]+))?\s*$') AS m
  FROM src)
SELECT c_custkey,
       CASE WHEN a IS NULL OR TRIM(a) = '' THEN NULL
            WHEN m THEN NULLIF(regexp_extract(a, p, 1), '')
       END AS house_number,
       CASE WHEN a IS NULL OR TRIM(a) = '' THEN NULL
            WHEN m THEN NULLIF(TRIM(regexp_extract(a, p, 2), ' ,'), '')
            ELSE NULLIF(TRIM(a), '')
       END AS street_name,
       CASE WHEN a IS NULL OR TRIM(a) = '' THEN NULL
            WHEN m THEN NULLIF(regexp_extract(a, p, 3), '')
       END AS unit
FROM pat ORDER BY c_custkey
    """,
)
def address_parse(spark, sf_dir):
    """Free-text address parsing (F9+F10): house number / street / unit
    extraction via the Arrow-batched parse UDF over synthetic address
    lines.

    Oracle-paired in r8 (8th rows-only upgrade).  The synthesis
    normalizes its input exactly like the cascade query — '#' becomes a
    space and non-ASCII is stripped ON BOTH SIDES, so (a) _to_ascii
    inside the UDF is the identity (no corpus-conditional equivalence
    claim; the NFKD/translit path stays golden-pinned in pytest) and
    (b) the _ADDR_RE match branch actually FIRES: house numbers and the
    'Apt N' unit capture are hash-checked on every row, not just the
    no-match fall-through (r8 review catch — with '#' in the TPC-H
    names, 100% of rows took the degenerate branch and a capture-group
    bug would have stayed green)."""
    from engine.ops.address import with_parsed_address

    c = t(spark, sf_dir, "customer")
    ascii_ = lambda col: F.regexp_replace(col, "[^ -~]", "")  # noqa: E731
    lines = c.select(
        "c_custkey",
        F.concat(
            (F.col("c_custkey") % 9000 + 1000).cast("string"),
            F.lit(" "),
            ascii_(
                F.regexp_replace(
                    F.coalesce(F.col("c_name"), F.lit("Elm")), "#", " "
                )
            ),
            F.lit(" Ave Apt "),
            (F.col("c_custkey") % 50).cast("string"),
        ).alias("full_address"),
    )
    return with_parsed_address(lines).select(
        "c_custkey", "house_number", "street_name", "unit"
    ).orderBy("c_custkey")
