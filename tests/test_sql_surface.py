"""Pure-SQL surface: views + registered UDFs drive the engine from spark.sql."""

from __future__ import annotations

from engine.sql import register_engine_sql

SF = "/root/testdata/sf0.001"


def test_sql_views_and_udfs(spark):
    register_engine_sql(spark, SF)
    # views queryable
    n = spark.sql("SELECT COUNT(*) AS n FROM lineitem").collect()[0]["n"]
    assert n == 6000
    # parse UDF callable from SQL
    row = spark.sql(
        "SELECT engine_parse_address('123 Main St Apt 4') AS p"
    ).collect()[0]["p"]
    assert row["house_number"] == "123" and row["street_name"] == "Main St"
    # obfuscate UDF matches the JVM sha2 expression path exactly
    got = spark.sql(
        """
        SELECT engine_obfuscate(c_name, 'salt') AS u,
               sha2(concat('salt', c_name), 256) AS jvm
        FROM customer LIMIT 20
        """
    ).collect()
    assert all(r["u"] == r["jvm"] for r in got)


def test_sql_pipeline_query_end_to_end(spark):
    """A reference-style chain written entirely in SQL over the registered
    surface (scan → normalize → dedup → hash)."""
    register_engine_sql(spark, SF)
    out = spark.sql(
        """
        WITH dedup AS (
          SELECT * FROM (
            SELECT o_custkey, o_orderkey, o_orderdate,
                   ROW_NUMBER() OVER (PARTITION BY o_custkey
                                      ORDER BY o_orderdate, o_orderkey) AS rn
            FROM orders) WHERE rn = 1)
        SELECT o_custkey, engine_obfuscate(CAST(o_custkey AS STRING), 'k') AS pid
        FROM dedup
        """
    ).collect()
    assert len(out) == 150
    assert all(len(r["pid"]) == 64 for r in out)


def test_doc_overlap_winnow_ubiquity_cap(spark, tmp_path):
    """Fingerprints shared by >500 docs are boilerplate, not overlap signal:
    they must be dropped BEFORE the fp self-join (r11 — the bound that
    keeps a hot shared header from going quadratic at corpus scale), while
    rare shared windows still pair up."""
    from queries import doc_overlap_winnow

    boiler = "the quick brown fox jumps over the lazy dog near the river bank today"
    rare = "zq" * 40  # 80 chars, unique window shared by exactly two docs
    rows = [(i, boiler, "s", "en") for i in range(600)]
    rows += [(1001, rare, "s", "en"), (1002, rare, "s", "en")]
    spark.createDataFrame(
        rows, "doc_id long, text string, source string, lang string"
    ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")

    got = {(r["id_a"], r["id_b"]) for r in
           doc_overlap_winnow(spark, str(tmp_path)).collect()}
    # 600 boilerplate docs share every window (fan-out 600 > 500) -> no
    # pairs from them; the rare window (fan-out 2) still pairs
    assert got == {(1001, 1002)}
