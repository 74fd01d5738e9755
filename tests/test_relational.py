"""Relational operator goldens (SURVEY §2.2-2.6) — the dedup/null-semantics
cases the reference pins in tests/test_pipeline_controller.py."""

from __future__ import annotations

from pyspark.sql import functions as F

from engine.ops import relational as R
from engine.ops.dedup import accumulate_keys, keep_first
from engine.ops.hashing import address_key, normalize_id, obfuscate_col


def test_normalize_code_col(spark):
    df = spark.createDataFrame(
        [("a",), ("  b  ",), ("",), ("   ",), ("none",), (" none ",), (None,)],
        "code string",
    )
    out = [r["n"] for r in df.select(R.normalize_code_col("code").alias("n")).collect()]
    assert out == ["a", "b", None, None, None, None, None]


def test_keep_first_deterministic(spark, sierra_df):
    """patron 456 keeps the display_order=0 row (home_library2) — reference
    golden tests/test_pipeline_controller.py:27-38,113-125."""
    out = keep_first(
        sierra_df,
        ["patron_id_plaintext"],
        ["display_order", "patron_record_address_type_id"],
    )
    rows = {r["patron_id_plaintext"]: r for r in out.collect()}
    assert len(rows) == 3
    assert rows[456]["patron_home_library_code"] == "home_library2"
    assert rows[456]["city"] == "Brooklyn"


def test_address_key_null_safe(spark, sierra_df):
    """All-null demographic row must produce 'id____' (empty slots kept),
    not null — SURVEY §7 risk 7."""
    df = sierra_df.withColumn(
        "patron_id_plaintext", normalize_id("patron_id_plaintext")
    ).withColumn(
        "k",
        address_key(
            "patron_id_plaintext", ["address", "city", "region", "postal_code"]
        ),
    )
    got = {r["patron_id_plaintext"]: r["k"] for r in df.collect()}
    assert got["789"] == "789____"
    assert got["123"] == "123_123 Main St_New York_NY_10001"


def test_obfuscate_deterministic_and_null(spark):
    df = spark.createDataFrame([("x",), ("x",), (None,)], "v string")
    out = [r["h"] for r in df.select(obfuscate_col("v", "salt").alias("h")).collect()]
    assert out[0] == out[1] and len(out[0]) == 64
    assert out[2] is None
    other = df.select(obfuscate_col("v", "other-salt").alias("h")).collect()[0]["h"]
    assert other != out[0]  # keyed


def test_anti_join_and_accumulate(spark):
    df = spark.createDataFrame([(1,), (2,), (3,)], "k long")
    seen = spark.createDataFrame([(2,)], "k long")
    assert {r["k"] for r in R.anti_join(df, seen, "k").collect()} == {1, 3}
    seen2 = accumulate_keys(seen, df.select("k"))
    assert seen2.count() == 3


def test_overlay_join_fills_only_matches(spark):
    base = spark.createDataFrame([(1, "a"), (2, "b"), (3, None)], "k long, v string")
    upd = spark.createDataFrame([(1, "A"), (3, "C")], "k long, v string")
    out = {r["k"]: r["v"] for r in R.overlay_join(base, upd, "k", ["v"]).collect()}
    assert out == {1: "A", 2: "b", 3: "C"}


def test_coalesce_fill_join_fallback(spark):
    base = spark.createDataFrame([(1, "fb1"), (2, "fb2")], "k long, fallback string")
    dim = spark.createDataFrame([(1, "dim1")], "k long, fill string")
    out = {
        r["k"]: r["out"]
        for r in R.coalesce_fill_join(base, dim, "k", "fill", "fallback", out_col="out")
        .select("k", "out")
        .collect()
    }
    assert out == {1: "dim1", 2: "fb2"}


def test_min_max_and_success_rate(spark):
    df = spark.createDataFrame([(1, "a"), (5, None), (3, "c")], "n long, s string")
    assert R.min_max(df, "n") == (1, 5)
    assert abs(R.success_rate(df, "s") - 2 / 3) < 1e-9


def test_keyset_page_is_take_ordered(spark):
    df = spark.range(1000).withColumn("v", F.col("id") % 7)
    page = R.keyset_page(df, ["v", "id"], 10)
    assert [r["id"] for r in page.collect()] == [0, 7, 14, 21, 28, 35, 42, 49, 56, 63]
    # physical plan must be top-k, not a global sort
    assert "TakeOrderedAndProject" in page._jdf.queryExecution().executedPlan().toString()


def test_missing_key_audit(spark):
    df = spark.createDataFrame([(1,), (2,), (3,), (3,)], "k long")
    dim = spark.createDataFrame([(1,)], "k long")
    count, sample = R.missing_key_audit(df, dim, "k")
    assert count == 2 and set(sample) == {2, 3}


def test_obfuscate_bcrypt_mode_reference_identical(spark):
    """bcrypt mode produces REAL bcrypt hashes even without the wheel (the
    vendored pure-Python fallback) — pinned to a public OpenWall test vector
    so wheel and fallback provably agree."""
    from engine.ops import hashing

    df = spark.createDataFrame([("U*U",), ("U*U*",), (None,)], "v string")
    out = [
        r["h"]
        for r in df.select(
            hashing.obfuscate_col(
                "v", "$2a$05$CCCCCCCCCCCCCCCCCCCCC.", mode="bcrypt"
            ).alias("h")
        ).collect()
    ]
    assert out[0] == "$2a$05$CCCCCCCCCCCCCCCCCCCCC.E5YPO9kmyuRGyh0XouQYb4YMJKvyOeW"
    assert out[1] == "$2a$05$CCCCCCCCCCCCCCCCCCCCC.VGOzA784oUp/Z0DY336zx7pLYAy0lwK"
    assert out[2] is None


def test_bcrypt_pure_openwall_vectors():
    """The vendored bcrypt against the published OpenWall crypt_blowfish
    known-answer tests (incl. the >72-byte truncation case)."""
    from engine.ops.bcrypt_pure import gensalt_from_bytes, hashpw

    vectors = [
        (b"U*U", "$2a$05$CCCCCCCCCCCCCCCCCCCCC.E5YPO9kmyuRGyh0XouQYb4YMJKvyOeW"),
        (b"U*U*", "$2a$05$CCCCCCCCCCCCCCCCCCCCC.VGOzA784oUp/Z0DY336zx7pLYAy0lwK"),
        (b"U*U*U", "$2a$05$XXXXXXXXXXXXXXXXXXXXXOAcXxm9kjPGEMsLznoKqmqw7tc8WCx4a"),
        (
            b"0123456789abcdefghijklmnopqrstuvwxyz"
            b"ABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789"
            b"chars after 72 are ignored",
            "$2a$05$abcdefghijklmnopqrstuu5s2v8.iXieOjg/.AySBTTZIIVFJeBui",
        ),
    ]
    for pw, expect in vectors:
        assert hashpw(pw, expect[:29]) == expect
    # deterministic config-driven salt construction round-trips
    salt = gensalt_from_bytes(bytes(range(16)), rounds=4)
    assert salt.startswith("$2b$04$") and len(salt) == 29
    assert hashpw(b"key", salt) == hashpw(b"key", salt)


def test_asof_join_rejects_column_collision(spark):
    import pytest
    from engine.ops.asof import asof_join

    probe = spark.createDataFrame([(1, 10, 5.0)], "k long, pts long, value double")
    build = spark.createDataFrame([(1, 5, 7.0)], "k long, bts long, value double")
    with pytest.raises(ValueError, match="collide"):
        asof_join(probe, build, "k", "pts", "bts", ["value"])


def test_asof_join_basic_semantics(spark):
    from engine.ops.asof import asof_join

    probe = spark.createDataFrame(
        [(1, 10), (1, 3), (2, 10)], "k long, pts long"
    )
    build = spark.createDataFrame(
        [(1, 5, "a"), (1, 10, "b"), (1, 12, "c")], "k long, bts long, tag string"
    )
    out = {(r["k"], r["pts"]): r["tag"] for r in asof_join(
        probe, build, "k", "pts", "bts", ["tag"]
    ).collect()}
    assert out[(1, 10)] == "b"   # inclusive bound picks the equal-ts build row
    assert out[(1, 3)] is None   # nothing at or before
    assert out[(2, 10)] is None  # no build rows for key 2


def test_range_join_multi_bucket_path(spark):
    """bucket_seconds < window_seconds → each probe row joins >2 buckets;
    result must equal the plain inequality join."""
    import datetime as dt

    from engine.ops.asof import range_join_buckets

    base = dt.datetime(2024, 1, 1)
    a = spark.createDataFrame(
        [(i, base + dt.timedelta(seconds=90 * i)) for i in range(20)],
        "id_a long, ts_a timestamp",
    )
    b = spark.createDataFrame(
        [(i, base + dt.timedelta(seconds=60 * i)) for i in range(30)],
        "id_b long, ts_b timestamp",
    )
    bucketed = range_join_buckets(
        a, b, "ts_a", "ts_b", window_seconds=300, bucket_seconds=120
    ).select("id_a", "id_b")
    plain = a.join(
        b,
        (F.col("ts_b") <= F.col("ts_a"))
        & (F.col("ts_b") >= F.col("ts_a") - F.expr("INTERVAL 300 SECONDS")),
    ).select("id_a", "id_b")
    assert sorted(map(tuple, bucketed.collect())) == sorted(map(tuple, plain.collect()))
    assert plain.count() > 0


def test_salted_join_left_semantics(spark):
    from engine.ops.skew import salted_join

    left = spark.createDataFrame([(1, "a"), (2, "b"), (9, "c")], "k long, v string")
    right = spark.createDataFrame([(1, "one"), (2, "two")], "k long, name string")
    plain = left.join(right, "k", "left").select("k", "v", "name")
    salted = salted_join(left, right, "k", salts=4, how="left").select("k", "v", "name")
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))
