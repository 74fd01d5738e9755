"""Blocked levenshtein entity matching: blocking recall, cap semantics,
tie-breaks, null handling."""

from __future__ import annotations

import pytest

from engine.extended.linkage import blocked_levenshtein_match


def _df(spark, rows, idc, tc):
    return spark.createDataFrame(rows, f"{idc} long, {tc} string")


def _match(spark, left_rows, right_rows, **kw):
    left = _df(spark, left_rows, "left_id", "left_text")
    right = _df(spark, right_rows, "right_id", "right_text")
    out = blocked_levenshtein_match(left, right, **kw)
    return {r["left_id"]: (r["match_id"], r["dist"]) for r in out.collect()}


def test_exact_and_single_edit_matches(spark):
    got = _match(
        spark,
        [(1, "alphabet soup"), (2, "alphabXt soup"), (3, "zzzzzzzz")],
        [(10, "alphabet soup"), (20, "different thing")],
    )
    assert got[1] == (10, 0)
    assert got[2] == (10, 1)      # substitution inside the middle
    assert got[3] == (None, None)  # nothing within max_dist


def test_prefix_damage_caught_by_suffix_block(spark):
    """An edit in the first block_len chars breaks the prefix key; the
    suffix pass still finds the pair."""
    got = _match(spark, [(1, "Xbcdefghij")], [(10, "abcdefghij")])
    assert got[1] == (10, 1)


def test_suffix_damage_caught_by_prefix_block(spark):
    got = _match(spark, [(1, "abcdefghiX")], [(10, "abcdefghij")])
    assert got[1] == (10, 1)


def test_best_match_prefers_lower_distance_then_lower_id(spark):
    got = _match(
        spark,
        [(1, "abcdef")],
        [(30, "abcdeX"), (20, "abcdef"), (10, "abcdeY")],
    )
    assert got[1] == (20, 0)
    # distance tie (both dist 1) -> lowest right_id wins
    got2 = _match(spark, [(1, "abcdef")], [(30, "abcdeX"), (10, "abcdeY")])
    assert got2[1] == (10, 1)


def test_null_text_rows_preserved_unmatched(spark):
    got = _match(spark, [(1, None), (2, "abcdef")], [(10, "abcdef")])
    assert got[1] == (None, None)
    assert got[2] == (10, 0)


def test_block_cap_overflow_reachable_via_other_key(spark):
    """cap=1 keeps only the lowest rid in the shared-prefix block, but the
    overflow row's distinct SUFFIX key still carries the pair."""
    got = _match(
        spark,
        [(1, "aaaa_target_x")],
        [(10, "aaaa_other_yyy"), (20, "aaaa_target_x")],
        block_cap=1,
    )
    assert got[1] == (20, 0)


def test_short_strings_block_whole_string(spark):
    """Strings shorter than block_len key on themselves in both passes."""
    got = _match(spark, [(1, "ab")], [(10, "ab"), (20, "ax")])
    assert got[1] == (10, 0)


def test_validation(spark):
    left = _df(spark, [(1, "x")], "left_id", "left_text")
    right = _df(spark, [(2, "x")], "right_id", "right_text")
    with pytest.raises(ValueError, match="max_dist"):
        blocked_levenshtein_match(left, right, max_dist=-1)
    with pytest.raises(ValueError, match="block_len"):
        blocked_levenshtein_match(left, right, block_len=0)
    with pytest.raises(ValueError, match="block_cap"):
        blocked_levenshtein_match(left, right, block_cap=0)


# ---------------------------------------------------------------------------
# incremental_entity_ids
# ---------------------------------------------------------------------------

from engine.extended.linkage import incremental_entity_ids


def test_incremental_ids_match_mint_and_collapse(spark):
    canonical = _df(
        spark,
        [(100, "alphabet soup"), (200, "totally different")],
        "entity_id",
        "entity_text",
    )
    batch = _df(
        spark,
        [
            (1, "alphabet soup"),       # exact match -> 100, dist 0
            (2, "alphabXt soup"),       # fuzzy match -> 100, dist 1
            (3, "brand new thing"),     # new entity
            (4, "brand new thing"),     # exact twin of 3: same minted id
            (5, None),                  # unidentifiable
            (6, "another new one"),     # second new entity
        ],
        "record_id",
        "record_text",
    )
    out = {
        r["record_id"]: (r["entity_id"], r["is_new"], r["dist"])
        for r in incremental_entity_ids(batch, canonical).collect()
    }
    assert out[1] == (100, 0, 0)
    assert out[2] == (100, 0, 1)
    assert out[5] == (None, 1, None)
    assert out[3] == out[4]                       # twins collapse
    assert out[3][1] == 1 and out[3][2] is None
    minted = {out[3][0], out[6][0]}
    assert minted == {201, 202}                   # dense above max existing


def test_incremental_ids_deterministic_across_partitionings(spark):
    canonical = _df(spark, [(10, "base entity")], "entity_id", "entity_text")
    rows = [(i, f"fresh item number {i % 7}") for i in range(1, 30)]
    batch = _df(spark, rows, "record_id", "record_text")
    a = sorted(
        (r["record_id"], r["entity_id"])
        for r in incremental_entity_ids(batch, canonical).collect()
    )
    b = sorted(
        (r["record_id"], r["entity_id"])
        for r in incremental_entity_ids(
            batch.repartition(7), canonical
        ).collect()
    )
    assert a == b
    # 7 distinct texts -> 7 minted ids, dense 11..17
    assert {e for _, e in a} == set(range(11, 18))


# ---------------------------------------------------------------------------
# golden_record
# ---------------------------------------------------------------------------

import datetime as _dt

from engine.extended.linkage import golden_record


def test_golden_record_rules(spark):
    T0 = _dt.datetime(2024, 1, 1)
    rows = [
        # (entity, ts, id, name, status)
        (1, T0, 10, "Bob", "a"),
        (1, _dt.datetime(2024, 2, 1), 11, None, "b"),      # latest name skips null
        (1, _dt.datetime(2024, 3, 1), 12, "Robert", "b"),  # latest name
        (2, T0, 20, "Zo", "x"),
        (2, None, 21, "Zoe-from-null-ts", "x"),            # null ts never "latest"
    ]
    df = spark.createDataFrame(
        rows, "eid long, ts timestamp, rid long, name string, status string"
    )
    got = {
        r["eid"]: (r["name"], r["status"])
        for r in golden_record(
            df, "eid", {"name": "latest", "status": "majority"},
            ts_col="ts", id_col="rid",
        ).collect()
    }
    assert got[1] == ("Robert", "b")
    assert got[2] == ("Zo", "x")
    # longest rule with lexicographic tie-break
    got2 = {
        r["eid"]: r["name"]
        for r in golden_record(df, "eid", {"name": "longest"}).collect()
    }
    assert got2[2] == "Zoe-from-null-ts"
    got3 = golden_record(
        spark.createDataFrame(
            [(1, "aa"), (1, "bb")], "eid long, name string"
        ),
        "eid",
        {"name": "longest"},
    ).collect()
    assert got3[0]["name"] == "bb"  # equal length -> lexicographic max


def test_golden_record_validation(spark):
    df = spark.createDataFrame([(1, "x")], "eid long, name string")
    import pytest as pt

    with pt.raises(ValueError, match="non-empty"):
        golden_record(df, "eid", {})
    with pt.raises(ValueError, match="unknown rules"):
        golden_record(df, "eid", {"name": "newest"})
