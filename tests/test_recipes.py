"""Declarative curation recipes: composition equivalence, validation,
config-driven end-to-end."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from engine.recipes import RecipeError, apply_recipe, compile_recipe


def _docs(spark):
    return spark.createDataFrame(
        [
            (1, "<p>contact bob@x.com for cafÃ© details</p>", "web"),
            (2, "<div>short</div>", "web"),
            (3, "<p>a perfectly long and clean document body here</p>", "wiki"),
            (4, "<p>a perfectly long and clean document body here</p>", "web"),
        ],
        "doc_id long, text string, source string",
    )


def test_recipe_equals_hand_composition(spark):
    from engine.extended.curation import fix_mojibake, html_to_text, redact_pii
    from engine.extended.dedup import exact_dedup_docs

    d = _docs(spark)
    recipe = apply_recipe(
        d,
        [
            {"op": "fix_mojibake"},
            {"op": "html_to_text"},
            {"op": "redact_pii"},
            {"op": "min_length", "chars": 20},
            {"op": "exact_dedup"},
        ],
    )
    hand = d.withColumn("text", fix_mojibake(F.col("text")))
    hand = hand.withColumn("text", html_to_text(F.col("text")))
    hand = hand.withColumn("text", redact_pii(F.col("text")))
    hand = hand.filter(F.length("text") >= 20)
    hand = exact_dedup_docs(hand)
    assert sorted(recipe.collect()) == sorted(hand.collect())
    # mojibake fixed, email redacted, dup dropped (3 and 4 share text)
    got = {r["doc_id"]: r["text"] for r in recipe.collect()}
    assert set(got) == {1, 3}
    assert "café" in got[1] and "<EMAIL>" in got[1]


def test_recipe_column_steps_stay_one_projection(spark):
    """A pure column-rewrite recipe must not introduce any exchange —
    the declarative form costs nothing over inline expressions."""
    plan = (
        apply_recipe(
            _docs(spark),
            [{"op": "fix_mojibake"}, {"op": "html_to_text"}, {"op": "redact_pii"}],
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_recipe_line_dedup_preserves_columns_and_lineless_docs(spark):
    d = spark.createDataFrame(
        [
            (1, "keep me\nSign in", "a"),
            (2, "other text\nSign in", "b"),
            (3, "", "c"),  # no lines: survives with original text
        ],
        "doc_id long, text string, source string",
    )
    out = apply_recipe(d, [{"op": "line_dedup", "min_docs": 2}])
    got = {r["doc_id"]: r for r in out.collect()}
    assert set(got) == {1, 2, 3}
    assert got[1]["source"] == "a"  # extra columns survive the rewrite
    assert "Sign in" not in got[1]["text"]
    assert "keep me" in got[1]["text"]
    assert got[3]["text"] == ""


def test_recipe_bloom_decontaminate(spark):
    d = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog today", "x"),
            (2, "completely unrelated words about engines and planes", "y"),
        ],
        "doc_id long, text string, source string",
    )
    ev = spark.createDataFrame(
        [(9, "the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string",
    )
    out = apply_recipe(d, [{"op": "bloom_decontaminate"}], eval_df=ev)
    assert [r["doc_id"] for r in out.collect()] == [2]
    with pytest.raises(RecipeError, match="eval_df"):
        apply_recipe(d, [{"op": "bloom_decontaminate"}]).collect()


def test_recipe_validation_fails_at_compile_time(spark):
    with pytest.raises(RecipeError, match="no steps"):
        compile_recipe([])
    with pytest.raises(RecipeError, match="unknown op 'tokenize'"):
        compile_recipe([{"op": "tokenize"}])
    with pytest.raises(RecipeError, match="'op' key"):
        compile_recipe(["redact_pii"])


def test_recipe_from_yaml_config(spark, tmp_path):
    """The reference's config posture end to end: the recipe lives in the
    same YAML load_config reads, and drives the pipeline unchanged."""
    from engine.sources.config import load_config

    yml = tmp_path / "curation.yaml"
    yml.write_text(
        "steps:\n"
        "  - {op: html_to_text}\n"
        "  - {op: min_length, chars: 10}\n"
    )
    cfg = load_config(str(yml))
    out = apply_recipe(_docs(spark), cfg["steps"])
    ids = {r["doc_id"] for r in out.collect()}
    assert ids == {1, 3, 4}  # doc 2 ('short') filtered by length


def test_recipe_rejects_typoed_parameters(spark):
    """Review finding: a typo'd param must fail at compile time, not
    silently fall back to the default mid-corpus."""
    with pytest.raises(RecipeError, match=r"unknown parameter.*char"):
        compile_recipe([{"op": "min_length", "char": 80}])
    with pytest.raises(RecipeError, match="valid:"):
        compile_recipe([{"op": "bloom_decontaminate", "bits": 64}])


def test_recipe_line_dedup_tolerates_existing_clean_text_column(spark):
    """Review finding: a frame already carrying clean_text must not make
    the rewrite join ambiguous."""
    d = spark.createDataFrame(
        [(1, "dup line\nbody a", "x"), (2, "dup line\nbody b", "y")],
        "doc_id long, text string, clean_text string",
    )
    got = {r["doc_id"]: r for r in apply_recipe(d, [{"op": "line_dedup"}]).collect()}
    assert "dup line" not in got[1]["text"]
    assert got[1]["clean_text"] == "x"  # caller's own column untouched


def test_new_composition_steps_equal_direct_operators(spark):
    """drop_code / min_zlib_ratio / latin_fraction_min behave exactly as
    the operators they name."""
    from engine.extended.curation import code_detect_exprs, compression_ratio
    from engine.recipes import apply_recipe

    rows = [
        (1, "Plain prose about perfectly ordinary things, at length. " * 4),
        (2, "def f(x):\n    return {x: 1};\n    y = 2;\n"),          # code
        (3, "spam " * 300),                                           # repetitive
        (4, "Привет мир Привет мир Привет это тест без латиницы"),    # non-latin
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    got = {
        r["doc_id"]
        for r in apply_recipe(
            df,
            [
                {"op": "drop_code"},
                {"op": "min_zlib_ratio", "min_ratio": 0.2},
                {"op": "latin_fraction_min", "frac": 0.5},
            ],
        ).collect()
    }
    direct = df.filter(~code_detect_exprs("text")["is_code"])
    direct = direct.filter(compression_ratio("text") >= 0.2)
    from engine.extended.text import script_count_exprs

    c = script_count_exprs("text")
    letters = (
        c["latin_chars"] + c["cyrillic_chars"] + c["greek_chars"]
        + c["cjk_chars"] + c["arabic_chars"]
    )
    direct = direct.filter((letters == 0) | (c["latin_chars"] >= 0.5 * letters))
    assert got == {r["doc_id"] for r in direct.collect()}
    assert got == {1}  # each hostile doc died to exactly one step


def test_new_steps_reject_unknown_params(spark):
    from engine.recipes import RecipeError, compile_recipe
    import pytest as pt

    with pt.raises(RecipeError, match="min_zlib_ratio"):
        compile_recipe([{"op": "min_zlib_ratio", "ratio": 0.1}])
