"""Declarative curation recipes: a config-listed sequence of curation
steps compiled into one DataFrame transform.

The reference is configuration-driven end to end (YAML + env selects the
pipeline's behavior; ``engine/sources/config.py``); this module extends
that posture to the corpus-curation surface: a recipe is plain data —

    steps:
      - {op: fix_mojibake}
      - {op: html_to_text}
      - {op: redact_pii}
      - {op: min_length, chars: 80}
      - {op: line_dedup}
      - {op: exact_dedup}
      - {op: bloom_decontaminate, m_bits: 16384}

— loadable from the same ``load_config`` YAML, reviewable in a diff, and
identical across environments.  ``apply_recipe`` composes the named
operators IN ORDER into a single lazy plan (column rewrites stay one
codegen'd projection chain; only the dedup/decontamination steps
introduce their documented shuffles), so the declarative form costs
nothing over hand-written composition — verified by the equivalence
test.

Unknown ops and bad parameters fail at COMPILE time with the full list
of valid names, not mid-job.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["apply_recipe", "compile_recipe", "RECIPE_OPS", "RecipeError"]


class RecipeError(ValueError):
    """A recipe names an unknown op or passes invalid parameters."""


def _col_rewrite(fn: Callable) -> Callable:
    """Lift a Column→Column curation expression to a frame step over the
    recipe's text column."""

    def step(df: DataFrame, text_col: str, **kw) -> DataFrame:
        return df.withColumn(text_col, fn(F.col(text_col), **kw))

    return step


def _op_fix_mojibake(df, text_col, **kw):
    from engine.extended.curation import fix_mojibake

    return df.withColumn(text_col, fix_mojibake(F.col(text_col)))


def _op_html_to_text(df, text_col, **kw):
    from engine.extended.curation import html_to_text

    return df.withColumn(text_col, html_to_text(F.col(text_col)))


def _op_redact_pii(df, text_col, **kw):
    from engine.extended.curation import redact_pii

    return df.withColumn(text_col, redact_pii(F.col(text_col)))


def _op_min_length(df, text_col, *, chars: int = 1, **kw):
    return df.filter(F.length(F.col(text_col)) >= int(chars))


def _op_lang_keep(df, text_col, *, langs: list[str] = ("en",), **kw):
    from engine.extended.text import lang_id_expr

    return df.filter(lang_id_expr(text_col).isin(*[str(x) for x in langs]))


def _op_exact_dedup(df, text_col, *, id_col: str = "doc_id", **kw):
    from engine.extended.dedup import exact_dedup_docs

    return exact_dedup_docs(df, id_col=id_col, text_col=text_col)


def _op_line_dedup(df, text_col, *, id_col: str = "doc_id", min_docs: int = 2, **kw):
    from engine.extended.dedup import line_dedup_rewrite

    rw = line_dedup_rewrite(
        df, id_col=id_col, text_col=text_col, min_docs=min_docs
    ).select(id_col, "clean_text")
    # rewrite IN PLACE so the recipe's column contract survives: docs the
    # rewriter produced no row for (no lines) keep their original text
    return (
        df.join(rw, id_col, "left")
        .withColumn(text_col, F.coalesce(F.col("clean_text"), F.col(text_col)))
        .drop("clean_text")
    )


def _op_minhash_dedup(df, text_col, *, id_col: str = "doc_id", threshold: float = 0.8, **kw):
    from engine.extended.dedup import minhash_dedup

    return minhash_dedup(
        df, id_col=id_col, text_col=text_col, threshold=threshold
    )


def _op_bloom_decontaminate(
    df, text_col, *, id_col: str = "doc_id", eval_df=None,
    shingle_n: int = 3, n_hashes: int = 3, m_bits: int = 16384, **kw
):
    if eval_df is None:
        raise RecipeError("bloom_decontaminate needs eval_df (pass to apply_recipe)")
    from engine.extended.curation import bloom_contamination

    flagged = bloom_contamination(
        df, eval_df, id_col=id_col, text_col=text_col,
        shingle_n=shingle_n, n_hashes=n_hashes, m_bits=m_bits,
    ).filter(F.col("n_flagged") > 0).select(id_col)
    return df.join(flagged, id_col, "left_anti")


#: op name -> step(df, text_col, **params) -> df
RECIPE_OPS: dict[str, Callable] = {
    "fix_mojibake": _op_fix_mojibake,
    "html_to_text": _op_html_to_text,
    "redact_pii": _op_redact_pii,
    "min_length": _op_min_length,
    "lang_keep": _op_lang_keep,
    "exact_dedup": _op_exact_dedup,
    "line_dedup": _op_line_dedup,
    "minhash_dedup": _op_minhash_dedup,
    "bloom_decontaminate": _op_bloom_decontaminate,
}


def compile_recipe(steps: list[dict]) -> list[tuple[str, Callable, dict]]:
    """Validate every step up front (names AND structure): returns the
    resolved (name, fn, params) list or raises :class:`RecipeError`
    naming the bad step and the valid vocabulary."""
    if not steps:
        raise RecipeError("recipe has no steps")
    out = []
    for i, step in enumerate(steps):
        if not isinstance(step, dict) or "op" not in step:
            raise RecipeError(f"step {i} must be a dict with an 'op' key: {step!r}")
        name = step["op"]
        fn = RECIPE_OPS.get(name)
        if fn is None:
            raise RecipeError(
                f"step {i}: unknown op {name!r}; valid ops: {sorted(RECIPE_OPS)}"
            )
        params = {k: v for k, v in step.items() if k != "op"}
        out.append((name, fn, params))
    return out


def apply_recipe(
    df: DataFrame,
    steps: list[dict],
    *,
    text_col: str = "text",
    eval_df: DataFrame | None = None,
) -> DataFrame:
    """Compose the recipe's steps IN ORDER into one lazy plan.  ``eval_df``
    supplies the benchmark corpus to decontamination steps."""
    compiled = compile_recipe(steps)
    out = df
    for name, fn, params in compiled:
        if name == "bloom_decontaminate":
            params = {**params, "eval_df": eval_df}
        out = fn(out, text_col, **params)
    return out
