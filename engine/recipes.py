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


def _op_fix_mojibake(df, text_col):
    from engine.extended.curation import fix_mojibake

    return df.withColumn(text_col, fix_mojibake(F.col(text_col)))


def _op_html_to_text(df, text_col):
    from engine.extended.curation import html_to_text

    return df.withColumn(text_col, html_to_text(F.col(text_col)))


def _op_redact_pii(df, text_col):
    from engine.extended.curation import redact_pii

    return df.withColumn(text_col, redact_pii(F.col(text_col)))


def _op_min_length(df, text_col, *, chars: int = 1):
    return df.filter(F.length(F.col(text_col)) >= int(chars))


def _op_lang_keep(df, text_col, *, langs: list[str] = ("en",)):
    from engine.extended.text import lang_id_expr

    return df.filter(lang_id_expr(text_col).isin(*[str(x) for x in langs]))


def _op_exact_dedup(df, text_col, *, id_col: str = "doc_id"):
    from engine.extended.dedup import exact_dedup_docs

    return exact_dedup_docs(df, id_col=id_col, text_col=text_col)


def _op_line_dedup(df, text_col, *, id_col: str = "doc_id", min_docs: int = 2):
    from engine.extended.dedup import line_dedup_rewrite

    # a reserved alias for the rewritten column: the input frame may
    # legitimately carry its own clean_text (review finding — the bare
    # name made the join ambiguous)
    rw = line_dedup_rewrite(
        df, id_col=id_col, text_col=text_col, min_docs=min_docs
    ).select(id_col, F.col("clean_text").alias("__recipe_clean"))
    # rewrite IN PLACE so the recipe's column contract survives: docs the
    # rewriter produced no row for (no lines) keep their original text
    return (
        df.join(rw, id_col, "left")
        .withColumn(
            text_col, F.coalesce(F.col("__recipe_clean"), F.col(text_col))
        )
        .drop("__recipe_clean")
    )


def _op_minhash_dedup(df, text_col, *, id_col: str = "doc_id", threshold: float = 0.8):
    from engine.extended.dedup import minhash_dedup

    return minhash_dedup(
        df, id_col=id_col, text_col=text_col, threshold=threshold
    )


def _op_bloom_decontaminate(
    df, text_col, *, id_col: str = "doc_id", eval_df=None,
    shingle_n: int = 3, n_hashes: int = 3, m_bits: int = 16384,
):
    if eval_df is None:
        raise RecipeError("bloom_decontaminate needs eval_df (pass to apply_recipe)")
    from engine.extended.curation import bloom_contamination

    flagged = bloom_contamination(
        df, eval_df, id_col=id_col, text_col=text_col,
        shingle_n=shingle_n, n_hashes=n_hashes, m_bits=m_bits,
    ).filter(F.col("n_flagged") > 0).select(id_col)
    return df.join(flagged, id_col, "left_anti")


def _op_drop_code(df, text_col):
    from engine.extended.curation import code_detect_exprs

    return df.filter(~code_detect_exprs(text_col)["is_code"])


def _op_min_zlib_ratio(df, text_col, *, min_ratio: float = 0.2):
    # low ratio = highly compressible = templated/repetitive spam; the
    # one Python (Arrow) seam in the vocabulary — documented, since every
    # other step stays pure codegen
    from engine.extended.curation import compression_ratio

    return df.filter(compression_ratio(text_col) >= float(min_ratio))


def _op_latin_fraction_min(df, text_col, *, frac: float = 0.5):
    from engine.extended.text import script_count_exprs

    c = script_count_exprs(text_col)
    letters = (
        c["latin_chars"] + c["cyrillic_chars"] + c["greek_chars"]
        + c["cjk_chars"] + c["arabic_chars"]
    )
    return df.filter(
        (letters == 0)
        | (c["latin_chars"] >= F.lit(float(frac)) * letters)
    )


class _Op:
    """An op's callable plus its declared parameter vocabulary.  ``context``
    names parameters apply_recipe injects (e.g. eval_df) when the step
    doesn't supply them — declared per op, never a name special-case in
    the dispatch loop."""

    def __init__(self, fn: Callable, params: frozenset = frozenset(),
                 context: frozenset = frozenset()):
        self.fn = fn
        self.params = params
        self.context = context


RECIPE_OPS: dict[str, _Op] = {
    "fix_mojibake": _Op(_op_fix_mojibake),
    "html_to_text": _Op(_op_html_to_text),
    "redact_pii": _Op(_op_redact_pii),
    "min_length": _Op(_op_min_length, frozenset({"chars"})),
    "lang_keep": _Op(_op_lang_keep, frozenset({"langs"})),
    "exact_dedup": _Op(_op_exact_dedup, frozenset({"id_col"})),
    "line_dedup": _Op(_op_line_dedup, frozenset({"id_col", "min_docs"})),
    "minhash_dedup": _Op(_op_minhash_dedup, frozenset({"id_col", "threshold"})),
    "bloom_decontaminate": _Op(
        _op_bloom_decontaminate,
        frozenset({"id_col", "shingle_n", "n_hashes", "m_bits"}),
        frozenset({"eval_df"}),
    ),
    "drop_code": _Op(_op_drop_code),
    "min_zlib_ratio": _Op(_op_min_zlib_ratio, frozenset({"min_ratio"})),
    "latin_fraction_min": _Op(_op_latin_fraction_min, frozenset({"frac"})),
}


def compile_recipe(steps: list[dict]) -> list[tuple[str, _Op, dict]]:
    """Validate every step up front — names AND parameter vocabulary (a
    typo'd parameter must fail here, not silently fall back to a default
    mid-corpus; review finding): returns the resolved (name, op, params)
    list or raises :class:`RecipeError` naming the bad step and the valid
    vocabulary."""
    if not steps:
        raise RecipeError("recipe has no steps")
    out = []
    for i, step in enumerate(steps):
        if not isinstance(step, dict) or "op" not in step:
            raise RecipeError(f"step {i} must be a dict with an 'op' key: {step!r}")
        name = step["op"]
        op = RECIPE_OPS.get(name)
        if op is None:
            raise RecipeError(
                f"step {i}: unknown op {name!r}; valid ops: {sorted(RECIPE_OPS)}"
            )
        params = {k: v for k, v in step.items() if k != "op"}
        unknown = set(params) - op.params - op.context
        if unknown:
            raise RecipeError(
                f"step {i} ({name}): unknown parameter(s) {sorted(unknown)}; "
                f"valid: {sorted(op.params | op.context)}"
            )
        out.append((name, op, params))
    return out


def apply_recipe(
    df: DataFrame,
    steps: list[dict],
    *,
    text_col: str = "text",
    eval_df: DataFrame | None = None,
) -> DataFrame:
    """Compose the recipe's steps IN ORDER into one lazy plan.  ``eval_df``
    supplies the benchmark corpus to any op that DECLARES an eval_df
    context parameter; a step-supplied value wins over the injection."""
    compiled = compile_recipe(steps)
    context = {"eval_df": eval_df}
    out = df
    for _name, op, params in compiled:
        for key in op.context:
            if key not in params and context.get(key) is not None:
                params = {**params, key: context[key]}
        out = op.fn(out, text_col, **params)
    return out
