"""Text analysis over document corpora — language-ID, quality scoring, token
counting, fingerprinting (north-star operators; graded alongside SURVEY §2).

Everything here is built from JVM-side expressions (split / regexp /
higher-order array functions) so the hot path stays inside whole-stage
codegen — no Python crosses the row stream.  Each operator has an exact
ANSI-SQL twin (DuckDB oracle) because the heuristics are deliberately
regex/count-based rather than model-based.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "script_count_exprs",
    "vocab_kl_by_group",
    "readability_counts",
    "c4_rule_exprs",
    "SCRIPT_BLOCKS",
    "tokens",
    "token_count",
    "ngrams_from",
    "word_ngrams",
    "char_ngrams",
    "norm_text",
    "ascii_norm_text",
    "lang_hits_from",
    "lang_id_from",
    "lang_id_expr",
    "quality_exprs",
    "char_entropy_from",
    "char_entropy_expr",
    "fingerprint",
    "rolling_fingerprints",
    "rolling_fingerprints_from",
    "hashed_doc_vectors",
]

#: token = maximal ASCII alnum/apostrophe run, matched on the ORIGINAL text
#: and lowercased per token.  Deliberately not lower-then-match: Unicode
#: lowercasing differs between engines (Java vs utf8proc disagree on 'İ' and
#: friends), while ASCII-class matching + ASCII lowering is engine-invariant.
#: Non-ASCII characters act as token separators.
_TOKEN_RE = "[A-Za-z0-9']+"


def tokens(col: Column | str) -> Column:
    """Lowercased word tokens (BPE-ish: ASCII alnum runs, apostrophes kept)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(
        F.regexp_extract_all(c, F.lit(_TOKEN_RE), F.lit(0)), lambda t: F.lower(t)
    )


def token_count(col: str) -> Column:
    return F.size(tokens(col))


def ngrams_from(toks: Column, n: int) -> Column:
    """n-gram shingles from an ALREADY-PROJECTED token-array column.

    ``toks`` must be a cheap reference (an aliased column), not an inline
    ``tokens(...)`` expression: the input is referenced once per output
    shingle inside the ``transform`` lambda, where Catalyst performs no
    common-subexpression elimination.  An inline tokenization there costs
    O(tokens) regex extractions **per shingle** — measured 12× slower at
    sf0.1.  Hot paths therefore project ``tokens(text).alias("__toks")``
    first (CollapseProject keeps the boundary: the alias is non-cheap and
    multiply referenced), then call this on the alias.
    """
    return F.when(F.size(toks) < n, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - n),
            lambda i: F.array_join(F.slice(toks, i + 1, n), " "),
        )
    )


def word_ngrams(col: str, n: int) -> Column:
    """Word n-gram shingles as strings (for MinHash / Jaccard).

    Convenience inline form for tiny/cold paths ONLY — it re-tokenizes per
    shingle (see :func:`ngrams_from`); hot paths must pre-project tokens.
    """
    return ngrams_from(tokens(col), n)


def char_ngrams(col: str, n: int) -> Column:
    """Character n-grams of the lowercased, whitespace-collapsed text.

    Inline form; pre-project :func:`norm_text` and slice that alias on hot
    paths (same re-evaluation trap as :func:`ngrams_from`).
    """
    norm = norm_text(col)
    return F.when(F.length(norm) < n, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(0), F.length(norm) - n),
            lambda i: norm.substr(i + F.lit(1), F.lit(n)),
        )
    )


def norm_text(col: Column | str) -> Column:
    """Lowercased, whitespace-collapsed text (the char-window normal form)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(F.lower(c), r"\s+", " ")


def ascii_norm_text(col: Column | str) -> Column:
    """ASCII-restricted normal form: non-printable-ASCII stripped BEFORE
    lowering, then whitespace-collapsed.  ASCII lowercasing is
    engine-invariant while Unicode lowering is not (Java vs utf8proc
    disagree on İ and friends), and stripping first also removes the
    UTF-16-unit vs codepoint length divergence on astral-plane input — the
    normal form every oracle-paired char-level operator builds on."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(
        F.lower(F.regexp_replace(c, "[^ -~]", "")), r"\s+", " "
    )


# ---------------------------------------------------------------------------
# Language ID: stopword-hit scoring (deterministic n-gram heuristic)
# ---------------------------------------------------------------------------

#: high-frequency function words per language; hits are counted as token-set
#: membership over :func:`tokens` (no \b regexes — word-boundary semantics
#: around non-ASCII text are engine-dependent).  Deliberately small: the
#: point is the *operator shape* (argmax over per-language match counts),
#: which scales to real lexicons.
LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "for", "with", "was"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "mit", "ein", "eine", "zu"],
    "fr": ["le", "la", "les", "et", "est", "une", "pour", "dans", "que", "des"],
    "es": ["el", "la", "los", "las", "es", "una", "por", "para", "con", "del"],
    "it": ["il", "la", "che", "di", "e", "un", "una", "per", "non", "sono"],
}


def lang_hits_from(toks: Column, lang: str) -> Column:
    """Marker-hit count from an already-projected token-array column."""
    words = F.array(*[F.lit(w) for w in LANG_MARKERS[lang]])
    return F.size(F.filter(toks, lambda t: F.array_contains(words, t)))


def lang_hits(col: str, lang: str) -> Column:
    return lang_hits_from(tokens(col), lang)


def lang_id_from(toks: Column, *, min_hits: int = 1) -> Column:
    """:func:`lang_id_expr` over an already-projected token array — use this
    on hot paths: the inline form tokenizes once per candidate language."""
    langs = sorted(LANG_MARKERS)
    pairs = F.array(
        *[
            F.struct(lang_hits_from(toks, lg).alias("hits"), F.lit(lg).alias("lang"))
            for lg in langs
        ]
    )
    best = F.aggregate(
        pairs,
        F.struct(F.lit(-1).alias("hits"), F.lit("und").alias("lang")),
        lambda acc, p: F.when(p["hits"] > acc["hits"], p).otherwise(acc),
    )
    return F.when(best["hits"] < min_hits, F.lit("und")).otherwise(best["lang"])


def lang_id_expr(col: str, *, min_hits: int = 1) -> Column:
    """argmax over language marker-hit counts; 'und' (undetermined) when no
    language reaches ``min_hits``.  Ties break to the alphabetically-first
    language code: the fold keeps the incumbent unless a candidate is
    STRICTLY better, and candidates arrive in sorted order — ``array_max``
    over (hits, lang) would invert that (later code wins ties).

    Inline convenience form; hot paths project ``tokens(col)`` once and call
    :func:`lang_id_from` on the alias (one tokenization instead of one per
    candidate language)."""
    return lang_id_from(tokens(col), min_hits=min_hits)


# ---------------------------------------------------------------------------
# Quality scoring
# ---------------------------------------------------------------------------


def quality_exprs(col: str) -> dict[str, Column]:
    """Length / ratio features used for corpus filtering.

    Ratios are over total characters (n_chars>0 guarded); stopword ratio is
    English-marker hits over token count.
    """
    n_chars = F.length(F.col(col))
    toks = token_count(col)
    alpha = F.length(F.regexp_replace(F.col(col), "[^A-Za-z]", ""))
    digits = F.length(F.regexp_replace(F.col(col), "[^0-9]", ""))
    punct = F.length(F.regexp_replace(F.col(col), r"[^.,;:!?'\"()\[\]-]", ""))
    spaces = F.length(F.regexp_replace(F.col(col), r"[^ \t\n]", ""))
    stop_hits = lang_hits(col, "en")
    nz = F.when(n_chars > 0, n_chars.cast("double"))
    return {
        "n_chars": n_chars.cast("long"),
        "n_tokens": toks.cast("long"),
        "alpha_ratio": F.round(alpha / nz, 4),
        "digit_ratio": F.round(digits / nz, 4),
        "punct_ratio": F.round(punct / nz, 4),
        "space_ratio": F.round(spaces / nz, 4),
        "stopword_ratio": F.round(
            stop_hits / F.when(toks > 0, toks.cast("double")), 4
        ),
        "mean_token_len": F.round(
            F.when(
                toks > 0,
                F.aggregate(
                    tokens(col), F.lit(0).cast("long"), lambda a, t: a + F.length(t)
                ).cast("double")
                / toks,
            ),
            4,
        ),
    }


def with_quality(df: DataFrame, col: str = "text") -> DataFrame:
    return df.withColumns(quality_exprs(col))


def char_entropy_from(norm: Column) -> Column:
    """Shannon character entropy (nats) from an ALREADY-PROJECTED
    normalized-text column — the standard gibberish/binary-noise filter
    (low entropy = repeated filler, high = random bytes).

    Zero-shuffle formulation: the per-char histogram is computed as
    ``length(s) - length(replace(s, c, ''))`` over the SORTED distinct-char
    array, so no explode/groupBy touches the row stream; cost is
    O(distinct_chars × len) per doc with distinct_chars ≤ charset size.
    The fold runs over a sorted array in both engines, making the float
    accumulation order—and therefore the oracle hash—deterministic.
    Identity used: H = ln(n) - (Σ cnt·ln cnt)/n, so only counts (exact
    integers) enter the lambda and the final expression does one division.
    """
    chars = F.array_sort(F.array_distinct(F.regexp_extract_all(norm, F.lit(r"[\s\S]"), F.lit(0))))
    n = F.length(norm)
    # count each char ONCE into an array, then fold — the fold lambda
    # references its argument twice, and an inline cnt() there would run
    # the length+replace pair twice per char (no CSE inside HOF lambdas).
    counts = F.transform(
        chars, lambda c: (n - F.length(F.replace(norm, c, F.lit("")))).cast("double")
    )
    sum_clnc = F.aggregate(
        counts, F.lit(0.0), lambda acc, x: acc + x * F.log(x)
    )
    return F.when(
        n > 0, F.round(F.log(n.cast("double")) - sum_clnc / n, 4)
    ).otherwise(F.lit(0.0))


def char_entropy_expr(col: str) -> Column:
    """Inline convenience form of :func:`char_entropy_from` over the
    ASCII-restricted normal form (re-normalizes inside the fold — tiny/cold
    paths only; hot paths project :func:`ascii_norm_text` once and pass the
    alias)."""
    return char_entropy_from(ascii_norm_text(col))


# ---------------------------------------------------------------------------
# Fingerprinting
# ---------------------------------------------------------------------------


def fingerprint(col: str) -> Column:
    """Whole-document fingerprint: md5 of the casefolded, alnum-only text.
    Robust to whitespace/punctuation edits; used as the exact-dedup key."""
    norm = F.lower(F.regexp_replace(F.col(col), "[^A-Za-z0-9]", ""))
    return F.md5(norm)


def rolling_fingerprints_from(
    norm: Column, *, window: int = 64, stride: int = 32, hash_fn: str = "xxhash64"
) -> Column:
    """Rolling-hash fingerprints from an ALREADY-PROJECTED normalized-text
    column (see :func:`ngrams_from` for why the input must be an alias):
    hash of each ``window``-char slice at ``stride`` offsets — the
    winnowing-style shape used for partial-overlap detection at corpus
    scale.  ``hash_fn``: xxhash64 (production) or the dual-implementable
    md5 family (oracle-checkable; see engine.extended.dedup.md5_long)."""
    from engine.extended.dedup import _hash64

    n = F.length(norm)
    starts = F.when(n < window, F.array(F.lit(0))).otherwise(
        F.sequence(F.lit(0), F.greatest(n - window, F.lit(0)), F.lit(stride))
    )
    return F.transform(
        starts, lambda s: _hash64(norm.substr(s + F.lit(1), F.lit(window)), hash_fn)
    )


def rolling_fingerprints(col: str, *, window: int = 64, stride: int = 32) -> Column:
    """Inline form of :func:`rolling_fingerprints_from` (re-normalizes per
    slice — tiny/cold paths only; hot paths project :func:`norm_text` first)."""
    return rolling_fingerprints_from(norm_text(col), window=window, stride=stride)


def hashed_doc_vectors(
    df: "DataFrame",
    *,
    dim: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
    hash_fn: str = "md5",
    round_to: int = 6,
) -> "DataFrame":
    """Feature-hashed document vectors: token counts bucketed into ``dim``
    slots by hash, L2-normalized — the model-free embedding bridge that
    lets the ENTIRE vector stack (cosine/LSH/IVF/PQ ANN, kNN joins,
    semdedup, JL/MRL/int8 tiers) run over raw text with no trained model
    in the loop (Weinberger et al.'s hashing trick).

    Returns (id, vec) with ``vec`` a dense array<double>; documents with
    no tokens drop out (no direction exists).  Counts are exact integers
    and the norm is one sqrt of an exact integer sum, so components are
    engine-exact after rounding — md5 mode makes the whole construction
    SQL-oracle-checkable.

    Scale shape: explode → (id, bucket) count with map-side partial
    aggregation, then ONE per-doc aggregate assembling the dense array
    from a ``map_from_entries`` lookup — the shuffle carries at most
    ``dim`` entries per doc, never tokens.
    """
    if dim < 1:
        raise ValueError(f"dim must be >= 1, got {dim}")
    from engine.extended.dedup import _hash64

    toks = df.select(
        F.col(id_col).alias("id"), F.explode(tokens(text_col)).alias("tok")
    )
    counts = toks.groupBy(
        "id",
        F.pmod(
            _hash64(F.concat(F.lit("dv|"), F.col("tok")), hash_fn), F.lit(dim)
        ).alias("bucket"),
    ).agg(F.count(F.lit(1)).alias("cnt"))
    entries = counts.groupBy("id").agg(
        F.map_from_entries(F.collect_list(F.struct("bucket", "cnt"))).alias("__m")
    )
    dense = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda i: F.coalesce(F.element_at("__m", i.cast("long")), F.lit(0)).cast("long"),
    )
    with_vec = entries.withColumn("__raw", dense)
    # norm projected behind an alias BEFORE the rescale transform (HOF
    # lambdas get no CSE — the O(d^2) trap quantize_int8 documents);
    # sumsq is exact integer, its sqrt one correctly-rounded IEEE op
    nrm = F.sqrt(
        F.aggregate(
            F.transform("__raw", lambda x: (x * x).cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    with_nrm = with_vec.withColumn("__n", nrm)
    vec = F.transform(
        "__raw", lambda x: F.round(x.cast("double") / F.col("__n"), round_to)
    )
    return with_nrm.select(F.col("id").alias(id_col), vec.alias("vec"))


# ---------------------------------------------------------------------------
# Script composition (writing-system profiling)
# ---------------------------------------------------------------------------

#: BMP script blocks profiled by :func:`script_count_exprs`.  All ranges are
#: single UTF-16 units, which is what makes the length-difference counting
#: trick engine-invariant even when astral-plane characters are present in
#: the surrounding text (they stay in both strings and cancel).
SCRIPT_BLOCKS = {
    "latin_chars": "[A-Za-z]",
    "digit_chars": "[0-9]",
    "cyrillic_chars": r"[\x{0400}-\x{04FF}]",
    "greek_chars": r"[\x{0370}-\x{03FF}]",
    "cjk_chars": r"[\x{4E00}-\x{9FFF}]",
    "arabic_chars": r"[\x{0600}-\x{06FF}]",
    # explicit ASCII set, not \s: Java includes VT (0x0B), RE2 does not
    "ws_chars": "[ \t\n\x0B\f\r]",
}


def script_count_exprs(col: str) -> dict[str, Column]:
    """Per-document character counts by writing system — the corpus
    composition signal (mixed-script spam, wrong-language contamination,
    transliteration artifacts) language-ID alone misses.

    Counts are computed as ``length(s) - length(regexp_replace(s, block,
    ''))``: exact integers, zero shuffle, and engine-invariant because
    every profiled block is BMP (one UTF-16 unit — the difference cancels
    any astral-plane characters elsewhere in the text, sidestepping the
    unit-vs-codepoint ``length`` divergence the ASCII normal form
    documents).  Ratios are the caller's division to round.
    """
    c = F.col(col)
    n = F.length(c)
    return {
        name: (n - F.length(F.regexp_replace(c, pat, ""))).cast("long")
        for name, pat in SCRIPT_BLOCKS.items()
    }


def vocab_kl_by_group(
    df: DataFrame,
    *,
    group_col: str = "source",
    text_col: str = "text",
    round_to: int = 4,
) -> DataFrame:
    """Distribution drift per group: KL(P_group || Q_rest) between a
    group's unigram distribution and the rest of the corpus, add-1
    smoothed over the global vocabulary, summed over the group's PRESENT
    tokens (the observed-support variant — absent tokens would need a
    group × vocabulary expansion for a term that is near-constant).

    The corpus-drift / source-outlier signal of corpus curation: a source
    whose language diverges from the collection (spam farm, wrong
    language, machine-generated boilerplate) scores high.

    Returns (group, n_tokens, kl) with kl rounded — each term's ``ln`` is
    ulp territory, but term magnitudes (< 1e-2) against a 1e-4 rounding
    leave ~10 orders of margin.

    Scale shape: one explode, a (group, token) aggregate, a token-level
    aggregate joined back on the token key, and two broadcast scalars
    (global token count, vocabulary size) — the same partial-agg pipeline
    as TF-IDF; nothing is ever group × vocabulary.
    """
    tok = df.select(
        F.col(group_col).alias("grp"), F.explode(tokens(text_col)).alias("t")
    )
    gc = tok.groupBy("grp", "t").agg(F.count(F.lit(1)).alias("c_s"))
    tot_tok = gc.groupBy("t").agg(F.sum("c_s").alias("c_g"))
    per_grp = gc.groupBy("grp").agg(F.sum("c_s").alias("n_s"))
    # globals derive from tot_tok's OUTPUT, not a fourth pass over gc:
    # n_g = Σ c_g and v = |distinct t| = tot_tok's row count (counted via
    # IF(c_g > 0, 1) so the optimizer cannot prune c_g and de-canonicalize
    # the shared subtree — the tfidf_top_terms trap).  Combined with the
    # null-safe t join below (tokens are never NULL, so semantics are
    # identical, but plain equality would infer isnotnull(t) into ONLY the
    # join's copies of gc), the four gc consumers collapse to two
    # canonical classes and AQE's stage reuse evaluates gc twice, not
    # four times (r10 reuse audit: 4 scans + 4 tokenizations → 2).
    globals_ = tot_tok.agg(
        F.sum("c_g").alias("n_g"),
        F.count(F.when(F.col("c_g") > 0, 1)).alias("v"),
    )
    j = (
        gc.alias("g")
        .join(
            tot_tok.alias("tt"),
            F.col("g.t").eqNullSafe(F.col("tt.t")),
        )
        .select("g.*", "tt.c_g")
        .join(F.broadcast(per_grp), "grp")
        .crossJoin(F.broadcast(globals_))
    )
    p = (F.col("c_s") + 1) / (F.col("n_s") + F.col("v"))
    q = (F.col("c_g") - F.col("c_s") + 1) / (
        F.col("n_g") - F.col("n_s") + F.col("v")
    )
    contrib = p * F.log(p / q)
    return (
        j.groupBy("grp")
        .agg(
            F.first("n_s").alias("n_tokens"),
            F.round(F.sum(contrib), round_to).alias("kl"),
        )
        .select(F.col("grp").alias(group_col), "n_tokens", "kl")
    )


#: the Gopher rule battery's "must contain 2 of these" stop-word set
#: (Rae et al. 2021, appendix A1.1 — public).  Deliberately the paper's
#: exact eight words, not LANG_MARKERS: the rule is a spam/gibberish gate,
#: not language ID.
GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]


def gopher_rule_exprs(toks: Column, raw: Column | str) -> dict[str, Column]:
    """Gopher-style document quality rule battery (Rae et al. 2021 §A1.1):
    word-count bounds, mean-word-length bounds, symbol-to-word ratio
    (``#`` and ellipsis), alphabetic-word fraction, and stop-word presence
    — the composite heuristic filter every web-scale corpus pipeline runs
    before dedup/tokenization, with per-rule flags for failure attribution.

    ``toks`` must be an already-projected token-array alias (the
    :func:`ngrams_from` re-evaluation trap); ``raw`` is the original text
    column for symbol counting.

    Every keep flag compares INTEGERS (thresholds cross-multiplied:
    ``mean_len >= 3`` becomes ``sum_len >= 3·n``), so the filter decision
    is engine-exact — no float knife-edge can disagree with an oracle.
    The reported ratio columns are rounded display values only; flags do
    not derive from them.  Zero shuffles, pure codegen expressions.
    """
    c = F.col(raw) if isinstance(raw, str) else raw
    n = F.size(toks).cast("long")
    sum_len = F.aggregate(
        toks, F.lit(0).cast("long"), lambda a, t: a + F.length(t)
    )
    # symbol count: '#' + '…' + three-dot runs counted as len-diff/3
    # (exact: the diff is always a multiple of 3)
    n_hash = F.length(c) - F.length(F.regexp_replace(c, "#", ""))
    n_uni_ell = F.length(c) - F.length(F.regexp_replace(c, "…", ""))
    n_dot_ell = (
        (F.length(c) - F.length(F.regexp_replace(c, r"\.\.\.", ""))) / 3
    ).cast("long")
    n_sym = (n_hash + n_uni_ell).cast("long") + n_dot_ell
    n_alpha = F.size(F.filter(toks, lambda t: t.rlike("[a-z]"))).cast("long")
    stop_arr = F.array(*[F.lit(w) for w in GOPHER_STOPWORDS])
    n_stop = F.size(F.array_intersect(F.array_distinct(toks), stop_arr)).cast(
        "long"
    )
    nz = F.when(n > 0, n.cast("double"))
    flag_words = ((n >= 50) & (n <= 100000)).cast("int")
    flag_word_len = (
        (n > 0) & (sum_len >= 3 * n) & (sum_len <= 10 * n)
    ).cast("int")
    flag_symbol = (10 * n_sym <= n).cast("int")
    flag_alpha = ((n > 0) & (5 * n_alpha >= 4 * n)).cast("int")
    flag_stop = (n_stop >= 2).cast("int")
    keep = (
        (flag_words == 1)
        & (flag_word_len == 1)
        & (flag_symbol == 1)
        & (flag_alpha == 1)
        & (flag_stop == 1)
    ).cast("int")
    return {
        "n_words": n,
        "mean_word_len": F.round(sum_len / nz, 4),
        "symbol_ratio": F.round(n_sym / nz, 4),
        "alpha_word_frac": F.round(n_alpha / nz, 4),
        "n_stop_distinct": n_stop,
        "flag_words": flag_words,
        "flag_word_len": flag_word_len,
        "flag_symbol": flag_symbol,
        "flag_alpha": flag_alpha,
        "flag_stop": flag_stop,
        "keep": keep,
    }


def c4_rule_exprs(text: Column | str) -> dict[str, Column]:
    """C4-style line-level quality rule battery (Raffel et al. 2020 §2.2):
    a line survives iff it ends in terminal punctuation (``.!?"``), has at
    least 5 space-separated words, and does not mention "javascript"; the
    document survives iff the kept text still has ≥3 sentence terminators
    and the raw text contains neither "lorem ipsum" nor a curly brace
    (the code-page exclusion).  Companion to :func:`gopher_rule_exprs`
    (document-level heuristics) — C4 filters WITHIN the document first.

    Input must be a text column with ``\\n`` line separators.  Returns
    per-rule counters plus ``clean_text`` (the kept-line reassembly) and
    the composite ``keep``.  Every decision compares integers or exact
    string predicates — no float knife-edges.  Zero shuffles, one codegen
    scan; line handling is array-expression-level (split/filter/join),
    never an explode, so the pass stays row-local at any corpus size.
    """
    c = F.col(text) if isinstance(text, str) else text
    lines = F.split(c, "\n")

    def _n_words(line: Column) -> Column:
        # split on single spaces + drop empties: engine-invariant word
        # count (regex \s+ class semantics differ across engines)
        return F.size(F.filter(F.split(line, " "), lambda w: w != F.lit("")))

    def _kept(line: Column) -> Column:
        return (
            line.rlike('[.!?"]$')
            & (_n_words(line) >= 5)
            & ~F.lower(line).rlike("javascript")
        )

    kept_lines = F.filter(lines, _kept)
    clean = F.array_join(kept_lines, "\n")
    n_sent = (
        F.length(clean) - F.length(F.regexp_replace(clean, "[.!?]", ""))
    ).cast("long")
    has_lorem = F.lower(c).rlike("lorem ipsum")
    has_brace = c.rlike("\\{")
    flag_sentences = (n_sent >= 3).cast("int")
    flag_lorem = (~has_lorem).cast("int")
    flag_brace = (~has_brace).cast("int")
    keep = ((n_sent >= 3) & ~has_lorem & ~has_brace).cast("int")
    return {
        "n_lines": F.size(lines).cast("long"),
        "n_kept_lines": F.size(kept_lines).cast("long"),
        "n_sentences": n_sent,
        "flag_sentences": flag_sentences,
        "flag_lorem": flag_lorem,
        "flag_brace": flag_brace,
        "keep": keep,
        "clean_text": clean,
    }


def readability_counts(col: str) -> dict[str, Column]:
    """Per-document integer counts for readability scoring: words (the
    standard tokenization), sentences (runs of ``.!?``, floored at 1 so
    fragments still score), and estimated syllables (vowel-group runs per
    word, floored at 1 per word — the classic approximation).

    Everything is exact integer counting (regexp matches), so any
    readability formula computed from AGGREGATED counts — rather than
    averaged per-doc floats — is engine-exact up to one final rounded
    division.
    """
    c = F.col(col)
    words = tokens(col)
    n_words = F.size(words).cast("long")
    n_sents = F.greatest(
        F.size(F.regexp_extract_all(c, F.lit(r"[.!?]+"), F.lit(0))),
        F.lit(1),
    ).cast("long")
    syl = F.aggregate(
        F.transform(
            words,
            lambda w: F.greatest(
                F.size(F.regexp_extract_all(w, F.lit("[aeiouy]+"), F.lit(0))),
                F.lit(1),
            ),
        ),
        F.lit(0),
        lambda acc, x: acc + x,
    ).cast("long")
    return {"n_words": n_words, "n_sentences": n_sents, "n_syllables": syl}
