"""Text-analysis expressions for the documents table (north-star extension).

All pure built-in column expressions (JVM-side, codegen-friendly) so they run
at scan speed over 100 TB of text — no Python in the hot path. Each helper has
a DuckDB-SQL twin next to its query in plans/llm_ops.py (and plans/core.py for
the TPC-H-shaped set) for oracle verification.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Small multilingual stopword marker sets for the n-gram language heuristic.
# Deliberately tiny and deterministic — this is a heuristic scorer, not a model.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "a"],
    "es": ["el", "la", "de", "que", "los"],
    "fr": ["le", "la", "les", "des", "une"],
    "de": ["der", "die", "und", "das", "ein"],
}

STOPWORDS_EN = ["the", "a", "an", "and", "or", "of", "to", "in", "is", "it"]

# BPE-ish token pattern: runs of word chars OR single non-space punctuation —
# approximates subword tokenizer pre-splitting (public GPT-2 style regex,
# simplified to what Spark/DuckDB regex engines both support).
BPE_SPLIT_PATTERN = r"[A-Za-z0-9_]+|[^A-Za-z0-9_\s]"


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def normalize_text(col: Column | str) -> Column:
    """lower → strip non-alnum → collapse whitespace → trim.

    The canonical form used for fingerprinting and exact dedup.
    """
    c = _c(col)
    out = F.lower(c)
    out = F.regexp_replace(out, r"[^a-z0-9\s]", " ")
    out = F.regexp_replace(out, r"\s+", " ")
    return F.trim(out)


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization → array<string>; empty text → empty array."""
    c = F.trim(_c(col))
    return F.when(F.length(c) == 0, F.array().cast("array<string>")).otherwise(
        F.split(c, r"\s+")
    )


def token_count(col: Column | str) -> Column:
    """Whitespace token count (long)."""
    return F.size(tokens(col)).cast("long")


def bpe_token_count(col: Column | str) -> Column:
    """Regex-based BPE-ish token count: word runs + punctuation singletons."""
    c = _c(col)
    return F.size(
        F.filter(
            F.regexp_extract_all(c, F.lit(BPE_SPLIT_PATTERN), F.lit(0)),
            lambda t: F.length(t) > 0,
        )
    ).cast("long")


def doc_fingerprint(col: Column | str) -> Column:
    """Deterministic content fingerprint: md5 of the normalized text.

    md5 over utf-8 bytes is portable (identical in Spark, DuckDB, Python),
    which makes exact/near-dup results oracle-checkable across engines.
    """
    return F.md5(normalize_text(col).cast("binary"))


def quality_metrics(col: Column | str) -> dict[str, Column]:
    """Heuristic quality scores: length, token stats, punct/stopword ratios.

    Returns named columns; callers select the ones they need. Ratios are
    guarded against empty documents (0-token → 0.0 ratio, not NULL/NaN).
    """
    c = _c(col)
    toks = tokens(col)
    n_tok = F.size(toks).cast("double")
    n_chars = F.length(c).cast("double")
    n_punct = F.length(c) - F.length(F.regexp_replace(c, r"[^\w\s]", ""))
    tok_chars = F.aggregate(
        F.transform(toks, lambda t: F.length(t).cast("long")), F.lit(0).cast("long"), lambda a, x: a + x
    ).cast("double")
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS_EN])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, F.lower(t))))
    safe = lambda num, den: F.when(den > 0, num / den).otherwise(F.lit(0.0))  # noqa: E731
    return {
        "n_chars": F.length(c).cast("long"),
        "n_tokens": n_tok.cast("long"),
        "avg_token_len": F.round(safe(tok_chars, n_tok), 4),
        "punct_ratio": F.round(safe(n_punct.cast("double"), n_chars), 4),
        "stopword_ratio": F.round(safe(n_stop.cast("double"), n_tok), 4),
    }


def language_scores(toks: Column) -> dict[str, Column]:
    """Per-language marker-hit counts over a TOKEN ARRAY column.

    Callers should materialize the token array (and, for wide score reuse,
    each score) as real columns before folding them with
    :func:`language_argmax` — feeding raw expressions here makes every
    downstream reference re-evaluate the tokenization (see
    plans/llm_ops.q_doc_langid)."""
    scores: dict[str, Column] = {}
    for lang, markers in sorted(LANG_MARKERS.items()):
        marker_arr = F.array(*[F.lit(m) for m in markers])
        scores[lang] = F.size(F.filter(toks, lambda t: F.array_contains(marker_arr, F.lower(t))))
    return scores


def language_argmax(scores: dict[str, Column]) -> Column:
    """Argmax fold over per-language score columns.

    Ties break by language code order (deterministic); no hits → 'und'.
    THE one tie-break implementation — every language-ID surface goes
    through here. The fold nests each score expression O(2^langs) times,
    so pass materialized score ATTRIBUTES, not computed expressions.
    """
    best = F.lit("und")
    best_score = F.lit(0)
    # Fold right-to-left so earlier languages win ties (strict > comparison).
    for lang, score in sorted(scores.items(), reverse=True):
        best = F.when(score >= best_score, F.lit(lang)).otherwise(best)
        best_score = F.when(score >= best_score, score).otherwise(best_score)
    # Reverse fold makes later langs lose ties to earlier ones only if we use
    # >= going backwards; a no-marker doc must still be 'und':
    return F.when(best_score > 0, best).otherwise(F.lit("und"))


def language_id(col: Column | str) -> Column:
    """Marker-word language heuristic: argmax of per-language marker hits.

    Single-expression convenience form; for per-doc scans over big corpora
    prefer materializing :func:`language_scores` columns and folding with
    :func:`language_argmax` (this inline form re-tokenizes per score and
    nests the fold exponentially)."""
    return language_argmax(language_scores(tokens(col)))
