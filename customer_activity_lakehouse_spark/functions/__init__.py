from .scalars import capitalize_first, derive_date_str, parse_ts
from .text import (
    doc_fingerprint,
    language_argmax,
    language_id,
    language_scores,
    normalize_text,
    quality_metrics,
    token_count,
    tokens,
)
from .vectors import cosine_similarity, dot, l2_norm

__all__ = [
    "parse_ts",
    "derive_date_str",
    "capitalize_first",
    "tokens",
    "token_count",
    "normalize_text",
    "doc_fingerprint",
    "quality_metrics",
    "language_argmax",
    "language_id",
    "language_scores",
    "dot",
    "l2_norm",
    "cosine_similarity",
]
