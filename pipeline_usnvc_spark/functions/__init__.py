from pipeline_usnvc_spark.functions.text import (
    EMAIL_RE,
    PHONE_RE,
    clean_string,
    display_title,
    doc_fingerprint,
    lang_id,
    quality_score_cols,
    redact_pii,
    split_flagged_codes,
    token_count,
    tokens,
    word_shingles,
)
from pipeline_usnvc_spark.functions.vectors import (
    to_double_array,
    dot,
    l2_norm,
    cosine_similarity,
)

__all__ = [
    "EMAIL_RE",
    "PHONE_RE",
    "redact_pii",
    "clean_string",
    "display_title",
    "split_flagged_codes",
    "tokens",
    "token_count",
    "word_shingles",
    "doc_fingerprint",
    "quality_score_cols",
    "lang_id",
    "to_double_array",
    "dot",
    "l2_norm",
    "cosine_similarity",
]
