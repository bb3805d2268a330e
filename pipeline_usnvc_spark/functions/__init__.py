from pipeline_usnvc_spark.functions.text import (
    clean_string,
    display_title,
    split_flagged_codes,
    tokens,
    token_count,
    word_shingles,
    doc_fingerprint,
    quality_score_cols,
    lang_id,
)
from pipeline_usnvc_spark.functions.vectors import (
    to_double_array,
    dot,
    l2_norm,
    cosine_similarity,
)

__all__ = [
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
