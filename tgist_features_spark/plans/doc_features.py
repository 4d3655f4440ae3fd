"""Fused per-document feature extraction (the reference's core use case:
tagger -> chunker -> feature stages over a document corpus, re-expressed as
ONE columnar pass).

Single scan, zero shuffles: every feature below is either a Catalyst
expression (chunk/quality/lang/fingerprint — whole-stage codegen) or part
of the one vectorized Arrow n-gram kernel (functions/text.py). Each
feature family is individually oracle-gated through the query registry
(`quality`, `lang_id`, `ngram_stats`, `tokenize`, `bpeish_tokens`,
`fingerprint`); this plan is their production composition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tgist_features_spark.functions.text import (
    with_lang_id,
    with_ngram_features,
    with_quality_features,
    with_text_features,
)

DOC_FEATURE_COLS = [
    "n_chars_f", "plen", "first_word", "last_word", "suffix3", "suffix4",
    "suffix5", "n_tokens", "stopword_ratio", "punct_ratio", "upper_ratio",
    "quality_score", "lang_pred", "n_distinct", "bigram_distinct",
    "trigram_distinct", "ngram_sig", "distinct_ratio", "fp",
]


def doc_features(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """documents -> one wide feature row per document."""
    out = with_text_features(docs, text_col)
    out = with_quality_features(out, text_col)
    out = with_lang_id(out, text_col)
    out = with_ngram_features(out, text_col)
    return out.withColumn("fp", F.md5(F.col(text_col)))
