from tgist_features_spark.functions.text import (  # noqa: F401
    NGRAM_STRUCT,
    ngram_features,
    tokenize,
    with_lang_id,
    with_ngram_features,
    with_quality_features,
    with_text_features,
)
