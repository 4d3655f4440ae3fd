"""Text features (F1/F2/F6, SURVEY.md §2.8) — the tagger->chunker->feature
stages of the reference, re-expressed as columnar ops.

The reference ran a per-line Python loop over POS-tagged text to emit chunk
features (first_word, last_word, plen, suffix3/4/5, prev/next context).
Here the cheap features are pure Catalyst expressions (whole-stage codegen,
zero Python) and the n-gram/signature features are ONE vectorized Arrow
pandas UDF over token arrays — no per-row Python UDFs anywhere
(BASELINE.json:15 input_hint).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

# ---------------------------------------------------------------- F1 tokenize

_TOKEN_RE = r"[A-Za-z0-9_]+|[^A-Za-z0-9_\s]"


def tokenize(col: str | Column, mode: str = "whitespace") -> Column:
    """text -> array<string>. 'whitespace' for the pre-normalized corpora;
    'bpeish' uses a word/punct regex closer to a BPE pre-tokenizer."""
    c = F.col(col) if isinstance(col, str) else col
    if mode == "whitespace":
        return F.split(c, r"\s+")
    return F.regexp_extract_all(c, F.lit(_TOKEN_RE), 0)


# ----------------------------------------------- cheap chunk features (F2 lite)


def with_text_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Catalyst-only chunk features: plen, first_word, last_word, suffix3/4/5
    (mirrors the reference's chunk feature names)."""
    toks = tokenize(text_col)
    last = F.element_at(toks, -1)
    return (
        df.withColumn("n_chars_f", F.length(text_col).cast("long"))
        .withColumn("plen", F.size(toks).cast("long"))
        .withColumn("first_word", F.element_at(toks, 1))
        .withColumn("last_word", last)
        .withColumn("suffix3", F.substring(last, -3, 3))
        .withColumn("suffix4", F.substring(last, -4, 4))
        .withColumn("suffix5", F.substring(last, -5, 5))
    )


def with_quality_features(
    df: DataFrame,
    text_col: str = "text",
    stopwords: tuple[str, ...] = ("the", "a", "of", "and", "to", "in", "is"),
) -> DataFrame:
    """Quality-scoring features for training-data pipelines: length, token
    stats, stopword ratio, punctuation ratio, uppercase ratio. All Catalyst."""
    toks = tokenize(text_col)
    n = F.size(toks)
    sw = F.array([F.lit(s) for s in stopwords])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(sw, F.lower(t))))
    n_punct = F.length(text_col) - F.length(F.regexp_replace(text_col, r"[^\w\s]", ""))
    n_upper = F.length(text_col) - F.length(F.regexp_replace(text_col, r"[A-Z]", ""))
    safe_len = F.greatest(F.length(text_col), F.lit(1))
    return (
        df.withColumn("n_tokens", n.cast("long"))
        .withColumn("stopword_ratio", n_stop / F.greatest(n, F.lit(1)))
        .withColumn("punct_ratio", n_punct / safe_len)
        .withColumn("upper_ratio", n_upper / safe_len)
        .withColumn(
            "quality_score",
            F.round(
                F.least(F.lit(1.0), F.log1p(n) / F.lit(5.0))
                * (F.lit(1.0) - (n_punct / safe_len)),
                6,
            ),
        )
    )


# ------------------------------------------------------- F6 vectorized n-gram

NGRAM_STRUCT = T.StructType(
    [
        T.StructField("plen", T.LongType()),
        T.StructField("n_distinct", T.LongType()),
        T.StructField("bigram_distinct", T.LongType()),
        T.StructField("trigram_distinct", T.LongType()),
        T.StructField("ngram_sig", T.LongType()),
        T.StructField("distinct_ratio", T.DoubleType()),
    ]
)

_FNV_OFFSET = np.uint64(0xCBF29CE484222325)
_FNV_PRIME = np.uint64(0x100000001B3)


def _fnv1a_tokens(tokens: list[str]) -> int:
    """Order-sensitive 64-bit FNV-1a over the token stream — the document
    fingerprint (rolling-hash analogue), deterministic across engines."""
    h = _FNV_OFFSET
    for t in tokens:
        for b in t.encode():
            h = (h ^ np.uint64(b)) * _FNV_PRIME
        h = (h ^ np.uint64(0x20)) * _FNV_PRIME
    return int(h.astype(np.int64))


@pandas_udf(NGRAM_STRUCT)
def ngram_features(text: pd.Series) -> pd.DataFrame:
    """Arrow-batched n-gram/signature features (the reference's chunker
    feature pass as one columnar op). Executed once per Arrow batch —
    pandas/numpy inside, no Spark-row-level Python."""
    tok_lists = text.fillna("").str.split()
    n_tokens, n_distinct, bi, tri, sig = [], [], [], [], []
    for toks in tok_lists:
        n_tokens.append(len(toks))
        n_distinct.append(len(set(toks)))
        bi.append(len({(a, b) for a, b in zip(toks, toks[1:])}))
        tri.append(len({(a, b, c) for a, b, c in zip(toks, toks[1:], toks[2:])}))
        sig.append(_fnv1a_tokens(toks))
    nt = np.asarray(n_tokens, dtype=np.float64)
    nd = np.asarray(n_distinct, dtype=np.float64)
    return pd.DataFrame(
        {
            "plen": pd.Series(n_tokens, dtype="int64"),
            "n_distinct": pd.Series(n_distinct, dtype="int64"),
            "bigram_distinct": pd.Series(bi, dtype="int64"),
            "trigram_distinct": pd.Series(tri, dtype="int64"),
            "ngram_sig": pd.Series(sig, dtype="int64"),
            "distinct_ratio": np.where(nt > 0, nd / np.maximum(nt, 1.0), 0.0),
        }
    )


def with_ngram_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    nf = ngram_features(F.col(text_col)).alias("__nf")
    out = df.withColumn("__nf", nf)
    for f in NGRAM_STRUCT.fields:
        out = out.withColumn(f.name, F.col(f"__nf.{f.name}"))
    return out.drop("__nf")


# ----------------------------------------------------------- language ID

_LANG_MARKERS = {
    "en": ("the", "and", "of", "to", "is"),
    "es": ("el", "la", "de", "que", "los"),
    "de": ("der", "die", "und", "das", "ist"),
    "fr": ("le", "la", "les", "et", "des"),
}


def with_lang_id(df: DataFrame, text_col: str = "text",
                 out_col: str = "lang_pred") -> DataFrame:
    """n-gram-heuristic language ID: argmax over per-language stopword hit
    counts, 'und' (undetermined) when nothing matches. Pure Catalyst."""
    toks = tokenize(text_col)
    scores = []
    for lang, markers in _LANG_MARKERS.items():
        arr = F.array([F.lit(m) for m in markers])
        s = F.size(F.filter(toks, lambda t: F.array_contains(arr, F.lower(t))))
        scores.append(F.struct(s.alias("s"), F.lit(lang).alias("l")))
    best = F.array_max(F.array(*scores))
    return df.withColumn(
        out_col, F.when(best["s"] > 0, best["l"]).otherwise(F.lit("und"))
    )
