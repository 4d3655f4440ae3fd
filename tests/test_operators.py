"""Unit tests for aggregates, pivots, salted aggregation, text functions."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from tgist_features_spark.functions.text import (
    with_lang_id,
    with_quality_features,
    with_text_features,
)
from tgist_features_spark.operators.aggregates import (
    per_entity_agg,
    role_tool_pivot,
    salted_agg,
)
from tgist_features_spark.sources.corpus import transcripts_df


def test_per_entity_agg_matches_pandas(spark, tiny_pdf):
    got = (
        per_entity_agg(transcripts_df(spark, tiny_pdf))
        .toPandas()
        .sort_values("conv_id")
        .reset_index(drop=True)
    )
    g = tiny_pdf.groupby("conv_id")
    ref = pd.DataFrame(
        {
            "n_turns": g.size(),
            "first_ts": g["ts"].min(),
            "last_ts": g["ts"].max(),
            "n_roles": g["role"].nunique(),
            "n_tools": g["tool"].nunique(),
            "total_chars": g["text"].apply(lambda s: s.str.len().sum()),
        }
    ).reset_index().sort_values("conv_id").reset_index(drop=True)
    assert (got["n_turns"].to_numpy() == ref["n_turns"].to_numpy()).all()
    assert (got["first_ts"].to_numpy() == ref["first_ts"].to_numpy()).all()
    assert (got["n_roles"].to_numpy() == ref["n_roles"].to_numpy()).all()
    assert (got["n_tools"].to_numpy() == ref["n_tools"].to_numpy()).all()
    assert (got["total_chars"].to_numpy() == ref["total_chars"].to_numpy()).all()


def test_role_pivot(spark, tiny_pdf):
    got = (
        role_tool_pivot(transcripts_df(spark, tiny_pdf))
        .toPandas()
        .sort_values("conv_id")
        .reset_index(drop=True)
    )
    for r in ["system", "user", "assistant", "tool"]:
        ref = (
            tiny_pdf[tiny_pdf["role"] == r]
            .groupby("conv_id")
            .size()
            .reindex(sorted(tiny_pdf["conv_id"].unique()), fill_value=0)
        )
        assert (got[f"n_{r}"].to_numpy() == ref.to_numpy()).all(), r


def test_salted_agg_equals_plain(spark, small_pdf):
    df = transcripts_df(spark, small_pdf)
    plain = (
        df.groupBy("conv_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.length("text")).alias("chars"),
            F.max("ts").alias("mx"),
        )
        .toPandas()
        .sort_values("conv_id")
        .reset_index(drop=True)
    )
    salted = (
        salted_agg(
            df,
            "conv_id",
            {
                "n": (F.count(F.lit(1)), F.sum),
                "chars": (F.sum(F.length("text")), F.sum),
                "mx": (F.max("ts"), F.max),
            },
            n_salts=8,
        )
        .toPandas()
        .sort_values("conv_id")
        .reset_index(drop=True)
    )
    assert (plain["n"].to_numpy() == salted["n"].to_numpy()).all()
    assert (plain["chars"].to_numpy() == salted["chars"].to_numpy()).all()
    assert (plain["mx"].to_numpy() == salted["mx"].to_numpy()).all()


def test_text_features(spark):
    pdf = pd.DataFrame({"text": ["the quick brown fox", "hello", "a b a b"]})
    df = spark.createDataFrame(pdf)
    got = with_text_features(df).toPandas()
    assert got["plen"].tolist() == [4, 1, 4]
    assert got["first_word"].tolist() == ["the", "hello", "a"]
    assert got["last_word"].tolist() == ["fox", "hello", "b"]
    assert got["suffix3"].tolist() == ["fox", "llo", "b"]


def test_quality_features(spark):
    pdf = pd.DataFrame({"text": ["the cat, the hat!", "xyzzy"]})
    got = with_quality_features(spark.createDataFrame(pdf)).toPandas()
    assert got["n_tokens"].tolist() == [4, 1]
    assert abs(got["stopword_ratio"][0] - 0.5) < 1e-9
    assert got["punct_ratio"][0] > 0
    assert got["punct_ratio"][1] == 0.0


def test_lang_id(spark):
    pdf = pd.DataFrame(
        {"text": ["the cat and the dog", "el que de los la", "qqq zzz"]}
    )
    got = with_lang_id(spark.createDataFrame(pdf)).toPandas()
    assert got["lang_pred"].tolist() == ["en", "es", "und"]
