"""Synthetic corpus invariants (FIXTURES.md §A)."""

from __future__ import annotations

import numpy as np
import pandas as pd

from tgist_features_spark.sources.corpus import (
    TRANSCRIPT_SCHEMA,
    generate_queries_pdf,
    generate_transcripts_pdf,
    transcripts_df,
)


def test_deterministic():
    a = generate_transcripts_pdf(n_convs=100, seed=42)
    b = generate_transcripts_pdf(n_convs=100, seed=42)
    pd.testing.assert_frame_equal(a, b)
    c = generate_transcripts_pdf(n_convs=100, seed=7)
    assert not a.equals(c)


def test_shape_and_invariants(tiny_pdf):
    df = tiny_pdf.sort_values(["conv_id", "turn_idx"])
    assert list(df.columns) == ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    # dense gap-free turn_idx per conv
    for _cid, g in df.groupby("conv_id"):
        assert (g["turn_idx"].to_numpy() == np.arange(len(g))).all()
        # ts non-decreasing in turn order
        assert g["ts"].is_monotonic_increasing
    # tool non-null iff role == tool
    assert (df["tool"].notna() == (df["role"] == "tool")).all()
    assert set(df["role"]) <= {"system", "user", "assistant", "tool"}


def test_skew_and_duplicates():
    pdf = generate_transcripts_pdf(n_convs=2000, seed=42)
    sizes = pdf.groupby("conv_id").size()
    assert sizes.max() >= 20 * sizes.median(), "zipf skew: hot convs must exist"
    dups = pdf.duplicated(subset=["conv_id", "ts"], keep=False).sum()
    assert dups > 0, "duplicate-ts pairs must exist to force turn_idx tiebreak"


def test_text_deterministic_per_key(tiny_pdf):
    other = generate_transcripts_pdf(n_convs=20, seed=42, shuffled=False)
    merged = tiny_pdf.merge(other, on=["conv_id", "turn_idx"], suffixes=("", "_b"))
    assert (merged["text"] == merged["text_b"]).all()


def test_spark_roundtrip(spark, tiny_pdf):
    df = transcripts_df(spark, tiny_pdf)
    assert df.schema == TRANSCRIPT_SCHEMA
    assert df.count() == len(tiny_pdf)


def test_queries_shape(small_pdf):
    q = generate_queries_pdf(small_pdf, n_queries=200, seed=43)
    assert len(q) == 200
    unseen = q[~q["conv_id"].isin(set(small_pdf["conv_id"]))]
    assert len(unseen) == 20
    # exact-timestamp probes within their own conversation must exist —
    # they are what exercises the <= vs < inclusivity boundary
    hits = q.merge(
        small_pdf[["conv_id", "ts"]],
        left_on=["conv_id", "query_ts"],
        right_on=["conv_id", "ts"],
    )
    assert len(hits) >= 20
