"""Zero-temporal-leakage gate (north_rule).

Property: pick any cut timestamp; delete every row with ts > cut; all
backward features at rows with ts <= cut must be bit-identical to the
full-corpus run. Forward (lead) columns are label-side and excluded.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from tgist_features_spark.oracle.pandas_oracle import oracle_turn_features
from tgist_features_spark.plans.backfill import FEATURE_COLS, turn_features
from tgist_features_spark.sources.corpus import transcripts_df

BACKWARD_COLS = FEATURE_COLS + ["prev_role", "last_tool", "ngram_sig"]


def _features_sorted(spark, pdf):
    return (
        turn_features(transcripts_df(spark, pdf))
        .toPandas()
        .sort_values(["conv_id", "turn_idx"], kind="mergesort")
        .reset_index(drop=True)
    )


@pytest.mark.parametrize("quantile", [0.25, 0.5, 0.9])
def test_cut_invariance_spark(spark, tiny_pdf, quantile):
    cut = tiny_pdf["ts"].quantile(quantile)
    full = _features_sorted(spark, tiny_pdf)
    trunc = _features_sorted(spark, tiny_pdf[tiny_pdf["ts"] <= cut])
    full_vis = full[full["ts"] <= cut].reset_index(drop=True)
    assert len(full_vis) == len(trunc)
    for c in BACKWARD_COLS:
        a, b = full_vis[c], trunc[c]
        if a.dtype == object:
            assert ((a.isna() & b.isna()) | (a == b)).all(), c
        else:
            np.testing.assert_allclose(
                a.astype(float), b.astype(float), equal_nan=True, err_msg=c
            )


def test_cut_invariance_oracle(tiny_pdf):
    """Oracle obeys the same law — guards against an oracle that leaks."""
    cut = tiny_pdf["ts"].quantile(0.5)
    full = oracle_turn_features(tiny_pdf)
    trunc = oracle_turn_features(tiny_pdf[tiny_pdf["ts"] <= cut])
    full_vis = full[full["ts"] <= cut].reset_index(drop=True)
    for c in BACKWARD_COLS:
        a, b = full_vis[c], trunc.reset_index(drop=True)[c]
        if a.dtype == object:
            assert ((a.isna() & b.isna()) | (a == b)).all(), c
        else:
            np.testing.assert_allclose(
                a.astype(float), b.astype(float), equal_nan=True, err_msg=c
            )


def test_perturbing_future_rows(spark, tiny_pdf):
    """Stronger form: REPLACE future rows' text/role instead of deleting —
    visible features must not move."""
    cut = tiny_pdf["ts"].quantile(0.5)
    perturbed = tiny_pdf.copy()
    fut = perturbed["ts"] > cut
    perturbed.loc[fut, "text"] = "XXXX YYYY ZZZZ"
    perturbed.loc[fut, "role"] = "assistant"
    full = _features_sorted(spark, tiny_pdf)
    pert = _features_sorted(spark, perturbed)
    vis = (full["ts"] <= cut).to_numpy()
    for c in BACKWARD_COLS:
        a, b = full[c][vis], pert[c][vis]
        if a.dtype == object:
            assert ((a.isna() & b.isna()) | (a == b)).all(), c
        else:
            np.testing.assert_allclose(
                a.astype(float), b.astype(float), equal_nan=True, err_msg=c
            )


def test_asof_backfill_never_reads_future(spark, tiny_pdf):
    """Every backfilled match satisfies matched_ts <= query_ts."""
    from tgist_features_spark.plans.backfill import backfill_features
    from tgist_features_spark.sources.corpus import generate_queries_pdf, queries_df

    qpdf = generate_queries_pdf(tiny_pdf, n_queries=100, seed=9)
    feats = turn_features(transcripts_df(spark, tiny_pdf))
    bf = backfill_features(feats, queries_df(spark, qpdf)).toPandas()
    m = bf["ts"].notna()
    assert (bf.loc[m, "ts"] <= bf.loc[m, "query_ts"]).all()
