"""Property tests for the vectorized text kernel: the sentinel-join fast
path must agree with naive per-row Python on arbitrary whitespace/unicode."""

from __future__ import annotations

import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from tgist_features_spark.functions.text import _flat_tokens, ngram_stats_batch

texts = st.lists(
    st.text(
        alphabet=st.characters(
            codec="utf-8", exclude_characters=["\x00"],
        ),
        max_size=40,
    ),
    min_size=0,
    max_size=30,
)


@settings(max_examples=200, deadline=None)
@given(texts)
def test_flat_tokens_matches_str_split(rows):
    s = pd.Series(rows, dtype=object).fillna("")
    flat, row_id, lens = _flat_tokens(s)
    ref = s.str.split()
    ref_lens = ref.str.len().to_numpy() if len(s) else np.zeros(0)
    assert (lens == ref_lens).all()
    ref_flat = [t for toks in ref for t in toks]
    assert list(flat) == ref_flat
    ref_rows = [i for i, toks in enumerate(ref) for _ in toks]
    assert list(row_id) == ref_rows


@settings(max_examples=100, deadline=None)
@given(texts)
def test_ngram_stats_match_naive_sets(rows):
    s = pd.Series(rows, dtype=object)
    got = ngram_stats_batch(s)
    toks = s.fillna("").str.split()
    assert got["plen"].tolist() == [len(t) for t in toks]
    assert got["n_distinct"].tolist() == [len(set(t)) for t in toks]
    assert got["bigram_distinct"].tolist() == [
        len({(a, b) for a, b in zip(t, t[1:])}) for t in toks
    ]
    assert got["trigram_distinct"].tolist() == [
        len({(a, b, c) for a, b, c in zip(t, t[1:], t[2:])}) for t in toks
    ]
