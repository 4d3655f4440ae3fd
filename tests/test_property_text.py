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


# ---------------------------------------------------------------- MinHash

from hypothesis import given, settings
from hypothesis import strategies as st

from tgist_features_spark.operators.dedup import _MIXA, _M61, _minhash_batch


def _naive_minhash(texts, n_hashes, shingle, seed):
    """Reference implementation: per-doc python loop, same hash family."""
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _M61, size=n_hashes, dtype=np.uint64)
    b = rng.integers(0, _M61, size=n_hashes, dtype=np.uint64)
    out = []
    for text in texts:
        toks = (text or "").split()
        th = pd.util.hash_array(np.asarray(toks, dtype=object)).astype(np.uint64) \
            if toks else np.empty(0, np.uint64)
        shingles = []
        with np.errstate(over="ignore"):
            if len(th) >= shingle:
                for i in range(len(th) - shingle + 1):
                    v = th[i]
                    for x in th[i + 1 : i + shingle]:
                        v = v * _MIXA + x
                    shingles.append(v)
            else:  # whole-doc shingle (empty doc -> hash of "")
                if len(th) == 0:
                    v = pd.util.hash_array(np.array([""], dtype=object)).astype(np.uint64)[0]
                else:
                    v = th[0]
                    for x in th[1:]:
                        v = v * _MIXA + x
                shingles.append(v)
            sh = np.asarray(shingles, dtype=np.uint64) % _M61
            vals = (a[:, None] * sh[None, :] + b[:, None]) % _M61
        out.append(vals.min(axis=1).astype(np.int64))
    return out


_token = st.text(alphabet="abcxyz", min_size=1, max_size=4)
_doc = st.lists(_token, min_size=0, max_size=12).map(" ".join)


@settings(max_examples=60, deadline=None)
@given(st.lists(_doc, min_size=1, max_size=12))
def test_minhash_segmented_matches_naive(docs):
    """The segmented reduceat vectorization must agree with a naive per-doc
    loop on every doc — including empty docs, sub-shingle docs, and batch
    boundaries (tiny chunk size forces multi-chunk paths)."""
    got = _minhash_batch(pd.Series(docs), n_hashes=8, shingle=3, seed=9,
                         max_chunk_vals=16)
    ref = _naive_minhash(docs, n_hashes=8, shingle=3, seed=9)
    for g, r in zip(got, ref):
        np.testing.assert_array_equal(np.asarray(g), r)
