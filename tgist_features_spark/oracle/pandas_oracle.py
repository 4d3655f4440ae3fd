"""Pure pandas/numpy reference oracle (SURVEY.md §5.1).

The reference checkout was empty this session, so per north_rule the oracle
IS the reference: naive, single-threaded pandas per conversation — sorted
lists, shift/rolling/cumsum, ``pandas.merge_asof`` — written independently
of the Spark engine (no imports from operators/). Everything the engine
computes distributed must ``numpy.allclose``-match this at each
entity x timestamp.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from tgist_features_spark.plans.backfill import FEATURE_COLS


# document signature: pandas' stable 64-bit string hash of the raw text —
# the engine's ngram_features UDF pins the same definition


def oracle_turn_features(pdf: pd.DataFrame, gap_s: float = 1800.0) -> pd.DataFrame:
    """Per-turn features in canonical (conv_id, ts, turn_idx) order."""
    df = pdf.sort_values(["conv_id", "ts", "turn_idx"], kind="mergesort").reset_index(
        drop=True
    )
    g = df.groupby("conv_id", sort=False)

    prev_ts = g["ts"].shift(1)
    df["gap_s"] = (df["ts"] - prev_ts).dt.total_seconds()
    df["turn_no"] = g.cumcount() + 1
    df["turns_total"] = g["conv_id"].transform("size")
    df["turns_remaining"] = df["turns_total"] - df["turn_no"]
    df["session_id"] = (
        (df["gap_s"] > gap_s).fillna(False).astype("int64").groupby(df["conv_id"]).cumsum()
    )
    df["prev_role"] = g["role"].shift(1)
    df["next_role"] = g["role"].shift(-1)
    df["last_tool"] = g["tool"].ffill()

    chars = df["text"].str.len().astype("float64")
    is_user = (df["role"] == "user").astype("int64")
    is_tool = (df["role"] == "tool").astype("int64")

    def roll_excl(s: pd.Series, fn: str) -> pd.Series:
        # frame (-5, -1): shift then rolling over 5
        shifted = s.groupby(df["conv_id"]).shift(1)
        r = shifted.groupby(df["conv_id"]).rolling(5, min_periods=1)
        out = getattr(r, fn)()
        return out.reset_index(level=0, drop=True)

    df["n_user_5"] = roll_excl(is_user.astype("float64"), "sum").fillna(0).astype("int64")
    df["n_tool_5"] = roll_excl(is_tool.astype("float64"), "sum").fillna(0).astype("int64")
    df["roll_chars_5"] = roll_excl(chars, "mean")
    df["cum_chars"] = chars.astype("int64").groupby(df["conv_id"]).cumsum()

    toks = df["text"].fillna("").str.split()
    df["plen"] = toks.str.len().astype("int64")
    df["n_distinct"] = toks.apply(lambda t: len(set(t))).astype("int64")
    df["bigram_distinct"] = toks.apply(
        lambda t: len({(a, b) for a, b in zip(t, t[1:])})
    ).astype("int64")
    df["trigram_distinct"] = toks.apply(
        lambda t: len({(a, b, c) for a, b, c in zip(t, t[1:], t[2:])})
    ).astype("int64")
    df["ngram_sig"] = pd.util.hash_array(
        df["text"].fillna("").to_numpy(dtype=object)
    ).astype("int64")
    df["distinct_ratio"] = np.where(
        df["plen"] > 0, df["n_distinct"] / np.maximum(df["plen"], 1), 0.0
    )

    df["feature_vec"] = [
        np.array(v, dtype=np.float64)
        for v in df[FEATURE_COLS].astype("float64").to_numpy()
    ]
    return df


def oracle_backfill(
    features: pd.DataFrame,
    queries: pd.DataFrame,
    direction: str = "backward",
    tolerance_s: float | None = None,
    allow_exact_matches: bool = True,
) -> pd.DataFrame:
    """Reference as-of: pandas.merge_asof with by=conv_id.

    merge_asof(by=) requires globally sorted keys; ties on (conv, ts) resolve
    to the last row in ascending (ts, turn_idx) order for backward / first
    for forward — same rule the engine pins.
    """
    f = features.sort_values(["ts", "turn_idx"], kind="mergesort").reset_index(drop=True)
    q = queries.sort_values(["query_ts"], kind="mergesort").reset_index(drop=True)
    tol = pd.Timedelta(seconds=tolerance_s) if tolerance_s is not None else None
    out = pd.merge_asof(
        q,
        f[["conv_id", "ts", "turn_idx", "feature_vec"]],
        left_on="query_ts",
        right_on="ts",
        by="conv_id",
        direction=direction,
        tolerance=tol,
        allow_exact_matches=allow_exact_matches,
    )
    return out
