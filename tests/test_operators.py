"""Unit tests for aggregates, pivots, salted aggregation, text functions."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
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


# ------------------------------------------------- sampling / splitting


def test_deterministic_split_layout_independent(spark):
    from tgist_features_spark.operators.sampling import deterministic_split

    pdf = pd.DataFrame({"k": [f"u{i % 500}" for i in range(5000)],
                        "v": range(5000)})
    df = spark.createDataFrame(pdf)
    w = {"train": 0.8, "val": 0.1, "test": 0.1}
    a = deterministic_split(df, "k", w).toPandas().sort_values("v")
    b = deterministic_split(df.repartition(17), "k", w).toPandas().sort_values("v")
    assert a["split"].tolist() == b["split"].tolist()
    # one key -> one split (all rows of a key together)
    per_key = a.groupby("k")["split"].nunique()
    assert (per_key == 1).all()
    # fractions roughly honored over 500 keys
    frac = a.drop_duplicates("k")["split"].value_counts(normalize=True)
    assert abs(frac.get("train", 0) - 0.8) < 0.08
    assert abs(frac.get("val", 0) - 0.1) < 0.06


def test_deterministic_split_boundary_stability(spark):
    """Growing one split only moves its boundary: every key assigned to
    'train' at 70% stays in 'train' at 80%."""
    from tgist_features_spark.operators.sampling import deterministic_split

    pdf = pd.DataFrame({"k": [f"u{i}" for i in range(2000)]})
    df = spark.createDataFrame(pdf)
    a = deterministic_split(df, "k", {"train": 0.7, "rest": 0.3}).toPandas()
    b = deterministic_split(df, "k", {"train": 0.8, "rest": 0.2}).toPandas()
    m = a.merge(b, on="k", suffixes=("_70", "_80"))
    assert ((m["split_70"] != "train") | (m["split_80"] == "train")).all()


def test_deterministic_split_validation(spark):
    from tgist_features_spark.operators.sampling import deterministic_split

    df = spark.createDataFrame(pd.DataFrame({"k": ["a"]}))
    with pytest.raises(ValueError):
        deterministic_split(df, "k", {})
    with pytest.raises(ValueError):
        deterministic_split(df, "k", {"x": 0.0})


def test_per_group_sample(spark):
    from tgist_features_spark.operators.sampling import per_group_sample

    pdf = pd.DataFrame({
        "g": ["big"] * 100 + ["small"] * 2,
        "id": list(range(100)) + [1000, 1001],
    })
    df = spark.createDataFrame(pdf)
    got = per_group_sample(df, "g", 5, "id").toPandas()
    counts = got.groupby("g")["id"].count()
    assert counts["big"] == 5 and counts["small"] == 2  # quota + passthrough
    again = per_group_sample(df.repartition(7), "g", 5, "id").toPandas()
    assert sorted(got["id"]) == sorted(again["id"])  # layout-independent


def test_tfidf_topk_ranks_distinctive_term(spark):
    from tgist_features_spark.functions.text import tfidf_topk

    pdf = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": ["common words plus zebra zebra",
                 "common words plus yak",
                 "common words plus xylophone"],
    })
    got = tfidf_topk(spark.createDataFrame(pdf), k=1).toPandas()
    top = got.set_index("doc_id")["tok"].to_dict()
    assert top == {1: "zebra", 2: "yak", 3: "xylophone"}


# ------------------------------------------------- connected components


def _union_find_ref(pairs):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comp = {}
    for n in parent:
        comp[n] = find(n)
    return comp


def test_connected_components_vs_union_find(spark):
    """Distributed min-label propagation + pointer jumping must match a
    driver-side union-find on a graph with chains (multi-iteration),
    cycles, and singleton pairs."""
    from tgist_features_spark.operators.components import connected_components

    pairs = (
        [(i, i + 1) for i in range(0, 20)]          # long chain 0..20
        + [(100, 101), (101, 102), (102, 100)]       # cycle
        + [(200, 201)]                               # isolated pair
        + [(300, 310), (310, 305), (305, 300)]       # another cycle
        + [(400, 500), (450, 500), (400, 450)]
    )
    pdf = pd.DataFrame(pairs, columns=["a", "b"])
    got = (
        connected_components(spark.createDataFrame(pdf))
        .toPandas()
        .set_index("id")["comp"]
        .to_dict()
    )
    ref = _union_find_ref(pairs)
    assert got == ref


def test_connected_components_reliable_checkpoint_parity(spark, tmp_path):
    """checkpoint_dir mode (reliable per-iteration parquet checkpoints,
    cluster fault-tolerant) must produce exactly the labels of the default
    localCheckpoint mode, must actually write under the given directory
    during the run, and must leave NOTHING behind afterwards (superseded
    iterations reclaimed in-loop, run dir removed on exit) — checkpoint
    garbage accumulating across runs on a shared cluster path was a
    review finding."""
    import os

    # patch the CONCRETE class — pyspark 4's pyspark.sql.DataFrame is an
    # abstract facade; instances are classic.dataframe.DataFrame
    from pyspark.sql.classic.dataframe import DataFrame as ClassicDF

    from tgist_features_spark.operators.components import connected_components

    pairs = (
        [(i, i + 1) for i in range(0, 12)]
        + [(100, 101), (101, 102), (102, 100)]
        + [(200, 201)]
    )
    pdf = pd.DataFrame(pairs, columns=["a", "b"])
    local = (
        connected_components(spark.createDataFrame(pdf))
        .toPandas().set_index("id")["comp"].to_dict()
    )
    ckdir = str(tmp_path / "cc_ckpt")
    seen_during_run = []
    orig = ClassicDF.count

    def counting(self):
        if os.path.isdir(ckdir):
            for run in os.listdir(ckdir):
                seen_during_run.extend(os.listdir(os.path.join(ckdir, run)))
        return orig(self)

    ClassicDF.count = counting
    try:
        reliable = (
            connected_components(spark.createDataFrame(pdf), checkpoint_dir=ckdir)
            .toPandas().set_index("id")["comp"].to_dict()
        )
    finally:
        ClassicDF.count = orig
    assert reliable == local == _union_find_ref(pairs)
    assert any(e.startswith("iter-") for e in seen_during_run), (
        "no reliable checkpoints observed during the run"
    )
    assert not (os.path.isdir(ckdir) and os.listdir(ckdir)), (
        f"checkpoint garbage left behind: {os.listdir(ckdir)}"
    )


def test_connected_components_random_graph(spark):
    import numpy as np

    from tgist_features_spark.operators.components import connected_components

    rng = np.random.default_rng(11)
    pairs = [
        (int(a), int(b))
        for a, b in rng.integers(0, 150, size=(120, 2))
        if a != b
    ]
    pdf = pd.DataFrame(pairs, columns=["a", "b"])
    got = (
        connected_components(spark.createDataFrame(pdf))
        .toPandas()
        .set_index("id")["comp"]
        .to_dict()
    )
    assert got == _union_find_ref(pairs)


def test_bm25_ranks_term_dense_docs(spark):
    from tgist_features_spark.functions.text import bm25_topk

    pdf = pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "text": [
            "hash hash hash join",          # dense in the query term
            "hash join scan",               # one hit
            "scan filter sort",             # no hit
            "hash join " + "scan filter sort " * 40,  # one hit, long doc (penalized)
        ],
    })
    got = bm25_topk(spark.createDataFrame(pdf), ["hash"], k=3).toPandas()
    assert got["doc_id"].iloc[0] == 1          # densest short doc wins
    assert 3 not in set(got["doc_id"])         # no-hit doc never appears
    assert (got["bm25"] > 0).all()


# ---------------------------------------------------------- sequence packing


def _naive_pack(weights: dict[int, int], c: int) -> list[tuple[int, int, int, int]]:
    """(key, chunk_id, offset_in_chunk, n_in_chunk) by literal concat-walk."""
    out, cum = [], 0
    for k in sorted(weights):
        w = weights[k]
        if w <= 0:
            continue
        prev, cum = cum, cum + w
        for chunk in range(prev // c, (cum - 1) // c + 1):
            b, e = max(prev, chunk * c), min(cum, (chunk + 1) * c)
            out.append((k, chunk, b - chunk * c, e - b))
    return out


def test_pack_chunks_matches_naive_and_is_layout_independent(spark):
    from tgist_features_spark.operators.packing import pack_chunks

    rng = np.random.default_rng(7)
    weights = {int(k): int(w) for k, w in enumerate(rng.integers(0, 120, 200))}
    pdf = pd.DataFrame({"k": list(weights), "w": list(weights.values())})
    df = spark.createDataFrame(pdf)
    want = pd.DataFrame(
        _naive_pack(weights, 64),
        columns=["k", "chunk_id", "offset_in_chunk", "n_in_chunk"],
    )

    for variant in (
        pack_chunks(df, "k", "w", 64, n_parts=1),
        pack_chunks(df, "k", "w", 64, n_parts=5),
        pack_chunks(df.repartition(13), "k", "w", 64, n_parts=5),
    ):
        got = (
            variant.toPandas()
            .sort_values(["k", "chunk_id"])
            .reset_index(drop=True)
        )
        assert got["n_tokens"].tolist() == [
            weights[k] for k in got["k"]
        ]
        g = got[["k", "chunk_id", "offset_in_chunk", "n_in_chunk"]]
        w2 = want.sort_values(["k", "chunk_id"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(
            g.astype("int64"), w2.astype("int64"), check_names=False
        )
        # every chunk but the last is exactly full
        per_chunk = got.groupby("chunk_id")["n_in_chunk"].sum()
        assert (per_chunk.iloc[:-1] == 64).all()


def test_pack_chunks_edge_cases(spark):
    from tgist_features_spark.operators.packing import pack_chunks

    with pytest.raises(ValueError):
        pack_chunks(
            spark.createDataFrame(pd.DataFrame({"k": [1], "w": [1]})), "k", "w", 0
        )
    empty = spark.createDataFrame(pd.DataFrame({"k": [1], "w": [1]})).filter("k < 0")
    out = pack_chunks(empty, "k", "w", 16)
    assert out.count() == 0
    assert set(out.columns) == {
        "k", "n_tokens", "chunk_id", "offset_in_chunk", "n_in_chunk",
    }
    # one doc spanning many chunks
    one = spark.createDataFrame(pd.DataFrame({"k": [5], "w": [1000]}))
    got = pack_chunks(one, "k", "w", 64).toPandas().sort_values("chunk_id")
    assert got["chunk_id"].tolist() == list(range(16))
    assert got["n_in_chunk"].sum() == 1000


def test_pack_chunks_sparse_int64_keys_no_overflow(spark):
    """Hash-derived keys spanning nearly all of int64: the r3 linear
    formula ((key - kmin) * n_parts) silently overflowed bigint here and
    produced non-monotone part ids. The histogram assignment must (a)
    still match the naive oracle and (b) balance the prefix-sum parts."""
    from tgist_features_spark.operators.packing import (
        _range_partition_expr,
        pack_chunks,
    )

    ks = (
        [(-(2**62)) + 7 * i for i in range(60)]
        + [2**62 + 17 * i for i in range(60)]
        + list(range(80))
    )
    weights = {k: (i % 7) + 1 for i, k in enumerate(ks)}
    df = spark.createDataFrame(pd.DataFrame({"k": ks, "w": list(weights.values())}))

    got = (
        pack_chunks(df, "k", "w", 32, n_parts=4)
        .toPandas()
        .sort_values(["k", "chunk_id"])
        .reset_index(drop=True)
    )
    want = pd.DataFrame(
        _naive_pack(dict(sorted(weights.items())), 32),
        columns=["k", "chunk_id", "offset_in_chunk", "n_in_chunk"],
    ).sort_values(["k", "chunk_id"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[["k", "chunk_id", "offset_in_chunk", "n_in_chunk"]].astype("int64"),
        want.astype("int64"),
        check_names=False,
    )

    expr, n_rows, n_parts = _range_partition_expr(df, "k", "w", 4)
    counts = [
        r["count"] for r in df.select(expr.alias("p")).groupBy("p").count().collect()
    ]
    assert n_rows == len(ks) and n_parts >= 4
    assert max(counts) <= 2.5 * (n_rows / n_parts), counts


def test_pack_chunks_clustered_keys_balance(spark):
    """All keys inside one coarse grid cell (dense cluster far from the
    origin): the observed-extent split must still balance — and the
    output must be identical whether refinement runs or not."""
    from tgist_features_spark.operators.packing import (
        _range_partition_expr,
        pack_chunks,
    )

    ks = [10_000_000 + i for i in range(2000)]
    df = spark.createDataFrame(pd.DataFrame({"k": ks, "w": [2] * len(ks)}))
    expr, n_rows, n_parts = _range_partition_expr(df, "k", "w", 8)
    counts = [
        r["count"] for r in df.select(expr.alias("p")).groupBy("p").count().collect()
    ]
    assert n_parts == 8 and max(counts) <= 2 * (n_rows / n_parts), counts

    a = (
        pack_chunks(df, "k", "w", 128, n_parts=8, refine=0)
        .toPandas()
        .sort_values(["k", "chunk_id"])
        .reset_index(drop=True)
    )
    b = (
        pack_chunks(df, "k", "w", 128, n_parts=8, refine=1)
        .toPandas()
        .sort_values(["k", "chunk_id"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)


# ------------------------------------------------------- repetition filters


def test_repetition_features_match_naive(spark):
    from tgist_features_spark.functions.text import with_repetition_features

    docs = [
        "spam spam spam spam spam spam",
        "the quick brown fox jumps over a lazy dog while two birds watch"
        " from an old oak tree nearby",
        "a b a b a b a b",
        "one",
        "x y",
        "gap  gap\ttab gap  gap",  # consecutive spaces/tabs: literal-split semantics
    ]
    got = (
        with_repetition_features(
            spark.createDataFrame(pd.DataFrame({"doc_id": range(len(docs)), "text": docs}))
        )
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )

    def naive(text):
        tk = text.split(" ")
        n = len(tk)
        big = [" ".join(tk[i : i + 2]) for i in range(n - 1)]
        tri = [" ".join(tk[i : i + 3]) for i in range(n - 2)]
        best = max((big.count(g) for g in set(big)), default=0)
        return (
            n,
            round(len(set(tk)) / n, 6),
            round(2 * best / n, 6),
            round(1 - len(set(tri)) / len(tri), 6) if tri else 0.0,
        )

    for i, text in enumerate(docs):
        n, ttr, tbf, dtf = naive(text)
        row = got.iloc[i]
        assert row.n_tokens == n
        assert row.ttr == pytest.approx(ttr, abs=0)
        assert row.top_bigram_frac == pytest.approx(tbf, abs=0)
        assert row.dup_trigram_frac == pytest.approx(dtf, abs=0)
    # the spam docs are junk, the fox doc is clean
    assert not got.iloc[0].keep and not got.iloc[2].keep
    assert bool(got.iloc[1].keep)


# ---------------------------------------------------- temperature resampling


def test_temperature_resample_exact_and_fractional(spark):
    from tgist_features_spark.operators.sampling import temperature_resample

    rows = (
        [("a", i) for i in range(64)]
        + [("b", 100 + i) for i in range(16)]
        + [("c", 200 + i) for i in range(4)]
        + [("d", 300 + i) for i in range(32)]
    )
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["g", "id"]))
    out = temperature_resample(df, "g", "id", tau=0.5, cap=3.0).toPandas()
    by_g = out.groupby("g").size()
    # exact multipliers: a->1, b->sqrt(4)=2, c->sqrt(16)=4 capped at 3
    assert by_g["a"] == 64 and by_g["b"] == 32 and by_g["c"] == 12
    # fractional: d -> sqrt(2) ~ 1.414: between floor and ceil, deterministic
    assert 32 <= by_g["d"] <= 64
    again = temperature_resample(df.repartition(11), "g", "id", tau=0.5, cap=3.0)
    assert again.toPandas().groupby("g").size()["d"] == by_g["d"]
    # copy_idx enumerates 1..n_copies
    mx = out.groupby("id")[["copy_idx", "n_copies"]].max()
    assert (mx["copy_idx"] == mx["n_copies"]).all()
    # tau=0 -> no resampling at all
    flat = temperature_resample(df, "g", "id", tau=0.0)
    assert flat.count() == len(rows)
    with pytest.raises(ValueError):
        temperature_resample(df, "g", "id", tau=-1)
    with pytest.raises(ValueError):
        temperature_resample(df, "g", "id", cap=0.5)


# ---------------------------------------------------------- decontamination


def test_decontaminate_removes_exactly_overlapping_docs(spark):
    from tgist_features_spark.operators.dedup import (
        contamination_hits,
        decontaminate,
    )

    ev = spark.createDataFrame(
        pd.DataFrame({"doc_id": [100], "text": ["alpha beta gamma delta"]})
    )
    train = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [1, 2, 3, 4],
                "text": [
                    "x alpha beta gamma y",        # shares 'alpha beta gamma'
                    "beta gamma delta z w",        # shares 'beta gamma delta'
                    "alpha gamma beta delta x",    # same words, no shared trigram
                    "totally clean words here ok",
                ],
            }
        )
    )
    hits = contamination_hits(train, ev, n=3).toPandas().sort_values("doc_id")
    assert hits["doc_id"].tolist() == [1, 2]
    assert hits["n_hit_grams"].tolist() == [1, 1]
    kept = decontaminate(train, ev, n=3).toPandas()
    assert sorted(kept["doc_id"]) == [3, 4]
    # with bigrams, doc 3 also collides ('beta delta'? no — eval bigrams are
    # alpha-beta, beta-gamma, gamma-delta; doc 3 has gamma-beta, beta-delta)
    kept2 = decontaminate(train, ev, n=2).toPandas()
    assert sorted(kept2["doc_id"]) == [3, 4]
    # unigrams: every doc sharing any eval word is contaminated
    kept1 = decontaminate(train, ev, n=1).toPandas()
    assert sorted(kept1["doc_id"]) == [4]


def test_deterministic_shuffle_ranks(spark):
    from tgist_features_spark.operators.packing import deterministic_shuffle
    from tgist_features_spark.operators.sampling import hash_bucket  # noqa: F401

    import hashlib

    pdf = pd.DataFrame({"k": range(500)})
    df = spark.createDataFrame(pdf)
    got = deterministic_shuffle(df, "k", n_parts=8).toPandas()
    # ranks are a permutation of 0..n-1
    assert sorted(got["shuffle_rank"]) == list(range(500))

    def bucket(k, salt="shuffle"):
        return int(hashlib.md5(f"{k}{salt}".encode()).hexdigest()[:15], 16) % 1_000_000

    want = sorted(range(500), key=lambda k: (bucket(k), k))
    by_rank = got.sort_values("shuffle_rank")["k"].tolist()
    assert by_rank == want
    # layout independence + epoch independence
    again = deterministic_shuffle(df.repartition(13), "k", n_parts=4).toPandas()
    m = got.merge(again, on="k", suffixes=("_a", "_b"))
    assert (m["shuffle_rank_a"] == m["shuffle_rank_b"]).all()
    epoch2 = deterministic_shuffle(df, "k", salt="epoch2", n_parts=8).toPandas()
    m2 = got.merge(epoch2, on="k", suffixes=("_a", "_b"))
    assert (m2["shuffle_rank_a"] != m2["shuffle_rank_b"]).any()
    with pytest.raises(ValueError):
        deterministic_shuffle(df, "k", n_parts=0)


# ------------------------------------------------ redaction / window chunking


def test_with_redaction_counts_and_scrubs(spark):
    from tgist_features_spark.functions.text import with_redaction

    pdf = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": [
            "mail a@b.co and c.d+e@f-g.example.org now",
            "go to https://x.y/z?a=1 or http://q.r ssn 123-45-6789",
            "nothing sensitive",
        ],
    })
    got = (
        with_redaction(spark.createDataFrame(pdf))
        .toPandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert got["n_email"].tolist() == [2, 0, 0]
    assert got["n_url"].tolist() == [0, 2, 0]
    assert got["n_ssn"].tolist() == [0, 1, 0]
    assert got["redacted"][0] == "mail <EMAIL> and <EMAIL> now"
    assert got["redacted"][1] == "go to <URL> or <URL> ssn <SSN>"
    assert got["redacted"][2] == "nothing sensitive"


def test_chunk_windows_match_naive(spark):
    from tgist_features_spark.functions.text import chunk_windows

    texts = {
        1: " ".join(f"t{i}" for i in range(10)),   # > size: multiple windows
        2: " ".join(f"u{i}" for i in range(4)),    # == size: one window
        3: "solo",                                  # < size: one short window
        4: " ".join(f"v{i}" for i in range(9)),    # last window short
    }
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": list(texts), "text": list(texts.values())})
    )
    got = (
        chunk_windows(df, size=4, stride=2)
        .toPandas().sort_values(["doc_id", "win_idx"]).reset_index(drop=True)
    )
    want = []
    for k, t in texts.items():
        tk = t.split(" ")
        n = len(tk)
        last = (n - 4 + 1) // 2 if n > 4 else 0
        for i in range(last + 1):
            w = tk[i * 2 : i * 2 + 4]
            want.append((k, i, " ".join(w), len(w)))
    want_df = pd.DataFrame(
        want, columns=["doc_id", "win_idx", "window_text", "n_window_tokens"]
    ).sort_values(["doc_id", "win_idx"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got.astype({"win_idx": "int64", "n_window_tokens": "int64"}),
        want_df.astype({"win_idx": "int64", "n_window_tokens": "int64"}),
    )
    with pytest.raises(ValueError):
        chunk_windows(df, size=0)


def test_cross_doc_span_stats(spark):
    from tgist_features_spark.operators.dedup import cross_doc_span_stats

    shared = " ".join(f"s{i}" for i in range(10))
    docs = {
        1: shared + " tail one extra words here",        # shares the 10-token span
        2: shared + " different ending tokens now ok",   # with doc 1
        3: " ".join(f"u{i}" for i in range(15)),          # fully unique
        4: "short doc",                                   # < n tokens: no spans
    }
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": list(docs), "text": list(docs.values())})
    )
    got = (
        cross_doc_span_stats(df, n=8, max_frac=0.2)
        .toPandas().set_index("doc_id").sort_index()
    )
    # doc 4 has < 8 tokens -> absent
    assert sorted(got.index) == [1, 2, 3]
    # docs 1,2: the shared 10-token prefix yields 3 shared 8-gram positions
    assert got.loc[1, "n_dup_spans"] == 3 and got.loc[2, "n_dup_spans"] == 3
    assert got.loc[3, "n_dup_spans"] == 0
    assert got.loc[3, "keep"] == 1
    # 3 of 8 positions shared (15-token doc) -> frac 0.375 > 0.2 -> drop
    assert got.loc[1, "n_spans"] == 8 and abs(got.loc[1, "dup_span_frac"] - 0.375) < 1e-12
    assert got.loc[1, "keep"] == 0
    # layout independence
    again = cross_doc_span_stats(df.repartition(7), n=8, max_frac=0.2).toPandas()
    assert sorted(map(tuple, again.to_numpy().tolist())) == sorted(
        map(tuple, got.reset_index().to_numpy().tolist())
    )


def test_cross_doc_span_stats_hot_gram_divert_is_equivalent(spark):
    """The max_df hot-gram divert is a physical optimization only: with a
    boilerplate gram present in EVERY doc (df 30 > max_df 3) the capped
    plan must produce exactly the uncapped plan's output."""
    from tgist_features_spark.operators.dedup import cross_doc_span_stats

    boiler = "this page is for informational purposes only contact support"
    docs = {
        i: boiler + " " + " ".join(f"w{i}_{j}" for j in range(6)) for i in range(30)
    }
    docs[100] = docs[0].replace("w0_", "x_")  # near-dup pair off the boilerplate
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": list(docs), "text": list(docs.values())})
    )
    capped = (
        cross_doc_span_stats(df, n=4, max_df=3)
        .toPandas().sort_values("doc_id").reset_index(drop=True)
    )
    uncapped = (
        cross_doc_span_stats(df, n=4, max_df=None)
        .toPandas().sort_values("doc_id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(capped, uncapped)
    # the 9-token boilerplate yields 6 dup 4-gram positions in every doc
    assert (capped["n_dup_spans"] >= 6).all()


def test_banded_numeric_loop_form_matches_unrolled(spark):
    """The transform-loop band hashing (round-5 cold-codegen cut) must
    produce bit-identical (band, bhash) rows to the original unrolled
    CreateArray form — bucket assignment, and therefore LSH recall, is
    untouchable."""
    from pyspark.sql import functions as F

    from tgist_features_spark.operators.dedup import _banded_numeric

    rng = np.random.default_rng(0)
    pdf = pd.DataFrame({
        "id": range(50),
        "sig": [rng.integers(-2**62, 2**62, 128).tolist() for _ in range(50)],
    })
    df = spark.createDataFrame(pdf)
    got = _banded_numeric(df, 64, 2).toPandas().sort_values(
        ["id", "band"]).reset_index(drop=True)
    ref = df.select(
        "id",
        F.posexplode(F.array(*[
            F.xxhash64(*[F.element_at("sig", i * 2 + j + 1) for j in range(2)])
            for i in range(64)
        ])).alias("band", "bhash"),
    ).toPandas().sort_values(["id", "band"]).reset_index(drop=True)
    assert got.equals(ref)
    # odd rows-per-band width too (4 bands x 3 rows over a 12-long sig)
    pdf2 = pd.DataFrame({
        "id": range(20),
        "sig": [rng.integers(-2**62, 2**62, 12).tolist() for _ in range(20)],
    })
    df2 = spark.createDataFrame(pdf2)
    got2 = _banded_numeric(df2, 4, 3).toPandas().sort_values(
        ["id", "band"]).reset_index(drop=True)
    ref2 = df2.select(
        "id",
        F.posexplode(F.array(*[
            F.xxhash64(*[F.element_at("sig", i * 3 + j + 1) for j in range(3)])
            for i in range(4)
        ])).alias("band", "bhash"),
    ).toPandas().sort_values(["id", "band"]).reset_index(drop=True)
    assert got2.equals(ref2)


def test_remove_dup_spans_hot_gram_divert_is_equivalent(spark):
    """remove_dup_spans' max_df divert (ported from cross_doc_span_stats)
    is a physical optimization only: with a boilerplate gram in EVERY doc
    (df 30 > max_df 3) the capped plan must produce exactly the uncapped
    plan's output — byte-equal clean_text included."""
    from tgist_features_spark.operators.dedup import remove_dup_spans

    boiler = "this page is for informational purposes only contact support"
    docs = {
        i: boiler + " " + " ".join(f"w{i}_{j}" for j in range(6)) for i in range(30)
    }
    docs[100] = docs[0].replace("w0_", "x_")
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": list(docs), "text": list(docs.values())})
    )
    capped = (
        remove_dup_spans(df, n=4, max_df=3)
        .toPandas().sort_values("doc_id").reset_index(drop=True)
    )
    uncapped = (
        remove_dup_spans(df, n=4, max_df=None)
        .toPandas().sort_values("doc_id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(capped, uncapped)
    # boilerplate spans removed everywhere, per-doc unique words kept
    assert (capped["n_removed"] >= 4).all()
    assert capped.loc[0, "clean_text"].startswith("w0_")


def test_remove_dup_spans_matches_naive(spark):
    """Span REMOVAL must equal a naive per-doc reference: tokens covered by
    any cross-doc duplicated n-gram position are deleted, everything else
    (short docs, null text, unique docs) passes through untouched."""
    from tgist_features_spark.operators.dedup import remove_dup_spans

    boiler = "one two three four five six seven eight"
    docs = {
        1: boiler + " unique a b c",
        2: boiler + " other d e f",
        3: "totally different text with no shared spans at all here",
        4: "short doc",
        5: None,
        6: boiler,  # the whole doc is the shared span -> clean_text ''
    }
    n = 8
    texts = {k: v for k, v in docs.items() if v is not None}
    from collections import defaultdict

    gram_docs = defaultdict(set)
    for d, txt in texts.items():
        tk = txt.split(" ")
        for p in range(len(tk) - n + 1):
            gram_docs[" ".join(tk[p : p + n])].add(d)

    def naive(d):
        txt = docs[d]
        if txt is None:
            return None, 0, 0
        tk = txt.split(" ")
        cov = set()
        for p in range(len(tk) - n + 1):
            if len(gram_docs[" ".join(tk[p : p + n])]) >= 2:
                cov.update(range(p, p + n))
        clean = " ".join(t for i, t in enumerate(tk) if i not in cov)
        return clean, len(tk), len(cov)

    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": list(docs), "text": list(docs.values())})
    )
    got = (
        remove_dup_spans(df, n=n)
        .toPandas().set_index("doc_id").sort_index()
    )
    assert sorted(got.index) == sorted(docs)
    for d in docs:
        clean, ntok, nrem = naive(d)
        row = got.loc[d]
        assert (row.clean_text == clean) or (clean is None and row.clean_text is None), d
        assert row.n_tokens == ntok and row.n_removed == nrem, d
    assert got.loc[6, "clean_text"] == ""


def test_token_frequency_stats_exact(spark):
    """Hand-computed integer outputs, with hot_min low enough that the
    head/tail vocabulary split (broadcast divert) is exercised."""
    from tgist_features_spark.functions.text import token_frequency_stats

    docs = {1: "the the cat", 2: "the dog", 3: "qq zz"}
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": list(docs), "text": list(docs.values())})
    )
    for hot_min in (3, 10**9):  # divert engaged / pure shuffle join
        got = (
            token_frequency_stats(df, min_count=2, hot_min=hot_min)
            .toPandas().set_index("doc_id").sort_index()
        )
        # C(the)=3, everything else 1
        assert got.loc[1].tolist() == [3, 7, 23333, 1, 333333]
        assert got.loc[2].tolist() == [2, 4, 20000, 1, 500000]
        assert got.loc[3].tolist() == [2, 2, 10000, 2, 1000000]


def test_group_centroids_match_numpy(spark):
    from tgist_features_spark.operators.similarity import group_centroids

    rng = np.random.default_rng(3)
    labels = rng.integers(0, 4, 200)
    vecs = rng.normal(size=(200, 16)).astype(np.float32)
    df = spark.createDataFrame(
        pd.DataFrame({"label": labels, "embedding": list(map(list, vecs))})
    )
    got = group_centroids(df).toPandas().set_index("label").sort_index()
    scale = 10_000_000
    for lab in range(4):
        sub = vecs[labels == lab]
        q = np.floor(sub.astype(np.float64) * scale + 0.5).astype(np.int64)
        want = (q.sum(axis=0) // len(sub)) / scale
        assert got.loc[lab, "n_vecs"] == len(sub)
        assert np.array_equal(np.array(got.loc[lab, "centroid"]), want), lab
    again = group_centroids(df.repartition(7)).toPandas().set_index("label").sort_index()
    for lab in range(4):
        assert np.array_equal(
            np.array(got.loc[lab, "centroid"]), np.array(again.loc[lab, "centroid"])
        )


def test_group_centroid_components_reassemble(spark):
    """The flat (label, dim, n_vecs, value_x1e7) rows carry exactly the
    array centroid: value_x1e7 / scale reassembled over dim must be
    bitwise equal to group_centroids' output, and n_vecs must agree on
    every row (negative components included — exercises the pmod
    floor-div)."""
    from tgist_features_spark.operators.similarity import (
        group_centroid_components,
        group_centroids,
    )

    rng = np.random.default_rng(7)
    labels = rng.integers(0, 5, 300)
    vecs = rng.normal(size=(300, 12)).astype(np.float32)
    df = spark.createDataFrame(
        pd.DataFrame({"label": labels, "embedding": list(map(list, vecs))})
    )
    arr = group_centroids(df).toPandas().set_index("label").sort_index()
    flat = group_centroid_components(df).toPandas()
    assert set(flat.columns) == {"label", "dim", "n_vecs", "value_x1e7"}
    assert str(flat["value_x1e7"].dtype) == "int64"
    for lab, sub in flat.groupby("label"):
        sub = sub.sort_values("dim")
        assert sub["dim"].tolist() == list(range(12))
        assert (sub["n_vecs"] == arr.loc[lab, "n_vecs"]).all()
        rebuilt = (sub["value_x1e7"].to_numpy() / 1e7)
        assert np.array_equal(rebuilt, np.array(arr.loc[lab, "centroid"])), lab


def test_pack_chunks_pad_to_boundary(spark):
    """Boundary-respecting packing: every doc gets exactly ceil(w/c)
    chunks, no chunk mixes documents, the doc's tokens start at offset 0
    of its first chunk, per-doc tokens conserve, and global chunk ids are
    contiguous."""
    import math

    from tgist_features_spark.operators.packing import pack_chunks

    rng = np.random.default_rng(11)
    weights = {int(k): int(w) for k, w in enumerate(rng.integers(0, 300, 120))}
    df = spark.createDataFrame(
        pd.DataFrame({"k": list(weights), "w": list(weights.values())})
    )
    got = (
        pack_chunks(df, "k", "w", 64, n_parts=5, pad_to_boundary=True)
        .toPandas().sort_values(["k", "chunk_id"])
    )
    pos = {k: w for k, w in weights.items() if w > 0}
    per_doc = got.groupby("k").agg(
        n=("chunk_id", "count"), tok=("n_in_chunk", "sum")
    )
    assert per_doc["tok"].to_dict() == pos
    assert all(per_doc.loc[k, "n"] == math.ceil(w / 64) for k, w in pos.items())
    assert (got.groupby("chunk_id")["k"].nunique() == 1).all()
    firsts = got.groupby("k").first()
    assert (firsts["offset_in_chunk"] == 0).all()
    total = sum(math.ceil(w / 64) for w in pos.values())
    assert sorted(got["chunk_id"].unique()) == list(range(total))


# ------------------------------------------------- bounded range join


def test_bounded_range_join_matches_naive(spark):
    """Binned interval join must equal the naive equi+filter join on a
    corpus with boundary deltas (exactly hi -> included, exactly lo ->
    excluded), multiple entities, and a negative ("preceded-by") window."""
    rng = np.random.default_rng(13)
    rows = []
    eid = 0
    for u in range(5):
        for _ in range(60):
            rows.append((eid, u, int(rng.integers(0, 3600))))
            eid += 1
    # exact boundary pair: delta exactly 300s and exactly 0s
    rows.append((9000, 9, 1000))
    rows.append((9001, 9, 1300))   # 300s after -> INcluded for (0, 300]
    rows.append((9002, 9, 1000))   # 0s after   -> EXcluded
    pdf = pd.DataFrame(rows, columns=["event_id", "user_id", "off"])
    pdf["ts"] = pd.to_datetime(pdf["off"], unit="s")
    df = spark.createDataFrame(pdf[["event_id", "user_id", "ts"]])

    from tgist_features_spark.operators.ranges import bounded_range_join

    a = df.select(
        F.col("event_id").alias("aid"), F.col("user_id").alias("u"),
        F.col("ts").alias("ats"),
    )
    b = df.select(
        F.col("event_id").alias("bid"), F.col("user_id").alias("bu"),
        F.col("ts").alias("bts"),
    )
    for lo, hi in [(0, 300), (-300, 0), (-120, 180)]:
        binned = (
            bounded_range_join(a, b, "u", "bu", "ats", "bts", lo, hi)
            .select("aid", "bid").toPandas()
        )
        naive = (
            a.join(
                b,
                on=[
                    F.col("u") == F.col("bu"),
                    F.col("bts") > F.col("ats") + F.expr(f"INTERVAL {lo} SECONDS"),
                    F.col("bts") <= F.col("ats") + F.expr(f"INTERVAL {hi} SECONDS"),
                ],
            ).select("aid", "bid").toPandas()
        )
        got = set(map(tuple, binned.to_numpy()))
        want = set(map(tuple, naive.to_numpy()))
        assert got == want, (lo, hi, got ^ want)
    # the boundary pair specifically
    binned = bounded_range_join(a, b, "u", "bu", "ats", "bts", 0, 300)
    pairs9 = {
        (r.aid, r.bid)
        for r in binned.filter(F.col("u") == 9).select("aid", "bid").collect()
    }
    assert (9000, 9001) in pairs9 and (9000, 9002) not in pairs9


# ------------------------------------------------- round-5 operators


def test_group_standardize_integer_exact(spark):
    """dev/mean fixed-point values must equal a pure-integer Python
    reference (floor semantics, negatives included), and every row of the
    input must come back exactly once."""
    from tgist_features_spark.operators.aggregates import group_standardize

    rng = np.random.default_rng(5)
    pdf = pd.DataFrame({
        "doc_id": range(200),
        "g": rng.choice(["a", "b", "c"], 200),
        "x": rng.integers(0, 5000, 200),
    })
    got = (
        group_standardize(spark.createDataFrame(pdf), "x", "g")
        .toPandas().set_index("doc_id").sort_index()
    )
    assert len(got) == 200
    for g, sub in pdf.groupby("g"):
        n, sm = len(sub), int(sub["x"].sum())
        want_mean = (sm * 10000) // n
        for _, row in sub.iterrows():
            r = got.loc[row["doc_id"]]
            assert r["n_group"] == n
            assert r["mean_x10000"] == want_mean
            assert r["dev_x10000"] == ((int(row["x"]) * n - sm) * 10000) // n
    # floor (not trunc) on negative deviations: python // is floor — the
    # assertion above already pins it for every below-mean row
    assert (got["dev_x10000"] < 0).any() and (got["dev_x10000"] > 0).any()


def test_debounce_matches_pandas(spark):
    """Lag-based debounce vs a pandas reference: first row per stream
    survives, gaps >= threshold survive, sub-threshold rows drop; equal
    timestamps are ordered by the tiebreak."""
    from tgist_features_spark.operators.windows import debounce

    rng = np.random.default_rng(9)
    rows = []
    eid = 0
    for u in range(5):
        t = 0
        for _ in range(40):
            t += int(rng.integers(0, 90))
            rows.append((eid, u, pd.Timestamp(t, unit="s")))
            eid += 1
    pdf = pd.DataFrame(rows, columns=["event_id", "u", "ts"])
    got = set(
        debounce(
            spark.createDataFrame(pdf), ["u"], "ts", 30.0,
            order_tiebreak="event_id",
        ).toPandas()["event_id"]
    )
    want = set()
    for u, sub in pdf.groupby("u"):
        sub = sub.sort_values(["ts", "event_id"])
        prev = None
        for _, r in sub.iterrows():
            if prev is None or (r["ts"] - prev).total_seconds() >= 30.0:
                want.add(r["event_id"])
            prev = r["ts"]  # lag rule: previous ROW, kept or not
    assert got == want
    assert len(want) < len(pdf)  # the test corpus actually debounces


def test_hard_negatives_excludes_same_label(spark):
    """Every returned neighbor has a label different from its query's,
    ranks are contiguous from 1, and the top negative matches a numpy
    exhaustive reference."""
    from tgist_features_spark.operators.similarity import hard_negatives

    rng = np.random.default_rng(3)
    vecs = rng.normal(size=(60, 8)).astype(np.float64)
    labels = (np.arange(60) % 4)
    pdf = pd.DataFrame({
        "vec_id": range(60), "label": labels, "embedding": list(map(list, vecs)),
    })
    df = spark.createDataFrame(pdf)
    q = df.filter("vec_id < 3").select(
        F.col("vec_id").alias("q_id"),
        F.col("label").alias("q_label"),
        F.col("embedding").alias("q_vec"),
    )
    got = hard_negatives(df, q, k=5).toPandas()
    for qid, sub in got.groupby("q_id"):
        assert sorted(sub["rank"]) == [1, 2, 3, 4, 5]
        assert (sub["neighbor_label"] != labels[qid]).all()
        # numpy reference for the top hit
        sims = vecs @ vecs[qid] / (
            np.linalg.norm(vecs, axis=1) * np.linalg.norm(vecs[qid])
        )
        sims = np.round(sims, 6)
        mask = labels != labels[qid]
        order = sorted(np.where(mask)[0], key=lambda i: (-sims[i], i))
        assert sub.sort_values("rank")["neighbor_id"].iloc[0] == order[0]


def test_group_mad_outliers_matches_numpy(spark):
    """Exact median/MAD per group vs numpy (interpolated median), flag
    boundary exercised by a planted extreme value."""
    from tgist_features_spark.operators.aggregates import group_mad_outliers

    rng = np.random.default_rng(13)
    pdf = pd.DataFrame({
        "doc_id": range(121),
        "g": ["a"] * 60 + ["b"] * 61,
        "x": np.concatenate([
            rng.integers(90, 110, 60), rng.integers(400, 420, 60), [9999],
        ]),
    })
    got = (
        group_mad_outliers(spark.createDataFrame(pdf), "x", "g")
        .toPandas().set_index("doc_id").sort_index()
    )
    for g, sub in pdf.groupby("g"):
        med = np.percentile(sub["x"], 50, method="linear")
        mad = np.percentile(np.abs(sub["x"] - med), 50, method="linear")
        rows = got.loc[sub["doc_id"]]
        assert (rows["med"] == med).all(), g
        assert (rows["mad"] == mad).all(), g
        want = (np.abs(sub["x"].to_numpy() - med) > 3.0 * mad).astype(int)
        assert (rows["is_outlier"].to_numpy() == want).all(), g
    assert got.loc[120, "is_outlier"] == 1  # the planted extreme


def test_budget_sample_matches_naive_and_is_prefix_stable(spark):
    """The histogram-cut selection must equal the naive per-group
    hash-ordered cumsum rule exactly; raising one group's budget only
    APPENDS to its selection; unbudgeted groups are dropped; and the
    result is layout-independent."""
    import hashlib

    from tgist_features_spark.operators.sampling import budget_sample

    rng = np.random.default_rng(21)
    pdf = pd.DataFrame({
        "doc_id": range(600),
        "g": rng.choice(["a", "b", "nope"], 600, p=[0.5, 0.3, 0.2]),
        "w": rng.integers(1, 50, 600),
    })
    budgets = {"a": 900, "b": 400}

    def naive(budgets_):
        keep = set()
        for g, sub in pdf.groupby("g"):
            if g not in budgets_:
                continue
            hv = {
                r.doc_id: int(
                    hashlib.md5(f"{r.doc_id}budget".encode()).hexdigest()[:15], 16
                )
                for r in sub.itertuples()
            }
            run = 0
            for did in sorted(sub["doc_id"], key=lambda d: (hv[d], d)):
                wv = int(pdf.loc[pdf["doc_id"] == did, "w"].iloc[0])
                if run + wv > budgets_[g]:
                    break  # prefix rule: first crossing row ends the group
                run += wv
                keep.add(did)
        return keep

    df = spark.createDataFrame(pdf)
    got = set(
        budget_sample(df, "g", "w", budgets, "doc_id").toPandas()["doc_id"]
    )
    assert got == naive(budgets)
    # weight conservation under the budget
    kept_pdf = pdf[pdf["doc_id"].isin(got)]
    for g, cap in budgets.items():
        assert kept_pdf[kept_pdf["g"] == g]["w"].sum() <= cap
    assert not (kept_pdf["g"] == "nope").any()

    # prefix stability: bigger budget for 'a' keeps every old 'a' row
    got2 = set(
        budget_sample(df, "g", "w", {"a": 1500, "b": 400}, "doc_id")
        .toPandas()["doc_id"]
    )
    old_a = {d for d in got if (pdf.loc[pdf["doc_id"] == d, "g"] == "a").iloc[0]}
    assert old_a <= got2

    # layout independence
    got3 = set(
        budget_sample(df.repartition(13), "g", "w", budgets, "doc_id")
        .toPandas()["doc_id"]
    )
    assert got3 == got


def test_budget_sample_rejects_null_and_negative_weights(spark):
    from tgist_features_spark.operators.sampling import budget_sample

    df = spark.createDataFrame(
        [(1, "a", 5), (2, "a", None), (3, "a", 7)],
        schema="doc_id long, g string, w bigint",
    )
    with pytest.raises(ValueError, match="NULL"):
        budget_sample(df, "g", "w", {"a": 100}, "doc_id")
    neg = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1, 2], "g": ["a", "a"], "w": [5, -3]})
    )
    with pytest.raises(ValueError, match="negative"):
        budget_sample(neg, "g", "w", {"a": 100}, "doc_id")
    # fractional weights would be silently truncated by the bigint casts
    # — refused at plan-build time, before any job runs
    frac = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1, 2], "g": ["a", "a"], "w": [5.5, 3.25]})
    )
    with pytest.raises(TypeError, match="integral"):
        budget_sample(frac, "g", "w", {"a": 100}, "doc_id")


def test_distinct_sketches_merge_equals_one_pass(spark):
    """Mergeable-sketch maintenance: per-batch sketches unioned must give
    EXACTLY the one-pass sketch's estimate per key (the merge property
    that makes incremental maintenance free), and the estimate must be
    within the HLL error bound of the exact distinct count."""
    from tgist_features_spark.operators.aggregates import (
        distinct_sketches,
        merge_distinct_sketches,
    )

    rng = np.random.default_rng(17)
    pdf = pd.DataFrame({
        "g": rng.choice(["a", "b"], 30_000),
        "v": rng.integers(0, 5_000, 30_000),
        "batch": rng.integers(0, 3, 30_000),
    })
    df = spark.createDataFrame(pdf)
    one_pass = (
        distinct_sketches(df, ["g"], "v")
        .toPandas().set_index("g")["est"].to_dict()
    )
    per_batch = distinct_sketches(df, ["g", "batch"], "v")
    merged = (
        merge_distinct_sketches(per_batch, ["g"])
        .toPandas().set_index("g")["est"].to_dict()
    )
    assert merged == one_pass  # merge property: bit-equal estimates
    exact = pdf.groupby("g")["v"].nunique().to_dict()
    for g, e in exact.items():
        assert abs(merged[g] - e) / e < 0.05, (g, merged[g], e)


def test_normalize_for_dedup_collapses_variants(spark):
    """Case/punctuation/whitespace variants of one passage must normalize
    to the SAME string (and therefore dedup together); distinct content
    must not collide; NULL passes through."""
    from tgist_features_spark.functions.text import normalize_for_dedup

    pdf = pd.DataFrame({
        "doc_id": range(6),
        "text": [
            "The quick brown fox!",
            "the  quick   BROWN fox",
            "the,quick;brown--fox...",
            "a different document",
            "",
            None,
        ],
    })
    got = (
        spark.createDataFrame(pdf, schema="doc_id long, text string")
        .select("doc_id", normalize_for_dedup(F.col("text")).alias("n"))
        .toPandas().set_index("doc_id")["n"]
    )
    assert got[0] == got[1] == got[2] == "the quick brown fox"
    assert got[3] == "a different document"
    assert got[4] == ""
    assert got[5] is None


def test_funnel_step_conversions_matches_pandas(spark):
    """Per-pair conversion counts vs a brute-force pandas reference:
    window boundary (exactly +window kept, 0-gap excluded), multiple B
    events counted once per A, per-entity isolation."""
    from tgist_features_spark.operators.ranges import funnel_step_conversions

    rng = np.random.default_rng(23)
    rows = []
    eid = 0
    for u in range(8):
        t = 0
        for _ in range(30):
            t += int(rng.integers(1, 100))
            rows.append((eid, u, rng.choice(["view", "click", "buy"]), t))
            eid += 1
    pdf = pd.DataFrame(rows, columns=["event_id", "user_id", "event_type", "off"])
    pdf["ts"] = pd.to_datetime(pdf["off"], unit="s")
    got = (
        funnel_step_conversions(
            spark.createDataFrame(pdf[["event_id", "user_id", "event_type", "ts"]]),
            ["view", "click", "buy"], window_s=60.0,
        )
        .toPandas().set_index("step_from")
    )
    for a_step, b_step in [("view", "click"), ("click", "buy")]:
        A = pdf[pdf["event_type"] == a_step]
        B = pdf[pdf["event_type"] == b_step]
        conv = 0
        for _, ar in A.iterrows():
            hit = B[(B["user_id"] == ar["user_id"])
                    & (B["off"] > ar["off"]) & (B["off"] <= ar["off"] + 60)]
            conv += int(len(hit) > 0)
        row = got.loc[a_step]
        assert row["step_to"] == b_step
        assert row["n_from"] == len(A)
        assert row["n_converted"] == conv, (a_step, b_step)


def test_funnel_chain_matches_pandas(spark):
    """Chained-funnel depth vs a brute-force per-user pandas state
    machine: anchor = first step-0 event (ts, then id), each next step =
    earliest match strictly after and within window of the PREVIOUS
    match. Exercises window boundary (exactly +window kept), restart-free
    greediness (a later better anchor is ignored), and per-user
    isolation."""
    from tgist_features_spark.operators.ranges import funnel_chain

    rng = np.random.default_rng(31)
    steps = ["view", "click", "buy"]
    rows = []
    eid = 0
    for u in range(30):
        t = 0
        for _ in range(40):
            t += int(rng.integers(1, 50))
            rows.append((eid, u, str(rng.choice(steps + ["noise"])), t))
            eid += 1
    # planted exact-boundary chain: click exactly +60 of view (kept),
    # buy exactly +60 of that click (kept)
    rows += [(eid, 900, "view", 1000), (eid + 1, 900, "click", 1060),
             (eid + 2, 900, "buy", 1120)]
    # planted zero-gap: click at SAME ts as view must not advance
    rows += [(eid + 3, 901, "view", 2000), (eid + 4, 901, "click", 2000)]
    pdf = pd.DataFrame(rows, columns=["event_id", "user_id", "event_type", "off"])
    pdf["ts"] = pd.to_datetime(pdf["off"], unit="s")
    got = (
        funnel_chain(
            spark.createDataFrame(pdf[["event_id", "user_id", "event_type", "ts"]]),
            steps, window_s=60.0,
        )
        .toPandas().sort_values("step_idx").reset_index(drop=True)
    )

    depth = {}
    for u, g in pdf[pdf["event_type"].isin(steps)].groupby("user_id"):
        g = g.sort_values(["off", "event_id"])
        stage, t_prev = -1, None
        for _, r in g.iterrows():
            si = steps.index(r["event_type"])
            if stage == -1 and si == 0:
                stage, t_prev = 0, r["off"]
            elif si == stage + 1 and r["off"] > t_prev and r["off"] <= t_prev + 60:
                stage, t_prev = si, r["off"]
        depth[u] = stage
    for i, s in enumerate(steps):
        want = sum(1 for d in depth.values() if d >= i)
        row = got.iloc[i]
        assert row["step"] == s and row["step_idx"] == i
        assert int(row["n_reached"]) == want, (s, int(row["n_reached"]), want)
    assert depth[900] == 2 and depth[901] == 0


def test_transition_counts_matches_pandas(spark):
    from tgist_features_spark.operators.windows import transition_counts

    rng = np.random.default_rng(7)
    rows = []
    eid = 0
    for u in range(20):
        for _ in range(25):
            rows.append((eid, u, str(rng.choice(["a", "b", "c"])), eid * 10))
            eid += 1
    pdf = pd.DataFrame(rows, columns=["event_id", "user_id", "t", "off"])
    pdf["ts"] = pd.to_datetime(pdf["off"], unit="s")
    got = (
        transition_counts(
            spark.createDataFrame(pdf[["event_id", "user_id", "t", "ts"]]),
            "user_id", "t", ("ts", "event_id"),
        ).toPandas().set_index(["from_type", "to_type"])["n_transitions"]
    )
    ref = {}
    for _, g in pdf.groupby("user_id"):
        g = g.sort_values(["ts", "event_id"])
        for x, y in zip(g["t"], g["t"][1:]):
            ref[(x, y)] = ref.get((x, y), 0) + 1
    assert got.to_dict() == ref


def test_rolling_distinct_matches_pandas(spark):
    from tgist_features_spark.operators.windows import with_rolling_distinct

    rng = np.random.default_rng(11)
    pdf = pd.DataFrame({
        "event_id": range(300),
        "user_id": rng.integers(0, 10, 300),
        "t": rng.choice(["x", "y", "z", None], 300),
        "off": range(300),
    })
    pdf["ts"] = pd.to_datetime(pdf["off"], unit="s")
    got = (
        with_rolling_distinct(
            spark.createDataFrame(pdf[["event_id", "user_id", "t", "ts"]]),
            "t", "user_id", ("ts", "event_id"), n=4,
        ).toPandas().set_index("event_id")["n_distinct"]
    )
    for _, g in pdf.groupby("user_id"):
        g = g.sort_values(["ts", "event_id"]).reset_index(drop=True)
        for i in range(len(g)):
            lo = max(0, i - 3)
            vals = {v for v in g["t"][lo:i + 1] if v is not None}
            assert got[g["event_id"][i]] == len(vals)


def test_group_trend_matches_numpy_and_guards_overflow(spark):
    from tgist_features_spark.operators.aggregates import group_trend

    rng = np.random.default_rng(13)
    rows = []
    eid = 0
    for u in range(12):
        base = rng.uniform(-50, 50)
        drift = rng.uniform(-2, 2)
        for i in range(40):
            rows.append((eid, u, base + drift * i + rng.normal(0, 5), eid))
            eid += 1
    pdf = pd.DataFrame(rows, columns=["event_id", "g", "v", "off"])
    pdf["ts"] = pd.to_datetime(pdf["off"], unit="s")
    got = (
        group_trend(
            spark.createDataFrame(pdf[["event_id", "g", "v", "ts"]]),
            "v", "g", ("ts", "event_id"), scale=100,
        ).toPandas().set_index("g").sort_index()
    )
    for u, grp in pdf.groupby("g"):
        grp = grp.sort_values(["ts", "event_id"])
        x = np.arange(1, len(grp) + 1, dtype=np.int64)
        y = np.round(grp["v"].to_numpy() * 100).astype(np.int64)
        n = len(x)
        num = n * int((x * y).sum()) - int(x.sum()) * int(y.sum())
        den = n * int((x * x).sum()) - int(x.sum()) ** 2
        assert int(got.loc[u, "slope_num"]) == num
        assert int(got.loc[u, "slope_den"]) == den
        # exact slope agrees with the float least-squares fit
        slope = np.polyfit(x, y / 100.0, 1)[0]
        assert abs(num / den / 100.0 - slope) < 1e-6
    # overflow guard: a group violating max|y| * n^3 / 2 < 2^62 raises
    big = pd.DataFrame({
        "event_id": range(3000),
        "g": ["hot"] * 3000,
        "v": [9e13] * 3000,
        "ts": pd.to_datetime(range(3000), unit="s"),
    })
    # either the in-plan guard fires (actionable message) or ANSI mode
    # catches the per-row product overflow first — loud both ways, never
    # a silent wraparound
    with pytest.raises(
        Exception, match="exact-arithmetic bound|ARITHMETIC_OVERFLOW"
    ):
        group_trend(
            spark.createDataFrame(big), "v", "g", ("ts", "event_id"), scale=100
        ).collect()


def test_interval_overlap_join_matches_bruteforce(spark):
    from tgist_features_spark.operators.ranges import interval_overlap_join

    rng = np.random.default_rng(17)
    def mk(n, prefix):
        start = rng.integers(0, 5000, n)
        length = rng.integers(0, 400, n)
        return pd.DataFrame({
            f"{prefix}id": range(n),
            f"{prefix}e": rng.integers(0, 6, n),
            f"{prefix}s": pd.to_datetime(start, unit="s"),
            f"{prefix}end": pd.to_datetime(start + length, unit="s"),
        })
    A, B = mk(120, "a"), mk(150, "b")
    got = (
        interval_overlap_join(
            spark.createDataFrame(A), spark.createDataFrame(B),
            "ae", "be", "as", "aend", "bs", "bend", bucket_s=120.0,
        ).select("aid", "bid").toPandas()
    )
    got_pairs = set(zip(got["aid"], got["bid"]))
    ref = set()
    for _, ar in A.iterrows():
        for _, br in B.iterrows():
            if (
                ar["ae"] == br["be"]
                and ar["as"] < br["bend"]
                and br["bs"] < ar["aend"]
            ):
                ref.add((ar["aid"], br["bid"]))
    assert got_pairs == ref
    assert len(got) == len(got_pairs)  # exactly-once, no dedup pass


def test_interval_overlap_join_refuses_inverted(spark):
    from tgist_features_spark.operators.ranges import interval_overlap_join

    A = pd.DataFrame({
        "aid": [0], "ae": [1],
        "as": pd.to_datetime([100], unit="s"),
        "aend": pd.to_datetime([50], unit="s"),
    })
    B = pd.DataFrame({
        "bid": [0], "be": [1],
        "bs": pd.to_datetime([0], unit="s"),
        "bend": pd.to_datetime([200], unit="s"),
    })
    with pytest.raises(Exception, match="end < start"):
        interval_overlap_join(
            spark.createDataFrame(A), spark.createDataFrame(B),
            "ae", "be", "as", "aend", "bs", "bend", bucket_s=60.0,
        ).collect()


def test_token_bigram_counts_matches_pandas(spark):
    from tgist_features_spark.functions.text import token_bigram_counts

    pdf = pd.DataFrame({
        "doc_id": range(6),
        "text": [
            "a b c a b", "a b", "c", "x y x y x", "q", "b a",
        ],
    })
    got = (
        token_bigram_counts(spark.createDataFrame(pdf))
        .toPandas().set_index(["w1", "w2"])["n_pairs"].to_dict()
    )
    ref = {}
    for t in pdf["text"]:
        ws = t.split(" ")
        for x, y in zip(ws, ws[1:]):
            ref[(x, y)] = ref.get((x, y), 0) + 1
    assert got == ref
    # min_count prunes the tail after exact aggregation
    from tgist_features_spark.functions.text import token_bigram_counts as tbc
    got2 = tbc(spark.createDataFrame(pdf), min_count=2).toPandas()
    assert set(map(tuple, got2[["w1", "w2"]].values)) == {
        k for k, v in ref.items() if v >= 2
    }


def test_cooccurrence_counts_matches_bruteforce(spark):
    from tgist_features_spark.functions.text import cooccurrence_counts

    pdf = pd.DataFrame({
        "doc_id": range(5),
        "text": [
            "the cat sat", "the dog sat!", "cat dog", "THE the cat",
            "zebra",
        ],
    })
    got = cooccurrence_counts(spark.createDataFrame(pdf)).toPandas()
    import re
    docs = [
        sorted({
            w for w in (re.sub(r"[^a-z0-9]", "", t) for t in s.lower().split(" "))
            if w
        })
        for s in pdf["text"]
    ]
    ref_ab, ref_df = {}, {}
    for toks in docs:
        for w in toks:
            ref_df[w] = ref_df.get(w, 0) + 1
        for i, a in enumerate(toks):
            for b in toks[i + 1:]:
                ref_ab[(a, b)] = ref_ab.get((a, b), 0) + 1
    assert got.set_index(["a", "b"])["n_ab"].to_dict() == ref_ab
    for _, r in got.iterrows():
        assert r["n_a"] == ref_df[r["a"]] and r["n_b"] == ref_df[r["b"]]
        assert r["n_docs"] == 5
    # the cap bounds pair fan-out per doc at max_tokens choose 2
    capped = cooccurrence_counts(
        spark.createDataFrame(pd.DataFrame({
            "doc_id": [0], "text": [" ".join(f"w{i:03d}" for i in range(100))],
        })), max_tokens=8,
    ).toPandas()
    assert len(capped) == 8 * 7 // 2
    assert set(capped["a"]).issubset({f"w{i:03d}" for i in range(8)})


def test_group_cdf_matches_pandas(spark):
    from tgist_features_spark.operators.windows import with_group_cdf

    rng = np.random.default_rng(23)
    pdf = pd.DataFrame({
        "doc_id": range(200),
        "g": rng.choice(["x", "y", "z"], 200),
        "v": rng.integers(0, 50, 200),  # plenty of ties
    })
    got = with_group_cdf(
        spark.createDataFrame(pdf), "v", "g", "doc_id"
    ).toPandas().set_index("doc_id")
    for g, grp in pdf.groupby("g"):
        ranks = grp["v"].rank(method="min").astype(int) - 1
        for did, r in zip(grp["doc_id"], ranks):
            assert got.loc[did, "rank_m1"] == r
            assert got.loc[did, "n_m1"] == len(grp) - 1


def test_equidepth_bins_balanced_and_exact(spark):
    from tgist_features_spark.operators.windows import equidepth_bins

    rng = np.random.default_rng(29)
    pdf = pd.DataFrame({
        "doc_id": range(500),
        "g": rng.choice(["a", "b"], 500),
        "v": rng.integers(0, 40, 500),  # heavy ties
    })
    got = equidepth_bins(
        spark.createDataFrame(pdf), "v", "g", "doc_id", n_bins=10
    ).toPandas()
    for g, grp in pdf.groupby("g"):
        sub = got[got["g"] == g].set_index("bin").sort_index()
        # populations differ by at most one BY CONSTRUCTION, even
        # under ties (the row_number tiebreak)
        assert sub["n_rows"].max() - sub["n_rows"].min() <= 1
        assert sub["n_rows"].sum() == len(grp)
        assert sub["sum_v"].sum() == grp["v"].sum()
        # reference via the same (v, id) ordering
        grp = grp.sort_values(["v", "doc_id"]).reset_index(drop=True)
        bins = (np.arange(len(grp)) * 10) // len(grp)
        ref = pd.DataFrame({"bin": bins, "v": grp["v"]}).groupby("bin")["v"]
        assert sub["min_v"].to_dict() == ref.min().to_dict()
        assert sub["max_v"].to_dict() == ref.max().to_dict()
    with pytest.raises(ValueError, match="n_bins"):
        equidepth_bins(spark.createDataFrame(pdf), "v", "g", "doc_id", 0)


def test_conversion_latency_matches_pandas(spark):
    from tgist_features_spark.operators.ranges import conversion_latency

    rng = np.random.default_rng(31)
    pdf = pd.DataFrame({
        "event_id": range(400),
        "user_id": rng.integers(0, 25, 400),
        "event_type": rng.choice(["view", "purchase", "click"], 400,
                                 p=[0.5, 0.1, 0.4]),
        "off": rng.integers(0, 100000, 400),
    })
    pdf["ts"] = pd.to_datetime(pdf["off"], unit="s")
    got = conversion_latency(
        spark.createDataFrame(pdf[["event_id", "user_id", "event_type", "ts"]]),
        "user_id", "event_type", "view", "purchase",
    ).toPandas().set_index("user_id")
    seen = set()
    for u, grp in pdf.groupby("user_id"):
        views = grp[grp["event_type"] == "view"]
        if views.empty:
            assert u not in got.index
            continue
        seen.add(u)
        f = views["off"].min() * 1_000_000
        purch = grp[grp["event_type"] == "purchase"]
        after = purch[purch["off"] * 1_000_000 >= f]
        assert got.loc[u, "from_us"] == f
        if after.empty:
            assert pd.isna(got.loc[u, "to_us"])  # censored, still a row
        else:
            t = after["off"].min() * 1_000_000
            assert got.loc[u, "to_us"] == t
            assert got.loc[u, "latency_us"] == t - f
    assert set(got.index) == seen


def test_rolling_outliers_matches_numpy(spark):
    from tgist_features_spark.operators.windows import with_rolling_outliers

    rng = np.random.default_rng(37)
    rows = []
    eid = 0
    for u in range(10):
        for i in range(60):
            v = float(rng.normal(50, 2))
            if rng.random() < 0.05:
                v += 40.0  # injected spikes
            rows.append((eid, u, v, eid))
            eid += 1
    pdf = pd.DataFrame(rows, columns=["event_id", "u", "v", "off"])
    pdf["ts"] = pd.to_datetime(pdf["off"], unit="s")
    got = with_rolling_outliers(
        spark.createDataFrame(pdf[["event_id", "u", "v", "ts"]]),
        "v", "u", ("ts", "event_id"), n=20, z=3, scale=100,
    ).toPandas().set_index("event_id")
    n_flagged = 0
    for u, grp in pdf.groupby("u"):
        grp = grp.sort_values(["ts", "event_id"]).reset_index(drop=True)
        y = np.round(grp["v"].to_numpy() * 100).astype(np.int64)
        for i in range(len(grp)):
            lo = max(0, i - 19)
            win = y[lo:i + 1]
            cnt, s, q = len(win), int(win.sum()), int((win * win).sum())
            assert got.loc[grp["event_id"][i], "win_cnt"] == cnt
            assert got.loc[grp["event_id"][i], "win_sum"] == s
            assert got.loc[grp["event_id"][i], "win_sumsq"] == q
            dev = int(y[i]) * cnt - s
            var_num = cnt * q - s * s
            want = dev * dev > 9 * var_num if var_num > 0 else dev != 0
            assert bool(got.loc[grp["event_id"][i], "is_outlier"]) == want
            n_flagged += want
    assert n_flagged > 0  # the injected spikes are actually caught
    # first row of each entity: cnt==1, var 0, dev 0 -> never an outlier
    firsts = pdf.sort_values(["ts", "event_id"]).groupby("u").head(1)
    for e in firsts["event_id"]:
        assert not got.loc[e, "is_outlier"]


def test_population_drift_counts_and_edges(spark):
    from tgist_features_spark.operators.aggregates import population_drift

    rng = np.random.default_rng(41)
    ref = pd.DataFrame({"v": rng.integers(0, 100, 1000)})
    new = pd.DataFrame({"v": np.concatenate([
        rng.integers(0, 100, 500),
        rng.integers(150, 200, 100),   # unseen-above mass
        np.array([-5, -1]),            # below-reference mass
    ])})
    got = population_drift(
        spark.createDataFrame(ref), spark.createDataFrame(new), "v", 10
    ).toPandas().sort_values("bin").reset_index(drop=True)
    assert list(got["bin"]) == list(range(10))
    assert got["ref_n"].sum() == 1000 and got["ref_total"].iloc[0] == 1000
    assert got["new_n"].sum() == len(new) and got["new_total"].iloc[0] == len(new)
    # reference boundaries via the same rank rule
    sv = np.sort(ref["v"].to_numpy())
    bins = (np.arange(1000) * 10) // 1000
    lo = {b: int(sv[bins == b].min()) for b in range(10)}
    assert got.set_index("bin")["lo"].to_dict() == lo
    # value rule: count of boundaries <= v, minus 1; clamp to 0
    edges_sorted = sorted(lo.values())
    def bin_of(x):
        k = sum(1 for e in edges_sorted if e <= x) - 1
        return max(k, 0)
    for frame, col in ((ref, "ref_n"), (new, "new_n")):
        want = pd.Series([bin_of(x) for x in frame["v"]]).value_counts()
        for b in range(10):
            assert got.loc[b, col] == want.get(b, 0), (col, b)
    # above-reference values landed in the last bin
    assert got.loc[9, "new_n"] >= 100
    with pytest.raises(ValueError, match="n_bins"):
        population_drift(
            spark.createDataFrame(ref), spark.createDataFrame(new), "v", 0
        )
    # an EMPTY (or all-NULL) reference must refuse loudly, not silently
    # report an empty drift table while the new corpus has rows
    empty = spark.createDataFrame([], "v long")
    with pytest.raises(ValueError, match="reference"):
        population_drift(empty, spark.createDataFrame(new), "v", 10)


def test_new_ops_null_value_contracts(spark):
    """Round-6 NULL rules: NULL values never occupy a regression slot,
    a rolling window's cnt counts values not rows, rank/bin/drift ops
    exclude NULLs (engines disagree on NULL sort order)."""
    from tgist_features_spark.operators.aggregates import (
        group_trend,
        population_drift,
    )
    from tgist_features_spark.operators.windows import (
        equidepth_bins,
        with_group_cdf,
        with_rolling_outliers,
    )

    pdf = pd.DataFrame({
        "event_id": range(6),
        "g": ["a"] * 6,
        "v": [1.0, None, 2.0, 3.0, None, 4.0],
    })
    pdf["ts"] = pd.to_datetime(pdf["event_id"], unit="s")
    sdf = spark.createDataFrame(pdf)

    # group_trend: x indexes observed values only -> n == 4 and the
    # slope of y = 100,200,300,400 over x=1..4 is exactly 100/unit
    t = group_trend(sdf, "v", "g", ("ts", "event_id"), scale=100).first()
    assert t["n"] == 4
    assert t["slope_num"] / t["slope_den"] == 100.0

    # rolling outliers: win_cnt counts VALUES; NULL rows never flagged
    ro = (
        with_rolling_outliers(sdf, "v", "g", ("ts", "event_id"), n=3)
        .toPandas().set_index("event_id")
    )
    assert ro.loc[2, "win_cnt"] == 2      # rows 0,1,2 -> values 1.0, 2.0
    assert ro.loc[4, "win_cnt"] == 2      # rows 2,3,4 -> values 2.0, 3.0
    assert not ro.loc[1, "is_outlier"] and not ro.loc[4, "is_outlier"]

    # rank/bin ops exclude NULL rows entirely
    cdf = with_group_cdf(sdf, "v", "g", "event_id").toPandas()
    assert set(cdf["event_id"]) == {0, 2, 3, 5}
    assert set(cdf["n_m1"]) == {3}
    bins = equidepth_bins(sdf, "v", "g", "event_id", 2).toPandas()
    assert bins["n_rows"].sum() == 4

    # drift: NULLs excluded from both corpora
    d = population_drift(sdf, sdf, "v", 2).toPandas()
    assert d["ref_total"].iloc[0] == 4 and d["new_total"].iloc[0] == 4


def test_interval_islands_matches_bruteforce(spark):
    from tgist_features_spark.operators.ranges import interval_islands

    rng = np.random.default_rng(41)
    rows = []
    for i in range(500):
        s = int(rng.integers(0, 2000))
        rows.append((i, int(rng.integers(0, 12)), s, s + int(rng.integers(0, 60))))
    df = spark.createDataFrame(rows, ["id", "e", "s", "t"])
    got = (
        interval_islands(df, "e", "s", "t", "id")
        .toPandas()
        .sort_values(["e", "island_id"])
        .reset_index(drop=True)
    )
    # brute force: sweep each entity's intervals in (s, t, id) order
    exp = []
    byent: dict[int, list[tuple[int, int, int]]] = {}
    for i, e, s, t in rows:
        byent.setdefault(e, []).append((s, t, i))
    for e, ivs in byent.items():
        ivs.sort()
        cur_s, cur_e, n, isl = None, None, 0, 0
        for s, t, _ in ivs:
            if cur_s is None or s > cur_e:
                if cur_s is not None:
                    exp.append((e, isl, cur_s, cur_e, n))
                isl += 1
                cur_s, cur_e, n = s, t, 1
            else:
                cur_e = max(cur_e, t)
                n += 1
        exp.append((e, isl, cur_s, cur_e, n))
    exp_df = (
        pd.DataFrame(exp, columns=["e", "island_id", "island_start",
                                   "island_end", "n_spans"])
        .sort_values(["e", "island_id"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got[exp_df.columns].astype("int64"), exp_df.astype("int64")
    )
    # coverage identity: island lengths never double-count overlap
    for (_, r) in exp_df.iterrows():
        assert r.island_end >= r.island_start


def test_interval_islands_refuses_inverted(spark):
    import pyspark.errors

    from tgist_features_spark.operators.ranges import interval_islands

    df = spark.createDataFrame([(1, "u", 10, 5)], ["id", "e", "s", "t"])
    try:
        interval_islands(df, "e", "s", "t", "id").collect()
        raise AssertionError("inverted interval must be refused")
    except pyspark.errors.PySparkException:
        pass


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_vocab_edit1_exact_recall(spark):
    from tgist_features_spark.operators.dedup import vocab_edit1_pairs

    # substitution, deletion, insertion, distance-2 (excluded),
    # min_len boundary, punctuation stripping, identical dups collapse
    docs = [
        "receive recieve spark spork sparks",
        "table tables tango mango managed",
        "batch match watch latch catch dispatch",
        "scan! scans SCAN arc ark the they",
    ]
    df = spark.createDataFrame([(d,) for d in docs], ["text"])
    got = {
        (r.w_a, r.w_b)
        for r in vocab_edit1_pairs(df, min_len=4).collect()
    }
    # brute force over the same normalization
    import re

    vocab = set()
    for d in docs:
        for t in d.lower().split(" "):
            t = re.sub("[^a-z0-9]", "", t)
            if len(t) >= 4:
                vocab.add(t)
    exp = {
        (a, b)
        for a in vocab
        for b in vocab
        if a < b and _lev(a, b) == 1
    }
    assert got == exp
    # the three edit kinds are each represented in the fixture
    assert ("spark", "spork") in got       # substitution
    assert ("spark", "sparks") in got      # insertion
    assert ("scan", "scans") in got        # punctuation-stripped + case


def test_cohort_retention_matches_pandas(spark):
    from tgist_features_spark.operators.aggregates import cohort_retention

    rng = np.random.default_rng(43)
    pdf = pd.DataFrame({
        "user_id": rng.integers(0, 40, 600),
        "off": rng.integers(0, 40 * 86400, 600),
    })
    pdf["ts"] = pd.to_datetime(pdf["off"], unit="s")
    got = (
        cohort_retention(
            spark.createDataFrame(pdf[["user_id", "ts"]]), "user_id", "ts",
            bucket_s=86_400 * 7,
        )
        .toPandas()
        .set_index(["cohort_bucket", "bucket_offset"])["n_active"]
    )
    w = 86_400 * 7 * 1_000_000
    pdf["bkt"] = (pdf["off"] * 1_000_000) // w
    first = pdf.groupby("user_id")["bkt"].min()
    exp: dict[tuple[int, int], int] = {}
    for (u, b), _ in pdf.groupby(["user_id", "bkt"]):
        key = (first[u], b - first[u])
        exp[key] = exp.get(key, 0) + 1
    assert dict(got) == exp
    # offset-0 cells sum to the number of users
    assert got.xs(0, level="bucket_offset").sum() == pdf["user_id"].nunique()


def test_stratified_kfold_balance_and_determinism(spark):
    from tgist_features_spark.operators.sampling import stratified_kfold

    rng = np.random.default_rng(47)
    pdf = pd.DataFrame({
        "id": range(1000),
        "label": rng.choice(["a", "b", "c", "rare"], 1000,
                            p=[0.5, 0.3, 0.19, 0.01]),
    })
    df = spark.createDataFrame(pdf)
    got = stratified_kfold(df, "label", "id", 7).toPandas()
    assert set(got["fold"].unique()) <= set(range(7))
    # exact per-label balance: fold sizes differ by at most one
    for _, grp in got.groupby("label"):
        sizes = grp.groupby("fold").size()
        full = sizes.reindex(range(7), fill_value=0)
        assert full.max() - full.min() <= 1
    # deterministic: a repartitioned rerun assigns identically
    again = stratified_kfold(df.repartition(13), "label", "id", 7).toPandas()
    merged = got.merge(again, on=["id", "label"], suffixes=("_1", "_2"))
    assert (merged["fold_1"] == merged["fold_2"]).all()


def test_level_shift_matches_numpy(spark):
    from tgist_features_spark.operators.windows import with_level_shift

    rng = np.random.default_rng(53)
    rows = []
    eid = 0
    for u in range(8):
        base = 10.0
        for i in range(60):
            if i == 30 and u % 2 == 0:
                base = 40.0  # a genuine level shift for even users
            v = None if rng.random() < 0.05 else round(
                base + float(rng.normal(0, 1)), 2)
            rows.append((eid, u, i, v))
            eid += 1
    df = spark.createDataFrame(rows, ["event_id", "user_id", "i", "value"])
    n, thr = 10, 1500
    got = (
        with_level_shift(df, "value", "user_id", ("i",), n=n, thr_cents=thr)
        .toPandas()
        .set_index("event_id")
    )
    byu: dict[int, list[tuple[int, float | None]]] = {}
    for e, u, i, v in rows:
        byu.setdefault(u, []).append((e, v))
    n_flagged = 0
    for u, seq in byu.items():
        ys = [None if v is None else round(v * 100) for _, v in seq]
        for idx, (e, _) in enumerate(seq):
            rec = [y for y in ys[max(0, idx - n + 1): idx + 1] if y is not None]
            prior_rows = ys[max(0, idx - 2 * n + 1): max(0, idx - n + 1)]
            pri = [y for y in prior_rows if y is not None]
            a, b = sum(rec), sum(pri)
            flag = (
                len(prior_rows) == n
                and len(pri) > 0
                and len(rec) > 0
                and abs(a * len(pri) - b * len(rec)) > thr * len(rec) * len(pri)
            )
            assert got.loc[e, "is_shift"] == flag, (u, idx)
            assert got.loc[e, "recent_sum"] == a
            n_flagged += int(flag)
    assert n_flagged > 0  # the injected shifts are detected


def test_interarrival_histogram_matches_pandas(spark):
    from tgist_features_spark.operators.windows import interarrival_histogram

    rng = np.random.default_rng(59)
    pdf = pd.DataFrame({
        "event_id": range(400),
        "user_id": rng.integers(0, 15, 400),
        "event_type": rng.choice(["a", "b"], 400),
        "off": rng.integers(0, 100000, 400),
    })
    pdf["ts"] = pd.to_datetime(pdf["off"], unit="s")
    got = (
        interarrival_histogram(
            spark.createDataFrame(
                pdf[["event_id", "user_id", "event_type", "ts"]]),
            "user_id", ("ts", "event_id"), by_col="event_type",
        ).toPandas().set_index(["event_type", "gap_bucket"]).sort_index()
    )
    exp: dict[tuple[str, int], list[int]] = {}
    for _, grp in pdf.sort_values(["off", "event_id"]).groupby("user_id"):
        offs = (grp["off"] * 1_000_000).to_numpy()
        types = grp["event_type"].to_numpy()
        for i in range(1, len(grp)):
            gap = int(offs[i] - offs[i - 1])
            bkt = len(bin(gap)) - 2  # strip '0b'; bin(0) -> '0b0' len 1
            exp.setdefault((types[i], bkt), []).append(gap)
    assert set(got.index) == set(exp)
    for k, gaps in exp.items():
        assert got.loc[k, "n_gaps"] == len(gaps)
        assert got.loc[k, "min_us"] == min(gaps)
        assert got.loc[k, "max_us"] == max(gaps)
        assert got.loc[k, "sum_us"] == sum(gaps)
    # mass conservation: every non-first event contributes one gap
    n_first = pdf["user_id"].nunique()
    assert got["n_gaps"].sum() == len(pdf) - n_first


def test_scd2_intervals_matches_pandas(spark):
    from tgist_features_spark.operators.windows import scd2_intervals

    rows = [
        # user 1: a a b b a  -> runs a, b, a (repeat inside run collapses)
        (1, 1, "a", 0), (2, 1, "a", 10), (3, 1, "b", 20),
        (4, 1, "b", 30), (5, 1, "a", 40),
        # user 2: NULL is a real state: None, a, None
        (6, 2, None, 0), (7, 2, "a", 10), (8, 2, None, 20),
        # user 3: single state
        (9, 3, "z", 5),
    ]
    pdf = pd.DataFrame(rows, columns=["event_id", "user_id", "state", "off"])
    pdf["ts"] = pd.to_datetime(pdf["off"], unit="s")
    got = (
        scd2_intervals(
            spark.createDataFrame(
                pdf[["event_id", "user_id", "state", "ts"]]),
            "user_id", "state", ("ts", "event_id"),
        ).toPandas().sort_values(["user_id", "valid_from_us"])
        .reset_index(drop=True)
    )
    m = 1_000_000
    exp = pd.DataFrame([
        (1, "a", 0, 20 * m), (1, "b", 20 * m, 40 * m), (1, "a", 40 * m, None),
        (2, None, 0, 10 * m), (2, "a", 10 * m, 20 * m), (2, None, 20 * m, None),
        (3, "z", 5 * m, None),
    ], columns=["user_id", "state", "valid_from_us", "valid_to_us"])
    assert len(got) == len(exp)
    for i in range(len(exp)):
        for c in exp.columns:
            g, e = got.loc[i, c], exp.loc[i, c]
            assert (pd.isna(g) and pd.isna(e)) or g == e, (i, c, g, e)
    # half-open intervals tile each key's timeline without overlap
    for _, grp in got.groupby("user_id"):
        grp = grp.sort_values("valid_from_us")
        froms = grp["valid_from_us"].to_numpy()
        tos = grp["valid_to_us"].to_numpy()
        assert pd.isna(tos[-1])
        assert (tos[:-1] == froms[1:]).all()


def test_transition_latency_matches_pandas(spark):
    from tgist_features_spark.operators.windows import transition_latency

    rng = np.random.default_rng(67)
    pdf = pd.DataFrame({
        "event_id": range(300),
        "user_id": rng.integers(0, 10, 300),
        "event_type": rng.choice(["x", "y", "z"], 300),
        "off": rng.integers(0, 50000, 300),
    })
    pdf["ts"] = pd.to_datetime(pdf["off"], unit="s")
    got = (
        transition_latency(
            spark.createDataFrame(
                pdf[["event_id", "user_id", "event_type", "ts"]]),
            "user_id", "event_type", ("ts", "event_id"),
        ).toPandas().set_index(["from_type", "to_type"])
    )
    exp: dict[tuple[str, str], list[int]] = {}
    for _, grp in pdf.sort_values(["off", "event_id"]).groupby("user_id"):
        offs = (grp["off"] * 1_000_000).to_numpy()
        types = grp["event_type"].to_numpy()
        for i in range(1, len(grp)):
            exp.setdefault((types[i - 1], types[i]), []).append(
                int(offs[i] - offs[i - 1]))
    assert set(got.index) == set(exp)
    for k, gaps in exp.items():
        assert got.loc[k, "n_transitions"] == len(gaps)
        assert got.loc[k, "sum_us"] == sum(gaps)
        assert got.loc[k, "min_us"] == min(gaps)
        assert got.loc[k, "max_us"] == max(gaps)


def test_group_winsorize_matches_numpy(spark):
    from tgist_features_spark.operators.aggregates import group_winsorize

    rng = np.random.default_rng(71)
    pdf = pd.DataFrame({
        "id": range(600),
        "g": rng.choice(["a", "b", "c"], 600, p=[0.6, 0.39, 0.01]),
        "v": rng.integers(-500, 5000, 600),
    })
    got = (
        group_winsorize(spark.createDataFrame(pdf), "v", "g", "id",
                        lo_pct=10, hi_pct=90)
        .toPandas().set_index("id").sort_index()
    )
    for gname, grp in pdf.groupby("g"):
        s = grp.sort_values(["v", "id"]).reset_index(drop=True)
        n = len(s)
        lo = s.loc[(n - 1) * 10 // 100, "v"]
        hi = s.loc[(n - 1) * 90 // 100, "v"]
        for _, r in grp.iterrows():
            assert got.loc[r["id"], "value_wins"] == min(max(r["v"], lo), hi)
    # winsorizing at [0, 100] is the identity
    ident = group_winsorize(spark.createDataFrame(pdf), "v", "g", "id",
                            lo_pct=0, hi_pct=100).toPandas()
    assert (ident["value_wins"] == ident["v"]).all()


def test_char_pair_counts_matches_bruteforce(spark):
    from tgist_features_spark.functions.text import char_pair_counts

    docs = ["low low lower Lowest!", "new newer low", "a bb a"]
    got = {
        r.pair: r.n_pairs
        for r in char_pair_counts(
            spark.createDataFrame([(d,) for d in docs], ["text"])
        ).collect()
    }
    import re

    exp: dict[str, int] = {}
    for d in docs:
        for w in d.lower().split(" "):
            w = re.sub("[^a-z0-9]", "", w)
            if len(w) < 2:
                continue
            for i in range(len(w) - 1):
                exp[w[i:i + 2]] = exp.get(w[i:i + 2], 0) + 1
    assert got == exp
    # occurrence weighting: low x3 + lower + lowest all contribute "lo"
    assert got["lo"] == 5


def test_interval_islands_salted_equals_plain(spark):
    from tgist_features_spark.operators.ranges import (
        interval_islands,
        interval_islands_salted,
    )

    rng = np.random.default_rng(79)
    rows = []
    # one hot entity with heavy overlap + several normal ones + one
    # entity whose intervals never overlap (worst case for the salted
    # route — must still be exactly equal)
    for i in range(800):
        s = int(rng.integers(0, 3000))
        rows.append((i, 0, s, s + int(rng.integers(5, 120))))
    for i in range(800, 1000):
        e = int(rng.integers(1, 8))
        s = int(rng.integers(0, 2000))
        rows.append((i, e, s, s + int(rng.integers(0, 50))))
    for k, i in enumerate(range(1000, 1050)):
        rows.append((i, 9, 1000 * k, 1000 * k + 10))  # disjoint
    df = spark.createDataFrame(rows, ["id", "e", "s", "t"])
    plain = (
        interval_islands(df, "e", "s", "t", "id")
        .toPandas().sort_values(["e", "island_id"]).reset_index(drop=True)
    )
    for n_salts in (2, 16):
        salted = (
            interval_islands_salted(df, "e", "s", "t", "id", n_salts=n_salts)
            .toPandas().sort_values(["e", "island_id"]).reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(
            salted.astype("int64"), plain.astype("int64")
        )


def test_group_winsorize_excludes_nulls(spark):
    from tgist_features_spark.operators.aggregates import group_winsorize

    pdf = pd.DataFrame({
        "id": range(20),
        "g": ["a"] * 20,
        "v": [None if i % 5 == 0 else i * 10 for i in range(20)],
    })
    got = group_winsorize(
        spark.createDataFrame(pdf), "v", "g", "id", lo_pct=10, hi_pct=90
    ).toPandas()
    # the group_cdf NULL contract: NULL rows omitted, ranks over values only
    assert len(got) == 16
    assert got["v"].notna().all()
    vals = sorted(pdf["v"].dropna())
    lo = vals[(16 - 1) * 10 // 100]
    hi = vals[(16 - 1) * 90 // 100]
    assert got["value_wins"].min() == lo and got["value_wins"].max() == hi


def test_interarrival_histogram_refuses_bad_order(spark):
    import pyspark.errors

    from tgist_features_spark.operators.windows import interarrival_histogram

    pdf = pd.DataFrame({
        "event_id": [1, 2], "user_id": [1, 1], "seq": [1, 2],
        "ts": pd.to_datetime([100, 50], unit="s"),
    })
    df = spark.createDataFrame(pdf)
    try:
        interarrival_histogram(df, "user_id", ("seq",)).collect()
        raise AssertionError("order inconsistent with ts must be refused")
    except pyspark.errors.PySparkException:
        pass


def test_group_weighted_median_matches_numpy(spark):
    from tgist_features_spark.operators.aggregates import group_weighted_median

    rng = np.random.default_rng(83)
    pdf = pd.DataFrame({
        "id": range(500),
        "g": rng.choice(["a", "b", "c"], 500),
        "v": rng.integers(-100, 100, 500),
        "w": rng.integers(0, 50, 500),  # zero weights legal, ignored mass
    })
    got = (
        group_weighted_median(spark.createDataFrame(pdf), "v", "w", "g", "id")
        .toPandas().set_index("g")
    )
    for gname, grp in pdf.groupby("g"):
        s = grp.sort_values(["v", "id"])
        tot = s["w"].sum()
        cum = s["w"].cumsum()
        wmed = s.loc[(cum * 2 >= tot).idxmax(), "v"] if tot > 0 else None
        # idxmax returns the FIRST True — the lower weighted median
        assert got.loc[gname, "wmedian"] == wmed
        assert got.loc[gname, "total_weight"] == tot
        assert got.loc[gname, "n_rows"] == len(grp)
    # unit weights degenerate to the lower median
    pdf["w1"] = 1
    got1 = (
        group_weighted_median(spark.createDataFrame(pdf), "v", "w1", "g", "id")
        .toPandas().set_index("g")
    )
    for gname, grp in pdf.groupby("g"):
        vals = sorted(grp["v"])
        assert got1.loc[gname, "wmedian"] == vals[(len(vals) - 1) // 2]


def test_group_weighted_median_refuses_bad_weights(spark):
    import pyspark.errors

    from tgist_features_spark.operators.aggregates import group_weighted_median

    for bad in (-1, None):
        pdf = pd.DataFrame({
            "id": [1, 2], "g": ["a", "a"], "v": [1, 2],
            "w": [5, bad],
        })
        try:
            group_weighted_median(
                spark.createDataFrame(pdf), "v", "w", "g", "id"
            ).collect()
            raise AssertionError(f"weight {bad} must be refused")
        except pyspark.errors.PySparkException:
            pass


def test_count_min_sketches_properties(spark):
    from tgist_features_spark.operators.aggregates import (
        cms_estimate,
        count_min_sketches,
        merge_count_min_sketches,
    )

    rng = np.random.default_rng(89)
    pdf = pd.DataFrame({
        "key": rng.choice(["x", "y"], 4000),
        "val": rng.zipf(1.5, 4000) % 200,  # skewed frequencies
    })
    df = spark.createDataFrame(pdf)
    depth, width = 4, 1024
    sk = count_min_sketches(df, ["key"], "val", depth=depth, width=width)
    cells = sk.toPandas()
    # mass conservation: each depth row carries the key's full weight
    true_tot = pdf.groupby("key").size()
    for (k, d), grp in cells.groupby(["key", "cm_depth"]):
        assert grp["cm_cnt"].sum() == true_tot[k]
    # overestimate property + CMS error bound with generous slack
    queries = df.distinct()
    est = (
        cms_estimate(sk, queries, ["key"], "val", depth=depth, width=width)
        .toPandas().set_index(["key", "val"])["est"]
    )
    true = pdf.groupby(["key", "val"]).size()
    for idx, t in true.items():
        e = est[idx]
        assert e >= t, idx
        assert e - t <= 16 * true_tot[idx[0]] // width + 1, idx
    # absent value estimates 0 when its cells are untouched, never negative
    ghost = spark.createDataFrame(
        pd.DataFrame({"key": ["x"], "val": [10_000_019]}))
    g = cms_estimate(sk, ghost, ["key"], "val",
                     depth=depth, width=width).first()["est"]
    assert g >= 0
    # merge of disjoint halves == one-pass sketch, cell for cell
    h1 = count_min_sketches(
        spark.createDataFrame(pdf.iloc[:2000]), ["key"], "val",
        depth=depth, width=width)
    h2 = count_min_sketches(
        spark.createDataFrame(pdf.iloc[2000:]), ["key"], "val",
        depth=depth, width=width)
    merged = (
        merge_count_min_sketches([h1, h2], ["key"])
        .toPandas().sort_values(["key", "cm_depth", "cm_pos"])
        .reset_index(drop=True)
    )
    one_pass = cells.sort_values(["key", "cm_depth", "cm_pos"]).reset_index(
        drop=True)
    pd.testing.assert_frame_equal(merged, one_pass)


def test_group_heavy_hitters_matches_pandas(spark):
    from tgist_features_spark.operators.aggregates import group_heavy_hitters

    rng = np.random.default_rng(97)
    pdf = pd.DataFrame({
        "g": rng.choice(["a", "b"], 2000),
        "v": rng.zipf(1.4, 2000) % 50,
    })
    pdf.loc[::101, "v"] = None  # NULLs excluded by contract
    got = (
        group_heavy_hitters(spark.createDataFrame(pdf), "g", "v", k=7)
        .toPandas().sort_values(["g", "rank"]).reset_index(drop=True)
    )
    for gname, grp in pdf.dropna(subset=["v"]).groupby("g"):
        counts = grp.groupby("v").size().reset_index(name="n")
        counts = counts.sort_values(
            ["n", "v"], ascending=[False, True]).reset_index(drop=True)
        top = counts.head(7)
        mine = got[got["g"] == gname].reset_index(drop=True)
        assert len(mine) == len(top)
        assert list(mine["v"]) == list(top["v"])
        assert list(mine["n"]) == list(top["n"])
        assert list(mine["rank"]) == list(range(1, len(top) + 1))


def test_time_weighted_avg_matches_numpy(spark):
    from tgist_features_spark.operators.windows import time_weighted_avg

    rng = np.random.default_rng(101)
    rows = []
    eid = 0
    for u in range(12):
        t = 0
        n = int(rng.integers(1, 30))  # singletons included
        for _ in range(n):
            t += int(rng.integers(1, 5000))
            v = None if rng.random() < 0.1 else round(
                float(rng.uniform(-50, 50)), 2)
            rows.append((eid, u, v, t))
            eid += 1
    pdf = pd.DataFrame(rows, columns=["event_id", "user_id", "value", "off"])
    pdf["ts"] = pd.to_datetime(pdf["off"], unit="s")
    got = (
        time_weighted_avg(
            spark.createDataFrame(pdf[["event_id", "user_id", "value", "ts"]]),
            "value", "user_id", ("ts", "event_id"),
        ).toPandas().set_index("user_id")
    )
    for u, grp in pdf.groupby("user_id"):
        g = grp.sort_values(["off", "event_id"])
        us_ = (g["off"] * 1_000_000).to_numpy()
        ys = [None if pd.isna(v) else round(v * 100) for v in g["value"]]
        num = sum(
            int(ys[i]) * int(us_[i + 1] - us_[i])
            for i in range(len(g) - 1) if ys[i] is not None
        )
        den = int(us_[-1] - us_[0])
        assert got.loc[u, "twa_num"] == num
        assert got.loc[u, "twa_den"] == den
        assert got.loc[u, "n_obs"] == len(g)
        if len(g) == 1:
            assert den == 0  # the documented non-answer


def test_behavior_fingerprints_contracts(spark):
    import hashlib

    from tgist_features_spark.operators.dedup import behavior_fingerprints

    rows = [
        # users 1 and 2: identical sequences -> identical fingerprints
        (1, 1, "a", 0), (2, 1, "b", 10), (3, 1, "a", 20),
        (4, 2, "a", 100), (5, 2, "b", 110), (6, 2, "a", 120),
        # user 3: "a, NULL, b" must NOT collide with user 4's "a, b"
        (7, 3, "a", 0), (8, 3, None, 5), (9, 3, "b", 10),
        (10, 4, "a", 0), (11, 4, "b", 10),
        # user 5: same MULTISET as user 1, different order -> different fp
        (12, 5, "b", 0), (13, 5, "a", 10), (14, 5, "a", 20),
    ]
    pdf = pd.DataFrame(rows, columns=["event_id", "user_id", "event_type", "off"])
    pdf["ts"] = pd.to_datetime(pdf["off"], unit="s")
    got = (
        behavior_fingerprints(
            spark.createDataFrame(pdf[["event_id", "user_id", "event_type", "ts"]]),
            "user_id", "event_type",
        ).toPandas().set_index("user_id")
    )
    assert got.loc[1, "behavior_fp"] == got.loc[2, "behavior_fp"]
    assert got.loc[3, "behavior_fp"] != got.loc[4, "behavior_fp"]
    assert got.loc[1, "behavior_fp"] != got.loc[5, "behavior_fp"]
    assert got.loc[1, "n_events"] == 3
    # externally reproducible: plain hashlib over the joined sequence
    assert got.loc[4, "behavior_fp"] == hashlib.md5(b"a b").hexdigest()
    assert got.loc[3, "behavior_fp"] == hashlib.md5(b"a \x01 b").hexdigest()


def test_group_moments_merge_equals_one_pass(spark):
    """A17: the exact mergeable moments profile — numpy parity on every
    statistic, NULLs counted but weightless, and merge of per-batch
    profiles bit-equal to the one-pass profile (integer sums are
    order-independent, so this is exact, not approximate)."""
    from tgist_features_spark.operators.aggregates import (
        group_moments,
        merge_group_moments,
    )

    rng = np.random.default_rng(131)
    vals = np.round(rng.normal(50, 20, 3000), 2)
    pdf = pd.DataFrame({
        "g": rng.choice(["a", "b", "c"], 3000),
        "v": vals,
    })
    pdf.loc[rng.choice(3000, 150, replace=False), "v"] = None
    df = spark.createDataFrame(pdf)
    got = (
        group_moments(df, "v", ["g"], scale=100)
        .toPandas().set_index("g").sort_index()
    )
    x = (pdf["v"] * 100).round()
    for g, grp in pdf.groupby("g"):
        xi = (grp["v"] * 100).round().dropna().astype("int64")
        row = got.loc[g]
        assert row["n_obs"] == len(xi)
        assert row["n_null"] == grp["v"].isna().sum()
        assert row["sum_x"] == xi.sum()
        assert row["sumsq_x"] == (xi * xi).sum()
        assert row["min_x"] == xi.min()
        assert row["max_x"] == xi.max()
        assert row["var_num"] == len(xi) * (xi * xi).sum() - xi.sum() ** 2
    # all-NULL key: zero sums, NULL extrema, n_null counted
    allnull = spark.createDataFrame(
        pd.DataFrame({"g": ["z", "z"], "v": [None, None]}).astype(
            {"v": "float64"})
    )
    z = group_moments(allnull, "v", ["g"], scale=100).first()
    assert z["n_obs"] == 0 and z["n_null"] == 2
    assert z["sum_x"] == 0 and z["sumsq_x"] == 0 and z["var_num"] == 0
    assert z["min_x"] is None and z["max_x"] is None
    # merge of three batches (one containing the all-NULL key) == one-pass
    parts = [
        group_moments(spark.createDataFrame(pdf.iloc[:1000]), "v", ["g"], 100),
        group_moments(spark.createDataFrame(pdf.iloc[1000:]), "v", ["g"], 100),
    ]
    merged = (
        merge_group_moments(parts, ["g"])
        .toPandas().sort_values("g").reset_index(drop=True)
    )
    one_pass = (
        group_moments(df, "v", ["g"], 100)
        .toPandas().sort_values("g").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(merged, one_pass)


def test_triangle_enumerate_matches_bruteforce(spark):
    """G3: degree-oriented triangle enumeration equals the O(n^3) brute
    force on a random graph, counts each triangle exactly once on a
    hub graph (the skew case the orientation bounds), and returns
    ascending id triples."""
    from itertools import combinations

    from tgist_features_spark.operators.components import triangle_enumerate

    rng = np.random.default_rng(137)
    n = 60
    pairs = list(combinations(range(n), 2))
    chosen = [pairs[i] for i in rng.choice(len(pairs), 300, replace=False)]
    # add reversed duplicates + self-loops: must be canonicalized away
    rows = ([(a, b) for a, b in chosen]
            + [(b, a) for a, b in chosen[:50]]
            + [(i, i) for i in range(5)])
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["src", "dst"]))
    got = sorted(
        tuple(r) for r in triangle_enumerate(df).toPandas().itertuples(
            index=False)
    )
    eset = set(chosen)
    want = sorted(
        (a, b, c) for a, b, c in combinations(range(n), 3)
        if (a, b) in eset and (b, c) in eset and (a, c) in eset
    )
    assert got == want and len(want) > 10
    for a, b, c in got:
        assert a < b < c
    # hub graph: star center 0 + a rim cycle -> every rim edge closes
    # exactly one triangle through the hub; no duplicates
    m = 40
    star = [(0, i) for i in range(1, m + 1)]
    rim = [(i, i + 1) for i in range(1, m)] + [(m, 1)]
    hub = spark.createDataFrame(
        pd.DataFrame(star + rim, columns=["src", "dst"]))
    tri = triangle_enumerate(hub).toPandas()
    assert len(tri) == m  # one triangle per rim edge, counted once
    assert (tri["a"] == 0).all()


def test_zorder_layout_interleave_and_skipping(spark, tmp_path):
    """S12: zkey matches the Python bit-interleave reference; NULL and
    out-of-range inputs are refused in-plan; and the layout evidence —
    a Z-ordered write keeps parquet file min/max spans tight in BOTH
    dimensions, so a predicate on the NON-leading dimension prunes
    files that a single-column sort layout cannot skip at all."""
    import pyarrow.parquet as pq
    import pyspark.errors

    from tgist_features_spark.operators.ordering import zorder_layout

    def ref(x, y, bits=21):
        z = 0
        for i in range(bits):
            z |= ((x >> i) & 1) << (2 * i) | ((y >> i) & 1) << (2 * i + 1)
        return z

    rng = np.random.default_rng(139)
    side = 1 << 10
    pdf = pd.DataFrame({
        "x": rng.integers(0, side, 4096),
        "y": rng.integers(0, side, 4096),
    })
    out = zorder_layout(spark.createDataFrame(pdf), "x", "y",
                        bits=10, num_partitions=16)
    got = out.toPandas()
    for _, r in got.sample(200, random_state=0).iterrows():
        assert r["zkey"] == ref(int(r["x"]), int(r["y"]), 10)
    # refusals: NULL fires its own branch; out-of-range fires the other
    bad = spark.createDataFrame(pd.DataFrame({"x": [None], "y": [1]},
                                             dtype="object"))
    for frame in (
        bad,
        spark.createDataFrame(pd.DataFrame({"x": [side], "y": [1]})),
    ):
        try:
            zorder_layout(frame, "x", "y", bits=10).collect()
            raise AssertionError("zorder_key accepted invalid input")
        except pyspark.errors.PySparkException:
            pass
    # layout evidence: same data written z-ordered vs x-sorted
    zdir, xdir = str(tmp_path / "z"), str(tmp_path / "xsort")
    out.write.parquet(zdir)
    (spark.createDataFrame(pdf).repartitionByRange(16, "x")
     .sortWithinPartitions("x").write.parquet(xdir))

    def file_spans(d, col):
        spans = []
        for f in sorted(str(p) for p in __import__("pathlib").Path(
                d).glob("*.parquet")):
            md = pq.ParquetFile(f).metadata
            lo, hi = None, None
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(
                    [c.path_in_schema for c in
                     [md.row_group(rg).column(i)
                      for i in range(md.row_group(rg).num_columns)]
                     ].index(col)).statistics
                lo = st.min if lo is None else min(lo, st.min)
                hi = st.max if hi is None else max(hi, st.max)
            spans.append((lo, hi))
        return spans

    ylo, yhi = 100, 150  # narrow predicate on the non-leading dim
    z_hit = sum(1 for lo, hi in file_spans(zdir, "y")
                if not (hi < ylo or lo > yhi))
    x_hit = sum(1 for lo, hi in file_spans(xdir, "y")
                if not (hi < ylo or lo > yhi))
    n_z = len(file_spans(zdir, "y"))
    assert x_hit == len(file_spans(xdir, "y"))  # x-sort cannot prune on y
    assert z_hit < n_z  # z-order DOES prune on y
    # and the z layout still prunes on x too (both dims stay tight)
    xlo, xhi = 100, 150
    zx_hit = sum(1 for lo, hi in file_spans(zdir, "x")
                 if not (hi < xlo or lo > xhi))
    assert zx_hit < n_z


def test_tf_cosine_pairs_matches_bruteforce(spark):
    """D17: TF-cosine pairs equal the numpy brute force under the same
    candidate rule (shared term with df <= max_df), the integer
    threshold test matches float cosine, and repetition WEIGHT changes
    the answer where set-based Jaccard cannot see a difference."""
    from collections import Counter

    from tgist_features_spark.operators.dedup import tf_cosine_pairs

    docs = {
        1: "a b a b a b x1",       # heavy repetition of "a b"
        2: "a b a b a b x2",       # same phrase, repeated: high cosine
        3: "a b c d e f x3",       # same SET overlap with 1 on {a,b}
        4: "q r s t u v w",        # disjoint
        5: "q r s t u v w",        # identical to 4
    }
    rows = [(i, t) for i, txt in docs.items() for t in txt.split()]
    rel = spark.createDataFrame(pd.DataFrame(rows, columns=["id", "term"]))
    thr, mdf = 80, 4
    got = {
        (r["a"], r["b"]): (r["dot"], r["n2_a"], r["n2_b"])
        for r in tf_cosine_pairs(rel, "id", "term", thr, mdf).collect()
    }
    tfs = {i: Counter(t.split()) for i, t in docs.items()}
    dfs = Counter(t for c in tfs.values() for t in c)
    want = {}
    ids = sorted(docs)
    for ai in range(len(ids)):
        for bi in range(ai + 1, len(ids)):
            a, b = ids[ai], ids[bi]
            shared_rare = [t for t in tfs[a] if t in tfs[b] and dfs[t] <= mdf]
            if not shared_rare:
                continue
            dot = sum(tfs[a][t] * tfs[b][t] for t in tfs[a] if t in tfs[b])
            n2a = sum(v * v for v in tfs[a].values())
            n2b = sum(v * v for v in tfs[b].values())
            if dot * dot * 10_000 >= thr * thr * n2a * n2b:
                want[(a, b)] = (dot, n2a, n2b)
                # the integer test agrees with the float cosine
                assert dot / (n2a * n2b) ** 0.5 >= thr / 100 - 1e-12
    assert got == want
    # the weighted signal: (1,2) passes on repetition; (1,3) shares the
    # same term SET prefix but fails the weighted threshold
    assert (1, 2) in got and (1, 3) not in got
    assert (4, 5) in got  # identical docs always pass


def test_tf_cosine_prune_keeps_hot_overlap_pair(spark):
    """D17 prune safety: a pair whose cosine is carried almost entirely
    by shared HOT (df > max_df) terms — the shared-rare dot alone is far
    under threshold — must survive the candidate upper-bound prune and
    score exactly. Guards the prune's Cauchy-Schwarz bound against ever
    dropping a passing pair."""
    from tgist_features_spark.operators.dedup import tf_cosine_pairs

    docs = {
        1: "r " + "h " * 9,      # tf: r=1, h=9 -> n2 = 82
        2: "r " + "h " * 9,      # identical: dot = 1 + 81 = 82, cos = 1.0
        3: "h z1 z2 z3 z4",      # makes df(h) = 3 > max_df -> h is HOT
    }
    rows = [(i, t) for i, txt in docs.items() for t in txt.split()]
    rel = spark.createDataFrame(pd.DataFrame(rows, columns=["id", "term"]))
    got = {
        (r["a"], r["b"]): (r["dot"], r["n2_a"], r["n2_b"])
        for r in tf_cosine_pairs(rel, "id", "term", 80, 2).collect()
    }
    # dot_sr = 1 (the rare "r"); 1^2 * 1e4 << 6400 * 82 * 82, so a prune
    # that ignored hot mass would drop the pair — the exact answer keeps it
    assert got == {(1, 2): (82, 82, 82)}


def test_borda_fuse_matches_reference(spark):
    """X15: Borda fusion equals a Python reference — items missing from
    one list take that list's per-query N+1 penalty, ties break on item
    id, and the consensus item (mid-ranked in both) beats items a
    single list loved but the other never saw."""
    from tgist_features_spark.operators.similarity import borda_fuse

    a_rows = [("q1", i, r) for r, i in enumerate([10, 11, 12, 13], 1)]
    b_rows = [("q1", i, r) for r, i in enumerate([12, 11, 99, 98], 1)]
    a_rows += [("q2", 5, 1), ("q2", 6, 2)]
    b_rows += [("q2", 6, 1)]
    ra = spark.createDataFrame(a_rows, ["q", "item", "rank"])
    rb = spark.createDataFrame(b_rows, ["q", "item", "rank"])
    got = borda_fuse(ra, rb, "q", "item", "rank", k=3).collect()

    def ref(a, b, k=3):
        out = {}
        for q in {r[0] for r in a + b}:
            la = {i: r for qq, i, r in a if qq == q}
            lb = {i: r for qq, i, r in b if qq == q}
            na, nb = max(la.values()), max(lb.values(), default=0)
            items = set(la) | set(lb)
            sc = sorted(
                (la.get(i, na + 1) + lb.get(i, nb + 1), i) for i in items
            )
            out[q] = [(i, s, r + 1) for r, (s, i) in enumerate(sc[:k])]
        return out

    want = ref(a_rows, b_rows)
    for r in got:
        assert (r["item"], r["fused"], r["fused_rank"]) in want[r["q"]], r
    assert len(got) == sum(len(v) for v in want.values())
    # consensus beats one-sided: 11 (2+2=4) ranks above 10 (1 + nb+1=6)
    q1 = {r["item"]: r["fused_rank"] for r in got if r["q"] == "q1"}
    assert q1[11] < q1[10]


def test_snapshot_diff_null_safe(spark):
    """D18: snapshot diff classifies added/removed/changed with NULL as
    a value — NULL->x and x->NULL are 'changed', NULL->NULL is
    unchanged (omitted), identical rows are omitted."""
    from tgist_features_spark.operators.dedup import snapshot_diff

    old = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "c"), (4, None), (5, "e")],
        ["id", "v"],
    )
    new = spark.createDataFrame(
        [(1, "a"), (2, "x"), (3, None), (4, None), (6, "f")],
        ["id", "v"],
    )
    got = {
        r["id"]: (r["change"], r["v_old"], r["v_new"])
        for r in snapshot_diff(old, new, ["id"], ["v"]).collect()
    }
    assert got == {
        2: ("changed", None, "x"),   # NULL -> value
        3: ("changed", "c", None),   # value -> NULL
        5: ("removed", "e", None),
        6: ("added", None, "f"),
    }
    # 1 (equal) and 4 (NULL == NULL) are omitted
    assert 1 not in got and 4 not in got


def test_dq_report_counts_planted_violations(spark):
    """DQ1: every check class counts its planted violations exactly —
    NULL keys are nullability violations (not uniqueness or membership
    ones), and the clean table passes everything."""
    from tgist_features_spark.operators.dq import dq_report

    child = spark.createDataFrame(
        [
            # id, line, flag, qty, fk
            (1, 1, "A", 10, 100),
            (1, 1, "N", 20, 100),     # dup (id, line)
            (2, 1, "X", 10, 100),     # bad flag
            (3, 1, "A", 99, 101),     # qty out of range + dangling fk
            (None, 1, "A", 10, 100),  # NULL id (nullability only)
            (4, None, None, None, None),  # NULL line/flag/qty/fk
        ],
        "id long, line long, flag string, qty long, fk long",
    )
    parent = spark.createDataFrame([(100,), (102,)], "pk long")
    rep = {
        (r["check"], r["target"]): (r["n_rows"], r["n_violations"], r["ok"])
        for r in dq_report(
            child,
            not_null=("id",),
            unique=(("id", "line"),),
            accepted={"flag": ["A", "N", "R"]},
            in_range={"qty": (1, 50)},
            ref={"fk": (parent, "pk")},
        ).collect()
    }
    assert rep[("not_null", "id")] == (6, 1, 0)
    assert rep[("unique", "id,line")] == (6, 1, 0)       # one dup pair
    assert rep[("accepted", "flag")] == (6, 1, 0)        # 'X' only
    assert rep[("in_range", "qty")] == (6, 1, 0)         # 99 only
    assert rep[("ref", "fk->pk")] == (6, 1, 0)           # 101 only
    # clean table: all ok
    clean = spark.createDataFrame([(1, 1, "A", 10, 100)],
                                  "id long, line long, flag string, "
                                  "qty long, fk long")
    ok = dq_report(
        clean, not_null=("id",), unique=(("id", "line"),),
        accepted={"flag": ["A"]}, in_range={"qty": (1, 50)},
        ref={"fk": (parent, "pk")},
    ).agg({"ok": "min"}).first()[0]
    assert ok == 1


def test_dq_report_empty_table_is_all_green(spark):
    """DQ1: an EMPTY input table is a well-defined all-green report (0
    rows, 0 violations, every check ok) — the SUM-over-zero-rows NULLs
    must coalesce, not TypeError (a realistic pre-publish gate input)."""
    from tgist_features_spark.operators.dq import dq_report

    empty = spark.createDataFrame(
        [], "id long, line long, flag string, qty long, fk long"
    )
    parent = spark.createDataFrame([(100,)], "pk long")
    rep = {
        (r["check"], r["target"]): (r["n_rows"], r["n_violations"], r["ok"])
        for r in dq_report(
            empty,
            not_null=("id",),
            unique=(("id", "line"),),
            accepted={"flag": ["A"]},
            in_range={"qty": (1, 50)},
            ref={"fk": (parent, "pk")},
        ).collect()
    }
    assert all(v == (0, 0, 1) for v in rep.values()) and len(rep) == 5


def test_k_core_matches_reference_peeling(spark):
    """G4: k-core equals Python reference peeling on a random graph;
    a star dissolves at k=2 (connected but not dense); a planted
    5-clique survives k=4 while its sparse surroundings peel away."""
    from collections import defaultdict
    from itertools import combinations

    from tgist_features_spark.operators.components import k_core_vertices

    def ref_core(edge_list, k):
        adj = defaultdict(set)
        for a, b in edge_list:
            if a != b:
                adj[a].add(b)
                adj[b].add(a)
        changed = True
        while changed:
            changed = False
            for v in list(adj):
                if len(adj[v]) < k:
                    for u in adj.pop(v):
                        adj[u].discard(v)
                    changed = True
        return {v: len(ns) for v, ns in adj.items() if ns}

    rng = np.random.default_rng(41)
    n = 50
    pairs = list(combinations(range(n), 2))
    chosen = [pairs[i] for i in rng.choice(len(pairs), 220, replace=False)]
    df = spark.createDataFrame(pd.DataFrame(chosen, columns=["src", "dst"]))
    for k in (2, 3, 5):
        got = {r["v"]: r["deg"] for r in k_core_vertices(df, k).collect()}
        assert got == ref_core(chosen, k), k
    # star: hub degree is huge, but every leaf has degree 1
    star = spark.createDataFrame(
        pd.DataFrame([(0, i) for i in range(1, 30)], columns=["src", "dst"]))
    assert k_core_vertices(star, 2).count() == 0
    # planted clique: 5-clique + a long tail path hanging off it
    clique = list(combinations(range(5), 2))
    tail = [(4 + i, 5 + i) for i in range(1, 20)]
    g = spark.createDataFrame(
        pd.DataFrame(clique + tail, columns=["src", "dst"]))
    got = {r["v"]: r["deg"] for r in k_core_vertices(g, 4).collect()}
    assert got == {v: 4 for v in range(5)}


def test_ks_drift_matches_reference(spark):
    """A18: the binned KS fraction equals a numpy reference over the
    same equi-depth bin rule, detects a planted location shift, and is
    ~0 for iid halves."""
    from tgist_features_spark.operators.aggregates import ks_drift

    rng = np.random.default_rng(59)
    a = rng.integers(0, 1000, 4000)

    def run(ref_vals, new_vals, n_bins=10):
        ref = spark.createDataFrame(pd.DataFrame({"v": ref_vals}))
        new = spark.createDataFrame(pd.DataFrame({"v": new_vals}))
        r = ks_drift(ref, new, "v", n_bins).first()
        return r

    def ref_ks(ref_vals, new_vals, n_bins=10):
        sv = np.sort(ref_vals)
        n = len(sv)
        lo = {}
        for rnk, v in enumerate(sv):
            b = rnk * n_bins // n
            lo.setdefault(b, v)
        edges = sorted(lo.items())

        def bin_of(v):
            best = 0
            for b, l in edges:
                if l <= v:
                    best = max(best, b)
            return best

        rc = np.zeros(n_bins, dtype=np.int64)
        nc = np.zeros(n_bins, dtype=np.int64)
        for v in ref_vals:
            rc[bin_of(v)] += 1
        for v in new_vals:
            nc[bin_of(v)] += 1
        present = sorted(lo)
        cr = cn = 0
        best = (-1, None)
        for b in present:
            cr += rc[b]
            cn += nc[b]
            g = abs(cr * len(new_vals) - cn * len(ref_vals))
            if g > best[0]:
                best = (g, b)
        return best

    # iid halves: tiny statistic
    r = run(a[:2000], a[2000:])
    g, b = ref_ks(a[:2000], a[2000:])
    assert (r["ks_num"], r["worst_bin"]) == (g, b)
    assert r["ks_num"] / r["denom"] < 0.06
    # planted +300 location shift: large statistic, same reference
    shifted = a[2000:] + 300
    r2 = run(a[:2000], shifted)
    g2, b2 = ref_ks(a[:2000], shifted)
    assert (r2["ks_num"], r2["worst_bin"]) == (g2, b2)
    assert r2["ks_num"] / r2["denom"] > 0.25


def test_group_spearman_matches_scipy_free_reference(spark):
    """A19: the exact integer Spearman fraction matches a numpy
    reference over the same pinned ranks; perfectly monotone data
    gives rho exactly 1 (and reversed, exactly -1); NULLs are
    excluded; singleton groups return rho_den = 0."""
    from tgist_features_spark.operators.aggregates import group_spearman

    rng = np.random.default_rng(61)
    n = 500
    pdf = pd.DataFrame({
        "id": np.arange(n),
        "g": rng.choice(["a", "b"], n),
        "x": rng.integers(0, 50, n).astype("float64"),  # heavy ties
        "y": rng.normal(0, 1, n),
    })
    pdf.loc[rng.choice(n, 25, replace=False), "x"] = None
    got = {
        r["g"]: (r["n_pairs"], r["sum_d2"], r["rho_num"], r["rho_den"])
        for r in group_spearman(
            spark.createDataFrame(pdf), "x", "y", "g", "id"
        ).collect()
    }
    for g, grp in pdf.dropna(subset=["x", "y"]).groupby("g"):
        rx = grp.sort_values(["x", "id"]).reset_index()
        rx["r"] = np.arange(1, len(rx) + 1)
        ry = grp.sort_values(["y", "id"]).reset_index()
        ry["r"] = np.arange(1, len(ry) + 1)
        m = rx.set_index("id")["r"].to_frame("rx").join(
            ry.set_index("id")["r"].to_frame("ry"))
        d2 = int(((m["rx"] - m["ry"]) ** 2).sum())
        nn = len(m)
        den = nn * (nn * nn - 1)
        assert got[g] == (nn, d2, den - 6 * d2, den), g
    # monotone: rho == 1 exactly; reversed: rho == -1 exactly
    mono = spark.createDataFrame(pd.DataFrame({
        "id": range(100), "g": ["m"] * 100,
        "x": np.arange(100.0), "y": np.arange(100.0) * 3 + 7}))
    r = group_spearman(mono, "x", "y", "g", "id").first()
    assert r["rho_num"] == r["rho_den"] and r["sum_d2"] == 0
    rev = spark.createDataFrame(pd.DataFrame({
        "id": range(100), "g": ["r"] * 100,
        "x": np.arange(100.0), "y": -np.arange(100.0)}))
    r = group_spearman(rev, "x", "y", "g", "id").first()
    assert r["rho_num"] == -r["rho_den"]
    # singleton: den = 0 (a non-answer)
    single = spark.createDataFrame(
        pd.DataFrame({"id": [1], "g": ["s"], "x": [1.0], "y": [2.0]}))
    r = group_spearman(single, "x", "y", "g", "id").first()
    assert r["rho_den"] == 0


def test_snapshot_diff_reconstructs_new(spark):
    """D18 property: old + diff fully reconstructs new — applying the
    adds, drops, and changes to the old snapshot yields exactly the
    new snapshot, on randomized versions with NULL churn."""
    from tgist_features_spark.operators.dedup import snapshot_diff

    rng = np.random.default_rng(67)
    n = 400
    old = pd.DataFrame({
        "id": np.arange(n),
        "v": rng.integers(0, 20, n).astype("float64"),
        "s": rng.choice(["x", "y", None], n),
    })
    new = old.copy()
    new = new[~new["id"].isin(rng.choice(n, 60, replace=False))]  # drops
    upd = rng.choice(new["id"].to_numpy(), 80, replace=False)
    new.loc[new["id"].isin(upd), "v"] += 1                         # changes
    nullify = rng.choice(new["id"].to_numpy(), 30, replace=False)
    new.loc[new["id"].isin(nullify), "s"] = None                   # NULL churn
    adds = pd.DataFrame({
        "id": np.arange(n, n + 25),
        "v": rng.integers(0, 20, 25).astype("float64"),
        "s": rng.choice(["x", "y"], 25),
    })
    new = pd.concat([new, adds], ignore_index=True)

    diff = snapshot_diff(
        spark.createDataFrame(old), spark.createDataFrame(new),
        ["id"], ["v", "s"],
    ).toPandas()
    # reconstruct: start from old, drop removed, apply changes, add new
    rec = old.set_index("id")
    removed = diff[diff["change"] == "removed"]["id"]
    rec = rec.drop(index=removed)
    for _, r in diff[diff["change"] == "changed"].iterrows():
        rec.loc[r["id"], ["v", "s"]] = [r["v_new"], r["s_new"]]
    added = diff[diff["change"] == "added"].set_index("id")[["v_new", "s_new"]]
    added.columns = ["v", "s"]
    rec = pd.concat([rec, added]).sort_index().reset_index()

    want = new.sort_values("id").reset_index(drop=True)
    rec = rec[want.columns]
    assert len(rec) == len(want)
    for c in want.columns:
        a, b = rec[c], want[c]
        assert ((a == b) | (a.isna() & b.isna())).all(), c


def test_pagerank_fixed_point_matches_reference(spark):
    """G5: integer fixed-point PageRank equals a Python reference
    implementing the same pinned truncating arithmetic on a random
    weighted digraph (parallel edges combined, non-positive / NULL
    weights dropped), and total mass never exceeds scale."""
    from tgist_features_spark.operators.components import pagerank_fixed_point

    rng = np.random.default_rng(141)
    n = 25
    raw = []
    for _ in range(300):
        u, v = int(rng.integers(0, n)), int(rng.integers(0, n))
        raw.append((u, v, int(rng.integers(1, 50))))
    # parallel duplicates + junk rows the operator must drop
    raw += raw[:40]
    junk = [(0, 1, 0), (2, 3, -5), (None, 4, 7), (5, None, 7)]
    pdf = pd.DataFrame(raw + junk, columns=["src", "dst", "w"], dtype="object")
    df = spark.createDataFrame(pdf)

    edges: dict[tuple[int, int], int] = {}
    for u, v, w in raw:
        edges[(u, v)] = edges.get((u, v), 0) + w
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    big = len(nodes)
    scale, dn, dd = 10**9, 85, 100
    outw: dict[int, int] = {}
    for (u, _), w in edges.items():
        outw[u] = outw.get(u, 0) + w
    pr = {v: scale // big for v in nodes}
    for _ in range(3):
        infl = {v: 0 for v in nodes}
        for (u, v), w in edges.items():
            infl[v] += (pr[u] * w) // outw[u]
        pr = {
            v: (scale * (dd - dn)) // (dd * big) + (dn * infl[v]) // dd
            for v in nodes
        }

    got = pagerank_fixed_point(df, iters=3).toPandas()
    assert len(got) == big
    assert (got["n_nodes"] == big).all()
    by_node = dict(zip(got["node"].astype(int), got["pr_x1e9"].astype(int)))
    assert by_node == pr
    assert sum(by_node.values()) <= scale  # truncation only leaks mass


def test_ewma_smooth_matches_reference_incl_negatives(spark):
    """W9: the EWMA fold equals a Python reference using TRUNCATING
    integer division (the pinned cross-engine rule — Python's // floors,
    so the reference must truncate explicitly), including negative
    values; NULLs are excluded; singletons return their own value."""
    from tgist_features_spark.operators.windows import ewma_smooth

    def tdiv(a: int, d: int) -> int:
        return a // d if a >= 0 else -((-a) // d)

    rng = np.random.default_rng(143)
    rows = []
    for ent in range(40):
        for i in range(int(rng.integers(1, 30))):
            v = int(rng.integers(-5000, 5000))
            rows.append((ent, i, None if rng.random() < 0.1 else v))
    pdf = pd.DataFrame(rows, columns=["e", "pos", "v"], dtype="object")
    df = spark.createDataFrame(pdf)
    got = ewma_smooth(df, "v", "e", ("pos",), k=3).toPandas()

    want = {}
    for ent, grp in pdf.dropna(subset=["v"]).groupby("e"):
        vals = [int(v) for v in grp.sort_values("pos")["v"]]
        s = vals[0]
        for x in vals[1:]:
            s = tdiv(x + 7 * s, 8)
        want[ent] = (len(vals), vals[-1], s)
    assert len(got) == len(want)
    for _, r in got.iterrows():
        assert want[r["e"]] == (r["n_events"], r["v_last"], r["ewma"])
    with pytest.raises(ValueError):
        ewma_smooth(df, "v", "e", ("pos",), k=0)


def test_rfm_scores_reference_and_properties(spark):
    """A19: RFM quintiles equal a pandas reference applying the same
    pinned (metric, entity) rank rule per segment; per-segment bucket
    populations differ by at most one; scores live in 1..n_bins and
    the digit composite is consistent; n_bins > 9 is refused."""
    from tgist_features_spark.operators.aggregates import rfm_scores

    rng = np.random.default_rng(145)
    rows = []
    for ent in range(120):
        seg = ["A", "B", "C"][ent % 3]
        for _ in range(int(rng.integers(1, 8))):
            rows.append(
                (ent, seg, int(rng.integers(0, 10**8)), int(rng.integers(1, 10**6)))
            )
    pdf = pd.DataFrame(rows, columns=["ent", "seg", "ts_us", "cents"])
    df = spark.createDataFrame(pdf)
    got = (
        rfm_scores(df, "ent", "seg", "ts_us", "cents", n_bins=5)
        .toPandas().sort_values("ent").reset_index(drop=True)
    )

    pe = pdf.groupby(["ent", "seg"]).agg(
        last_us=("ts_us", "max"), n_events=("ts_us", "size"),
        monetary=("cents", "sum"),
    ).reset_index()
    pe["rec_days"] = (pdf["ts_us"].max() - pe["last_us"]) // 86_400_000_000
    for metric, out, asc_score in (
        ("rec_days", "r_score", False),
        ("n_events", "f_score", True),
        ("monetary", "m_score", True),
    ):
        scores = {}
        for _, grp in pe.groupby("seg"):
            g = grp.sort_values([metric, "ent"]).reset_index(drop=True)
            n = len(g)
            for i, ent in enumerate(g["ent"]):
                b = (i * 5) // n
                scores[ent] = b + 1 if asc_score else 5 - b
        pe[out] = pe["ent"].map(scores)
    want = pe.sort_values("ent").reset_index(drop=True)
    for c in ("rec_days", "n_events", "monetary", "r_score", "f_score", "m_score"):
        assert (got[c].astype(int) == want[c].astype(int)).all(), c
    assert (
        got["rfm"] == got["r_score"] * 100 + got["f_score"] * 10 + got["m_score"]
    ).all()
    for _, grp in got.groupby("seg"):
        for c in ("r_score", "f_score", "m_score"):
            counts = grp[c].value_counts()
            assert counts.max() - counts.min() <= 1
            assert set(counts.index) <= set(range(1, 6))
    with pytest.raises(ValueError):
        rfm_scores(df, "ent", "seg", "ts_us", "cents", n_bins=10)


def test_quantile_sketches_merge_and_error_bound(spark):
    """A20: merge-of-parts equals the one-pass sketch BIT-EQUAL (the
    order-insensitive log-bucket design makes that a construction
    property, the HLL posture); rank targeting is exact and the value
    estimate is within alpha relative error; NULLs excluded; non-
    positive values refused in-plan."""
    import pyspark.errors

    from tgist_features_spark.operators.aggregates import (
        merge_quantile_sketches,
        quantile_sketch_estimate,
        quantile_sketches,
    )

    alpha = 0.02
    rng = np.random.default_rng(147)
    rows = []
    for key in ("a", "b", "c"):
        vals = np.exp(rng.normal(2.0, 1.5, 5000))
        for i, v in enumerate(vals):
            rows.append((key, i % 4, None if i % 97 == 0 else float(v)))
    pdf = pd.DataFrame(rows, columns=["k", "part", "v"])
    df = spark.createDataFrame(pdf)

    one = quantile_sketches(df, ["k"], "v", alpha=alpha)
    parts = quantile_sketches(df, ["k", "part"], "v", alpha=alpha).drop("n")
    merged = merge_quantile_sketches(parts, ["k"])

    a = one.toPandas().sort_values("k").reset_index(drop=True)
    b = merged.toPandas().sort_values("k").reset_index(drop=True)
    assert (a["n"] == b["n"]).all()
    for x, y in zip(a["buckets"], b["buckets"]):
        assert [tuple(e) for e in x] == [tuple(e) for e in y]
    # n excludes the NULLs exactly
    want_n = pdf.dropna(subset=["v"]).groupby("k").size()
    assert dict(zip(a["k"], a["n"])) == want_n.to_dict()

    qs = [0.1, 0.5, 0.9, 0.99]
    est = quantile_sketch_estimate(one, qs, alpha=alpha).toPandas()
    assert len(est) == 3 * len(qs)
    for key, grp in pdf.dropna(subset=["v"]).groupby("k"):
        vals = np.sort(grp["v"].to_numpy())
        for q in qs:
            exact = vals[int(np.floor(q * (len(vals) - 1)))]
            got = est[(est["k"] == key) & (est["q"] == q)]["est"].iloc[0]
            assert abs(got - exact) / exact <= alpha + 1e-9, (key, q)

    bad = spark.createDataFrame(pd.DataFrame({"k": ["a"], "v": [-1.0]}))
    with pytest.raises(pyspark.errors.PySparkException):
        quantile_sketches(bad, ["k"], "v", alpha=alpha).collect()
    with pytest.raises(ValueError):
        quantile_sketches(df, ["k"], "v", alpha=0.7)
    with pytest.raises(ValueError):
        quantile_sketch_estimate(one, [])


def test_group_auc_matches_pairwise_reference(spark):
    """A22: the integer Mann-Whitney AUC fraction equals the O(n^2)
    pairwise definition (positives ranked above negatives, ties worth
    1/2) on random tie-heavy groups; single-class groups report
    auc_den = 0; NULL rows are excluded."""
    from fractions import Fraction

    from tgist_features_spark.operators.aggregates import group_auc

    rng = np.random.default_rng(149)
    rows = []
    for g in range(25):
        for _ in range(int(rng.integers(2, 40))):
            s = int(rng.integers(0, 8))  # small domain -> heavy ties
            y = bool(rng.random() < 0.3)
            if rng.random() < 0.05:
                rows.append((g, None, y))
            else:
                rows.append((g, s, y))
    rows.append((99, 5, True))   # single-class group
    rows.append((99, 3, True))
    pdf = pd.DataFrame(rows, columns=["g", "s", "y"], dtype="object")
    got = (
        group_auc(spark.createDataFrame(pdf), "s", "y", "g")
        .toPandas().set_index("g").sort_index()
    )
    for g, grp in pdf.dropna(subset=["s"]).groupby("g"):
        pos = [int(v) for v in grp[grp["y"] == True]["s"]]   # noqa: E712
        neg = [int(v) for v in grp[grp["y"] == False]["s"]]  # noqa: E712
        r = got.loc[g]
        assert (r["n_pos"], r["n_neg"]) == (len(pos), len(neg))
        if not pos or not neg:
            assert r["auc_den"] == 0
            continue
        num2 = sum(
            2 * (p > n) + 1 * (p == n) for p in pos for n in neg
        )  # doubled pairwise wins (tie = 1)
        want = Fraction(num2, 2 * len(pos) * len(neg))
        assert Fraction(int(r["auc_num"]), int(r["auc_den"])) == want, g


def test_loo_target_encode_leakage_invariance(spark):
    """A23: the LOO feature equals the pandas reference, and the
    LEAKAGE INVARIANT holds — flipping a row's own label leaves that
    row's encoded feature unchanged (loo_num = sum_y - y_i absorbs the
    flip on both terms); singleton categories report den 0; NULL
    categories/labels excluded."""
    from tgist_features_spark.operators.aggregates import loo_target_encode

    rng = np.random.default_rng(151)
    rows = []
    for i in range(400):
        cat = int(rng.integers(0, 60))
        y = bool(rng.random() < 0.4)
        if i % 53 == 0:
            rows.append((i, None, y))
        elif i % 67 == 0:
            rows.append((i, cat, None))
        else:
            rows.append((i, cat, y))
    rows.append((9999, 777, True))  # singleton category
    pdf = pd.DataFrame(rows, columns=["rid", "cat", "y"], dtype="object")
    df = spark.createDataFrame(pdf)
    got = (
        loo_target_encode(df, "cat", "y")
        .toPandas().set_index("rid").sort_index()
    )
    clean = pdf.dropna(subset=["cat", "y"])
    assert len(got) == len(clean)
    grp = clean.groupby("cat")["y"].agg(["sum", "size"])
    for rid, r in clean.set_index("rid").iterrows():
        g = grp.loc[r["cat"]]
        assert got.loc[rid, "loo_num"] == int(g["sum"]) - int(bool(r["y"]))
        assert got.loc[rid, "loo_den"] == int(g["size"]) - 1
    assert got.loc[9999, "loo_den"] == 0

    # leakage invariance: flip one row's label -> ITS OWN row unchanged
    flip_rid = int(clean[clean["cat"] == clean["cat"].mode()[0]]["rid"].iloc[0])
    pdf2 = pdf.copy()
    pdf2.loc[pdf2["rid"] == flip_rid, "y"] = ~pdf2.loc[
        pdf2["rid"] == flip_rid, "y"
    ].astype(bool)
    got2 = (
        loo_target_encode(spark.createDataFrame(pdf2), "cat", "y")
        .toPandas().set_index("rid").sort_index()
    )
    assert (
        got.loc[flip_rid, ["loo_num", "loo_den"]].tolist()
        == got2.loc[flip_rid, ["loo_num", "loo_den"]].tolist()
    )


def test_calibration_bins_properties(spark):
    """A24: per-group bin populations differ by at most one, positives
    never exceed rows, mass conserves to the non-NULL input count, and
    score spans are non-overlapping ascending per group."""
    from tgist_features_spark.operators.aggregates import calibration_bins

    rng = np.random.default_rng(153)
    n = 3000
    pdf = pd.DataFrame({
        "id": range(n),
        "g": rng.integers(0, 4, n),
        "s": rng.integers(0, 50, n),   # heavy ties
        "y": rng.random(n) < 0.3,
    })
    pdf.loc[::97, "s"] = None
    got = calibration_bins(
        spark.createDataFrame(pdf), "s", "y", "g", "id", n_bins=8
    ).toPandas()
    assert got["n_rows"].sum() == pdf["s"].notna().sum()
    assert (got["n_pos"] <= got["n_rows"]).all()
    for g, grp in got.groupby("g"):
        counts = grp["n_rows"]
        assert counts.max() - counts.min() <= 1
        spans = grp.sort_values("bin")[["score_min", "score_max"]]
        assert (spans["score_min"] <= spans["score_max"]).all()
        # ascending: each bin's min >= previous bin's min (ties may
        # straddle bins under the rank rule, so only min-monotonicity
        # is guaranteed)
        assert spans["score_min"].is_monotonic_increasing


def test_group_autocorr_matches_numpy(spark):
    """A25: the integer components reproduce numpy's lag-1 Pearson
    r^2 via r^2 = cov_num^2/(varx_num*vary_num), with NULL exclusion
    before pairing and the constant-series den-0 convention."""
    from tgist_features_spark.operators.aggregates import group_autocorr

    rng = np.random.default_rng(157)
    rows = []
    for g in ("a", "b", "c"):
        prev = 0.0
        for i in range(300):
            prev = 0.7 * prev + rng.normal(0, 10)
            v = None if rng.random() < 0.05 else int(round(prev))
            rows.append((g, i, v))
    rows += [("const", i, 7) for i in range(20)]
    pdf = pd.DataFrame(rows, columns=["g", "i", "v"], dtype="object")
    got = (
        group_autocorr(spark.createDataFrame(pdf), "v", "g", ("i",), lag=1)
        .toPandas().set_index("g")
    )
    for g in ("a", "b", "c"):
        vals = pdf[(pdf["g"] == g)].dropna(subset=["v"]).sort_values("i")["v"]
        x = np.array(vals[:-1], dtype="int64")
        y = np.array(vals[1:], dtype="int64")
        r = got.loc[g]
        assert r["n_pairs"] == len(x)
        want_r = np.corrcoef(x, y)[0, 1]
        got_r2 = r["cov_num"] ** 2 / (r["varx_num"] * r["vary_num"])
        assert abs(got_r2 - want_r**2) < 1e-9
        assert np.sign(r["cov_num"]) == np.sign(want_r)
        assert want_r > 0.3  # the AR(0.7) signal is actually detected
    assert got.loc["const", "varx_num"] == 0  # undefined r, den-0 rule


def test_with_rolling_median_matches_pandas(spark):
    """W20: the trailing lower median equals the pandas reference
    (sorted window, (cnt+1) div 2 order statistic) across frame
    growth, ties, and NULL exclusion."""
    from tgist_features_spark.operators.windows import with_rolling_median

    rng = np.random.default_rng(159)
    rows = []
    for e in range(10):
        for i in range(60):
            v = None if rng.random() < 0.1 else int(rng.integers(0, 20))
            rows.append((e, i, v))
    pdf = pd.DataFrame(rows, columns=["e", "i", "v"], dtype="object")
    n = 7
    got = (
        with_rolling_median(spark.createDataFrame(pdf), "v", "e", ("i",), n=n)
        .toPandas().set_index(["e", "i"]).sort_index()
    )
    clean = pdf.dropna(subset=["v"])
    assert len(got) == len(clean)
    for (e, i), r in got.iterrows():
        seq = clean[(clean["e"] == e) & (clean["i"] <= i)].sort_values("i")
        win = sorted(int(v) for v in seq["v"].tail(n))
        assert r["win_cnt"] == len(win)
        assert r["roll_med"] == win[(len(win) + 1) // 2 - 1]


def test_group_mode_pinned_ties(spark):
    """A26: mode equals the max-count value with ties broken toward
    the SMALLEST value; NULLs excluded; n_distinct exact."""
    from tgist_features_spark.operators.aggregates import group_mode

    pdf = pd.DataFrame(
        [("g1", "b"), ("g1", "b"), ("g1", "a"), ("g1", "a"), ("g1", "c"),
         ("g2", "z"), ("g2", None), ("g3", "m"), ("g3", "m"), ("g3", "k")],
        columns=["g", "v"],
    )
    got = (
        group_mode(spark.createDataFrame(pdf), "v", "g")
        .toPandas().set_index("g").sort_index()
    )
    assert got.loc["g1"].tolist() == ["a", 2, 3]   # tie a/b -> smallest
    assert got.loc["g2"].tolist() == ["z", 1, 1]   # NULL excluded
    assert got.loc["g3"].tolist() == ["m", 2, 2]


def test_group_gini_matches_pairwise_definition(spark):
    """A27: the rank-identity fraction equals the pairwise
    mean-absolute-difference definition sum|xi-xj| / (2n*sum x)
    exactly (ties included — rank assignment among equal values
    cannot change sum(rank*x)); all-equal groups report 0; a
    single-holder group reports (n-1)/n; negatives refused."""
    from fractions import Fraction

    import pyspark.errors

    from tgist_features_spark.operators.aggregates import group_gini

    rng = np.random.default_rng(161)
    rows = []
    for g in range(12):
        for i in range(int(rng.integers(2, 50))):
            rows.append((g, i, int(rng.integers(0, 40))))  # ties + zeros
    rows += [(90, i, 7) for i in range(10)]          # all equal -> 0
    rows += [(91, 0, 100)] + [(91, i, 0) for i in range(1, 5)]  # one holder
    pdf = pd.DataFrame(rows, columns=["g", "i", "x"])
    got = (
        group_gini(spark.createDataFrame(pdf), "x", "g", "i")
        .toPandas().set_index("g").sort_index()
    )
    for g, grp in pdf.groupby("g"):
        xs = grp["x"].to_numpy(dtype="int64")
        n, s = len(xs), int(xs.sum())
        r = got.loc[g]
        if s == 0:
            assert r["gini_den"] == 0
            continue
        mad = int(np.abs(xs[:, None] - xs[None, :]).sum())
        assert Fraction(int(r["gini_num"]), int(r["gini_den"])) == Fraction(
            mad, 2 * n * s
        ), g
    assert got.loc[90, "gini_num"] == 0
    assert Fraction(int(got.loc[91, "gini_num"]),
                    int(got.loc[91, "gini_den"])) == Fraction(4, 5)
    bad = spark.createDataFrame(pd.DataFrame({"g": [1], "i": [1], "x": [-3]}))
    with pytest.raises(pyspark.errors.PySparkException):
        group_gini(bad, "x", "g", "i").collect()


def test_churn_labels_leakage_invariance(spark):
    """SP4: features (n_before, last_gap_us) come only from pre-cutoff
    rows — PERTURBING events inside the label window changes labels
    but never features; label-window-born entities are excluded;
    matches the pandas reference."""
    from tgist_features_spark.operators.sampling import churn_labels

    day = 86_400_000_000
    rng = np.random.default_rng(163)
    rows = []
    for u in range(40):
        start = int(rng.integers(0, 15)) * day
        for k in range(int(rng.integers(1, 15))):
            rows.append((u, start + int(rng.integers(0, 13 * day))))
    rows.append((999, 29 * day))        # born inside the label window
    rows.append((0, 30 * day))          # anchors corpus max
    pdf = pd.DataFrame(rows, columns=["u", "us"], dtype="int64")
    hold = 7 * day
    got = (
        churn_labels(spark.createDataFrame(pdf), "u", "us", hold)
        .toPandas().set_index("u").sort_index()
    )
    cutoff = int(pdf["us"].max()) - hold
    ref = {}
    for u, grp in pdf.groupby("u"):
        before = grp[grp["us"] < cutoff]
        if len(before) == 0:
            continue
        ref[u] = (
            len(before),
            cutoff - int(before["us"].max()),
            int(not (grp["us"] >= cutoff).any()),
        )
    assert 999 not in got.index
    assert len(got) == len(ref)
    for u, (nb, gap, ch) in ref.items():
        assert got.loc[u].tolist() == [nb, gap, ch], u

    # leakage invariance: move every label-window event around WITHIN
    # the window (keeping the max anchor) -> features identical
    pdf2 = pdf.copy()
    in_win = (pdf2["us"] >= cutoff) & (pdf2["us"] < int(pdf["us"].max()))
    pdf2.loc[in_win, "us"] = cutoff + (pdf2.loc[in_win, "us"] % hold)
    got2 = (
        churn_labels(spark.createDataFrame(pdf2), "u", "us", hold)
        .toPandas().set_index("u").sort_index()
    )
    assert (got["n_before"] == got2["n_before"]).all()
    assert (got["last_gap_us"] == got2["last_gap_us"]).all()
