"""End-to-end corpus deduplication plan (training-data pipeline surface).

Stage order matters at scale:

1. **exact** — md5 hash-agg keeps the smallest doc_id per distinct text.
   This is the stage that absorbs degenerate mass duplication (boilerplate,
   empty docs), which is exactly the input the LSH bucket caps guard
   against — after this stage no bucket is degenerate by construction.
2. **near** — MinHash+LSH candidate pairs over the exact survivors; for
   every pair (a < b, est_jaccard >= threshold) the larger id is dropped in
   favor of the smaller ("keep first"). Greedy pairwise dropping is the
   standard near-dedup policy for training corpora: deterministic, one
   pass, no iterative connected-components job; transitive chains can drop
   slightly more than a full CC pass would keep — the conservative
   direction for dedup.

Everything is DataFrame-only: two hash aggregations, the banded LSH join,
and two anti-joins; no driver-side loops, no collects.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tgist_features_spark.operators.dedup import _lsh_pairs_lazy


def dedup_corpus(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_est_jaccard: float = 0.7,
    n_hashes: int = 128,
    bands: int = 64,
    max_bucket: int | None = 200,
    transitive: bool = False,
    eval_docs: DataFrame | None = None,
    decontam_ngram: int = 8,
    checkpoint_dir: str | None = None,
    ref_docs: DataFrame | None = None,
    ref_signatures: DataFrame | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Returns (kept_docs, drop_log).

    ``drop_log`` columns: (doc_id, dup_of, reason in {'exact','near',
    'contaminated','near_ref'}, est_jaccard — null except pairwise near
    drops; for 'near_ref' rows ``dup_of`` is the REFERENCE doc id and
    est_jaccard the MinHash estimate against it).

    ``ref_docs`` adds the cross-corpus stage: any surviving doc whose
    MinHash-estimated Jaccard against ANY reference document reaches
    ``min_est_jaccard`` is dropped (operators/dedup.py
    ``cross_corpus_near_pairs`` — two-sided banded join, the doc-level
    sibling of eval decontamination). Runs after within-corpus dedup so
    the cross probe scans the smallest corpus. ``ref_signatures`` feeds
    that stage a precomputed (id, sig) MinHash relation for the reference
    side so a STATIC reference corpus is signed once, not per run (with
    it set, ``ref_docs`` may be None) — see the operator docstring for
    the parameter-compatibility contract.

    ``eval_docs`` adds the third corpus-prep stage: any surviving doc that
    shares a token ``decontam_ngram``-gram with the eval set is dropped
    (operators/dedup.py ``contamination_hits`` — broadcast eval-gram
    probe). Runs AFTER dedup so the gram probe scans the smallest corpus.

    ``transitive=True`` closes the near-dup pairs into connected
    components (operators/components.py) and keeps exactly the minimum id
    of each component: a doc chain a~b~c collapses to {a} with b and c
    both logged against a (``dup_of`` = cluster representative,
    est_jaccard null — cluster membership is transitive, not pairwise).
    The default greedy pairwise policy stays the cheap one-pass path; the
    transitive policy costs O(log diameter) extra join rounds over the
    (small) pair relation only. ``checkpoint_dir`` (transitive mode only)
    switches the component iteration to reliable checkpoints for cluster
    fault-tolerance — see operators/components.py.
    """
    # null-safe fingerprint: md5(NULL) is NULL, which an equi-join would
    # silently drop — NULL-text docs must dedup against each other and be
    # ACCOUNTED for in the drop log (kept + dropped partitions the input)
    fp_expr = F.coalesce(F.md5(F.col(text_col)), F.lit("__null_text__"))
    # ONE hash aggregation produces the kept rows directly: min_by over
    # the (unique) id carries the winning row's full payload through the
    # map-side combine, so the exact stage is a single exchange instead
    # of agg + broadcast semi-join — and the final kept-side recompute
    # re-runs one stage, not two. Same rows as the join formulation by
    # construction (the min-id row per fingerprint).
    cols = docs.columns
    winners = (
        docs.withColumn("__fp", fp_expr)
        .groupBy("__fp")
        .agg(F.min_by(F.struct(*cols), F.col(id_col)).alias("__row"))
    )
    # LAZY localCheckpoint: exact_kept has two consumers (the signature
    # path inside the near-drop job, and the final kept anti-join); the
    # first action materializes it to executor blocks and the second
    # reuses them instead of re-running the exact aggregation. Lazy — not
    # eager — so no extra barrier enters the stage chain, and
    # localCheckpoint — not persist — so the blocks self-clean when the
    # caller drops the returned DataFrames.
    exact_kept = winners.select(
        *[F.col(f"__row.{c}").alias(c) for c in cols]
    ).localCheckpoint(eager=False)
    with_fp = docs.select(F.col(id_col), fp_expr.alias("fp"))
    fp = winners.select(
        F.col("__fp").alias("fp"), F.col(f"__row.{id_col}").alias("keep_id")
    )
    exact_drops = (
        with_fp.join(fp, "fp")
        .filter(F.col(id_col) != F.col("keep_id"))
        .select(
            F.col(id_col).alias("doc_id"),
            F.col("keep_id").alias("dup_of"),
            F.lit("exact").alias("reason"),
            F.lit(None).cast("double").alias("est_jaccard"),
        )
    )

    # lazy pair core: the near-drop reduction below is the FIRST action,
    # so signatures, band join, scoring and the drop aggregation all run
    # inside one job — no separate pair persist+count barrier in the
    # serial stage chain (the signature cache is still released right
    # after that job materializes)
    pairs, sig_cache, _braw = _lsh_pairs_lazy(
        exact_kept, id_col, text_col, n_hashes, bands, 3, 42,
        min_est_jaccard, max_bucket,
        # exact_kept ends in the min_by hash aggregation: it already fans
        # out across shuffle partitions, so the signature repartition
        # exchange is pure latency here
        input_fans_out=True,
    )
    if transitive:
        from tgist_features_spark.operators.components import (  # noqa: PLC0415
            connected_components,
        )

        # connected_components expands its pair input symmetrically via a
        # single-pass explode (NOT a self-union that would evaluate the
        # lazy band-join + scoring subplan twice), so the lazy pair plan
        # is safe to hand over as-is
        comps = connected_components(pairs, checkpoint_dir=checkpoint_dir)
        near_drops = (
            comps.filter(F.col("id") != F.col("comp"))
            .select(
                F.col("id").alias("doc_id"),
                F.col("comp").alias("dup_of"),
                F.lit("near").alias("reason"),
                F.lit(None).cast("double").alias("est_jaccard"),
            )
            .localCheckpoint(eager=True)
        )
    else:
        # keep-first policy: for each near-dup pair (a < b) drop b; a doc
        # that appears as b in several pairs logs its smallest partner as
        # dup_of and THAT pair's est_jaccard (struct-min keeps the two
        # fields consistent)
        near_drops = (
            pairs.groupBy(F.col("b").alias("doc_id"))
            .agg(F.min(F.struct("a", "est_jaccard")).alias("best"))
            .select(
                "doc_id",
                F.col("best.a").alias("dup_of"),
                F.lit("near").alias("reason"),
                F.col("best.est_jaccard").alias("est_jaccard"),
            )
            .localCheckpoint(eager=True)
        )
    # near_drops' eager localCheckpoint (or the component iteration's own
    # first checkpoint in transitive mode) was the action that
    # materialized the lazy pair plan — and with it the signature cache,
    # whose only consumers have now run: release it, so repeated pipeline
    # runs in one session accumulate nothing (the checkpointed near-drop
    # blocks self-clean when the caller drops the returned DataFrames).
    # Both downstream outputs (kept, drop_log) read the materialized log.
    sig_cache.unpersist()
    kept = exact_kept.join(near_drops.select("doc_id"), id_col, "left_anti")
    drop_log = exact_drops.unionByName(near_drops)
    if eval_docs is not None:
        from tgist_features_spark.operators.dedup import (  # noqa: PLC0415
            contamination_hits,
        )

        hits = contamination_hits(
            kept, eval_docs, id_col=id_col, text_col=text_col, n=decontam_ngram
        )
        contam = hits.select(
            F.col(id_col).alias("doc_id"),
            F.lit(None).cast(docs.schema[id_col].dataType).alias("dup_of"),
            F.lit("contaminated").alias("reason"),
            F.lit(None).cast("double").alias("est_jaccard"),
        )
        kept = kept.join(hits.select(id_col), id_col, "left_anti")
        drop_log = drop_log.unionByName(contam)
    if ref_docs is not None or ref_signatures is not None:
        from tgist_features_spark.operators.dedup import (  # noqa: PLC0415
            cross_corpus_near_pairs,
        )

        xpairs = cross_corpus_near_pairs(
            kept, ref_docs,
            id_col=id_col, text_col=text_col,
            n_hashes=n_hashes, bands=bands,
            min_est_jaccard=min_est_jaccard, max_bucket=max_bucket,
            ref_signatures=ref_signatures,
        )
        ref_drops = (
            xpairs.groupBy(F.col("a").alias("doc_id"))
            .agg(F.min(F.struct("b", "est_jaccard")).alias("best"))
            .select(
                "doc_id",
                F.col("best.b").alias("dup_of"),
                F.lit("near_ref").alias("reason"),
                F.col("best.est_jaccard").alias("est_jaccard"),
            )
            .localCheckpoint(eager=True)
        )
        xpairs.unpersist()
        kept = kept.join(ref_drops.select("doc_id"), id_col, "left_anti")
        drop_log = drop_log.unionByName(ref_drops)
    return kept, drop_log
