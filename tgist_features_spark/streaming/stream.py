"""Structured Streaming surface (T1-T5, SURVEY.md §2.9).

The batch engine is authoritative (north_rule is batch-first); this module
gives the same feature semantics an incremental form: watermarked event
time, tumbling/sliding windowed counts, session windows, late-data dedup,
and a custom stateful per-conversation operator via
``applyInPandasWithState`` (running turn counts / last-ts state — the
incremental analogue of the W2/W5 window features).

At the 10^12-turn design point this is the maintenance path: the batch
backfill bootstraps the feature table; the stream keeps it fresh between
snapshots, keyed and partitioned identically (conv_id), so the as-of
serving join reads one consistent layout.
"""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal
from typing import Any

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from tgist_features_spark.sources.corpus import TRANSCRIPT_SCHEMA


def _round_half_up(x: float) -> int:
    """Spark-compatible fixed-point rounding for the stateful kernels:
    batch F.round on a double goes through BigDecimal.valueOf (shortest
    decimal repr) with HALF_UP, while Python's round() is half-to-even
    and flips exact-.5 boundaries (10.125 * 100 = 1012.5: Spark 1013,
    round() 1012). Decimal over repr(x) reproduces Spark's value
    exactly, preserving row-for-row batch/stream parity on boundary
    values."""
    return int(Decimal(repr(x)).quantize(Decimal(1), rounding=ROUND_HALF_UP))


def read_transcript_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source stream over a transcript parquet directory (S1 analog)."""
    reader = spark.readStream.schema(TRANSCRIPT_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(path)


def dedup_within_watermark(
    stream: DataFrame, delay: str = "10 minutes"
) -> DataFrame:
    """T5: idempotent re-delivery — drop duplicate (conv_id, turn_idx)
    within the watermark horizon."""
    return stream.withWatermark("ts", delay).dropDuplicatesWithinWatermark(
        ["conv_id", "turn_idx"]
    )


def windowed_turn_counts(
    stream: DataFrame,
    window: str = "1 hour",
    slide: str | None = None,
    delay: str = "30 minutes",
) -> DataFrame:
    """T2: watermarked tumbling/sliding per-conversation turn counts."""
    win = F.window("ts", window, slide) if slide else F.window("ts", window)
    return (
        stream.withWatermark("ts", delay)
        .groupBy("conv_id", win.alias("win"))
        .agg(
            F.count(F.lit(1)).alias("n_turns"),
            F.sum(F.length("text")).cast("long").alias("chars"),
        )
    )


def session_window_stats(
    stream: DataFrame, gap_s: float = 1800.0, delay: str = "30 minutes"
) -> DataFrame:
    """T3: streaming sessionize via session_window (gap-merged windows).

    Gap inclusivity matches batch ``sessionize`` exactly: empirically
    (tests/test_streaming.py::test_session_gap_exact_threshold_matches_batch)
    ``session_window`` MERGES two events whose gap equals the duration and
    cuts only when the gap is strictly greater — the same "cut when
    gap > gap_s" rule the batch surface uses, so no duration adjustment
    is needed."""
    gap = f"{int(round(gap_s * 1_000_000))} microseconds"
    return (
        stream.withWatermark("ts", delay)
        .groupBy("conv_id", F.session_window("ts", gap).alias("sw"))
        .agg(
            F.count(F.lit(1)).alias("n_turns"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
        )
    )


# ------------------------------------------------------- T4: custom state

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_turns", T.LongType()),
        T.StructField("last_ts_us", T.LongType()),
        T.StructField("cum_chars", T.LongType()),
    ]
)

INCR_OUT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("turn_no", T.LongType()),
        T.StructField("gap_s", T.DoubleType()),
        T.StructField("cum_chars", T.LongType()),
    ]
)


def _incr_fn(key: Any, pdfs, state: GroupState):
    """Incremental W2/W5 features: running turn number, gap to previous
    turn, cumulative chars — per conversation, state carried across
    micro-batches. Within a batch rows are processed in (ts, turn_idx)
    order; across batches the source must deliver in event-time order
    (true for the bootstrap replay; late rows are handled by the dedup +
    watermark stage upstream).

    Vectorized: one numpy cumsum/diff pass per pandas batch, offset by
    the carried state — no per-row Python loop."""
    if state.exists:
        n_turns, last_ts_us, cum_chars = state.get
    else:
        n_turns, last_ts_us, cum_chars = 0, None, 0
    frames = []
    for pdf in pdfs:
        if len(pdf) == 0:
            continue
        pdf = pdf.sort_values(["ts", "turn_idx"], kind="mergesort")
        # pin the unit: astype("int64") on a datetime series returns its
        # NATIVE resolution (ns today, us under arrow-backed dtypes) —
        # convert to datetime64[us] first so ts_us is microseconds always
        ts_us = pdf["ts"].to_numpy(dtype="datetime64[us]").astype("int64")
        chars = pdf["text"].str.len().fillna(0).astype("int64").to_numpy()
        gap = np.empty(len(pdf), dtype=np.float64)
        gap[1:] = (ts_us[1:] - ts_us[:-1]) / 1e6
        gap[0] = (
            (ts_us[0] - last_ts_us) / 1e6 if last_ts_us is not None else np.nan
        )
        turn_no = n_turns + 1 + np.arange(len(pdf), dtype=np.int64)
        cum = cum_chars + np.cumsum(chars)
        frames.append(
            pd.DataFrame(
                {
                    "conv_id": key[0],
                    "turn_idx": pdf["turn_idx"].to_numpy(),
                    "turn_no": turn_no,
                    "gap_s": gap,
                    "cum_chars": cum,
                }
            )
        )
        n_turns += len(pdf)
        cum_chars = int(cum[-1])
        last_ts_us = int(ts_us[-1])
    state.update((n_turns, last_ts_us, cum_chars))
    yield (
        pd.concat(frames, ignore_index=True)
        if frames
        else pd.DataFrame(
            columns=["conv_id", "turn_idx", "turn_no", "gap_s", "cum_chars"]
        )
    )


def _apply_incremental(watermarked: DataFrame) -> DataFrame:
    """The stateful operator itself — input must already carry a watermark."""
    return watermarked.groupBy("conv_id").applyInPandasWithState(
        _incr_fn,
        outputStructType=INCR_OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


DEDUP_DOCS_TABLE = "dedup_docs"
DEDUP_FP_TABLE = "dedup_fingerprints"


def stream_dedup_writer(
    stream: DataFrame,
    io,
    id_col: str = "doc_id",
    text_col: str = "text",
    checkpoint: str | None = None,
):
    """Ingest-time exact dedup: every micro-batch drops rows whose
    md5(text) fingerprint was already ingested — earlier in the SAME batch
    (keep the smallest id) or by any PREVIOUS batch (anti-join against the
    persistent fingerprint table) — then appends survivors to the corpus
    table and their fingerprints to the fingerprint table.

    This is the streaming face of the batch dedup pipeline: a corpus built
    through this sink never needs the exact stage of ``dedup_corpus`` (the
    near-dup stage still runs batch-side — banding needs the whole
    corpus). The fingerprint table is exactly the state a 100 TB ingest
    keeps anyway, and the anti-join is fingerprint-vs-fingerprint (16
    bytes/row moves, never text). Retries are EXACTLY-once for the data
    itself: both tables are ``ingest_batch``-partitioned and written with
    dynamic partition OVERWRITE, so a batch retried after any crash
    (docs committed but fingerprints not, marker lost, …) replaces its own
    partitions instead of appending duplicates — a dedup sink must not be
    able to duplicate its own output (r3 ADVICE). The per-batch marker
    remains as a fast-path skip. Returns the DataStreamWriter.
    """
    import os  # noqa: PLC0415

    ckpt = checkpoint or io.path("_dedup_ckpt")
    marker_dir = os.path.join(ckpt, "_batch_markers")
    fp_expr = F.coalesce(F.md5(F.col(text_col)), F.lit("__null_text__"))

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        marker = os.path.join(marker_dir, f"batch_{batch_id}")
        if os.path.exists(marker):
            return
        spark = batch_df.sparkSession
        with_fp = batch_df.withColumn("fp", fp_expr)
        # within-batch keep-first (smallest id per fingerprint)
        keep = with_fp.groupBy("fp").agg(F.min(id_col).alias(id_col))
        fresh = with_fp.join(keep, ["fp", id_col], "left_semi")
        # cross-batch: drop fingerprints any previous batch ingested
        if io.exists(DEDUP_FP_TABLE):
            seen = spark.read.parquet(io.path(DEDUP_FP_TABLE)).select("fp")
            fresh = fresh.join(seen, "fp", "left_anti")
        fresh = fresh.withColumn("ingest_batch", F.lit(batch_id)).persist()
        try:
            # dynamic partition overwrite: a retried batch REPLACES its own
            # ingest_batch partition (other batches untouched), so the
            # docs-committed/fp-missing crash window re-runs cleanly
            (
                fresh.drop("fp")
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("ingest_batch")
                .parquet(io.path(DEDUP_DOCS_TABLE))
            )
            (
                fresh.select("fp", "ingest_batch")
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("ingest_batch")
                .parquet(io.path(DEDUP_FP_TABLE))
            )
        finally:
            fresh.unpersist()
        os.makedirs(marker_dir, exist_ok=True)
        open(marker, "w").close()

    return (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
    )


def incremental_turn_state(stream: DataFrame, delay: str = "30 minutes") -> DataFrame:
    """T4: applyInPandasWithState — incremental per-conv turn features."""
    return _apply_incremental(stream.withWatermark("ts", delay))


STREAM_FEATURES_TABLE = "stream_features"


def stream_features_writer(
    stream: DataFrame,
    io,
    n_buckets: int | None = None,
    delay: str = "30 minutes",
    checkpoint: str | None = None,
):
    """T4 -> S3: sink the incremental per-conv features into the SAME
    bucket(conv_id)-partitioned layout as the batch feature table (bucket
    count defaults to ``io.n_buckets`` so the two surfaces cannot
    diverge), so the maintenance path the module docstring promises is
    real: batch backfill bootstraps, the stream keeps the table fresh, and
    any consumer (the as-of serving join, the lineage reader) sees one
    consistent layout.

    Delivery semantics: source re-delivery is absorbed by an explicit
    ``dedup_within_watermark`` stage applied here (state would otherwise
    double-count duplicates forever); sink retries are made idempotent with
    a per-batch success marker — a foreachBatch re-run of an
    already-COMMITTED batch id is a no-op. A crash in the narrow window
    between the data append and the marker write re-appends that batch
    (at-least-once there; the fully transactional form of this sink is an
    Iceberg/Delta commit, which replaces the marker). Returns the
    DataStreamWriter — caller picks the trigger and calls ``start()``.
    """
    import os  # noqa: PLC0415

    n = n_buckets or getattr(io, "n_buckets", 16)
    # the dedup stage sets THE watermark; the stateful operator reuses it
    # (Spark disallows redefining a watermark mid-plan)
    feats = _apply_incremental(dedup_within_watermark(stream, delay))
    ckpt = checkpoint or io.path("_stream_ckpt")
    # markers live UNDER the checkpoint so they share its identity: batch
    # ids restart from 0 when a checkpoint is reset or a different
    # checkpoint streams into this warehouse, and warehouse-global markers
    # would then silently SKIP those batches (data loss). Scoped here, a
    # reset checkpoint re-appends its batches (the documented
    # at-least-once window) instead of dropping them.
    marker_dir = os.path.join(ckpt, "_batch_markers")

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        marker = os.path.join(marker_dir, f"batch_{batch_id}")
        if os.path.exists(marker):
            return  # retry of a committed batch — idempotent no-op
        out = batch_df.withColumn(
            "bucket", F.pmod(F.xxhash64("conv_id"), F.lit(n)).cast("long")
        )
        out.write.mode("append").partitionBy("bucket").parquet(
            io.path(STREAM_FEATURES_TABLE)
        )
        os.makedirs(marker_dir, exist_ok=True)
        open(marker, "w").close()

    return (
        feats.writeStream.foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
    )


def enrich_with_static(
    stream: DataFrame,
    static_dim: DataFrame,
    on: list[str] | str,
    how: str = "left",
) -> DataFrame:
    """T6: stream-static enrichment join — each micro-batch joins
    against a (small) static dimension with a broadcast hint, so the
    stream side never shuffles and the state store is never involved
    (stream-static joins are stateless by definition: only the stream
    side triggers processing).

    Refresh semantics worth knowing at scale: a FILE-backed static side
    is re-listed per micro-batch, so replacing the dimension's files
    rolls new attributes into subsequent batches without restarting the
    query; a fully static in-memory frame is fixed for the query's
    lifetime. Inner and left joins are supported by Spark for
    stream-static; right/full (which would need to emit unmatched STATIC
    rows at end-of-stream) are not — this wrapper inherits that rule."""
    return stream.join(F.broadcast(static_dim), on=on, how=how)


DEBOUNCE_OUT_SCHEMA = T.StructType([
    T.StructField("user_id", T.LongType()),
    T.StructField("event_type", T.StringType()),
    T.StructField("event_id", T.LongType()),
    T.StructField("ts", T.TimestampType()),
    T.StructField("gap_s", T.DoubleType()),
])
_DEBOUNCE_STATE = T.StructType([T.StructField("last_kept_us", T.LongType())])


def stateful_debounce(
    stream: DataFrame,
    min_gap_s: float,
    delay: str = "30 minutes",
) -> DataFrame:
    """T7: CHAINED debounce — keep an event only if >= ``min_gap_s``
    after the last KEPT event of its (user_id, event_type) stream.

    This is the rule the batch ``debounce`` operator
    (operators/windows.py) explicitly does NOT implement: the kept-chain
    is inherently sequential per stream (row k's fate depends on which
    earlier rows survived), which a window function cannot express but
    per-key state carried across micro-batches can. Within a batch rows
    process in (ts, event_id) order; across batches the watermark + the
    carried last-kept timestamp keep the chain consistent for in-order
    delivery (late rows beyond the watermark are the upstream dedup
    stage's problem, same contract as the incremental turn state).

    The per-batch loop is a Python scan over the (small) per-key batch —
    honest about being the stateful slow path; the batch operator stays
    the vectorized bulk rule."""
    min_gap_us = int(round(min_gap_s * 1_000_000))

    def fn(key: Any, pdfs, state: GroupState):
        last_kept = state.get[0] if state.exists else None
        # MATERIALIZE the whole per-key micro-batch before sorting: the
        # iterator yields multiple Arrow chunks for a key whose batch
        # exceeds arrow.maxRecordsPerBatch, in no cross-chunk order — a
        # per-chunk sort would run the sequential rule on wrongly-ordered
        # data exactly at the burst scale this operator targets (review
        # finding). Memory is bounded by one key's one-micro-batch volume.
        chunks = [p for p in pdfs if len(p)]
        if not chunks:
            state.update((int(last_kept) if last_kept is not None else None,))
            yield pd.DataFrame(
                columns=[f.name for f in DEBOUNCE_OUT_SCHEMA.fields]
            )
            return
        pdf = pd.concat(chunks, ignore_index=True).sort_values(
            ["ts", "event_id"], kind="mergesort"
        )
        ts_us = pdf["ts"].to_numpy(dtype="datetime64[us]").astype("int64")
        keep = np.zeros(len(pdf), dtype=bool)
        gaps = []
        for i, t in enumerate(ts_us):
            if last_kept is None or t - last_kept >= min_gap_us:
                keep[i] = True
                # seconds since the previous KEPT event, carried
                # across micro-batches; nan only for the first ever
                gaps.append(
                    np.nan if last_kept is None else (t - last_kept) / 1e6
                )
                last_kept = int(t)
        kept = pdf[keep]
        state.update((int(last_kept) if last_kept is not None else None,))
        yield pd.DataFrame({
            "user_id": key[0],
            "event_type": key[1],
            "event_id": kept["event_id"].to_numpy(),
            "ts": kept["ts"].to_numpy(),
            "gap_s": np.array(gaps, dtype=np.float64),
        })

    return (
        stream.withWatermark("ts", delay)
        .groupBy("user_id", "event_type")
        .applyInPandasWithState(
            fn,
            outputStructType=DEBOUNCE_OUT_SCHEMA,
            stateStructType=_DEBOUNCE_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


TRANSITIONS_OUT_SCHEMA = T.StructType([
    T.StructField("user_id", T.LongType()),
    T.StructField("from_type", T.StringType()),
    T.StructField("to_type", T.StringType()),
    T.StructField("ts", T.TimestampType()),
])
_TRANSITIONS_STATE = T.StructType([
    T.StructField("last_us", T.LongType()),
    T.StructField("last_event_id", T.LongType()),
    T.StructField("last_type", T.StringType()),
])


def stateful_transitions(
    stream: DataFrame,
    delay: str = "30 minutes",
) -> DataFrame:
    """T8: streaming first-order transition emission — for every event,
    one (from_type -> to_type) row against the PREVIOUS event of the
    same user, with the previous event carried across micro-batches as
    per-key state. Downstream, ``output.groupBy(from_type, to_type)``
    maintains the live transition-count table; after any prefix of the
    stream the aggregated counts equal the batch ``transition_counts``
    over the same prefix (the batch/stream parity test pins this).

    A user's first-ever event emits nothing (no predecessor) — exactly
    the batch operator's terminal-event rule, seen from the other side.
    Within a batch the pairing is vectorized (pandas shift over the
    (ts, event_id)-sorted batch); state is 3 scalars per user. The
    watermark bounds how late an event may arrive and still pair
    correctly; beyond-watermark stragglers are the upstream dedup
    stage's contract, as with every stateful op here."""

    def fn(key: Any, pdfs, state: GroupState):
        chunks = [p for p in pdfs if len(p)]
        if not chunks:
            if state.exists:
                state.update(tuple(state.get))
            yield pd.DataFrame(
                columns=[f.name for f in TRANSITIONS_OUT_SCHEMA.fields]
            )
            return
        # concat ALL chunks before sorting — per-chunk order is not
        # guaranteed across Arrow batch boundaries (the T7 finding)
        pdf = pd.concat(chunks, ignore_index=True).sort_values(
            ["ts", "event_id"], kind="mergesort"
        )
        types = pdf["event_type"].astype(str).to_numpy()
        prev = np.empty(len(pdf), dtype=object)
        prev[1:] = types[:-1]
        prev[0] = state.get[2] if state.exists else None
        ts_us = pdf["ts"].to_numpy(dtype="datetime64[us]").astype("int64")
        state.update((int(ts_us[-1]), int(pdf["event_id"].iloc[-1]),
                      str(types[-1])))
        mask = np.array([p is not None for p in prev])
        out = pdf[mask]
        yield pd.DataFrame({
            "user_id": key[0],
            "from_type": prev[mask],
            "to_type": out["event_type"].to_numpy(),
            "ts": out["ts"].to_numpy(),
        })

    return (
        stream.withWatermark("ts", delay)
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=TRANSITIONS_OUT_SCHEMA,
            stateStructType=_TRANSITIONS_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


FUNNEL_OUT_SCHEMA = T.StructType([
    T.StructField("user_id", T.LongType()),
    T.StructField("step_idx", T.IntegerType()),
    T.StructField("step", T.StringType()),
    T.StructField("ts", T.TimestampType()),
])

_FUNNEL_STATE = T.StructType([
    T.StructField("stage", T.IntegerType()),
    T.StructField("t_us", T.LongType()),
])


def stateful_funnel(
    stream: DataFrame,
    steps: list[str],
    window_s: float = 3600.0,
    delay: str = "30 minutes",
) -> DataFrame:
    """T9: streaming CHAINED funnel — the incremental form of the batch
    ``funnel_chain`` fold. Emits one row the moment a user's funnel
    ADVANCES (anchor matched, or step i+1 matched within ``window_s``
    of the step-i match), carrying the greedy state machine
    (stage, matched-ts) across micro-batches as 2 scalars per user.
    Because the greedy earliest-match chain visits each stage at most
    once per user, ``output.groupBy(step_idx).count()`` over any prefix
    of the stream equals the batch ``funnel_chain`` n_reached column
    over the same prefix — the parity test pins this, including chains
    whose consecutive matches arrive in different micro-batches.

    The stream is filtered to the funnel's step types BEFORE the
    stateful shuffle, so state traffic scales with funnel-relevant
    events only. Within a batch the fold is a sequential scan over the
    (ts, id)-sorted funnel events of one user — the same inherently
    sequential recurrence the batch operator runs as an F.aggregate
    fold; all chunks are concatenated before sorting (the T7
    Arrow-chunk-ordering rule). Late data beyond the watermark is the
    upstream dedup stage's contract, as with every stateful op here."""
    if len(steps) < 2:
        raise ValueError("stateful_funnel: need at least two steps")
    if len(set(steps)) != len(steps):
        raise ValueError("stateful_funnel: steps must be distinct")
    w = int(round(window_s * 1_000_000))
    if w < 1:
        raise ValueError("stateful_funnel: window must be >= 1 microsecond")
    si_map = {s: i for i, s in enumerate(steps)}
    step_names = list(steps)

    def fn(key: Any, pdfs, state: GroupState):
        chunks = [p for p in pdfs if len(p)]
        if not chunks:
            if state.exists:
                state.update(tuple(state.get))
            yield pd.DataFrame(
                columns=[f.name for f in FUNNEL_OUT_SCHEMA.fields]
            )
            return
        pdf = pd.concat(chunks, ignore_index=True).sort_values(
            ["ts", "event_id"], kind="mergesort"
        )
        stage, t_prev = (state.get if state.exists else (-1, 0))
        ts_us = pdf["ts"].to_numpy(dtype="datetime64[us]").astype("int64")
        sis = pdf["event_type"].map(si_map).to_numpy()
        hit_idx: list[int] = []
        hit_stage: list[int] = []
        for i in range(len(pdf)):
            si, t = int(sis[i]), int(ts_us[i])
            if (stage == -1 and si == 0) or (
                si == stage + 1 and t > t_prev and t <= t_prev + w
            ):
                stage, t_prev = si, t
                hit_idx.append(i)
                hit_stage.append(si)
        state.update((int(stage), int(t_prev)))
        out = pdf.iloc[hit_idx]
        yield pd.DataFrame({
            "user_id": key[0],
            "step_idx": np.array(hit_stage, dtype="int32"),
            "step": [step_names[s] for s in hit_stage],
            "ts": out["ts"].to_numpy(),
        })

    return (
        stream.filter(F.col("event_type").isin(step_names))
        .withWatermark("ts", delay)
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=FUNNEL_OUT_SCHEMA,
            stateStructType=_FUNNEL_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


SCD2_OUT_SCHEMA = T.StructType([
    T.StructField("user_id", T.LongType()),
    T.StructField("state", T.StringType()),
    T.StructField("valid_from_us", T.LongType()),
    T.StructField("valid_to_us", T.LongType()),
])

_SCD2_STATE = T.StructType([
    T.StructField("attr", T.StringType()),
    T.StructField("attr_is_null", T.BooleanType()),
    T.StructField("from_us", T.LongType()),
])


def stateful_scd2(
    stream: DataFrame,
    attr_col: str = "event_type",
    delay: str = "30 minutes",
) -> DataFrame:
    """T10: streaming SCD2 maintenance — the incremental form of the
    batch ``scd2_intervals`` temporalization. Tracks each key's current
    (attr, valid_from) as 3 scalars of state and emits a CLOSED
    half-open interval row the moment the attr CHANGES (NULL-safe, like
    the batch operator: NULL is a real state). Over any stream prefix
    the emitted rows equal the batch operator's closed intervals
    (valid_to_us IS NOT NULL) over the same prefix — the still-open
    run lives in state, not in the output, because append-mode output
    is immutable and the open interval's end is unknown (the batch
    parity test pins exactly this relationship).

    Within a batch the run-length compression is vectorized (shift
    compare over the (ts, event_id)-sorted batch); chunks concatenate
    before sorting (the T7 rule)."""

    def fn(key: Any, pdfs, state: GroupState):
        chunks = [p for p in pdfs if len(p)]
        if not chunks:
            if state.exists:
                state.update(tuple(state.get))
            yield pd.DataFrame(
                columns=[f.name for f in SCD2_OUT_SCHEMA.fields]
            )
            return
        pdf = pd.concat(chunks, ignore_index=True).sort_values(
            ["ts", "event_id"], kind="mergesort"
        )
        s = pdf[attr_col]
        attrs = s.where(s.notna(), None).to_numpy(dtype=object)
        ts_us = pdf["ts"].to_numpy(dtype="datetime64[us]").astype("int64")
        if state.exists:
            cur_a, cur_null, cur_from = state.get
            cur = None if cur_null else cur_a
        else:
            cur, cur_from = attrs[0], int(ts_us[0])
            attrs, ts_us = attrs[1:], ts_us[1:]
        # shift compare against the carried state: prev[i] is the attr in
        # force just before row i (None != None is False, so the compare
        # is NULL-safe on object arrays)
        prev = np.empty(len(attrs), dtype=object)
        prev[1:] = attrs[:-1]
        prev[0] = cur
        idx = np.flatnonzero(attrs != prev)
        if len(idx):
            run_attr = np.concatenate(([cur], attrs[idx[:-1]]))
            run_from = np.concatenate(([cur_from], ts_us[idx[:-1]]))
            out = pd.DataFrame({
                "user_id": key[0],
                "state": run_attr,
                "valid_from_us": run_from.astype("int64"),
                "valid_to_us": ts_us[idx],
            })
            cur, cur_from = attrs[idx[-1]], int(ts_us[idx[-1]])
        else:
            out = pd.DataFrame(
                columns=[f.name for f in SCD2_OUT_SCHEMA.fields]
            )
        state.update((cur, cur is None, int(cur_from)))
        yield out

    return (
        stream.withWatermark("ts", delay)
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=SCD2_OUT_SCHEMA,
            stateStructType=_SCD2_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


ROLLDIST_OUT_SCHEMA = T.StructType([
    T.StructField("user_id", T.LongType()),
    T.StructField("event_id", T.LongType()),
    T.StructField("ts", T.TimestampType()),
    T.StructField("n_distinct", T.LongType()),
])


def _rolldist_state(n: int) -> T.StructType:
    # the trailing row tail as a fixed-semantics pair of arrays: values
    # (with a placeholder where the row's value was NULL) + null flags —
    # array elements themselves round-trip fine, but an explicit flag
    # array keeps "NULL value" distinct from any real string
    return T.StructType([
        T.StructField("vals", T.ArrayType(T.StringType())),
        T.StructField("nulls", T.ArrayType(T.BooleanType())),
    ])


def stateful_rolling_distinct(
    stream: DataFrame,
    value_col: str = "event_type",
    n: int = 10,
    delay: str = "30 minutes",
) -> DataFrame:
    """T11: streaming trailing-window distinct count — the incremental
    form of the batch ``with_rolling_distinct`` variety signal: for
    every event, how many DISTINCT non-NULL values the user's last
    ``n`` events (current included) carry. The carried state is the
    user's trailing row tail (at most n values + null flags), so state
    per key is bounded by construction — the same bound the batch
    window's per-row collect_set enjoys. Over any stream prefix the
    emissions equal the batch operator row-for-row (the parity test
    pins this, including windows that SPAN micro-batches). NULL rows
    occupy window slots but contribute nothing to the set — exactly
    collect_set's behavior.

    Within a batch the walk is a per-row deque scan over the user's
    (ts, id)-sorted events — the sliding-distinct recurrence is
    sequential by nature, the same posture as T9's fold; chunks
    concatenate before sorting (the T7 rule)."""
    if n < 1:
        raise ValueError("stateful_rolling_distinct: n must be >= 1")

    def fn(key: Any, pdfs, state: GroupState):
        chunks = [p for p in pdfs if len(p)]
        if not chunks:
            if state.exists:
                state.update(tuple(state.get))
            yield pd.DataFrame(
                columns=[f.name for f in ROLLDIST_OUT_SCHEMA.fields]
            )
            return
        pdf = pd.concat(chunks, ignore_index=True).sort_values(
            ["ts", "event_id"], kind="mergesort"
        )
        if state.exists:
            vals, nulls = state.get
            tail = [None if isnull else v
                    for v, isnull in zip(list(vals), list(nulls))]
        else:
            tail = []
        s = pdf[value_col]
        incoming = list(s.where(s.notna(), None).to_numpy(dtype=object))
        counts = []
        for v in incoming:
            tail.append(v)
            if len(tail) > n:
                tail.pop(0)
            counts.append(len({x for x in tail if x is not None}))
        state.update((
            [("" if v is None else v) for v in tail],
            [v is None for v in tail],
        ))
        yield pd.DataFrame({
            "user_id": key[0],
            "event_id": pdf["event_id"].to_numpy(),
            "ts": pdf["ts"].to_numpy(),
            "n_distinct": np.array(counts, dtype="int64"),
        })

    return (
        stream.withWatermark("ts", delay)
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=ROLLDIST_OUT_SCHEMA,
            stateStructType=_rolldist_state(n),
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


PROFILE_MOMENTS_TABLE = "profile_moments"
PROFILE_HLL_TABLE = "profile_hll"
PROFILE_QUANTILE_TABLE = "profile_quantiles"


def stream_profile_writer(
    stream: DataFrame,
    io,
    value_col: str,
    key_cols: list[str],
    distinct_col: str | None = None,
    scale: int = 100,
    lg_k: int = 12,
    quantiles: bool = False,
    alpha: float = 0.01,
    checkpoint: str | None = None,
):
    """T12: incremental corpus-datasheet maintenance — every micro-batch
    writes its own per-key moments profile (group_moments: exact
    mergeable bigint sums/extrema) and, optionally, its HLL distinct
    sketches, each into an ``ingest_batch``-partitioned table. The
    CURRENT datasheet is obtained by merging the tiny per-batch profile
    rows (``read_current_profile``) — never by rescanning ingested
    history, which is the entire point at 100 TB: profile maintenance
    cost is O(batch), read cost is O(batches x keys).

    Exactly-once under retries comes from the storage shape, not from
    merge bookkeeping: additive merge is NOT idempotent (a re-added
    batch double-counts), so batches are never merged INTO a running
    total on the write path — each batch owns its partition and a retry
    dynamic-OVERWRITES it (the stream_dedup_writer discipline). The
    merge happens at READ time, where merge==one-pass exactness is the
    tested property of the profile operators.

    ``quantiles=True`` adds the A20 log-bucket quantile sketches as a
    third per-batch table — the percentile leg of the datasheet
    (moments = mean/var, HLL = distinct, quantiles = distribution
    shape), with the SAME merge==one-pass-bit-equal property because
    bucket counts are order-insensitive. The value column must be
    positive in that mode (the A20 contract; nonpositive values are
    refused loudly in-plan, never silently bucketed)."""
    import os  # noqa: PLC0415

    from tgist_features_spark.operators.aggregates import (  # noqa: PLC0415
        distinct_sketches,
        group_moments,
        quantile_sketches,
    )

    ckpt = checkpoint or io.path("_profile_ckpt")
    marker_dir = os.path.join(ckpt, "_batch_markers")

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        marker = os.path.join(marker_dir, f"batch_{batch_id}")
        if os.path.exists(marker):
            return
        moments = group_moments(batch_df, value_col, key_cols, scale)
        (
            moments.withColumn("ingest_batch", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("ingest_batch")
            .parquet(io.path(PROFILE_MOMENTS_TABLE))
        )
        if distinct_col is not None:
            sk = distinct_sketches(batch_df, key_cols, distinct_col, lg_k)
            (
                sk.withColumn("ingest_batch", F.lit(batch_id))
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("ingest_batch")
                .parquet(io.path(PROFILE_HLL_TABLE))
            )
        if quantiles:
            qs = quantile_sketches(batch_df, key_cols, value_col, alpha)
            (
                qs.withColumn("ingest_batch", F.lit(batch_id))
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("ingest_batch")
                .parquet(io.path(PROFILE_QUANTILE_TABLE))
            )
        os.makedirs(marker_dir, exist_ok=True)
        open(marker, "w").close()

    return (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
    )


def read_current_profile(
    spark: SparkSession, io, key_cols: list[str]
) -> tuple[DataFrame, DataFrame | None, DataFrame | None]:
    """The read side of T12: merge all per-batch profile partitions into
    the current datasheet — (moments, hll_or_None, quantiles_or_None).
    Bit-equal to the one-pass profile over everything ingested (the
    merge==one-pass property of group_moments / distinct_sketches /
    quantile_sketches), at the cost of reading only profile rows."""
    from tgist_features_spark.operators.aggregates import (  # noqa: PLC0415
        merge_distinct_sketches,
        merge_group_moments,
        merge_quantile_sketches,
    )

    moments = merge_group_moments(
        [spark.read.parquet(io.path(PROFILE_MOMENTS_TABLE)).drop("ingest_batch")],
        key_cols,
    )
    hll = None
    if io.exists(PROFILE_HLL_TABLE):
        hll = merge_distinct_sketches(
            spark.read.parquet(io.path(PROFILE_HLL_TABLE)).drop(
                "ingest_batch", "est"
            ),
            key_cols,
        )
    quant = None
    if io.exists(PROFILE_QUANTILE_TABLE):
        quant = merge_quantile_sketches(
            spark.read.parquet(io.path(PROFILE_QUANTILE_TABLE)).drop(
                "ingest_batch", "n"
            ),
            key_cols,
        )
    return moments, hll, quant


ROLLOUT_OUT_SCHEMA = T.StructType([
    T.StructField("user_id", T.LongType()),
    T.StructField("event_id", T.LongType()),
    T.StructField("ts", T.TimestampType()),
    T.StructField("win_cnt", T.LongType()),
    T.StructField("win_sum", T.LongType()),
    T.StructField("win_sumsq", T.LongType()),
    T.StructField("is_outlier", T.BooleanType()),
])


def _rollout_state() -> T.StructType:
    # trailing y tail: fixed-point values + null flags (a NULL-valued
    # row occupies its window slot but joins no statistic — the batch
    # operator's cnt/sum consistency rule)
    return T.StructType([
        T.StructField("ys", T.ArrayType(T.LongType())),
        T.StructField("nulls", T.ArrayType(T.BooleanType())),
    ])


def stateful_rolling_outliers(
    stream: DataFrame,
    value_col: str = "value",
    n: int = 20,
    z: int = 3,
    scale: int = 100,
    delay: str = "30 minutes",
) -> DataFrame:
    """T13: streaming trailing-window z-outlier flags — the incremental
    form of the batch ``with_rolling_outliers`` telemetry screen, with
    the IDENTICAL integer rule: over the non-NULL values of the last
    ``n`` rows (current included), flag when
    (y·cnt − s)² > z²·(cnt·q − s²), degenerate windows (cnt < 2 or
    zero variance) flagging on any deviation from the constant window.
    No float, no sqrt — the flag a restart or an engine swap cannot
    flip near the threshold.

    State per key is the trailing row tail (at most n fixed-point
    values + null flags): bounded by construction. Over any stream
    prefix the emissions equal the batch operator row-for-row,
    including windows spanning micro-batches (parity-pinned). Chunks
    concatenate before sorting (the T7 rule); the per-row walk is the
    sliding-window recurrence — sequential by nature, the T9/T11
    posture."""
    if n < 1:
        raise ValueError("stateful_rolling_outliers: n must be >= 1")

    def fn(key: Any, pdfs, state: GroupState):
        chunks = [p for p in pdfs if len(p)]
        if not chunks:
            if state.exists:
                state.update(tuple(state.get))
            yield pd.DataFrame(
                columns=[f.name for f in ROLLOUT_OUT_SCHEMA.fields]
            )
            return
        pdf = pd.concat(chunks, ignore_index=True).sort_values(
            ["ts", "event_id"], kind="mergesort"
        )
        if state.exists:
            ys, nulls = state.get
            tail = [None if isnull else int(v)
                    for v, isnull in zip(list(ys), list(nulls))]
        else:
            tail = []
        vals = pdf[value_col].to_numpy()
        out_rows = []
        for v in vals:
            y = None if pd.isna(v) else _round_half_up(float(v) * scale)
            tail.append(y)
            if len(tail) > n:
                tail.pop(0)
            nn = [x for x in tail if x is not None]
            cnt = len(nn)
            # empty window: NULL sums, exactly as the batch window's
            # F.sum over zero non-null rows
            s = sum(nn) if nn else None
            q = sum(x * x for x in nn) if nn else None
            if y is None:
                flag = False
            else:
                dev = y * cnt - s
                var_num = cnt * q - s * s
                flag = (dev * dev > z * z * var_num) if var_num > 0 else (
                    dev != 0
                )
            out_rows.append((cnt, s, q, flag))
        state.update((
            [0 if v is None else v for v in tail],
            [v is None for v in tail],
        ))
        cnts, sums, sqs, flags = zip(*out_rows)
        yield pd.DataFrame({
            "user_id": key[0],
            "event_id": pdf["event_id"].to_numpy(),
            "ts": pdf["ts"].to_numpy(),
            "win_cnt": np.array(cnts, dtype="int64"),
            "win_sum": pd.array(sums, dtype="Int64"),
            "win_sumsq": pd.array(sqs, dtype="Int64"),
            "is_outlier": np.array(flags, dtype=bool),
        })

    return (
        stream.withWatermark("ts", delay)
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=ROLLOUT_OUT_SCHEMA,
            stateStructType=_rollout_state(),
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


EWMA_OUT_SCHEMA = T.StructType([
    T.StructField("user_id", T.LongType()),
    T.StructField("event_id", T.LongType()),
    T.StructField("ts", T.TimestampType()),
    T.StructField("n_events", T.LongType()),
    T.StructField("v", T.LongType()),
    T.StructField("ewma", T.LongType()),
])


def _ewma_state() -> T.StructType:
    return T.StructType([
        T.StructField("s", T.LongType()),
        T.StructField("cnt", T.LongType()),
    ])


def stateful_ewma(
    stream: DataFrame,
    value_col: str = "value",
    k: int = 3,
    scale: int = 100,
    delay: str = "30 minutes",
) -> DataFrame:
    """T14: streaming per-entity EWMA maintenance — the incremental
    form of the batch ``ewma_smooth`` smoothed-level feature, with the
    IDENTICAL pinned integer recurrence

        s_1 = v_1;   s_t = (v_t + (2^k - 1) * s_{t-1}) div 2^k

    (`div` truncates toward zero; Python's ``//`` floors, so the
    truncation is spelled out explicitly here — the same
    cross-engine/cross-runtime pin the batch operator's tests hold).
    NULL-valued rows are EXCLUDED, exactly as in batch.

    State per key is TWO 64-bit integers (running smoothed level +
    count) — the smallest possible stateful footprint, vs the T13
    rolling tail; this is why EWMA is the scale-friendly "level"
    feature for entities whose full history would never fit a rolling
    window. Emits one row per consumed event carrying the
    post-update (n_events, v, ewma); over any stream prefix the last
    emission per entity equals the batch ``ewma_smooth`` row
    (parity-pinned). Chunks concatenate before sorting (the T7 rule).
    """
    if k < 1 or k > 32:
        raise ValueError("stateful_ewma: k must be in [1, 32]")
    m = (1 << k) - 1
    d = 1 << k

    def _tdiv(a: int) -> int:
        return a // d if a >= 0 else -((-a) // d)

    def fn(key: Any, pdfs, state: GroupState):
        chunks = [p for p in pdfs if len(p)]
        if not chunks:
            if state.exists:
                state.update(tuple(state.get))
            yield pd.DataFrame(columns=[f.name for f in EWMA_OUT_SCHEMA.fields])
            return
        pdf = pd.concat(chunks, ignore_index=True).sort_values(
            ["ts", "event_id"], kind="mergesort"
        )
        s, cnt = state.get if state.exists else (0, 0)
        out = []
        for _, row in pdf.iterrows():
            v = row[value_col]
            if pd.isna(v):
                continue
            y = _round_half_up(float(v) * scale)
            s = y if cnt == 0 else _tdiv(y + m * s)
            cnt += 1
            out.append((int(row["event_id"]), row["ts"], cnt, y, s))
        state.update((int(s), int(cnt)))
        if not out:
            yield pd.DataFrame(columns=[f.name for f in EWMA_OUT_SCHEMA.fields])
            return
        eids, tss, cnts, ys, ss = zip(*out)
        yield pd.DataFrame({
            "user_id": key[0],
            "event_id": np.array(eids, dtype="int64"),
            "ts": list(tss),
            "n_events": np.array(cnts, dtype="int64"),
            "v": np.array(ys, dtype="int64"),
            "ewma": np.array(ss, dtype="int64"),
        })

    return (
        stream.withWatermark("ts", delay)
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=EWMA_OUT_SCHEMA,
            stateStructType=_ewma_state(),
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
