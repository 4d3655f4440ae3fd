"""Streaming surface: file-source replay must agree with the batch engine."""

from __future__ import annotations

import uuid

import pytest
from pyspark.sql import functions as F

from tgist_features_spark.operators.sessionize import sessionize
from tgist_features_spark.sources.corpus import transcripts_df
from tgist_features_spark.streaming.stream import (
    dedup_within_watermark,
    incremental_turn_state,
    read_transcript_stream,
    session_window_stats,
    windowed_turn_counts,
)


@pytest.fixture(scope="module")
def corpus_dir(spark, tiny_pdf, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("stream_src"))
    transcripts_df(spark, tiny_pdf).repartition(4).write.mode("overwrite").parquet(p)
    return p


def _run_to_memory(stream_df, mode: str) -> str:
    name = f"t{uuid.uuid4().hex[:8]}"
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return name


def test_windowed_counts_match_batch(spark, corpus_dir, tiny_pdf):
    stream = read_transcript_stream(spark, corpus_dir)
    name = _run_to_memory(windowed_turn_counts(stream, "1 hour"), "complete")
    got = spark.sql(f"SELECT conv_id, win.start AS ws, n_turns FROM {name}").toPandas()
    batch = (
        transcripts_df(spark, tiny_pdf)
        .groupBy("conv_id", F.window("ts", "1 hour").alias("win"))
        .agg(F.count(F.lit(1)).alias("n_turns"))
        .select("conv_id", F.col("win.start").alias("ws"), "n_turns")
        .toPandas()
    )
    key = ["conv_id", "ws"]
    got = got.sort_values(key).reset_index(drop=True)
    batch = batch.sort_values(key).reset_index(drop=True)
    assert len(got) == len(batch)
    assert (got["n_turns"].to_numpy() == batch["n_turns"].to_numpy()).all()


def test_session_window_matches_batch_session_count(spark, corpus_dir, tiny_pdf):
    stream = read_transcript_stream(spark, corpus_dir)
    name = _run_to_memory(session_window_stats(stream, gap_s=1800.0), "complete")
    got = (
        spark.sql(f"SELECT conv_id, COUNT(*) AS n_sessions FROM {name} GROUP BY 1")
        .toPandas()
        .sort_values("conv_id")
        .reset_index(drop=True)
    )
    batch = (
        sessionize(transcripts_df(spark, tiny_pdf), gap_s=1800.0)
        .groupBy("conv_id")
        .agg((F.max("session_id") + 1).alias("n_sessions"))
        .toPandas()
        .sort_values("conv_id")
        .reset_index(drop=True)
    )
    assert (got["n_sessions"].to_numpy() == batch["n_sessions"].to_numpy()).all()


def test_dedup_within_watermark(spark, tiny_pdf, tmp_path):
    dup_dir = str(tmp_path / "dups")
    df = transcripts_df(spark, tiny_pdf)
    df.unionByName(df).repartition(4).write.mode("overwrite").parquet(dup_dir)
    stream = read_transcript_stream(spark, dup_dir)
    name = _run_to_memory(dedup_within_watermark(stream), "append")
    n = spark.sql(f"SELECT COUNT(*) AS n FROM {name}").collect()[0]["n"]
    assert n == len(tiny_pdf)


def test_incremental_state_matches_batch(spark, corpus_dir, tiny_pdf):
    stream = read_transcript_stream(spark, corpus_dir)
    name = _run_to_memory(incremental_turn_state(stream), "append")
    got = (
        spark.sql(f"SELECT conv_id, turn_idx, turn_no, cum_chars FROM {name}")
        .toPandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    from tgist_features_spark.oracle.pandas_oracle import oracle_turn_features

    ref = oracle_turn_features(tiny_pdf)[["conv_id", "turn_idx", "turn_no", "cum_chars"]]
    ref = ref.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    assert len(got) == len(ref)
    assert (got["turn_no"].to_numpy() == ref["turn_no"].to_numpy()).all()
    assert (got["cum_chars"].to_numpy() == ref["cum_chars"].to_numpy()).all()


def test_incremental_state_across_microbatches(spark, tiny_pdf, tmp_path):
    """State carries across micro-batches: split the corpus into an early
    and a late half (by global event time), deliver one file per trigger,
    and require the final output to still match the batch oracle."""
    import os

    src = str(tmp_path / "batched")
    os.makedirs(src, exist_ok=True)
    cut = tiny_pdf["ts"].quantile(0.5)
    early = tiny_pdf[tiny_pdf["ts"] <= cut]
    late = tiny_pdf[tiny_pdf["ts"] > cut]
    # file names sort early < late; file source processes in path order
    transcripts_df(spark, early).coalesce(1).write.mode("overwrite").parquet(src + "/b=0")
    transcripts_df(spark, late).coalesce(1).write.mode("overwrite").parquet(src + "/b=1")

    stream = (
        spark.readStream.schema(
            __import__("tgist_features_spark.sources.corpus", fromlist=["TRANSCRIPT_SCHEMA"]).TRANSCRIPT_SCHEMA
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/b=*")
    )
    name = _run_to_memory(incremental_turn_state(stream), "append")
    got = (
        spark.sql(f"SELECT conv_id, turn_idx, turn_no, cum_chars FROM {name}")
        .toPandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    from tgist_features_spark.oracle.pandas_oracle import oracle_turn_features

    ref = (
        oracle_turn_features(tiny_pdf)[["conv_id", "turn_idx", "turn_no", "cum_chars"]]
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    assert len(got) == len(ref)
    assert (got["turn_no"].to_numpy() == ref["turn_no"].to_numpy()).all()
    assert (got["cum_chars"].to_numpy() == ref["cum_chars"].to_numpy()).all()


def test_session_gap_exact_threshold_matches_batch(spark, tmp_path):
    """A gap of EXACTLY the threshold must sessionize identically on both
    surfaces. Empirically session_window MERGES events whose gap equals the
    duration (inclusive end) and cuts only on gap > duration — identical to
    batch sessionize's strict-> cut, so both the exact-threshold gap (merge)
    and the 1-microsecond-over gap (cut) must agree with batch."""
    import pandas as pd

    pdf = pd.DataFrame(
        {
            "conv_id": ["c1"] * 3 + ["c2"] * 2,
            "turn_idx": [0, 1, 2, 0, 1],
            "role": ["user"] * 5,
            "text": ["x"] * 5,
            "tool": [None] * 5,
            "ts": pd.to_datetime(
                [0, 1800_000_000_000, 3600_000_000_000,  # exact 1800s gaps
                 0, 1800_000_001_000],                    # 1800.000001s gap
            ),
        }
    )
    src = str(tmp_path / "exact_gap")
    transcripts_df(spark, pdf).coalesce(1).write.mode("overwrite").parquet(src)
    stream = read_transcript_stream(spark, src)
    name = _run_to_memory(session_window_stats(stream, gap_s=1800.0), "complete")
    got = (
        spark.sql(f"SELECT conv_id, COUNT(*) AS n FROM {name} GROUP BY 1")
        .toPandas().set_index("conv_id")["n"].to_dict()
    )
    batch = (
        sessionize(transcripts_df(spark, pdf), gap_s=1800.0)
        .groupBy("conv_id").agg((F.max("session_id") + 1).alias("n"))
        .toPandas().set_index("conv_id")["n"].to_dict()
    )
    # c1: exact-threshold gaps merge (1 session); c2: gap just over cuts (2)
    assert batch == {"c1": 1, "c2": 2}
    assert got == batch


def test_stream_features_sink_matches_batch_layout(spark, corpus_dir, tiny_pdf, tmp_path):
    """The streaming sink must land in the bucket(conv_id)-partitioned
    feature layout with values equal to the batch/pandas oracle — one
    consistent table whether rows arrived by backfill or by stream."""
    import os

    from tgist_features_spark.sources.table_io import TableIO
    from tgist_features_spark.streaming.stream import (
        STREAM_FEATURES_TABLE,
        stream_features_writer,
    )

    io_ = TableIO(spark, str(tmp_path / "wh"), n_buckets=8)
    stream = read_transcript_stream(spark, corpus_dir)
    # bucket count comes from the TableIO — the one the batch table uses
    q = stream_features_writer(stream, io_).trigger(availableNow=True).start()
    q.awaitTermination(120)

    root = io_.path(STREAM_FEATURES_TABLE)
    assert any(d.startswith("bucket=") for d in os.listdir(root)), (
        "sink must be bucket-partitioned like the batch feature table"
    )
    got = (
        spark.read.parquet(root)
        .select("conv_id", "turn_idx", "turn_no", "cum_chars")
        .toPandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    from tgist_features_spark.oracle.pandas_oracle import oracle_turn_features

    ref = (
        oracle_turn_features(tiny_pdf)[["conv_id", "turn_idx", "turn_no", "cum_chars"]]
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    assert len(got) == len(ref)
    assert (got["turn_no"].to_numpy() == ref["turn_no"].to_numpy()).all()
    assert (got["cum_chars"].to_numpy() == ref["cum_chars"].to_numpy()).all()


def test_stream_dedup_sink_exactly_once_unique(spark, tmp_path):
    """Ingest-time dedup: duplicates within a batch, across batches, and
    across RESTARTS (second availableNow run over the same source) must
    all collapse — the corpus table ends up with one row per distinct
    text (smallest doc_id kept), and the rerun is a no-op."""
    import pandas as pd

    from tgist_features_spark.sources.table_io import TableIO
    from tgist_features_spark.streaming.stream import (
        DEDUP_DOCS_TABLE,
        stream_dedup_writer,
    )

    src = tmp_path / "docs_src"
    src.mkdir()
    # file 1: in-batch duplicate (1, 2 same text); file 2: cross-batch
    # duplicate of doc 1 plus a fresh doc
    pd.DataFrame(
        {"doc_id": [2, 1, 3], "text": ["alpha beta", "alpha beta", "unique one"]}
    ).to_parquet(src / "f1.parquet")
    pd.DataFrame(
        {"doc_id": [10, 11], "text": ["alpha beta", "another text"]}
    ).to_parquet(src / "f2.parquet")

    io_ = TableIO(spark, str(tmp_path / "wh"))
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )

    def run_once():
        q = stream_dedup_writer(stream, io_).trigger(availableNow=True).start()
        q.awaitTermination(120)
        return (
            spark.read.parquet(io_.path(DEDUP_DOCS_TABLE))
            .toPandas()
            .sort_values("doc_id")
        )

    got = run_once()
    assert got["doc_id"].tolist() == [1, 3, 11]
    assert got["text"].is_unique
    again = run_once()  # restart over the same source: no re-ingest
    assert again["doc_id"].tolist() == [1, 3, 11]

    # crash-window replay (r3 ADVICE): docs committed but fingerprints +
    # checkpoint lost — the re-delivered batches must REPLACE their own
    # ingest_batch partitions, not append duplicates
    import shutil

    from tgist_features_spark.streaming.stream import DEDUP_FP_TABLE

    shutil.rmtree(io_.path(DEDUP_FP_TABLE))
    shutil.rmtree(io_.path("_dedup_ckpt"))
    replay = run_once()
    assert replay["doc_id"].tolist() == [1, 3, 11]
    assert replay["text"].is_unique


def test_doc_feature_fns_are_stream_compatible(spark, tmp_path):
    """The per-row doc operators (repetition filters, redaction, window
    chunking) are stateless projections, so they must run unchanged on a
    streaming scan and agree with the batch engine row-for-row — the
    property that lets the ingest pipeline quality-filter and scrub
    at stream time."""
    import pandas as pd

    from tgist_features_spark.functions.text import (
        chunk_windows,
        with_redaction,
        with_repetition_features,
    )

    pdf = pd.DataFrame({
        "doc_id": range(20),
        "text": [
            f"doc {i} mail u{i}@x.co " + " ".join(f"w{j % (i + 2)}" for j in range(30))
            for i in range(20)
        ],
    })
    src = str(tmp_path / "docs")
    df = spark.createDataFrame(pdf)
    df.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(df.schema).parquet(src)

    for fn in (
        lambda d: with_repetition_features(d).drop("text"),
        lambda d: with_redaction(d).drop("text"),
        lambda d: chunk_windows(d, size=8, stride=4),
    ):
        name = _run_to_memory(fn(stream), "append")
        got = spark.sql(f"SELECT * FROM {name}").toPandas()
        want = fn(df).toPandas()
        cols = sorted(want.columns)
        got = got[cols].sort_values(cols, kind="mergesort").reset_index(drop=True)
        want = want[cols].sort_values(cols, kind="mergesort").reset_index(drop=True)
        pd.testing.assert_frame_equal(got, want)


def test_stream_static_enrichment_matches_batch(spark, corpus_dir, tiny_pdf):
    """T6: enriching the transcript stream with a static role-weight dim
    must equal the batch broadcast join row-for-row; unmatched stream
    rows survive (left join), and the dimension columns ride along."""
    import pandas as pd

    from tgist_features_spark.streaming.stream import (
        enrich_with_static,
        read_transcript_stream,
    )

    dim = spark.createDataFrame(pd.DataFrame({
        "role": ["user", "assistant"],
        "role_weight": [1.0, 2.0],
    }))
    stream = read_transcript_stream(spark, corpus_dir)
    name = _run_to_memory(
        enrich_with_static(stream, dim, on="role"), "append"
    )
    got = (
        spark.sql(f"SELECT conv_id, turn_idx, role, role_weight FROM {name}")
        .toPandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    )
    batch = (
        transcripts_df(spark, tiny_pdf)
        .join(F.broadcast(dim), on="role", how="left")
        .select("conv_id", "turn_idx", "role", "role_weight")
        .toPandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    )
    assert len(got) == len(batch) == len(tiny_pdf)
    m = got.merge(batch, on=["conv_id", "turn_idx"], suffixes=("", "_b"))
    assert (m["role"] == m["role_b"]).all()
    assert ((m["role_weight"] == m["role_weight_b"])
            | (m["role_weight"].isna() & m["role_weight_b"].isna())).all()


def test_stateful_debounce_chained_rule_across_batches(spark, tmp_path):
    """T7: the CHAINED debounce (gap measured from the last KEPT event)
    must match a sequential reference, including a chain that crosses a
    micro-batch boundary — the shape the batch window operator refuses."""
    import os

    import numpy as np
    import pandas as pd

    from tgist_features_spark.streaming.stream import stateful_debounce

    # bursts 10s apart within each user stream; threshold 25s means the
    # chained rule keeps every third event — the lag rule would keep NONE
    # after the first (every consecutive gap is 10s < 25s)
    rows = []
    eid = 0
    for u in range(3):
        for k in range(12):
            rows.append((eid, u, "click", pd.Timestamp(100 * u + 10 * k, unit="s")))
            eid += 1
    pdf = pd.DataFrame(rows, columns=["event_id", "user_id", "event_type", "ts"])

    src = str(tmp_path / "ev")
    os.makedirs(src, exist_ok=True)
    early = pdf[pdf["event_id"] % 12 < 6]   # first half of every stream
    late = pdf[pdf["event_id"] % 12 >= 6]
    schema = "event_id long, user_id long, event_type string, ts timestamp"
    spark.createDataFrame(early, schema=schema).coalesce(1).write.mode(
        "overwrite").parquet(src + "/b=0")
    spark.createDataFrame(late, schema=schema).coalesce(1).write.mode(
        "overwrite").parquet(src + "/b=1")
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/b=*")
    )
    name = _run_to_memory(stateful_debounce(stream, 25.0), "append")
    got = (
        spark.sql(f"SELECT user_id, event_id, gap_s FROM {name}")
        .toPandas().sort_values("event_id").reset_index(drop=True)
    )

    # sequential chained reference
    want = []
    for u, sub in pdf.groupby("user_id"):
        sub = sub.sort_values(["ts", "event_id"])
        last = None
        for _, r in sub.iterrows():
            t = r["ts"].value // 1000  # us
            if last is None or t - last >= 25_000_000:
                want.append((r["event_id"], np.nan if last is None else (t - last) / 1e6))
                last = t
    want_ids = [w[0] for w in want]
    assert got["event_id"].tolist() == sorted(want_ids)
    wmap = dict(want)
    for r in got.itertuples():
        w = wmap[r.event_id]
        assert (np.isnan(w) and np.isnan(r.gap_s)) or w == r.gap_s
    # the chained rule kept every 3rd event (30s spacing >= 25s)
    per_user = got.groupby("user_id")["event_id"].count()
    assert (per_user == 4).all(), per_user.to_dict()


def test_stateful_transitions_parity_with_batch(spark, tmp_path):
    """T8: streaming transition emission aggregated over the whole
    stream == the batch transition_counts table, including pairs whose
    two events arrive in DIFFERENT micro-batches (the carried-state
    boundary)."""
    import os

    import numpy as np
    import pandas as pd

    from tgist_features_spark.operators.windows import transition_counts
    from tgist_features_spark.streaming.stream import stateful_transitions

    rng = np.random.default_rng(43)
    rows = []
    eid = 0
    for u in range(5):
        for k in range(20):
            rows.append((eid, u, str(rng.choice(["a", "b", "c"])),
                         pd.Timestamp(1000 * u + 7 * k, unit="s")))
            eid += 1
    pdf = pd.DataFrame(rows, columns=["event_id", "user_id", "event_type", "ts"])

    src = str(tmp_path / "ev")
    os.makedirs(src, exist_ok=True)
    schema = "event_id long, user_id long, event_type string, ts timestamp"
    # split so every user's stream crosses the batch boundary mid-chain
    early = pdf[pdf["event_id"] % 20 < 11]
    late = pdf[pdf["event_id"] % 20 >= 11]
    spark.createDataFrame(early, schema=schema).coalesce(1).write.mode(
        "overwrite").parquet(src + "/b=0")
    spark.createDataFrame(late, schema=schema).coalesce(1).write.mode(
        "overwrite").parquet(src + "/b=1")
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/b=*")
    )
    name = _run_to_memory(stateful_transitions(stream), "append")
    got = (
        spark.sql(
            f"SELECT from_type, to_type, COUNT(*) AS n_transitions FROM {name} "
            "GROUP BY 1, 2"
        ).toPandas().set_index(["from_type", "to_type"])["n_transitions"]
        .to_dict()
    )
    want = (
        transition_counts(
            spark.createDataFrame(pdf, schema=schema),
            "user_id", "event_type", ("ts", "event_id"),
        ).toPandas().set_index(["from_type", "to_type"])["n_transitions"]
        .to_dict()
    )
    assert got == want
    # per-user transition volume: n_events - 1 each (first emits nothing)
    total = spark.sql(f"SELECT COUNT(*) c FROM {name}").first()["c"]
    assert total == len(pdf) - 5


def test_stateful_funnel_parity_with_batch(spark, tmp_path):
    """T9: streaming chained-funnel advancement rows aggregated over the
    whole stream == the batch funnel_chain n_reached table, including
    chains whose consecutive step matches arrive in DIFFERENT
    micro-batches (the carried-state boundary), and non-funnel event
    types never reaching the stateful operator."""
    import os

    import numpy as np
    import pandas as pd

    from tgist_features_spark.operators.ranges import funnel_chain
    from tgist_features_spark.streaming.stream import stateful_funnel

    rng = np.random.default_rng(61)
    rows = []
    eid = 0
    for u in range(12):
        for k in range(20):
            rows.append((
                eid, u,
                str(rng.choice(["view", "click", "purchase", "noise"],
                               p=[0.4, 0.3, 0.1, 0.2])),
                pd.Timestamp(100_000 * u + 600 * k, unit="s"),
            ))
            eid += 1
    pdf = pd.DataFrame(rows, columns=["event_id", "user_id", "event_type", "ts"])
    steps = ["view", "click", "purchase"]
    window_s = 1800.0  # 3 events' spacing: some chains break, some hold

    src = str(tmp_path / "fev")
    os.makedirs(src, exist_ok=True)
    schema = "event_id long, user_id long, event_type string, ts timestamp"
    # split so every user's stream crosses the batch boundary mid-chain
    early = pdf[pdf["event_id"] % 20 < 9]
    late = pdf[pdf["event_id"] % 20 >= 9]
    spark.createDataFrame(early, schema=schema).coalesce(1).write.mode(
        "overwrite").parquet(src + "/b=0")
    spark.createDataFrame(late, schema=schema).coalesce(1).write.mode(
        "overwrite").parquet(src + "/b=1")
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/b=*")
    )
    name = _run_to_memory(
        stateful_funnel(stream, steps, window_s=window_s), "append"
    )
    got = (
        spark.sql(
            f"SELECT step_idx, step, COUNT(*) AS n_reached FROM {name} "
            "GROUP BY 1, 2"
        ).toPandas().set_index("step_idx")
    )
    want = (
        funnel_chain(
            spark.createDataFrame(pdf, schema=schema), steps,
            window_s=window_s,
        ).toPandas().set_index("step_idx")
    )
    # batch reports every step (zero-reached included); the stream only
    # emits reached steps — compare on the batch's nonzero rows and
    # check the stream emitted nothing beyond them
    nz = want[want["n_reached"] > 0]
    assert len(nz) > 0 and nz["n_reached"].iloc[0] > 0
    assert set(got.index) == set(nz.index)
    for i in nz.index:
        assert got.loc[i, "n_reached"] == nz.loc[i, "n_reached"], i
        assert got.loc[i, "step"] == nz.loc[i, "step"]
    # each user advances through each stage at most once
    per_user = spark.sql(
        f"SELECT user_id, step_idx, COUNT(*) c FROM {name} GROUP BY 1, 2"
    ).toPandas()
    assert (per_user["c"] == 1).all()


def test_stateful_scd2_parity_with_batch(spark, tmp_path):
    """T10: streaming SCD2 closed intervals over the whole stream ==
    the batch scd2_intervals rows with a non-NULL valid_to, including
    runs that OPEN in one micro-batch and CLOSE in the next, and NULL
    as a real state."""
    import os

    import numpy as np
    import pandas as pd

    from tgist_features_spark.operators.windows import scd2_intervals
    from tgist_features_spark.streaming.stream import stateful_scd2

    rng = np.random.default_rng(73)
    rows = []
    eid = 0
    for u in range(10):
        for k in range(24):
            state = rng.choice(["a", "b", None], p=[0.45, 0.45, 0.1])
            rows.append((eid, u, state,
                         pd.Timestamp(50_000 * u + 300 * k, unit="s")))
            eid += 1
    pdf = pd.DataFrame(rows, columns=["event_id", "user_id", "event_type", "ts"])

    src = str(tmp_path / "scd")
    os.makedirs(src, exist_ok=True)
    schema = "event_id long, user_id long, event_type string, ts timestamp"
    early = pdf[pdf["event_id"] % 24 < 11]
    late = pdf[pdf["event_id"] % 24 >= 11]
    spark.createDataFrame(early, schema=schema).coalesce(1).write.mode(
        "overwrite").parquet(src + "/b=0")
    spark.createDataFrame(late, schema=schema).coalesce(1).write.mode(
        "overwrite").parquet(src + "/b=1")
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/b=*")
    )
    name = _run_to_memory(stateful_scd2(stream, "event_type"), "append")
    got = (
        spark.sql(
            f"SELECT user_id, state, valid_from_us, valid_to_us FROM {name}"
        ).toPandas()
        .sort_values(["user_id", "valid_from_us"]).reset_index(drop=True)
    )
    batch = scd2_intervals(
        spark.createDataFrame(pdf, schema=schema),
        "user_id", "event_type", ("ts", "event_id"),
    ).toPandas()
    closed = (
        batch[batch["valid_to_us"].notna()]
        .rename(columns={"event_type": "state"})
        .sort_values(["user_id", "valid_from_us"]).reset_index(drop=True)
    )
    assert len(got) == len(closed) > 0
    for c in ["user_id", "valid_from_us", "valid_to_us"]:
        assert (got[c].astype("int64") == closed[c].astype("int64")).all(), c
    ga, ca = got["state"], closed["state"]
    assert ((ga == ca) | (ga.isna() & ca.isna())).all()
    # NULL ran as a real state at least once in the fixture
    assert got["state"].isna().any()


def test_stateful_rolling_distinct_parity_with_batch(spark, tmp_path):
    """T11: streaming trailing-window distinct counts == the batch
    with_rolling_distinct rows, row-for-row, including windows that
    span micro-batches and NULL rows that occupy slots but add no
    value."""
    import os

    import numpy as np
    import pandas as pd

    from tgist_features_spark.operators.windows import with_rolling_distinct
    from tgist_features_spark.streaming.stream import stateful_rolling_distinct

    rng = np.random.default_rng(103)
    rows = []
    eid = 0
    for u in range(8):
        for k in range(30):
            v = None if rng.random() < 0.12 else str(
                rng.choice(["a", "b", "c", "d", "e"]))
            rows.append((eid, u, v, pd.Timestamp(9000 * u + 60 * k, unit="s")))
            eid += 1
    pdf = pd.DataFrame(rows, columns=["event_id", "user_id", "event_type", "ts"])

    src = str(tmp_path / "rd")
    os.makedirs(src, exist_ok=True)
    schema = "event_id long, user_id long, event_type string, ts timestamp"
    early = pdf[pdf["event_id"] % 30 < 13]
    late = pdf[pdf["event_id"] % 30 >= 13]
    spark.createDataFrame(early, schema=schema).coalesce(1).write.mode(
        "overwrite").parquet(src + "/b=0")
    spark.createDataFrame(late, schema=schema).coalesce(1).write.mode(
        "overwrite").parquet(src + "/b=1")
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/b=*")
    )
    n = 7
    name = _run_to_memory(
        stateful_rolling_distinct(stream, "event_type", n=n), "append"
    )
    got = (
        spark.sql(f"SELECT event_id, n_distinct FROM {name}")
        .toPandas().set_index("event_id")["n_distinct"]
    )
    want = (
        with_rolling_distinct(
            spark.createDataFrame(pdf, schema=schema),
            "event_type", "user_id", ("ts", "event_id"), n=n,
        ).toPandas().set_index("event_id")["n_distinct"]
    )
    assert len(got) == len(want) == len(pdf)
    assert got.sort_index().equals(want.sort_index())


def test_stream_profile_maintenance_equals_one_pass(spark, tmp_path):
    """T12: per-batch profiles merged at read time equal the one-pass
    batch profile BIT FOR BIT (moments AND the A20 quantile-sketch
    buckets) and estimate-for-estimate (HLL), across micro-batch
    boundaries and a restart (marker no-op — rerun must not
    double-count)."""
    import numpy as np
    import pandas as pd

    from tgist_features_spark.operators.aggregates import (
        distinct_sketches,
        group_moments,
        quantile_sketches,
    )
    from tgist_features_spark.sources.table_io import TableIO
    from tgist_features_spark.streaming.stream import (
        read_current_profile,
        stream_profile_writer,
    )

    src = tmp_path / "ev_src"
    src.mkdir()
    rng = np.random.default_rng(149)
    full = pd.DataFrame({
        "k": rng.choice(["a", "b"], 600),
        "v": np.round(rng.normal(10, 1.5, 600), 2),  # positive (A20 leg)
        "u": rng.integers(0, 80, 600),
    })
    full.loc[rng.choice(600, 30, replace=False), "v"] = None
    for i, lo in enumerate(range(0, 600, 200)):
        full.iloc[lo:lo + 200].to_parquet(src / f"f{i}.parquet")

    io_ = TableIO(spark, str(tmp_path / "wh"))
    stream = (
        spark.readStream.schema("k string, v double, u long")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )

    def run_once():
        q = stream_profile_writer(
            stream, io_, "v", ["k"], distinct_col="u", quantiles=True
        ).trigger(availableNow=True).start()
        q.awaitTermination(120)

    run_once()
    moments, hll, quant = read_current_profile(spark, io_, ["k"])
    got = moments.toPandas().sort_values("k").reset_index(drop=True)
    want = (
        group_moments(spark.createDataFrame(full), "v", ["k"])
        .toPandas().sort_values("k").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)
    got_est = hll.toPandas().set_index("k")["est"].sort_index()
    want_est = (
        distinct_sketches(spark.createDataFrame(full), ["k"], "u")
        .toPandas().set_index("k")["est"].sort_index()
    )
    assert got_est.tolist() == want_est.tolist()
    got_q = quant.toPandas().sort_values("k").reset_index(drop=True)
    want_q = (
        quantile_sketches(spark.createDataFrame(full), ["k"], "v")
        .toPandas().sort_values("k").reset_index(drop=True)
    )
    assert (got_q["n"] == want_q["n"]).all()
    for x, y in zip(got_q["buckets"], want_q["buckets"]):
        assert [tuple(e) for e in x] == [tuple(e) for e in y]
    # restart over the same source: markers + checkpoint make it a no-op
    run_once()
    again, _, _ = read_current_profile(spark, io_, ["k"])
    pd.testing.assert_frame_equal(
        again.toPandas().sort_values("k").reset_index(drop=True), want)


def test_stateful_rolling_outliers_parity_with_batch(spark, tmp_path):
    """T13: streaming trailing-window z-outlier flags == the batch
    with_rolling_outliers rows, row-for-row — window statistics AND
    flags — including windows spanning micro-batches, NULL rows
    (slots without statistics), planted spikes, and constant windows
    (degenerate rule)."""
    import os

    import numpy as np
    import pandas as pd

    from tgist_features_spark.operators.windows import with_rolling_outliers
    from tgist_features_spark.streaming.stream import stateful_rolling_outliers

    rng = np.random.default_rng(107)
    rows = []
    eid = 0
    for u in range(6):
        base = 10.0 + u
        for k in range(40):
            if rng.random() < 0.1:
                v = None
            elif k in (17, 33):
                v = base + 50.0  # planted spike
            elif k in (5, 25):
                # exact .5 fixed-point boundary (x.125 * 100 = exact
                # .5): batch F.round is HALF_UP, Python round() is
                # banker's — parity must hold on the boundary too
                v = base + 0.125
            elif u == 5:
                v = base  # constant stream: degenerate-variance rule
            else:
                v = round(base + rng.normal(0, 1.0), 2)
            rows.append((eid, u, v, pd.Timestamp(9000 * u + 60 * k, unit="s")))
            eid += 1
    pdf = pd.DataFrame(rows, columns=["event_id", "user_id", "value", "ts"])

    src = str(tmp_path / "ro")
    os.makedirs(src, exist_ok=True)
    schema = "event_id long, user_id long, value double, ts timestamp"
    early = pdf[pdf["event_id"] % 40 < 19]
    late = pdf[pdf["event_id"] % 40 >= 19]
    spark.createDataFrame(early, schema=schema).coalesce(1).write.mode(
        "overwrite").parquet(src + "/b=0")
    spark.createDataFrame(late, schema=schema).coalesce(1).write.mode(
        "overwrite").parquet(src + "/b=1")
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/b=*")
    )
    # self-inclusion bound: a lone spike in a cnt-row window tops out
    # at z^2 = cnt-1, so n must exceed z^2+1 for spikes to be flaggable
    n, z = 12, 2
    name = _run_to_memory(
        stateful_rolling_outliers(stream, "value", n=n, z=z), "append"
    )
    cols = ["win_cnt", "win_sum", "win_sumsq", "is_outlier"]
    got = (
        spark.sql(f"SELECT event_id, {', '.join(cols)} FROM {name}")
        .toPandas().set_index("event_id").sort_index()
    )
    want = (
        with_rolling_outliers(
            spark.createDataFrame(pdf, schema=schema),
            "value", "user_id", ("ts", "event_id"), n=n, z=z,
        ).toPandas().set_index("event_id")[cols].sort_index()
    )
    assert len(got) == len(want) == len(pdf)
    for c in cols:
        # NaN-safe: empty windows carry NULL sums on both sides
        assert got[c].fillna(-1).tolist() == want[c].fillna(-1).tolist(), c
    # sanity: the planted spikes were actually flagged somewhere
    assert got["is_outlier"].sum() >= 8


def test_stateful_ewma_parity_with_batch(spark, tmp_path):
    """T14: streaming EWMA maintenance == the batch ewma_smooth result
    per entity at every stream prefix's end — the same pinned
    truncating recurrence across micro-batch boundaries, with NULL
    rows excluded and negative values exercising trunc-vs-floor."""
    import os

    import numpy as np
    import pandas as pd

    from tgist_features_spark.operators.windows import ewma_smooth
    from tgist_features_spark.streaming.stream import stateful_ewma

    rng = np.random.default_rng(109)
    rows = []
    eid = 0
    for u in range(8):
        for j in range(30):
            if rng.random() < 0.12:
                v = None
            elif j in (4, 19):
                # exact .5 boundaries, both signs: HALF_UP rounds away
                # from zero, banker's would flip these (ADVICE class)
                v = 7.125 if j == 4 else -7.125
            else:
                v = round(float(rng.normal(0, 40.0)), 2)  # negatives too
            rows.append((eid, u, v, pd.Timestamp(9000 * u + 60 * j, unit="s")))
            eid += 1
    pdf = pd.DataFrame(rows, columns=["event_id", "user_id", "value", "ts"])

    src = str(tmp_path / "ew")
    os.makedirs(src, exist_ok=True)
    schema = "event_id long, user_id long, value double, ts timestamp"
    early = pdf[pdf["event_id"] % 30 < 13]
    late = pdf[pdf["event_id"] % 30 >= 13]
    spark.createDataFrame(early, schema=schema).coalesce(1).write.mode(
        "overwrite").parquet(src + "/b=0")
    spark.createDataFrame(late, schema=schema).coalesce(1).write.mode(
        "overwrite").parquet(src + "/b=1")
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/b=*")
    )
    name = _run_to_memory(stateful_ewma(stream, "value", k=3), "append")
    got = spark.sql(f"SELECT * FROM {name}").toPandas()
    # one emission per non-NULL event
    assert len(got) == pdf["value"].notna().sum()

    # final emission per user == the batch operator's row
    last = (
        got.sort_values(["user_id", "ts", "event_id"])
        .groupby("user_id").tail(1).set_index("user_id").sort_index()
    )
    batch_in = spark.createDataFrame(pdf, schema=schema).select(
        "event_id", "user_id", "ts",
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
    )
    want = (
        ewma_smooth(batch_in, "cents", "user_id", ("ts", "event_id"), k=3)
        .toPandas().set_index("user_id").sort_index()
    )
    assert (last["n_events"] == want["n_events"]).all()
    assert (last["v"] == want["v_last"]).all()
    assert (last["ewma"] == want["ewma"]).all()

    # every intermediate emission equals the python prefix fold
    from decimal import ROUND_HALF_UP, Decimal

    def tdiv(a: int) -> int:
        return a // 8 if a >= 0 else -((-a) // 8)

    def rhu(x: float) -> int:
        # batch F.round semantics: HALF_UP over the shortest decimal
        # repr (NOT python round()'s half-to-even)
        return int(Decimal(repr(x)).quantize(Decimal(1), ROUND_HALF_UP))

    for u, grp in pdf.dropna(subset=["value"]).groupby("user_id"):
        seq = grp.sort_values(["ts", "event_id"])
        s = None
        mine = []
        for _, r in seq.iterrows():
            y = rhu(float(r["value"]) * 100)
            s = y if s is None else tdiv(y + 7 * s)
            mine.append((int(r["event_id"]), s))
        theirs = (
            got[got["user_id"] == u]
            .sort_values(["ts", "event_id"])[["event_id", "ewma"]]
        )
        assert list(map(tuple, theirs.to_numpy())) == mine
