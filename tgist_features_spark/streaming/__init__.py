from tgist_features_spark.streaming.stream import (  # noqa: F401
    dedup_within_watermark,
    incremental_turn_state,
    read_transcript_stream,
    session_window_stats,
    windowed_turn_counts,
)
