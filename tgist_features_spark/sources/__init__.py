from tgist_features_spark.sources.corpus import (  # noqa: F401
    TRANSCRIPT_SCHEMA,
    generate_queries_pdf,
    generate_transcripts_pdf,
    queries_df,
    transcripts_df,
)
from tgist_features_spark.sources.table_io import TableIO  # noqa: F401
