from tgist_features_spark.oracle.pandas_oracle import (  # noqa: F401
    oracle_backfill,
    oracle_turn_features,
)
