from tgist_features_spark.plans.backfill import (  # noqa: F401
    FEATURE_COLS,
    backfill_features,
    turn_features,
)
