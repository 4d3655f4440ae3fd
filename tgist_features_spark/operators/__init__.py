from tgist_features_spark.operators.ordering import canonical_order  # noqa: F401
from tgist_features_spark.operators.sessionize import sessionize, session_bounds  # noqa: F401
from tgist_features_spark.operators.windows import (  # noqa: F401
    with_cumulative,
    with_delta_ts,
    with_ffill,
    with_lag_lead,
    with_rolling_counts,
    with_rolling_time,
)
from tgist_features_spark.operators.asof import asof_join  # noqa: F401
from tgist_features_spark.operators.aggregates import (  # noqa: F401
    per_entity_agg,
    role_tool_pivot,
    salted_agg,
)
