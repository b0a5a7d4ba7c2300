"""Dataflow operators — the engine's query surface (SURVEY.md §2).

Every operator is a pure function DataFrame -> DataFrame (or a small builder
returning Column expressions), expressed with built-in Catalyst primitives.
No row-wise Python UDFs on large tables.
"""

from peskas_timor_data_pipeline_spark.operators.restructure import (  # noqa: F401
    coalesce_columns,
    nest,
    unnest,
    pivot_longer,
    pivot_wider,
    unite,
    distinct_except,
    deterministic_sample_n,
    replicate_rows,
)
from peskas_timor_data_pipeline_spark.operators.joins import (  # noqa: F401
    reduce_join,
    complete,
    one_to_one_day_match,
    suffix_regex_join,
)
from peskas_timor_data_pipeline_spark.operators.windows import (  # noqa: F401
    top1_per_group,
    mode_per_group,
    sessionize,
    month_spine,
)
from peskas_timor_data_pipeline_spark.operators.outliers import (  # noqa: F401
    loc_scale_bounds,
    mad_alert,
)
from peskas_timor_data_pipeline_spark.operators.joins import (  # noqa: F401
    asof_join,
    interval_join,
    join_nested,
    scd2_intervals,
)
from peskas_timor_data_pipeline_spark.operators.timeseries import (  # noqa: F401
    dtw_to_pattern,
)
from peskas_timor_data_pipeline_spark.operators.weights import (  # noqa: F401
    convert_length,
    estimate_weights,
)
