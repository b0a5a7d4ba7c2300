"""Scalar column helpers (SURVEY.md §2.7)."""

from peskas_timor_data_pipeline_spark.functions.geo import (  # noqa: F401
    haversine_m,
    bbox_filter,
    grid_cell,
)
from peskas_timor_data_pipeline_spark.functions.datetime_fns import (  # noqa: F401
    week_start_sunday,
    floor_date,
)
from peskas_timor_data_pipeline_spark.functions.hashing import (  # noqa: F401
    anonymized_id,
)
