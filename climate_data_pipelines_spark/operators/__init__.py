"""Composable operators: every capability is ``DataFrame -> DataFrame``."""

from climate_data_pipelines_spark.operators import (  # noqa: F401
    asof,
    climate,
    dedup,
    merge,
    multimodal,
    scale,
    similarity,
    textops,
    training,
)
