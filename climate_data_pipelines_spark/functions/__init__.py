"""Scalar / vector / text function library (all JVM-side built-ins).

Everything here composes ``pyspark.sql.functions`` Column expressions —
whole-stage-codegen friendly, no Python on the hot path (SURVEY.md §2.7).
"""

from climate_data_pipelines_spark.functions.scalar import (
    inclusive_month_range,
    with_year_month,
    month_key,
)
from climate_data_pipelines_spark.functions.vectors import (
    dot,
    norm,
    cosine_similarity,
)
from climate_data_pipelines_spark.functions.text import (
    tokens,
    normalize_text,
    shingles,
)

__all__ = [
    "inclusive_month_range",
    "with_year_month",
    "month_key",
    "dot",
    "norm",
    "cosine_similarity",
    "tokens",
    "normalize_text",
    "shingles",
]
