"""climate_data_pipelines_spark — PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the query and
data-processing capabilities of the reference repo
sppidy/climate-data-pipelines (an eager single-node pandas/xarray ETL
codebase), extended with the LLM-training-data operators a 100 TB
pipeline needs (dedup, similarity search, text analysis, multimodal
columns).

Design stance (SURVEY.md §7.0):
- DataFrame-first, SQL-views-second; every operator is a composable
  ``DataFrame -> DataFrame`` function.
- Explicit schemas everywhere (never ``inferSchema`` on the hot path).
- Lazy end-to-end: Catalyst plans replace the reference's file-IR
  between stages.
- No custom Catalyst rules needed (SURVEY.md §4); scale discipline =
  pushdown-friendly predicates, broadcast-gated joins, AQE on, no
  driver-side materialization on the data path.
"""

from climate_data_pipelines_spark.session import get_spark
from climate_data_pipelines_spark.catalog import TABLES, load_tables, register_views

__all__ = ["get_spark", "TABLES", "load_tables", "register_views"]

__version__ = "0.1.0"
