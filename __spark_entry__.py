"""Driver contract for the spark-graft builder (PySpark target).

Thin wrapper over ``climate_data_pipelines_spark.queries.REGISTRY``:
every implemented operator from SURVEY.md §2 registers a Spark callable
and (when SQL-expressible) a DuckDB oracle twin there. The driver runs
``entry(spark)`` as a smoke check, then each ``queries()[name]`` at
sf=0.01 against ``oracle_sql()[name]``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001 (SURVEY.md §7.1):
    scan → inclusive month filter → NaN/null drop → year/month derive →
    grouped monthly summary. Driver checks rows>0."""
    from climate_data_pipelines_spark.catalog import ensure_session_confs
    from climate_data_pipelines_spark.plans.pipeline import monthly_summary

    ensure_session_confs(spark)
    return monthly_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    Ordered by ``queries.DRIVER_WINDOW`` (explicit per-round rotation
    list) first, then definition order — the driver verifies the first
    50 entries per round, and the window is how rotation is expressed
    without mutating the registry itself.
    """
    from climate_data_pipelines_spark.queries import REGISTRY, driver_ordered_names

    return {name: REGISTRY[name].fn for name in driver_ordered_names()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each SQL-expressible query;
    rows-only entries (non-SQL-expressible ops) are omitted."""
    from climate_data_pipelines_spark.queries import REGISTRY, driver_ordered_names

    return {
        name: REGISTRY[name].oracle
        for name in driver_ordered_names()
        if REGISTRY[name].oracle is not None
    }
