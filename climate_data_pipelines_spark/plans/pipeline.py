"""Flagship lazy pipeline (SURVEY.md §7.1 minimum end-to-end slice).

One DataFrame chain standing in for the reference's §3.1 stages 1–3:
scan → inclusive month filter (P2) → NaN/null drop (P3) → year/month
derivation (F1) → grouped monthly summary (A1/A3 + engine-added Q17
numeric aggregates). The ``events`` fixture is the long-format
observation table analog (FIXTURES.md).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from climate_data_pipelines_spark.catalog import load_table
from climate_data_pipelines_spark.operators.climate import observations


def monthly_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly per-type observation summary over `events`.

    The reference stops at raw cells (no numeric aggregates —
    SURVEY.md §2.4); this is the analytics layer it implies: per
    (year, month, event_type) count + sum/avg/min/max of the measure.
    Aggregates are rounded for oracle hash stability (SURVEY.md §7.4).
    """
    ev = load_table(spark, sf_dir, "events")
    obs = observations(ev, ts_col="ts", value_col="value", start=(2024, 1), end=(2024, 12))
    return (
        obs.groupBy("year", "month", "event_type")
        .agg(
            F.count("*").alias("n_obs"),
            F.round(F.sum("value"), 4).alias("sum_value"),
            F.round(F.avg("value"), 6).alias("avg_value"),
            F.round(F.min("value"), 6).alias("min_value"),
            F.round(F.max("value"), 6).alias("max_value"),
        )
    )
