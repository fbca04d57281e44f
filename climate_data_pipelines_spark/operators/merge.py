"""Upsert / latest-record operators (batch CDC-style maintenance).

The reference maintains its outputs by delete-then-rewrite
(--force at precipitation_pipeline.py:255, os.remove at
humidity_pipeline.py:193-195) and by re-running a month. The engine's
relational form of that maintenance loop:

- ``merge_upsert``: source-wins MERGE without a table format —
  new/changed rows replace their target rows, everything else carries
  over. Plan: source ∪ (target anti-join source on key); one shuffle
  on the key, no full rewrite of untouched partitions when combined
  with a partitioned sink (dynamic partition overwrite).
- ``latest_per_key``: the SCD-style "current snapshot" — one row per
  key, the one with the greatest ordering column, via ``max_by``
  (no window, no self-join; single hash aggregate).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def merge_upsert(target: DataFrame, source: DataFrame, key_cols: list[str]) -> DataFrame:
    """Source-wins upsert: every source row lands; target rows survive
    only if their key is absent from the source. Schemas must match.

    Equivalent to SQL MERGE (WHEN MATCHED UPDATE all, WHEN NOT MATCHED
    INSERT). The anti-join shuffles on the key only; at 100 TB pair
    this with bucketed layouts (operators/scale.py) so neither side
    re-shuffles.
    """
    if target.columns != source.columns:
        raise ValueError(
            f"merge_upsert needs identical schemas; target={target.columns} "
            f"source={source.columns}"
        )
    untouched = target.join(source.select(*key_cols), key_cols, "left_anti")
    return source.unionByName(untouched)


def latest_per_key(
    df: DataFrame,
    key_cols: list[str],
    order_col: str,
    value_cols: list[str],
) -> DataFrame:
    """Current-snapshot aggregation: per key, the value columns of the
    row with the greatest ``order_col`` (must be unique per key for
    determinism — use an event id, not a timestamp with ties), plus
    the max order value itself. Single hash aggregate (partial+final),
    no window sort, no self-join."""
    aggs = [F.max_by(c, order_col).alias(c) for c in value_cols]
    aggs.append(F.max(order_col).alias(order_col))
    return df.groupBy(*key_cols).agg(*aggs)
