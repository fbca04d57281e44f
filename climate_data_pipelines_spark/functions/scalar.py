"""Date / string / arithmetic scalar helpers.

Re-expresses the reference's derived-column and predicate logic
(SURVEY.md §2.2 P2, §2.7 F1–F6) as Column expressions. Each helper is
partition-prunable / pushdown-friendly: predicates are written against
the raw timestamp column (comparison with literals), never as opaque
UDFs, so Catalyst can push them into the parquet scan.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def oracle_round(col: Column | str, scale: int) -> Column:
    """Round a double the way DuckDB's ROUND does (scaled multiply).

    DuckDB computes ``round(x*10^s)/10^s`` in doubles; Spark's F.round
    rounds the exact binary value via BigDecimal HALF_UP — the two can
    differ in the last decimal when the scaled double lands across a
    rounding boundary (~0.1% of rows at scale 4). Reproducing the
    scaled form makes both engines bit-identical (exact .5 ties at
    scale 0 round away-from-zero in both).
    """
    c = F.col(col) if isinstance(col, str) else col
    p = F.lit(float(10**scale))
    return F.round(c * p, 0) / p


def inclusive_month_range(
    ts: Column | str, start_year: int, start_month: int, end_year: int, end_month: int
) -> Column:
    """Inclusive year-month window predicate (SURVEY.md §2.2 P2).

    The reference's ``time_filter`` (precipitation_pipeline.py:66-70,
    humidity_pipeline.py:50-53, temperature_pipeline.py:58-61) keeps
    timestamps where (y,m) lies in [(y0,m0), (y1,m1)] inclusive at
    month granularity. Canonical prunable form:

        ts >= make_date(y0, m0, 1) AND ts < add_months(make_date(y1, m1, 1), 1)

    — two literal comparisons Catalyst pushes to the scan, instead of
    the reference's per-row year/month extraction.
    """
    col = F.col(ts) if isinstance(ts, str) else ts
    lo = F.to_timestamp(F.lit(f"{start_year:04d}-{start_month:02d}-01"))
    hi_excl = F.to_timestamp(F.add_months(F.lit(f"{end_year:04d}-{end_month:02d}-01"), 1))
    return (col >= lo) & (col < hi_excl)


def with_year_month(df, ts_col: str = "ts"):
    """Derive integer year/month columns (SURVEY.md §2.7 F1; reference:
    precipitation_pipeline.py:131-132 ``pd.to_datetime(...).dt.year``)."""
    return df.withColumn("year", F.year(ts_col)).withColumn("month", F.month(ts_col))


def month_key(year: Column | str = "year", month: Column | str = "month") -> Column:
    """Zero-padded ``YYYY-MM`` string key (SURVEY.md §2.7 F5; the
    reference's f"{month:02d}" filename codec,
    precipitation_pipeline.py:135)."""
    y = F.col(year) if isinstance(year, str) else year
    m = F.col(month) if isinstance(month, str) else month
    return F.format_string("%04d-%02d", y, m)
