"""Declared engine queries + DuckDB oracle twins (driver contract).

Every operator from SURVEY.md §2 with a **Qnn** tag gets one entry
here: a Spark callable ``(spark, sf_dir) -> DataFrame`` plus (when
SQL-expressible) an ANSI-SQL string the DuckDB oracle runs on the same
parquet tables. The driver hash-compares the two (row count + schema +
order-insensitive value hash), so:

- every computed column is aliased identically on both sides;
- float aggregates are rounded on both sides (SURVEY.md §7.4 —
  double addition is non-associative across partition orders);
- no query relies on output row order (tie-broken window ranks only).

Spark side is DataFrame-first and stays JVM-side (no Python UDFs in
any oracle-checked query); oracle side is plain DuckDB SQL against the
pre-registered views ``region nation customer supplier part orders
lineitem events documents embeddings``.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from climate_data_pipelines_spark.catalog import load_table
from climate_data_pipelines_spark.functions.scalar import inclusive_month_range
from climate_data_pipelines_spark.operators import climate


@dataclass(frozen=True)
class QuerySpec:
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # None → rows-only check (non-SQL-expressible)
    doc: str


REGISTRY: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None, doc: str = ""):
    def deco(fn):
        REGISTRY[name] = QuerySpec(fn=fn, oracle=oracle, doc=doc or fn.__doc__ or "")
        return fn

    return deco


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def oround(col, scale: int):
    """Round a double the way the DuckDB oracle's ROUND does.

    DuckDB computes ``round(x*10^s)/10^s`` in doubles; Spark's F.round
    rounds the *exact* binary value via BigDecimal HALF_UP. For values
    whose scaled double lands across a rounding boundary the two
    differ in the last decimal (observed ~0.1% of rows at scale 4).
    Reproducing the scaled-multiply form on the Spark side makes both
    engines bit-identical: double ops are deterministic, and exact
    .5 ties at scale 0 round away-from-zero in both (BigDecimal
    HALF_UP == C round for them).
    """
    p = F.lit(float(10**scale))
    return F.round(col * p, 0) / p


# ---------------------------------------------------------------------------
# §2.2 projections / filters / predicates
# ---------------------------------------------------------------------------


@query(
    "q01_projection",
    "SELECT event_id, ts, user_id, value FROM events",
    "P1: column projection (reference selects [time,lat,lon,VAR], "
    "precipitation_pipeline.py:139). Column pruning reaches the scan.",
)
def q01(spark, sf_dir):
    return _t(spark, sf_dir, "events").select("event_id", "ts", "user_id", "value")


@query(
    "q02_time_range",
    """SELECT l_orderkey, l_linenumber, l_shipdate, l_quantity
       FROM lineitem
       WHERE l_shipdate >= TIMESTAMP '1996-03-01'
         AND l_shipdate < TIMESTAMP '1997-11-01'""",
    "P2: inclusive year-month window (precipitation_pipeline.py:66-70) in "
    "canonical partition-prunable form.",
)
def q02(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return li.filter(inclusive_month_range("l_shipdate", 1996, 3, 1997, 10)).select(
        "l_orderkey", "l_linenumber", "l_shipdate", "l_quantity"
    )


@query(
    "q03_null_drop",
    """SELECT event_id, value FROM events
       WHERE value IS NOT NULL AND NOT isnan(value)""",
    "P3: dropna(subset=[VAR]) (precipitation_pipeline.py:107) with NaN "
    "normalized to SQL NULL semantics.",
)
def q03(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return ev.filter(F.col("value").isNotNull() & ~F.isnan("value")).select(
        "event_id", "value"
    )


@query(
    "q04_mask_semi_join",
    """SELECT event_id, user_id, value FROM events
       WHERE user_id IN (SELECT DISTINCT user_id FROM events WHERE user_id % 10 < 3)""",
    "P4/J2: land-mask filter as broadcast left-semi join against a mask "
    "dimension (globe.is_land at precipitation_pipeline.py:160-161). The "
    "mask here is a derived user_id dimension standing in for the land grid.",
)
def q04(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    mask = ev.select("user_id").distinct().filter(F.pmod("user_id", F.lit(10)) < 3)
    return climate.land_filter(ev, mask, ["user_id"]).select(
        "event_id", "user_id", "value"
    )


@query(
    "q05_numeric_validity",
    """SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_num
       FROM events
       WHERE regexp_matches(json_extract_string(props, '$.k'), '^[0-9]+$')""",
    "P6: string-numeric validity filter + cast (value.isdigit() at "
    "population_pipeline.py:44).",
)
def q05(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k")
    return (
        ev.withColumn("_k", k)
        .filter(F.col("_k").rlike("^[0-9]+$"))
        .select("event_id", F.col("_k").cast("bigint").alias("k_num"))
    )


# ---------------------------------------------------------------------------
# §2.3 joins
# ---------------------------------------------------------------------------


@query(
    "q06_broadcast_lookup_join",
    """SELECT c_custkey, c_name, n_name
       FROM customer JOIN nation ON c_nationkey = n_nationkey""",
    "J1: dict-lookup join (population_pipeline.py:57-65) as an explicit "
    "broadcast hash join of a small dimension.",
)
def q06(spark, sf_dir):
    cust = _t(spark, sf_dir, "customer")
    nat = _t(spark, sf_dir, "nation")
    return cust.join(
        F.broadcast(nat), cust.c_nationkey == nat.n_nationkey, "inner"
    ).select("c_custkey", "c_name", "n_name")


@query(
    "q07_grid_semi_join",
    """SELECT l_orderkey, l_linenumber, l_partkey FROM lineitem
       WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_size < 15)""",
    "J2/Q11-shape: left-semi join of the fact table against a filtered "
    "dimension (the land-cell pattern on star-schema keys).",
)
def q07(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    small = _t(spark, sf_dir, "part").filter(F.col("p_size") < 15).select("p_partkey")
    return li.join(
        F.broadcast(small), li.l_partkey == small.p_partkey, "left_semi"
    ).select("l_orderkey", "l_linenumber", "l_partkey")


@query(
    "q08_grid_anti_join",
    """SELECT l_orderkey, l_linenumber, l_partkey FROM lineitem
       WHERE l_partkey NOT IN (SELECT p_partkey FROM part WHERE p_size < 15)""",
    "Q08: anti-join variant (ocean points; SURVEY.md §2.3 J2).",
)
def q08(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    small = _t(spark, sf_dir, "part").filter(F.col("p_size") < 15).select("p_partkey")
    return li.join(
        F.broadcast(small), li.l_partkey == small.p_partkey, "left_anti"
    ).select("l_orderkey", "l_linenumber", "l_partkey")


@query(
    "q09_multiway_join",
    """SELECT r_name, n_name,
              ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
              COUNT(*) AS n_items
       FROM lineitem
       JOIN orders   ON l_orderkey = o_orderkey
       JOIN customer ON o_custkey = c_custkey
       JOIN nation   ON c_nationkey = n_nationkey
       JOIN region   ON n_regionkey = r_regionkey
       GROUP BY r_name, n_name""",
    "Q09: 5-way equi join over the star schema; dims broadcast, fact "
    "never shuffled until the final aggregation.",
)
def q09(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    nat = _t(spark, sf_dir, "nation")
    reg = _t(spark, sf_dir, "region")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
        .join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            ),
            F.count("*").alias("n_items"),
        )
    )


@query(
    "q10_left_outer_join",
    """SELECT c_custkey, COUNT(o_orderkey) AS n_orders,
              ROUND(COALESCE(SUM(o_totalprice), 0), 2) AS total_spent
       FROM customer LEFT JOIN orders ON o_custkey = c_custkey
       GROUP BY c_custkey""",
    "Q10: left outer join preserving customers with zero orders.",
)
def q10(spark, sf_dir):
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.round(F.coalesce(F.sum("o_totalprice"), F.lit(0.0)), 2).alias(
                "total_spent"
            ),
        )
    )


@query(
    "q11_left_semi_join",
    """SELECT c_custkey, c_name FROM customer
       WHERE c_custkey IN (SELECT o_custkey FROM orders)""",
    "Q11: left semi — customers having at least one order.",
)
def q11(spark, sf_dir):
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").select("o_custkey")
    return cust.join(orders, cust.c_custkey == orders.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


@query(
    "q12_left_anti_join",
    """SELECT c_custkey, c_name FROM customer
       WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)""",
    "Q12: left anti — customers with no orders.",
)
def q12(spark, sf_dir):
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").select("o_custkey")
    return cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


# ---------------------------------------------------------------------------
# §2.4 aggregations / grouping
# ---------------------------------------------------------------------------


@query(
    "q13_partition_layout",
    "SELECT DISTINCT year(ts) AS year, month(ts) AS month FROM events",
    "A1: grouping-as-physical-partitioning (per-month CSV split at "
    "precipitation_pipeline.py:134) — the derived partition-key space.",
)
def q13(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return ev.select(
        F.year("ts").alias("year"), F.month("ts").alias("month")
    ).distinct()


@query(
    "q14_distinct",
    "SELECT DISTINCT event_type FROM events",
    "A2: distinct coordinate values (df['lat'].unique(), "
    "precipitation_pipeline.py:170).",
)
def q14(spark, sf_dir):
    return _t(spark, sf_dir, "events").select("event_type").distinct()


@query(
    "q15_group_count",
    """SELECT year(ts) AS year, month(ts) AS month, event_type,
              COUNT(*) AS n_rows
       FROM events GROUP BY year(ts), month(ts), event_type""",
    "A3: per-group cardinality (len(features) per month, "
    "precipitation_pipeline.py:167,234).",
)
def q15(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return (
        ev.withColumn("year", F.year("ts"))
        .withColumn("month", F.month("ts"))
        .groupBy("year", "month", "event_type")
        .agg(F.count("*").alias("n_rows"))
    )


@query(
    "q16_value_per_key",
    """SELECT lang, MAX(n_chars) AS max_chars, COUNT(*) AS n_docs
       FROM documents GROUP BY lang""",
    "A4: dict-build first/last-value-per-key (population_pipeline.py:45), "
    "canonicalized to max for determinism (SURVEY.md §7.4).",
)
def q16(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    return docs.groupBy("lang").agg(
        F.max("n_chars").alias("max_chars"), F.count("*").alias("n_docs")
    )


@query(
    "q17_agg_suite",
    """SELECT l_returnflag, l_linestatus,
              ROUND(SUM(l_quantity), 2) AS sum_qty,
              ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
              ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
              ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
              ROUND(AVG(l_quantity), 6) AS avg_qty,
              ROUND(AVG(l_extendedprice), 4) AS avg_price,
              ROUND(AVG(l_discount), 6) AS avg_disc,
              COUNT(*) AS count_order
       FROM lineitem
       WHERE l_shipdate <= TIMESTAMP '2000-09-02'
       GROUP BY l_returnflag, l_linestatus""",
    "Q17: TPC-H Q1-shaped pricing summary — hash agg with partial "
    "(map-side) combine; the engine's flagship numeric aggregate suite.",
)
def q17(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2000-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@query(
    "q18_count_distinct",
    """SELECT l_returnflag,
              COUNT(DISTINCT l_partkey) AS n_parts,
              COUNT(DISTINCT l_suppkey) AS n_supps
       FROM lineitem GROUP BY l_returnflag""",
    "Q18: exact distinct counts (approx_count_distinct is exercised "
    "rows-only in tests — sketch values differ from exact by design).",
)
def q18(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
    )


@query(
    "q19_rollup",
    """SELECT l_returnflag, l_linestatus,
              ROUND(SUM(l_quantity), 2) AS sum_qty, COUNT(*) AS n
       FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)""",
    "Q19: ROLLUP grouping sets (df.rollup).",
)
def q19(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"), F.count("*").alias("n")
    )


@query(
    "q20_filtered_agg",
    """SELECT l_returnflag,
              ROUND(SUM(CASE WHEN l_discount > 0.05 THEN l_extendedprice ELSE 0 END), 2)
                AS high_disc_rev,
              COUNT(CASE WHEN l_quantity > 25 THEN 1 END) AS n_bulk
       FROM lineitem GROUP BY l_returnflag""",
    "Q20: filtered aggregation (sum(CASE WHEN…) ≡ F.sum(F.when(…))).",
)
def q20(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(
            F.sum(F.when(F.col("l_discount") > 0.05, F.col("l_extendedprice")).otherwise(0.0)),
            2,
        ).alias("high_disc_rev"),
        F.count(F.when(F.col("l_quantity") > 25, F.lit(1))).alias("n_bulk"),
    )


# ---------------------------------------------------------------------------
# §2.5 windows / sorts / limits
# ---------------------------------------------------------------------------


@query(
    "q21_sort_limit",
    """SELECT o_orderkey, o_totalprice FROM orders
       ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""",
    "W1/W3: global sort + limit (top-k). Range-partitioned sort; limit "
    "pushed into partial top-k per partition. Tie-broken → deterministic set.",
)
def q21(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return o.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey")).limit(100).select(
        "o_orderkey", "o_totalprice"
    )


@query(
    "q22_neighbor_diff",
    """WITH d AS (SELECT DISTINCT value FROM events WHERE value IS NOT NULL),
         g AS (SELECT value - LAG(value) OVER (ORDER BY value) AS gap FROM d)
       SELECT ROUND(COALESCE(MIN(gap), 0.5), 6) AS resolution FROM g""",
    "W2: grid-resolution inference — min neighbor gap over sorted distinct "
    "values, fallback for singleton axes "
    "(precipitation_pipeline.py:169-184; generalized first-gap → min-gap).",
)
def q22(spark, sf_dir):
    ev = _t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    res = climate.grid_resolution(ev, "value", fallback=0.5)
    return res.select(F.round("resolution", 6).alias("resolution"))


@query(
    "q23_topk_per_group",
    """SELECT event_type, event_id, value, rn FROM (
         SELECT event_type, event_id, value,
                ROW_NUMBER() OVER (PARTITION BY event_type
                                   ORDER BY value DESC, event_id) AS rn
         FROM events WHERE value IS NOT NULL) t
       WHERE rn <= 5""",
    "W3: ranking top-k per group (window rank + filter; the "
    "--drop-densest analog, SURVEY.md §2.5).",
)
def q23(spark, sf_dir):
    ev = _t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    w = Window.partitionBy("event_type").orderBy(F.desc("value"), F.asc("event_id"))
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select("event_type", "event_id", "value", "rn")
    )


@query(
    "q24_rolling_window",
    """SELECT event_id, user_id,
              ROUND(AVG(value) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id
                                     ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 6)
                AS rolling_avg
       FROM events""",
    "W4 (Q24): frame-spec aggregate window — climate rolling mean per "
    "cell (partition by coords, order by time).",
)
def q24(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-2, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.round(F.avg("value").over(w), 6).alias("rolling_avg"),
    )


# ---------------------------------------------------------------------------
# §2.6 set operations
# ---------------------------------------------------------------------------


@query(
    "q25_union",
    """SELECT event_id, event_type, value FROM events WHERE event_type = 'click'
       UNION ALL
       SELECT event_id, event_type, value FROM events WHERE event_type = 'purchase'""",
    "Q25: unionByName of two same-schema slices (multi-variable climate "
    "tables share one long schema, SURVEY.md §2.6).",
)
def q25(spark, sf_dir):
    ev = _t(spark, sf_dir, "events").select("event_id", "event_type", "value")
    a = ev.filter(F.col("event_type") == "click")
    b = ev.filter(F.col("event_type") == "purchase")
    return a.unionByName(b)


@query(
    "q26_intersect",
    """SELECT user_id FROM events WHERE ts <  TIMESTAMP '2024-01-15'
       INTERSECT
       SELECT user_id FROM events WHERE ts >= TIMESTAMP '2024-01-15'""",
    "Q26: INTERSECT (distinct) — users active in both halves of the month.",
)
def q26(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    cut = F.lit("2024-01-15").cast("timestamp")
    a = ev.filter(F.col("ts") < cut).select("user_id")
    b = ev.filter(F.col("ts") >= cut).select("user_id")
    return a.intersect(b)


@query(
    "q27_except_all",
    """SELECT user_id FROM events WHERE event_type = 'click'
       EXCEPT ALL
       SELECT user_id FROM events WHERE event_type = 'error'""",
    "Q27: EXCEPT ALL (multiset difference).",
)
def q27(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    a = ev.filter(F.col("event_type") == "click").select("user_id")
    b = ev.filter(F.col("event_type") == "error").select("user_id")
    return a.exceptAll(b)


# ---------------------------------------------------------------------------
# §2.7 scalar functions
# ---------------------------------------------------------------------------


@query(
    "q28_date_parts",
    """SELECT event_id, year(ts) AS year, month(ts) AS month,
              day(ts) AS day, hour(ts) AS hour
       FROM events""",
    "F1 (Q28): date-part extraction as derived columns "
    "(pd.to_datetime(...).dt.year at precipitation_pipeline.py:131-132).",
)
def q28(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.year("ts").alias("year"),
        F.month("ts").alias("month"),
        F.dayofmonth("ts").alias("day"),
        F.hour("ts").alias("hour"),
    )


@query(
    "q29_coord_arithmetic",
    """SELECT l_orderkey, l_linenumber,
              ROUND(l_extendedprice * (1 - l_discount), 4) AS net_price,
              ROUND(l_extendedprice * (1 - l_discount) * (1 + l_tax), 4) AS gross_price,
              ROUND(ABS(l_discount - l_tax), 6) AS rate_gap
       FROM lineitem""",
    "F3 (Q29): row-level arithmetic (the polygon-corner math shape: "
    "lon ± res/2, abs(a-b) at precipitation_pipeline.py:197-208).",
)
def q29(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    net = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        oround(net, 4).alias("net_price"),
        oround(net * (1 + F.col("l_tax")), 4).alias("gross_price"),
        oround(F.abs(F.col("l_discount") - F.col("l_tax")), 6).alias("rate_gap"),
    )


@query(
    "q30_string_codec",
    """SELECT event_id,
              printf('%04d-%02d', year(ts), month(ts)) AS month_key,
              lpad(CAST(user_id AS VARCHAR), 6, '0') AS user_key,
              concat_ws('_', event_type, printf('%04d-%02d', year(ts), month(ts)))
                || '.csv' AS filename,
              regexp_replace(
                concat_ws('_', event_type, printf('%04d-%02d', year(ts), month(ts)))
                  || '.csv', '\\.csv$', '') AS stem
       FROM events""",
    "F5/F6 (Q30): filename codec — zero-padded format, lpad, concat_ws, "
    "suffix strip (f'{month:02d}' at precipitation_pipeline.py:135, "
    ".replace('.csv','') at :279-280).",
)
def q30(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    mk = F.format_string("%04d-%02d", F.year("ts"), F.month("ts"))
    fname = F.concat(F.concat_ws("_", F.col("event_type"), mk), F.lit(".csv"))
    return ev.select(
        "event_id",
        mk.alias("month_key"),
        F.lpad(F.col("user_id").cast("string"), 6, "0").alias("user_key"),
        fname.alias("filename"),
        F.regexp_replace(fname, r"\.csv$", "").alias("stem"),
    )


@query(
    "q31_polygon_corners",
    """SELECT event_id,
              ROUND(value - 0.3125, 6) AS west,
              ROUND(value + 0.3125, 6) AS east,
              ROUND(value * 0.5 - 0.25, 6) AS south,
              ROUND(value * 0.5 + 0.25, 6) AS north
       FROM events WHERE value IS NOT NULL""",
    "U1→F3 (Q31): cell polygonization corner math, vectorized (replaces "
    "iterrows loop at precipitation_pipeline.py:188-223). Corners "
    "flattened to columns for oracle hashing; the nested ring array is "
    "exercised by q32/geojson.",
)
def q31(spark, sf_dir):
    ev = _t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    v = F.col("value")
    return ev.select(
        "event_id",
        oround(v - 0.3125, 6).alias("west"),
        oround(v + 0.3125, 6).alias("east"),
        oround(v * 0.5 - 0.25, 6).alias("south"),
        oround(v * 0.5 + 0.25, 6).alias("north"),
    )


@query(
    "q33_json_access",
    """SELECT event_id,
              CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_value
       FROM events""",
    "F9 (Q33): JSON field access on the events.props document column "
    "(feat['properties'].get('ADMIN') shape, population_pipeline.py:59).",
)
def q33(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("bigint").alias("k_value"),
    )


# ---------------------------------------------------------------------------
# §2.10 streaming surface (batch-checkable forms)
# ---------------------------------------------------------------------------


@query(
    "q35_tumbling_window",
    """SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS window_start,
              CAST(date_trunc('day', ts) AS TIMESTAMP) + INTERVAL 1 DAY AS window_end,
              event_type, COUNT(*) AS n,
              ROUND(SUM(value), 4) AS sum_value
       FROM events GROUP BY 1, 2, 3""",
    "Q35: tumbling window aggregation (F.window in batch mode — same "
    "operator Structured Streaming uses; the reference's monthly "
    "micro-batch cadence, SURVEY.md §2.10).",
)
def q35(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 day").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("sum_value"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n",
            "sum_value",
        )
    )
