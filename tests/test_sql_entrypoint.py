"""SQL-entry-point parity (SURVEY.md §1.3: DataFrame-first, SQL-views-
second — every capability reachable from spark.sql) and join-strategy
configuration behavior."""

from __future__ import annotations

from pyspark.sql import functions as F

from climate_data_pipelines_spark.catalog import load_table, register_views


def test_sql_ddl_dml_roundtrip(spark, sf_dir):
    register_views(spark, sf_dir)
    try:
        spark.sql("DROP TABLE IF EXISTS monthly_totals")
        spark.sql(
            """CREATE TABLE monthly_totals USING parquet AS
               SELECT year(ts) AS y, month(ts) AS m, COUNT(*) AS n
               FROM events GROUP BY 1, 2"""
        )
        before = spark.table("monthly_totals").count()
        spark.sql("INSERT INTO monthly_totals VALUES (1999, 1, 0)")
        after = spark.table("monthly_totals")
        assert after.count() == before + 1
        assert after.filter("y = 1999 AND m = 1").first().n == 0
        # the CTAS result matches the DataFrame-API equivalent
        df_counts = (
            load_table(spark, sf_dir, "events")
            .groupBy(F.year("ts").alias("y"), F.month("ts").alias("m"))
            .count()
        )
        got = {
            (r.y, r.m): r.n
            for r in after.filter("y != 1999").collect()
        }
        want = {(r.y, r.m): r["count"] for r in df_counts.collect()}
        assert got == want
    finally:
        spark.sql("DROP TABLE IF EXISTS monthly_totals")


def test_udf_reachable_from_sql(spark, sf_dir):
    from climate_data_pipelines_spark.functions.udfs import type_weight

    register_views(spark, sf_dir)
    spark.udf.register("type_weight", type_weight)
    rows = spark.sql(
        """SELECT event_type, type_weight(event_type) AS w
           FROM events GROUP BY event_type"""
    ).collect()
    weights = {r.event_type: r.w for r in rows}
    assert weights["purchase"] == 5
    assert weights["error"] == 0


def test_join_strategy_follows_broadcast_threshold(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    nation = load_table(spark, sf_dir, "nation")
    sup = load_table(spark, sf_dir, "supplier")

    def plan(df):
        return df._jdf.queryExecution().executedPlan().toString()

    joined = li.join(sup, li.l_suppkey == sup.s_suppkey).join(
        nation, sup.s_nationkey == nation.n_nationkey
    )
    # default threshold (10 MB): tiny dims broadcast
    assert "BroadcastHashJoin" in plan(joined)

    # threshold off: planner must fall back to shuffle joins
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        p = plan(
            li.join(sup, li.l_suppkey == sup.s_suppkey).join(
                nation, sup.s_nationkey == nation.n_nationkey
            )
        )
        assert "BroadcastHashJoin" not in p
        assert "SortMergeJoin" in p or "ShuffledHashJoin" in p
        # an explicit hint still forces broadcast past the threshold
        p_hint = plan(li.join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey))
        assert "BroadcastHashJoin" in p_hint
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
