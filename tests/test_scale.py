from __future__ import annotations

from pyspark.sql import functions as F

from climate_data_pipelines_spark.catalog import load_table
from climate_data_pipelines_spark.operators import scale


def test_salted_join_matches_plain_join(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").withColumnRenamed(
        "l_partkey", "p_partkey"
    )
    part = load_table(spark, sf_dir, "part")
    plain = li.join(part, "p_partkey").select("l_orderkey", "l_linenumber", "p_name")
    salted = scale.salted_join(li, part, "p_partkey", n_salt=4).select(
        "l_orderkey", "l_linenumber", "p_name"
    )
    assert plain.count() == salted.count()
    assert plain.exceptAll(salted).isEmpty()
    assert salted.exceptAll(plain).isEmpty()


def test_salted_agg_matches_plain_agg(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    got = {
        (r.l_returnflag, r.l_linestatus): (r.n, round(r.sum_value, 4))
        for r in scale.salted_agg_count_sum(
            li, ["l_returnflag", "l_linestatus"], "l_quantity", n_salt=4
        ).collect()
    }
    want = {
        (r.l_returnflag, r.l_linestatus): (r.n, round(r.s, 4))
        for r in li.groupBy("l_returnflag", "l_linestatus")
        .agg(F.count("*").alias("n"), F.sum("l_quantity").alias("s"))
        .collect()
    }
    assert got == want


def test_bucketed_join_avoids_shuffle(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").withColumnRenamed(
        "l_orderkey", "o_orderkey"
    )
    try:
        scale.write_bucketed(orders, "b_orders", "o_orderkey", 4, "o_orderkey")
        scale.write_bucketed(li, "b_lineitem", "o_orderkey", 4, "o_orderkey")
        bo = spark.table("b_orders")
        bl = spark.table("b_lineitem")
        # hint("merge") pins SortMergeJoin (else the small side would
        # broadcast at test scale and hide the bucketing effect)
        joined = bo.join(bl.hint("merge"), "o_orderkey").select(
            "o_orderkey", "o_totalprice", "l_quantity"
        )
        # co-located layout: same key, same bucket count -> no Exchange
        assert not scale.plan_has_exchange(joined)
        # and the result is still correct
        want = (
            orders.join(li, "o_orderkey")
            .select("o_orderkey", "o_totalprice", "l_quantity")
            .count()
        )
        assert joined.count() == want

        # contrast: the un-bucketed join of the same data shuffles
        assert scale.plan_has_exchange(
            orders.join(li.hint("merge"), "o_orderkey").select(
                "o_orderkey", "o_totalprice", "l_quantity"
            )
        )
    finally:
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")
