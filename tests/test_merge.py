from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from climate_data_pipelines_spark.operators import merge


def test_merge_upsert_source_wins(spark):
    target = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], "k long, s string, v double"
    )
    source = spark.createDataFrame(
        [(2, "B", 99.0), (4, "d", 40.0)], "k long, s string, v double"
    )
    out = {r.k: (r.s, r.v) for r in merge.merge_upsert(target, source, ["k"]).collect()}
    assert out == {1: ("a", 10.0), 2: ("B", 99.0), 3: ("c", 30.0), 4: ("d", 40.0)}


def test_merge_upsert_rejects_schema_mismatch(spark):
    t = spark.createDataFrame([(1,)], "k long")
    s = spark.createDataFrame([(1, 2)], "k long, extra long")
    with pytest.raises(ValueError):
        merge.merge_upsert(t, s, ["k"])


def test_latest_per_key_takes_max_order_row(spark):
    df = spark.createDataFrame(
        [
            (7, 1, "old", 1.0),
            (7, 5, "new", 2.0),
            (7, 3, "mid", 3.0),
            (8, 2, "only", 4.0),
        ],
        "user long, seq long, state string, v double",
    )
    out = {
        r.user: (r.state, r.v, r.seq)
        for r in merge.latest_per_key(df, ["user"], "seq", ["state", "v"]).collect()
    }
    assert out == {7: ("new", 2.0, 5), 8: ("only", 4.0, 2)}


def test_udtf_splits_sentences(spark):
    from climate_data_pipelines_spark.functions.udfs import register_udtfs

    register_udtfs(spark)
    spark.createDataFrame(
        [(1, "alpha beta. gamma! delta epsilon?"), (2, "no punct")],
        "doc_id long, text string",
    ).createOrReplaceTempView("_udtf_docs")
    rows = spark.sql(
        """SELECT s.* FROM _udtf_docs d,
           LATERAL split_sentences(d.doc_id, d.text) s"""
    ).collect()
    got = {(r.doc_id, r.sent_idx): r.sentence for r in rows}
    assert got == {
        (1, 0): "alpha beta",
        (1, 1): "gamma",
        (1, 2): "delta epsilon",
        (2, 0): "no punct",
    }
