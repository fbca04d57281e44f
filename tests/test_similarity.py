from __future__ import annotations

import math

from pyspark.sql import functions as F

from climate_data_pipelines_spark.catalog import load_table
from climate_data_pipelines_spark.operators import similarity


def _vecs(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")


def test_cosine_topk_known_geometry(spark):
    df = _vecs(
        spark,
        [
            (0, [1.0, 0.0], 0),
            (1, [1.0, 0.01], 0),   # nearly parallel to 0
            (2, [0.0, 1.0], 0),    # orthogonal
            (3, [-1.0, 0.0], 0),   # opposite
        ],
    )
    q = df.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    got = similarity.cosine_topk(df, q, k=3).orderBy("rank").collect()
    assert [r.vec_id for r in got] == [1, 2, 3]
    assert math.isclose(got[0].cosine, 1.0, abs_tol=1e-4)
    assert math.isclose(got[1].cosine, 0.0, abs_tol=1e-9)
    assert math.isclose(got[2].cosine, -1.0, abs_tol=1e-9)
    # query never matches itself
    assert all(r.vec_id != 0 for r in got)


def test_neardup_pairs_blocked(spark):
    df = _vecs(
        spark,
        [
            (0, [1.0, 0.0], 0),
            (1, [1.0, 0.001], 0),
            (2, [1.0, 0.0], 1),  # identical but different block
        ],
    )
    pairs = similarity.embedding_neardup_pairs(df, threshold=0.99).collect()
    assert [(p.id_a, p.id_b) for p in pairs] == [(0, 1)]


def test_ann_recall_against_exact(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    exact = similarity.cosine_topk(emb, q, k=10)
    approx = similarity.ann_lsh_topk(emb, q, k=10, n_planes=5, n_tables=8, multiprobe_bits=1)
    e = {(r.query_id, r.vec_id) for r in exact.collect()}
    a = {(r.query_id, r.vec_id) for r in approx.collect()}
    # multiprobe LSH (8 tables x 5 planes, Hamming-1 probes) on 500
    # vecs: require high recall of the exact top-k (q55 defaults)
    assert len(a & e) / len(e) >= 0.8
    # approx scores must equal exact scores for shared pairs (exact
    # cosine within bucket)
    es = {(r.query_id, r.vec_id): r.cosine for r in exact.collect()}
    for r in approx.collect():
        if (r.query_id, r.vec_id) in es:
            assert math.isclose(r.cosine, es[(r.query_id, r.vec_id)], abs_tol=1e-9)


def test_ivf_recall_against_exact(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    exact = similarity.cosine_topk(emb, q, k=10)
    approx = similarity.ann_ivf_topk(emb, q, k=10, n_cells=32, n_probe=12)
    e = {(r.query_id, r.vec_id) for r in exact.collect()}
    a = {(r.query_id, r.vec_id) for r in approx.collect()}
    # probing 12/32 cells of a spherical quantizer must recover most
    # of the exact top-k (q73 defaults)
    assert len(a & e) / len(e) >= 0.8
    # shared pairs score identically (exact cosine on candidates)
    es = {(r.query_id, r.vec_id): r.cosine for r in exact.collect()}
    for r in approx.collect():
        if (r.query_id, r.vec_id) in es:
            assert math.isclose(r.cosine, es[(r.query_id, r.vec_id)], abs_tol=1e-9)
    # never more than k results per query, ranks are 1..n
    per_q = {}
    for r in approx.collect():
        per_q.setdefault(r.query_id, []).append(r.rank)
    for ranks in per_q.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))


def test_label_centroids_elementwise_mean(spark):
    df = spark.createDataFrame(
        [
            (1, [1.0, 2.0], 0),
            (2, [3.0, 4.0], 0),
            (3, [10.0, 20.0], 1),
        ],
        "vec_id long, embedding array<float>, label int",
    )
    out = {r.label: (r.centroid, r.n_vectors) for r in
           similarity.label_centroids(df).collect()}
    assert out[0][0] == [2.0, 3.0] and out[0][1] == 2
    assert out[1][0] == [10.0, 20.0] and out[1][1] == 1
