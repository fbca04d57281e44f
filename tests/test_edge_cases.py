"""Empty-input and degenerate-input robustness (SURVEY.md §5.2 item 3:
the lazy-engine mirror of the reference's empty-DataFrame guards)."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from climate_data_pipelines_spark.operators import (
    asof,
    climate,
    dedup,
    merge,
    scale,
    similarity,
    textops,
)


def _empty_docs(spark):
    return spark.createDataFrame([], "doc_id long, text string, source string")


def test_dedup_operators_on_empty_corpus(spark):
    docs = _empty_docs(spark)
    assert dedup.exact_dedup(docs).count() == 0
    assert dedup.exact_dedup_keys(docs).count() == 0
    assert dedup.minhash_signatures(docs).count() == 0
    sigs = dedup.minhash_signatures(docs)
    assert dedup.minhash_lsh_candidates(sigs).count() == 0
    assert dedup.ngram_jaccard_pairs(docs).count() == 0
    assert dedup.simhash(docs).count() == 0


def test_textops_on_empty_and_blank_docs(spark):
    docs = _empty_docs(spark)
    assert textops.word_count(docs).count() == 0
    assert textops.quality_score(docs).count() == 0
    blank = spark.createDataFrame([(1, "", "a"), (2, "   ", "a")],
                                  "doc_id long, text string, source string")
    rows = {r.doc_id: r for r in textops.token_stats(blank).collect()}
    assert rows[1].n_tokens_ws == 0 and rows[2].n_tokens_ws == 0
    red = {r.doc_id: r for r in textops.redact(blank).collect()}
    assert red[1].n_emails == 0 and red[1].n_urls == 0


def test_connected_components_no_edges(spark):
    edges = spark.createDataFrame([], "id_a long, id_b long")
    nodes = spark.createDataFrame([(1,), (2,)], "doc_id long")
    out = {r.node: r.component for r in dedup.connected_components(edges, nodes).collect()}
    assert out == {1: 1, 2: 2}
    # no nodes at all
    assert dedup.connected_components(edges).count() == 0


def test_similarity_with_no_queries(spark, sf_dir):
    from climate_data_pipelines_spark.catalog import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    empty_q = spark.createDataFrame([], "query_id long, query_vec array<float>")
    assert similarity.cosine_topk(emb, empty_q, k=5).count() == 0


def test_asof_join_empty_right(spark):
    left = spark.createDataFrame(
        [(1, datetime.datetime(2024, 1, 1))], "k long, ts timestamp"
    )
    right = spark.createDataFrame([], "k long, rts timestamp, v double")
    out = asof.asof_join(left, right, on="k", left_ts="ts", right_ts="rts",
                         right_vals=["v"]).collect()
    assert len(out) == 1 and out[0].v is None


def test_merge_upsert_empty_sides(spark):
    t = spark.createDataFrame([(1, "a")], "k long, s string")
    e = spark.createDataFrame([], "k long, s string")
    assert [r.k for r in merge.merge_upsert(t, e, ["k"]).collect()] == [1]
    assert [r.s for r in merge.merge_upsert(e, t, ["k"]).collect()] == ["a"]
    assert merge.merge_upsert(e, e, ["k"]).count() == 0
    assert merge.latest_per_key(e, ["k"], "k", ["s"]).count() == 0


def test_salted_ops_empty(spark):
    e = spark.createDataFrame([], "k long, v double")
    d = spark.createDataFrame([], "k long, name string")
    assert scale.salted_join(e, d, "k").count() == 0
    assert scale.salted_agg_count_sum(e, ["k"], "v").count() == 0


def test_climate_chain_empty_range(spark):
    df = spark.createDataFrame(
        [(datetime.datetime(2024, 6, 1), 1.0, 2.0, 3.0)],
        "ts timestamp, lat double, lon double, value double",
    )
    # window selects nothing -> every downstream stage stays empty, no errors
    obs = climate.observations(df, start=(1999, 1), end=(1999, 12))
    assert obs.count() == 0
    polys = climate.polygonize(obs)
    feats = climate.geojson_features(polys)
    assert climate.feature_collection(feats, ["year", "month"]).count() == 0
    res = climate.grid_resolution(obs, "lat", fallback=0.5).first()
    assert res.resolution == 0.5  # singleton/empty axis falls back


def test_all_null_value_column(spark):
    df = spark.createDataFrame(
        [(datetime.datetime(2024, 1, 1), 1.0, 2.0, None),
         (datetime.datetime(2024, 1, 2), 1.0, 2.0, float("nan"))],
        "ts timestamp, lat double, lon double, value double",
    )
    # NaN and NULL both dropped at the observation boundary
    assert climate.observations(df).count() == 0


def test_new_text_ops_on_empty_and_degenerate_docs(spark):
    from climate_data_pipelines_spark.operators import textops, training

    empty = spark.createDataFrame([], "doc_id long, text string")
    assert textops.line_dedup(empty).count() == 0
    assert training.chunk_windows(empty).count() == 0
    assert training.bigram_lm_score(empty).count() == 0

    degenerate = spark.createDataFrame(
        [(1, ""), (2, "one"), (3, "   ")], "doc_id long, text string"
    )
    # no doc has 2+ tokens -> no bigram evidence
    assert training.bigram_lm_score(degenerate).count() == 0
    # chunker: docs 1 and 3 have zero tokens -> no chunks; doc 2 one chunk
    chunks = training.chunk_windows(degenerate, window=4, stride=2).collect()
    assert [(r.doc_id, r.chunk_id, r.chunk_text) for r in chunks] == [(2, 0, "one")]


def test_upsample_fractional_empty_and_all_zero(spark):
    from climate_data_pipelines_spark.operators import training

    empty = spark.createDataFrame([], "doc_id long, weight double")
    assert training.upsample_fractional(empty, "weight").count() == 0
    zeros = spark.createDataFrame([(1, 0.0), (2, 0.0)], "doc_id long, weight double")
    assert training.upsample_fractional(zeros, "weight").count() == 0


def test_round4_ops_on_empty_and_degenerate_inputs(spark):
    from climate_data_pipelines_spark.operators import similarity, textops, training

    empty = spark.createDataFrame([], "doc_id long, text string")
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "delta epsilon zeta")],
        "doc_id long, text string",
    )

    # contamination_rate: empty benchmark -> all rates 0, never null
    rates = {r.doc_id: (r.n_contaminated, r.contamination_rate)
             for r in training.contamination_rate(docs, empty, k=3).collect()}
    assert rates == {1: (0, 0.0), 2: (0, 0.0)}
    # empty train side -> empty output
    assert training.contamination_rate(empty, docs, k=3).count() == 0

    # dsir: empty target corpus -> uniform-smoothed target, still defined
    out = {r.doc_id: r.dsir_logratio for r in
           training.dsir_logratio(docs, empty).collect()}
    assert set(out) == {1, 2} and all(v is not None for v in out.values())
    assert training.dsir_logratio(empty, docs).count() == 0

    # compression_ratio on empty corpus
    assert training.compression_ratio(empty).count() == 0

    # repeated_spans / strip on corpora with no repetition
    assert textops.repeated_spans(docs, k=8).count() == 0
    stripped = {r.doc_id: r.text_dedup for r in
                textops.strip_repeated_spans(docs, k=8).collect()}
    assert stripped == {1: "alpha beta gamma", 2: "delta epsilon zeta"}
    assert textops.repeated_spans(empty, k=8).count() == 0

    # semantic_dedup on an empty embedding frame (plane derivation at
    # n=0 must not blow up)
    vecs = spark.createDataFrame([], "vec_id long, embedding array<float>, label int")
    assert similarity.semantic_dedup(vecs, threshold=0.95).count() == 0
