"""Similarity search over embedding columns (SURVEY.md §2.11).

Baseline: brute-force cosine top-k — expression-level dot products
(zip_with + aggregate, JVM codegen) and a rank window; fully
distributed, no UDF, no driver loop.

Scale path: LSH-bucketed ANN — random-hyperplane sign bits computed
from deterministic per-(dim, plane) hash weights, bucket equi-join,
exact cosine only within buckets. At 100 TB the bucket join replaces
the full cross product; multiprobe = explode over neighbor buckets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from climate_data_pipelines_spark.functions.scalar import oracle_round
from climate_data_pipelines_spark.functions.vectors import cosine_similarity


def cosine_topk(
    df: DataFrame,
    query_df: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Brute-force cosine top-k against (a small set of) query vectors.

    ``query_df``: (query_id, query_vec). Broadcast the queries; one
    pass over the corpus computes all scores; per-query rank window
    keeps k. Rounded score for oracle hash stability; ties broken on
    corpus id. This is the exact baseline the ANN variants are judged
    against (recall@k).
    """
    q = query_df.select(
        F.col("query_id"), F.col("query_vec")
    )
    scored = (
        df.crossJoin(F.broadcast(q))
        .filter(F.col(id_col) != F.col("query_id"))
        .select(
            "query_id",
            F.col(id_col),
            oracle_round(cosine_similarity(vec_col, "query_vec"), 6).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", id_col, "cosine", "rank")
    )


def embedding_neardup_pairs(
    df: DataFrame,
    block_col: str = "label",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.9,
) -> DataFrame:
    """Embedding-cosine near-dup pairs within a blocking key.

    Exact cosine on blocked candidate pairs (id_a < id_b) — the
    verification stage of an embedding-dedup pipeline. The block join
    is an equi-join on the block key; no global cross product.
    """
    a = df.select(
        F.col(block_col).alias("_blk"),
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("_va"),
    )
    b = df.select(
        F.col(block_col).alias("_blk"),
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("_vb"),
    )
    return (
        a.join(b, "_blk")
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            oracle_round(cosine_similarity("_va", "_vb"), 6).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


def _hyperplane_sign(vec_col: str, plane: int) -> F.Column:
    """Sign bit of vec · w_plane with deterministic pseudo-random
    weights: w[d] = (xxhash64(plane, d) % 1001 - 500) / 500 — computed
    expression-side from the element index, no weight table shipped."""
    dot = F.aggregate(
        F.zip_with(
            F.col(vec_col),
            F.sequence(F.lit(0), F.size(vec_col) - 1),
            lambda x, i: x.cast("double")
            * ((F.xxhash64(F.lit(plane), i) % 1001).cast("double") / 500.0),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    return F.when(dot >= 0, F.lit(1)).otherwise(F.lit(0))


def ann_lsh_topk(
    df: DataFrame,
    query_df: DataFrame,
    k: int = 10,
    n_planes: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Approximate top-k: random-hyperplane LSH bucketing + exact
    cosine within the query's bucket (SURVEY.md §2.11 scale path).

    Corpus rows and query rows hash to an n_planes-bit bucket; the
    candidate join is an equi-join on the bucket key, then exact
    cosine + rank. Recall is tunable via n_planes / multiprobe; the
    exactness contract is "top-k of the candidate set", which is why
    this ships rows-only (the oracle covers the exact variant).
    """
    def bucketed(frame: DataFrame, vcol: str, idc) -> DataFrame:
        bucket = None
        for p in range(n_planes):
            bit = _hyperplane_sign(vcol, p) * (1 << p)
            bucket = bit if bucket is None else bucket + bit
        return frame.withColumn("bucket", bucket)

    corpus = bucketed(df, vec_col, id_col).select("bucket", F.col(id_col), F.col(vec_col))
    queries = bucketed(
        query_df.withColumnRenamed("query_vec", "_qv"), "_qv", "query_id"
    ).select("bucket", "query_id", "_qv")
    scored = (
        corpus.join(F.broadcast(queries), "bucket")
        .filter(F.col(id_col) != F.col("query_id"))
        .select(
            "query_id",
            F.col(id_col),
            oracle_round(cosine_similarity(vec_col, "_qv"), 6).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", id_col, "cosine", "rank")
    )
