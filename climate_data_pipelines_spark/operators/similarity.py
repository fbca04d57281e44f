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
from climate_data_pipelines_spark.functions.vectors import (
    cosine_similarity,
    l2_normalize,
    sq_l2,
)


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


def ann_ivf_topk(
    df: DataFrame,
    query_df: DataFrame,
    k: int = 10,
    n_cells: int = 32,
    n_probe: int = 12,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k via an IVF coarse quantizer (SURVEY.md §2.11
    'IVF variant as the scale path'):

    1. k-means over unit-normalized corpus vectors → ``n_cells``
       centroids (spherical-ish quantizer: L2 on the unit sphere
       orders like cosine);
    2. each corpus vector is assigned to its nearest centroid — the
       inverted lists, materialized as a (vec_id, cell) table;
    3. each query probes its ``n_probe`` nearest centroids (centroid
       table is tiny — n_cells × dim — and broadcast);
    4. exact cosine runs only on the probed cells' members; rank
       window keeps k.

    At 100 TB the inverted-list assignment is written once
    (partitioned/bucketed by cell) and each query touches
    n_probe/n_cells of the corpus; the KMeans fit itself samples or
    trains on a fraction. Approximate by construction → rows-only;
    tests gate recall against the exact q38 baseline.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    normed = df.select(
        F.col(id_col), l2_normalize(vec_col).alias("_nv")
    )
    feats = normed.select(
        F.col(id_col), array_to_vector("_nv").alias("features")
    )
    model = KMeans(
        k=n_cells,
        seed=seed,
        maxIter=8,  # coarse quantizer: cell assignment stabilizes fast,
        # and ANN recall is insensitive to the last k-means ulps
        featuresCol="features",
        predictionCol="cell",
    ).fit(feats)
    inverted = model.transform(feats).select(id_col, "cell")

    spark = df.sparkSession
    cent_rows = [
        (i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())
    ]
    centroids = spark.createDataFrame(cent_rows, "cell int, centroid array<double>")

    probed = (
        query_df.select("query_id", l2_normalize("query_vec").alias("_nq"))
        .crossJoin(F.broadcast(centroids))
        .select("query_id", "cell", sq_l2("_nq", "centroid").alias("_d2"))
    )
    wp = Window.partitionBy("query_id").orderBy(F.asc("_d2"), F.asc("cell"))
    probe_cells = (
        probed.withColumn("_pr", F.row_number().over(wp))
        .filter(F.col("_pr") <= n_probe)
        .select("query_id", "cell")
    )

    candidates = (
        inverted.join(F.broadcast(probe_cells), "cell")
        .filter(F.col(id_col) != F.col("query_id"))
        .select("query_id", id_col)
    )
    scored = (
        candidates.join(df.select(F.col(id_col), F.col(vec_col)), id_col)
        .join(F.broadcast(query_df), "query_id")
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


def _hyperplane_sign(vec_col: str, table: int, plane: int) -> F.Column:
    """Sign bit of vec · w_(table,plane) with deterministic
    pseudo-random weights: w[d] = (xxhash64(table, plane, d) % 1001
    - 500) / 500 — computed expression-side from the element index, no
    weight table shipped to executors."""
    dot = F.aggregate(
        F.zip_with(
            F.col(vec_col),
            F.sequence(F.lit(0), F.size(vec_col) - 1),
            lambda x, i: x.cast("double")
            * (((F.xxhash64(F.lit(table), F.lit(plane), i) % 1001) - 500).cast("double") / 500.0),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    return F.when(dot >= 0, F.lit(1)).otherwise(F.lit(0))


def ann_lsh_topk(
    df: DataFrame,
    query_df: DataFrame,
    k: int = 10,
    n_planes: int = 5,
    n_tables: int = 8,
    multiprobe_bits: int = 1,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Approximate top-k: multi-table random-hyperplane LSH with
    MULTIPROBE + exact cosine on the candidate union (SURVEY.md §2.11
    scale path).

    Each of ``n_tables`` independent hash tables buckets every vector
    by n_planes sign bits; a corpus row is a candidate if it collides
    with the query in ANY table (OR-amplification — recall rises with
    tables, precision with planes). ``multiprobe_bits=1`` additionally
    probes every bucket at Hamming distance 1 from the query's bucket
    (n_planes+1 probes per table, explode on the QUERY side only — the
    corpus is still hashed once per table): a near-neighbor that
    disagrees on a single sign bit is recovered without paying for
    more tables, so high-dimensional inputs keep selectivity
    (2^n_planes buckets) without the recall collapse of exact-bucket
    matching. Candidate generation is an equi-join on (table, bucket);
    exact cosine runs only on the distinct candidate set. Approximate
    by construction → rows-only (the exact variant q38 is the
    oracle-checked baseline; recall is gated in tests and reported by
    bench.py).
    """

    def bucketed(frame: DataFrame, vcol: str, keep: list[str]) -> DataFrame:
        tables = []
        for t in range(n_tables):
            bucket = None
            for p in range(n_planes):
                bit = _hyperplane_sign(vcol, t, p) * (1 << p)
                bucket = bit if bucket is None else bucket + bit
            tables.append(F.struct(F.lit(t).alias("table"), bucket.alias("bucket")))
        return frame.select(
            *keep, F.explode(F.array(*tables)).alias("_tb")
        ).select(*keep, F.col("_tb.table").alias("table"), F.col("_tb.bucket").alias("bucket"))

    corpus_b = bucketed(df, vec_col, [id_col])
    query_b = bucketed(
        query_df.withColumnRenamed("query_vec", "_qv"), "_qv", ["query_id"]
    )
    if multiprobe_bits >= 1:
        # probe the exact bucket plus every single-bit flip of it
        probes = F.array(
            F.col("bucket"),
            *[F.col("bucket").bitwiseXOR(F.lit(1 << p)) for p in range(n_planes)],
        )
        query_b = query_b.select(
            "query_id", "table", F.explode(probes).alias("bucket")
        )
    candidates = (
        corpus_b.join(F.broadcast(query_b.select("query_id", "table", "bucket")), ["table", "bucket"])
        .filter(F.col(id_col) != F.col("query_id"))
        .select("query_id", id_col)
        .distinct()
    )
    scored = (
        candidates.join(df.select(F.col(id_col), F.col(vec_col)), id_col)
        .join(F.broadcast(query_df), "query_id")
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


def label_centroids(
    df: DataFrame, vec_col: str = "embedding", label_col: str = "label"
) -> DataFrame:
    """Per-label embedding centroid — the cluster/class prototype used
    for IVF coarse quantizers, centroid-based topic assignment, and
    embedding-drift monitoring.

    posexplode → one hash aggregate keyed on (label, dim) — |labels|×dim
    groups regardless of corpus size, map-side combined — then
    reassembled into an ordered array with array_agg over a sorted
    struct collect. No vector ever crosses the shuffle whole.
    """
    dims = df.select(
        F.col(label_col),
        F.posexplode(F.col(vec_col)).alias("dim", "x"),
    )
    per_dim = dims.groupBy(label_col, "dim").agg(
        F.avg("x").alias("mean_x"), F.count("*").alias("n")
    )
    return (
        per_dim.groupBy(label_col)
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("dim"), F.col("mean_x")))
            ).alias("pairs"),
            F.max("n").alias("n_vectors"),
        )
        .select(
            label_col,
            F.transform(F.col("pairs"), lambda p: p["mean_x"]).alias("centroid"),
            "n_vectors",
        )
    )


def semantic_dedup(
    df: DataFrame,
    threshold: float = 0.95,
    n_planes: int = 5,
    n_tables: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    keep: str = "min",
) -> DataFrame:
    """SemDeDup-style semantic deduplication over an embedding column:
    drop documents whose MEANING duplicates another's even when the
    text differs (template rewrites, boilerplate variants, translations
    embedded into one space).

    Stages — all bucketed, never all-pairs:
    1. multi-table hyperplane LSH buckets every vector (the corpus is
       hashed once per table, same signature machinery as
       ``ann_lsh_topk``);
    2. within-bucket exact cosine >= ``threshold`` yields verified
       near-dup edges (id_a < id_b, distinct across tables);
    3. connected components clusters the edges (transitive closure —
       A~B, B~C groups all three);
    4. keeper = min id per cluster; the survivors are returned with
       their cluster id and size.

    Approximate by construction (LSH recall < 1 means some true
    semantic pairs never become edges) → rows-only in the registry;
    recall is gated against the exact blocked near-dup (q43 twin) in
    tests. Returns (vec_id, cluster, cluster_size, is_keeper).
    """
    from climate_data_pipelines_spark.operators.dedup import connected_components

    def bucketed(frame: DataFrame) -> DataFrame:
        tables = []
        for t in range(n_tables):
            bucket = None
            for p in range(n_planes):
                bit = _hyperplane_sign(vec_col, t, p) * (1 << p)
                bucket = bit if bucket is None else bucket + bit
            tables.append(F.struct(F.lit(t).alias("table"), bucket.alias("bucket")))
        return frame.select(
            F.col(id_col), F.col(vec_col), F.explode(F.array(*tables)).alias("_tb")
        ).select(
            id_col, vec_col,
            F.col("_tb.table").alias("table"), F.col("_tb.bucket").alias("bucket"),
        )

    b = bucketed(df)
    a_side = b.select(
        "table", "bucket", F.col(id_col).alias("id_a"), F.col(vec_col).alias("_va")
    )
    b_side = b.select(
        "table", "bucket", F.col(id_col).alias("id_b"), F.col(vec_col).alias("_vb")
    )
    # score BEFORE deduplicating across tables: the bucket join output
    # pipelines straight into the cosine filter (narrow, stays in the
    # join stage), so the distinct only ever shuffles surviving
    # (id_a, id_b) pairs — 16 bytes/row — never the embedding arrays.
    # A pair colliding in several tables is scored once per table;
    # redundant FLOPs are ~free next to shuffling vectors (measured
    # 27.9 s → distinct-on-ids variant 4× faster at sf0.1).
    edges = (
        a_side.join(b_side, ["table", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(cosine_similarity("_va", "_vb") >= threshold)
        .select("id_a", "id_b")
        .distinct()
    ).localCheckpoint(eager=True)
    clusters = connected_components(
        edges, nodes=df.select(id_col), node_col=id_col
    ).withColumnRenamed("component", "cluster")
    sizes = clusters.groupBy("cluster").agg(F.count("*").alias("cluster_size"))
    return (
        clusters.join(sizes, "cluster")
        .select(
            id_col,
            "cluster",
            "cluster_size",
            (F.col(id_col) == F.col("cluster")).alias("is_keeper"),
        )
    )
