"""Iterative graph analytics over edge lists — PageRank.

The dedup pipeline's candidate/verified pair tables ARE graphs
(documents = nodes, near-dup relations = edges); beside
``dedup.connected_components`` (which turns them into clusters), a
centrality score ranks WITHIN a cluster — e.g. "which copy of this
near-dup family is the canonical one every other copy links to" — and
generalizes to any edge table (web link graphs in a crawl corpus,
user-interaction graphs in an event log).

Spark-first design, same discipline as ``connected_components``:
every iteration is one edge join + one node-key aggregate (single
shuffle per round over the node key), a stats-capped
``localCheckpoint`` truncates lineage per round
(``scale.localcheckpoint_capped`` — see its docstring for why the
plain checkpoint compounds Catalyst's join-size products across
rounds), and the only per-round driver traffic is a SCALAR
convergence metric riding the checkpoint as an ``Observation``. No
row data ever reaches the driver. Edges are checkpointed once and
reused by every round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from climate_data_pipelines_spark.operators.scale import (
    localcheckpoint_capped,
    unpersist_checkpoint,
)


def pagerank(
    edges: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    damping: float = 0.85,
    max_iter: int = 120,
    tol: float = 1e-6,
    node_col: str = "node",
    directed: bool = False,
) -> DataFrame:
    """PageRank by distributed power iteration.

    rank'(v) = (1-d)/N + d · Σ_{u→v} rank(u)/out_degree(u)

    Undirected mode (default — the near-dup graph has no direction)
    symmetrizes the edge list first; every endpoint then has
    out-degree ≥ 1, so there are no dangling nodes and total rank is
    conserved at 1 every round (checked by the convergence metric's
    construction, asserted in tests). Directed mode redistributes
    dangling mass uniformly each round (the standard correction), so
    rank still sums to 1.

    Per round (= two chained power steps), ONE checkpoint job: ranks ⋈
    edges (rank/deg contributions) → groupBy(dst) sum, twice, lazily
    fused; the L1 delta vs the previous round rides the round's
    checkpoint as an ``Observation`` metric — scalar-only driver
    traffic — and iteration stops when it drops below the chained-pair
    threshold. At 100 TB scale the edge table is the big side: it is
    checkpointed once, every round reuses the materialized copy, and
    the rank table (one row per node) is the only thing that moves.
    Chaining two power steps per checkpoint halves the per-round fixed
    overhead (checkpoint job + convergence action) that dominated the
    x100 wall ratio on the small near-dup graphs this serves.

    The round's checkpoint is stats-CAPPED (``localcheckpoint_capped``):
    the delta join references the previous round's checkpoint on both
    sides of a join, which under plain ``localCheckpoint`` squares the
    captured size-in-bytes estimate every round — a driver OOM by round
    ~19 on even a trivial graph. See the helper's docstring for the
    mechanism.

    Returns (node, rank) with ranks summing to 1.

    ``tol`` bounds the L1 distance of the RETURNED ranks from the true
    fixed point. The per-round metric is δ = ||r_{k+2} − r_k||₁ across
    the chained pair (the intermediate iterate is lazy and never
    materialized). Contraction at rate ≤ d gives
    ||r_{k+2} − fix|| ≤ (d/(1−d))²·δ, so the loop stops at
    δ < tol·((1−d)/d)² — the same guarantee the classic single-step
    rule (stop at δ < tol·(1−d)/d) provides. Raises RuntimeError if
    that has not happened after ``max_iter`` power steps. The
    worst-case rate is ``damping`` per step (undirected near-dup
    graphs are full of bipartite pieces — isolated pairs, stars —
    whose iterates oscillate and shrink only by the damping factor),
    so reaching 1e-6 takes ln(tol·(1-d)/d)/ln(d) ≈ 96 steps at the
    defaults: the bound is sized for that, and a looser ``tol`` buys a
    shorter run.
    """
    from pyspark.sql import Observation

    sym = edges.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
    if not directed:
        sym = sym.unionByName(
            edges.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst"))
        )
    sym = sym.localCheckpoint(eager=True)
    nodes = (
        sym.select(F.col("src").alias(node_col))
        .unionByName(sym.select(F.col("dst").alias(node_col)))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = nodes.count()
    if n == 0:
        return nodes.select(F.col(node_col), F.lit(0.0).alias("rank"))
    # node-sized and loop-invariant: materialize ONCE — otherwise every
    # round (and the directed-mode dangling join a second time) re-runs
    # the edge-scale groupBy shuffle
    degree = sym.groupBy("src").agg(F.count("*").alias("deg")).localCheckpoint(
        eager=True
    )

    ranks, ranks_ckpt = localcheckpoint_capped(
        nodes.select(F.col(node_col), F.lit(1.0 / n).alias("rank"))
    )

    base = (1.0 - damping) / n

    def _step(r: DataFrame) -> DataFrame:
        """One lazy power iteration. ``r`` is referenced exactly ONCE
        (the contribution branch): the completion to zero-inflow nodes
        left-joins the loop-invariant ``nodes`` checkpoint instead of
        ``r`` itself, so two steps can CHAIN lazily between
        checkpoints without the inner step's edge join being evaluated
        once per downstream branch. (Directed mode's dangling scan is
        a second reference to ``r`` — acceptable: it is an aggregate to
        ONE row, and the near-dup graphs this serves are undirected.)
        """
        contribs = (
            r.join(sym, r[node_col] == sym["src"], "inner")
            .join(degree, "src")
            .select(
                F.col("dst").alias(node_col),
                (F.col("rank") / F.col("deg")).alias("contrib"),
            )
            .groupBy(node_col)
            .agg(F.sum("contrib").alias("contrib"))
        )
        joined = nodes.join(contribs, node_col, "left")
        if directed:
            # dangling mass: rank sitting on nodes with no out-edges is
            # redistributed uniformly to EVERY node (1-row broadcast
            # joined after the left join, so nodes with no in-edges
            # receive it too)
            dangling = (
                r.join(degree, r[node_col] == degree["src"], "left_anti")
                .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("dm"))
            )
            joined = joined.crossJoin(F.broadcast(dangling))
            inflow = F.coalesce(F.col("contrib"), F.lit(0.0)) + F.col("dm") / n
        else:
            inflow = F.coalesce(F.col("contrib"), F.lit(0.0))
        return joined.select(
            F.col(node_col), (base + damping * inflow).alias("rank")
        )

    threshold = tol * ((1.0 - damping) / damping) ** 2
    for _ in range((max_iter + 1) // 2):
        obs = Observation()
        new_ranks = (
            _step(_step(ranks))
            .join(
                ranks.select(F.col(node_col), F.col("rank").alias("_prev")),
                node_col,
            )
            .observe(
                obs, F.sum(F.abs(F.col("rank") - F.col("_prev"))).alias("l1")
            )
        )
        new_ranks, new_ckpt = localcheckpoint_capped(new_ranks)
        l1 = obs.get["l1"]
        # the new round's checkpoint is materialized (eager=True), so
        # the previous round's blocks are dead weight — drop them now
        # instead of letting ~max_iter node-sized checkpoints pile up
        # in executor storage for the whole run (ADVICE r5)
        prev_ckpt, ranks_ckpt = ranks_ckpt, new_ckpt
        ranks = new_ranks.select(node_col, "rank")
        unpersist_checkpoint(prev_ckpt)
        if l1 < threshold:
            break
    else:
        raise RuntimeError(
            f"pagerank did not converge in {max_iter} power steps "
            f"(L1 delta still >= {tol}); raise max_iter"
        )
    return ranks
