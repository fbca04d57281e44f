"""PageRank (operators/graph.py): distributed power iteration checked
against closed forms and an independent numpy implementation."""

from __future__ import annotations

import numpy as np
import pytest

from pyspark.sql import functions as F

from climate_data_pipelines_spark.operators import graph


def _numpy_pagerank(edges, directed=False, d=0.85, iters=300):
    nodes = sorted({x for e in edges for x in e})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    out: dict = {}
    for a, b in edges:
        out.setdefault(idx[a], []).append(idx[b])
        if not directed:
            out.setdefault(idx[b], []).append(idx[a])
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        nxt = np.full(n, (1.0 - d) / n)
        dangling = 0.0
        for u in range(n):
            vs = out.get(u)
            if not vs:
                dangling += r[u]
                continue
            share = d * r[u] / len(vs)
            for v in vs:
                nxt[v] += share
        nxt += d * dangling / n
        r = nxt
    return {v: r[idx[v]] for v in nodes}


def test_pagerank_star_matches_numpy(spark):
    edges = [(0, i) for i in range(1, 6)]
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {r["node"]: r["rank"] for r in graph.pagerank(df).collect()}
    want = _numpy_pagerank(edges)
    assert set(got) == set(want)
    assert max(abs(got[v] - want[v]) for v in want) < 1e-6
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)
    # the hub out-ranks every leaf, leaves are symmetric
    assert got[0] > got[1]
    assert got[1] == pytest.approx(got[5], abs=1e-12)


def test_pagerank_chain_matches_numpy(spark):
    edges = [(i, i + 1) for i in range(10)]
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {r["node"]: r["rank"] for r in graph.pagerank(df).collect()}
    want = _numpy_pagerank(edges)
    assert max(abs(got[v] - want[v]) for v in want) < 1e-6


def test_pagerank_directed_dangling_conserves_mass(spark):
    # B has no out-edges: its rank must be redistributed, including to
    # C which has no in-edges
    edges = [(0, 1), (2, 1)]
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {r["node"]: r["rank"] for r in graph.pagerank(df, directed=True).collect()}
    want = _numpy_pagerank(edges, directed=True)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)
    assert max(abs(got[v] - want[v]) for v in want) < 1e-6
    assert got[1] > got[0]  # the sink of both edges ranks highest


def test_pagerank_empty_edges(spark):
    df = spark.createDataFrame([], "id_a long, id_b long")
    assert graph.pagerank(df).count() == 0


def test_pagerank_disconnected_components_rank_by_size(spark):
    # a triangle and an isolated pair: total rank 1 split across both
    edges = [(0, 1), (1, 2), (0, 2), (10, 11)]
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {r["node"]: r["rank"] for r in graph.pagerank(df).collect()}
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)
    want = _numpy_pagerank(edges)
    assert max(abs(got[v] - want[v]) for v in want) < 1e-6


def test_pagerank_nonconvergence_raises(spark):
    edges = [(i, i + 1) for i in range(20)]
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    with pytest.raises(RuntimeError, match="did not converge"):
        graph.pagerank(df, max_iter=1, tol=1e-12)
