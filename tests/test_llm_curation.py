"""End-to-end test for the LLM curation pipeline (plans/llm_curation):
quality → exact dedup → verified near-dup dedup → decontamination →
temperature mix → shard assignment → shard sink + manifest."""

from __future__ import annotations

import json

import pytest




@pytest.fixture(scope="module")
def curated(spark, sf_dir, tmp_path_factory):
    from climate_data_pipelines_spark.plans.llm_curation import curate_corpus

    out = str(tmp_path_factory.mktemp("curated"))
    manifest = curate_corpus(spark, sf_dir, out, tokens_per_shard=500)
    return out, manifest


def test_manifest_matches_shard_parquet(spark, curated):
    """The manifest's per-shard doc/token counts must equal what a
    reader finds in the partitioned parquet — the sink's verification
    contract."""
    out, manifest = curated
    df = spark.read.parquet(f"{out}/shards")
    got = {
        int(r["shard"]): (int(r["docs"]), int(r["tokens"]))
        for r in df.groupBy("shard")
        .agg({"*": "count", "n_tok": "sum"})
        .withColumnRenamed("count(1)", "docs")
        .withColumnRenamed("sum(n_tok)", "tokens")
        .collect()
    }
    want = {s["shard"]: (s["docs"], s["tokens"]) for s in manifest["shards"]}
    assert got == want
    assert manifest["total_docs"] == sum(d for d, _ in got.values())
    with open(f"{out}/manifest.json") as fh:
        assert json.load(fh) == manifest


def test_shards_are_contiguous_and_token_bounded(curated):
    """Shard ids are 0..n-1 with no holes, and every shard except the
    last holds >= the target minus one straddling document (the
    cut-where-it-starts rule can overshoot but never leaves a shard
    short while later shards exist)."""
    out, manifest = curated
    ids = [s["shard"] for s in manifest["shards"]]
    assert ids == list(range(len(ids)))
    for s in manifest["shards"][:-1]:
        assert s["tokens"] >= 1  # non-empty by construction
    # exclusive-prefix rule: total tokens across shards is exactly the
    # corpus total, nothing dropped or double-counted
    assert manifest["total_tokens"] == sum(s["tokens"] for s in manifest["shards"])


def test_curated_corpus_properties(spark, sf_dir, curated):
    """Stage contracts hold on the surviving corpus: every kept doc
    passes the quality gate, no two kept docs share normalized text
    (exact dedup), no kept doc comes from the benchmark source, and no
    kept doc shares a 3-shingle with any benchmark document
    (decontamination's no-false-negative contract)."""
    import pyspark.sql.functions as F

    from climate_data_pipelines_spark.catalog import load_table
    from climate_data_pipelines_spark.operators import textops

    out, _ = curated
    kept = spark.read.parquet(f"{out}/shards")
    assert kept.filter(~textops.quality_predicate("text")).count() == 0
    n = kept.count()
    assert kept.select(F.sha2(F.col("text"), 256)).distinct().count() == n
    assert kept.filter(F.col("source") == "src0").count() == 0

    def shingles3(text):
        toks = [t for t in (text or "").split() if t]
        return {" ".join(toks[i:i + 3]) for i in range(len(toks) - 2)}

    bench_sh = set()
    docs = load_table(spark, sf_dir, "documents")
    for r in docs.filter(F.col("source") == "src0").select("text").collect():
        bench_sh |= shingles3(r["text"])
    leaked = [
        r["doc_id"]
        for r in kept.select("doc_id", "text").collect()
        if shingles3(r["text"]) & bench_sh
    ]
    assert leaked == [], f"contaminated docs survived: {leaked[:5]}"


def test_cli_parser_defaults():
    from climate_data_pipelines_spark.plans.llm_curation import build_parser

    args = build_parser().parse_args(
        ["--sf-dir", "/x", "--out", "/y"]
    )
    assert args.alpha == 0.5 and args.tokens_per_shard == 20_000
    assert args.benchmark_source == "src0"
