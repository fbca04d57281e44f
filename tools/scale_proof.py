"""Empirical scale-proof for the dedup/ANN suite (VERDICT r4 item 1,
extended to a 100x step in r5).

Runs the heavy document/embedding operators against corpora generated
by tools/gen_scale_fixture.py — x1 (the sf0.1 shape: 5k docs / 2k
vectors), x10, and optionally x100 (500k docs / 200k vectors / 10M
events) — and records the measured scaling curve: wall time, output
rows, candidate counts, candidates-per-member. The contract tested:

- minhash/simhash LSH candidates grow ~linearly (banded buckets pair
  only true near-dups; random 240-bit band collisions are ~0), so
  pairs/doc stays ~constant;
- semantic dedup's derive_lsh_planes adds ~1 plane per corpus
  doubling, keeping expected candidates/member bounded (~target);
- ANN LSH candidates/query grow sublinearly in corpus size at fixed
  recall (deeper corpora fill buckets, but multiprobe breadth is
  constant) — recall@10 vs the exact baseline is recorded;
- decontamination scales on the REALISTIC axis: the benchmark set
  (HumanEval/MMLU-shaped: fixed size) is pinned to a ~constant-size
  slice while the train side grows, so survivors and wall time are
  meaningful at every scale (a benchmark that grows 10x with the
  corpus saturates word-soup shingle space and zeroes the output);
- wall time stays near-linear (each dir's time ratio is printed next
  to its data ratio vs the first dir).

Writes SCALEPROOF.json. Usage:
    python tools/gen_scale_fixture.py scaledata/x1 1
    python tools/gen_scale_fixture.py scaledata/x10 10
    python tools/gen_scale_fixture.py scaledata/x100 100
    python tools/scale_proof.py scaledata/x1 scaledata/x10 scaledata/x100

Env: SCALEPROOF_REPEATS (default 3) — timing repeats per query/dir.
     SCALEPROOF_ONLY — comma-separated query-name substrings; limits
       this invocation to matching queries (plus the ANN/plane blocks
       only when 'ann' matches). Results MERGE into an existing
       SCALEPROOF.json, so a long sweep can run in resumable chunks.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPEATS = int(os.environ.get("SCALEPROOF_REPEATS", "3"))
BASE_DOCS = 5000  # gen_scale_fixture.BASE_DOCS — x1 document count

QUERIES = [
    "q129_minhash64_candidates",
    "q122_verified_dedup_clusters",
    "q90_dedup_clusters",
    "q126_semantic_dedup",
    "q127_repeated_ngrams",
    "q124_simhash_candidates",
    # round-5 additions (documents-based, candidate-bounded by design)
    "q136_edit_distance_verify",
    # round-11 (zipf_cc sweep): incremental cross-corpus dedup joins
    # the permanent list — its base/batch split is self-contained in
    # the registry fn, so it runs on any documents fixture
    "q141_incremental_dedup",
    # events-based: sessionization (users and events scale together,
    # so per-key partition work stays constant)
    "q137_sessionize",
    # round-5b: single-shuffle funnel over the same events shape
    "q145_funnel",
    # round-5c: per-stratum heap sampling (partial WindowGroupLimit
    # before the exchange) and sample-then-verify heavy hitters (two
    # tiny shuffles, no full-vocab exchange)
    "q159_weighted_sample",
    "q160_heavy_hitters",
    # round-5c: iterative PageRank over the verified near-dup graph
    # (edge set grows linearly with the corpus; rounds stay O(1) on
    # the regular pair/clique components the fixture plants)
    "q161_pagerank",
    # round-6: hierarchical prefix-sum shard assignment (the global
    # ordered window's scalable twin — every corpus-sized stage
    # partitioned; only the |buckets|-row offset table is windowed
    # on one partition)
    "q171_shard_assign",
    # round-7: URL dedup (one short-key exchange — measured ×7.3 at
    # x100, flat as designed), containment verify on banded candidates
    # (candidate-bounded plan shape like q122, but the word-soup
    # fixture's shingle joins price it at ×32-52 — the known r8 perf
    # target, see COVERAGE.md), trigram LM (the fixture's RANDOM text
    # gives LINEAR trigram-vocab growth — Heaps' law sublinearity that
    # rescues real corpora doesn't apply, so the count-table joins are
    # corpus-sized and the curve lands at ×28; honest worst case, also
    # an r8 target)
    "q175_url_dedup",
    "q176_containment_neardup",
    "q177_trigram_lm_score",
    # round-8: salt-capped simhash candidates — the answer to q124's
    # x100 candidate blow-up (rows x6819): same banding, hot buckets
    # split into (band,id)-keyed md5 salt groups, join bounded at
    # ~width*cap per value
    "q178_simhash_capped_candidates",
    # round-8: prefix-filter small-in-large containment (the
    # LSH-invisible recall hole): df agg is corpus-linear, candidate
    # join keyed on each small doc's RAREST shingles
    "q179_small_in_large_containment",
    # round-8 (r7 verdict item 9): the two late-registered operators
    # join the permanent sweep — classifier training is one
    # distributed job per epoch with a (dim+1)-float collect, WARC
    # render+parse is applyInPandas groups + an Arrow member walk
    "q173_quality_classifier",
    "q174_warc_ingest",
    # round-8: CCNet perplexity-bucket mix — q177's LM + one
    # lang-keyed ranking window + stateless md5 keep
    "q181_perplexity_bucket_mix",
    # round-11: distributed Lloyd k-means + cluster-balanced mix —
    # per-iteration cost is one map-only Arrow kernel + one
    # (cluster,dim)-keyed agg, so wall should track the embedding
    # count ~linearly with a large fixed stage overhead at small n
    "q187_kmeans_mix",
    # round-12: context packing — hierarchical prefix sum + explode;
    # output rows ~= docs + tokens/ctx_len, both linear in the corpus
    # — and its per-sequence boundary manifest (one seq-keyed agg,
    # output rows = tokens/ctx_len)
    "q189_context_packing",
    "q190_sequence_manifest",
    # round-13: leakage-safe split (the q122 verified-CC machinery +
    # one stateless md5 projection — the row prices the split's
    # add-on over the clustering it reuses) and length-bucketed
    # batching (hierarchical in-bucket rank, the q171 pattern on a
    # second axis; output rows ~ docs/batch_size, linear)
    "q191_leakage_safe_split",
    "q192_length_bucket_batches",
]


def _fixed_bench_decontaminate(spark, sf_dir):
    """q139's scale-proof twin with the benchmark pinned to a
    ~constant-size slice (doc_id stride = corpus multiplier): the
    train side grows 10x/100x, the benchmark — like every real
    held-out eval set — does not."""
    from pyspark.sql import functions as F

    from climate_data_pipelines_spark.catalog import load_table, table_rows
    from climate_data_pipelines_spark.operators import training

    docs = load_table(spark, sf_dir, "documents")
    mult = max(1, table_rows(sf_dir, "documents") // BASE_DOCS)
    bench = docs.filter(
        (F.col("source") == "src0") & (F.col("doc_id") % mult == 0)
    )
    train = docs.filter(F.col("source") != "src0")
    out = training.bloom_decontaminate(
        train, bench, k=3, expected_items=20_000, fpp=0.01
    )
    return out.select("doc_id", "lang", "source", "n_chars")


def _fixed_bench_semantic_decontaminate(spark, sf_dir):
    """q166's scale twin on the REALISTIC axis (the q139 pattern):
    the benchmark is pinned to 100 planted perturbed copies of base
    vectors — real eval sets don't grow with the train corpus — while
    the train side scales 10x/100x. Output stays exactly the 100
    planted hits at every scale (the i.i.d. background never crosses
    the 0.99 threshold), so the timing curve isolates the
    cross-corpus bucket join + probe on a growing train side."""
    from pyspark.sql import functions as F

    from climate_data_pipelines_spark.catalog import load_table, table_rows
    from climate_data_pipelines_spark.operators import similarity

    emb = load_table(spark, sf_dir, "embeddings")
    bench = emb.filter(F.col("vec_id") < 100).select(
        (F.col("vec_id") + 10_000_000).alias("vec_id"),
        F.transform("embedding", lambda x, i: x * (1.0 + 0.002 * (i % 3)))
        .cast("array<float>")
        .alias("embedding"),
    )
    return similarity.semantic_decontaminate(
        emb, bench, threshold=0.99,
        corpus_n=table_rows(sf_dir, "embeddings"),
    )


def _q179_corpus(spark, sf_dir):
    """q179's corpus construction (queries.py q179): the scan plus 25
    planted 16-token excerpts of hosts 0-24 at id+950000 — replicated
    here so the candidate/recovery probes measure exactly the corpus
    the registry query runs on."""
    from pyspark.sql import functions as F

    from climate_data_pipelines_spark.catalog import load_table
    from climate_data_pipelines_spark.functions.text import tokens as _toks

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    tiny = docs.filter(F.col("doc_id") < 25).select(
        (F.col("doc_id") + 950000).alias("doc_id"),
        F.concat_ws(" ", F.slice(_toks("text"), 5, 16)).alias("text"),
    )
    return docs.unionByName(tiny)


def _q179_candidates(spark, sf_dir):
    """The candidate-pair table BEFORE the exact verify — its growth
    rate is q179's scaling claim: each prefix shingle fans out by its
    document frequency, so candidates grow ~linearly when prefix df is
    O(1) (Zipf text) and ~quadratically when df grows with the corpus
    (the fixed-30-type soup, dammed only by df_cap)."""
    from climate_data_pipelines_spark.operators import dedup

    return dedup.containment_small_in_large(
        _q179_corpus(spark, sf_dir), k=3, threshold=0.9, small_max=16,
        df_cap=64, candidates_only=True,
    )


def _q179_planted_recovery(spark, sf_dir):
    """Recall floor at every scale: the 25 planted excerpts must come
    back as (tiny → its own host) pairs — rows == 25 or the prefix
    join lost a pigeonhole-guaranteed pair."""
    from pyspark.sql import functions as F

    from climate_data_pipelines_spark.queries import REGISTRY

    out = REGISTRY["q179_small_in_large_containment"].fn(spark, sf_dir)
    return out.filter(
        (F.col("id_small") >= 950000)
        & (F.col("id_large") == F.col("id_small") - 950000)
    )


def _q122_candidates(spark, sf_dir):
    """q122's LSH candidate-pair table BEFORE verification — its row
    count is the stage the banding bounds; recorded alongside the full
    operator so the z1000 row (r11 verdict item 6) names which stage
    grows."""
    from climate_data_pipelines_spark.catalog import load_table
    from climate_data_pipelines_spark.operators import dedup
    from climate_data_pipelines_spark.queries import MINHASH_BANDS, MINHASH_N

    docs = load_table(spark, sf_dir, "documents")
    sigs = dedup.minhash_signatures(docs, k=3, n_hashes=MINHASH_N)
    return dedup.minhash_lsh_candidates(
        sigs, n_hashes=MINHASH_N, bands=MINHASH_BANDS
    )


def _q122_verified_pairs(spark, sf_dir):
    """q122's verified edge set (exact Jaccard >= 0.5 on the LSH
    candidates) — the CC input; candidates minus this count is the
    false-positive volume verification kills."""
    from pyspark.sql import functions as F

    from climate_data_pipelines_spark.catalog import load_table
    from climate_data_pipelines_spark.operators import dedup
    from climate_data_pipelines_spark.queries import MINHASH_BANDS, MINHASH_N

    docs = load_table(spark, sf_dir, "documents")
    sigs = dedup.minhash_signatures(docs, k=3, n_hashes=MINHASH_N)
    cand = dedup.minhash_lsh_candidates(
        sigs, n_hashes=MINHASH_N, bands=MINHASH_BANDS
    ).localCheckpoint(eager=True)
    return (
        dedup.jaccard_on_pairs(docs, cand, k=3)
        .filter(F.col("jaccard") >= 0.5)
        .select("id_a", "id_b")
    )


def _q141_candidates(spark, sf_dir):
    """q141's CROSS-corpus LSH candidate table (new × base band
    buckets only — the base never self-pairs) — the stage whose
    growth the z1000 row names (r12 verdict item 7): its base-bucket
    join is the shape most sensitive to vocabulary growth, so the
    candidates-per-new-doc ratio across Zipf decades is the claim."""
    from pyspark.sql import functions as F

    from climate_data_pipelines_spark.catalog import load_table
    from climate_data_pipelines_spark.operators import dedup
    from climate_data_pipelines_spark.queries import MINHASH_BANDS, MINHASH_N

    docs = load_table(spark, sf_dir, "documents")
    is_base = F.col("source").rlike("^src[0-9]$")
    sb = dedup.minhash_signatures(docs.filter(is_base), k=3, n_hashes=MINHASH_N)
    sn = dedup.minhash_signatures(docs.filter(~is_base), k=3, n_hashes=MINHASH_N)
    return dedup.minhash_lsh_candidates_cross(
        sn, sb, n_hashes=MINHASH_N, bands=MINHASH_BANDS
    )


CUSTOM = {
    "q139_fixed_bench_decontaminate": _fixed_bench_decontaminate,
    "q166_fixed_bench_semantic_decon": _fixed_bench_semantic_decontaminate,
    "q179_candidates": _q179_candidates,
    "q179_planted_recovery": _q179_planted_recovery,
    "q122_candidates": _q122_candidates,
    "q122_verified_pairs": _q122_verified_pairs,
    "q141_candidates": _q141_candidates,
}


def main() -> None:
    argv = list(sys.argv[1:])
    section = "queries"
    if "--section" in argv:
        i = argv.index("--section")
        section = argv[i + 1]
        del argv[i : i + 2]
    dirs = argv or ["scaledata/x1", "scaledata/x10"]

    from climate_data_pipelines_spark import get_spark
    from climate_data_pipelines_spark.catalog import load_table, table_rows
    from climate_data_pipelines_spark.operators import similarity
    from climate_data_pipelines_spark.queries import REGISTRY, _query_vectors

    spark = get_spark(app_name="scale-proof")

    def run_noop(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    def drop_stale_checkpoints() -> None:
        """bench.py's r7 lesson, adopted here in r11: operators
        localCheckpoint bounded intermediates that die with the query
        but linger in the block manager; across a multi-query sweep
        the dead blocks build memory pressure that taxes LATE list
        entries. The zipf section's q179_candidates row (a CUSTOM
        entry, so it runs after every QUERIES entry) measured 38.0 s
        at z100 while its own superset — the full operator, run
        early — measured 12.6 s; the probe paid the accumulated
        blocks, not the plan. Untimed, between samples."""
        try:
            for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
                rdd.unpersist(False)
        except Exception:
            pass

    out_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "SCALEPROOF.json",
    )
    only = [s for s in os.environ.get("SCALEPROOF_ONLY", "").split(",") if s]

    base = dirs[0]
    out: dict = {"dirs": dirs, "repeats": REPEATS, "queries": {}}
    if section != "queries":
        # named section (e.g. --section zipf, --section x1000): results
        # land under out[section] = {dirs, repeats, queries}, merging
        # with the existing file so the default x-family is untouched
        out = {}
        if os.path.exists(out_path):
            with open(out_path) as fh:
                out = json.load(fh)
        sec = out.get(section)
        if not (isinstance(sec, dict) and sec.get("dirs") == dirs):
            sec = {"dirs": dirs, "repeats": REPEATS, "queries": {}}
        sec["repeats"] = REPEATS
        out[section] = sec
        results = sec["queries"]
    elif only and os.path.exists(out_path):
        with open(out_path) as fh:
            prev = json.load(fh)
        if prev.get("dirs") == dirs:  # merge only across same-dir runs
            out = prev
            out["repeats"] = REPEATS  # describe THIS run's samples
        else:
            print(
                f"WARNING: existing SCALEPROOF.json covers dirs "
                f"{prev.get('dirs')} != {dirs}; its results will be "
                "DISCARDED on write (re-run prior chunks with these "
                "dirs, or align the dir arguments to merge)"
            )
    if section == "queries":
        results = out["queries"]
    fns = {name: REGISTRY[name].fn for name in QUERIES} | CUSTOM
    for name, fn in fns.items():
        if only and not any(s in name for s in only):
            continue
        res = {}
        for d in dirs:
            n_docs = table_rows(d, "documents")
            rows = fn(spark, d).count()  # materialize once (rows metric)
            drop_stale_checkpoints()
            samples = []
            for _ in range(REPEATS):
                t0 = time.perf_counter()
                run_noop(fn(spark, d))
                samples.append(time.perf_counter() - t0)
                drop_stale_checkpoints()  # between samples, untimed
            res[d] = {
                "rows": rows,
                "sec": round(statistics.median(samples), 3),
                "n_docs": n_docs,
                "rows_per_doc": round(rows / n_docs, 4),
            }
        r1 = res[base]
        for d in dirs[1:]:
            mult = res[d]["n_docs"] // max(r1["n_docs"], 1)
            res[f"time_ratio_x{mult}"] = round(res[d]["sec"] / r1["sec"], 2)
            res[f"rows_ratio_x{mult}"] = round(
                res[d]["rows"] / max(r1["rows"], 1), 2
            )
        results[name] = res
        print(f"{name}: " + "  ".join(
            f"{d.rsplit('/', 1)[-1]} {res[d]['sec']}s/{res[d]['rows']}r"
            for d in dirs
        ))

    # ANN: candidate counts + recall@10 vs exact at every scale
    # (default section only — the zipf/x1000 families are document
    # corpora; their embeddings are the copied base tables)
    if section != "queries" or (only and not any("ann" in s for s in only)):
        with open(out_path, "w") as fh:
            json.dump(out, fh, indent=1)
        print("wrote SCALEPROOF.json (chunk)")
        return
    ann = {}
    for d in dirs:
        emb = load_table(spark, d, "embeddings")
        q = _query_vectors(spark, d)
        exact: dict = {}
        for r in similarity.cosine_topk(emb, q, k=10).collect():
            exact.setdefault(r["query_id"], set()).add(r["vec_id"])
        approx: dict = {}
        t0 = time.perf_counter()
        for r in similarity.ann_lsh_topk(
            emb, q, k=10, n_planes=5, n_tables=8, multiprobe_bits=2
        ).collect():
            approx.setdefault(r["query_id"], set()).add(r["vec_id"])
        sec = time.perf_counter() - t0
        hits = sum(len(exact[k_] & approx.get(k_, set())) for k_ in exact)
        total = sum(len(v) for v in exact.values())
        n_cand = similarity.ann_lsh_topk(
            emb, q, k=1 << 30, n_planes=5, n_tables=8, multiprobe_bits=2
        ).count()
        n_vec = table_rows(d, "embeddings")
        ann[d] = {
            "recall@10": round(hits / total, 3) if total else 0.0,
            "candidates": n_cand,
            "corpus": n_vec,
            "cand_frac": round(n_cand / (n_vec * len(exact)), 4),
            "sec": round(sec, 3),
        }
        print(f"q55-ann {d}: recall@10={ann[d]['recall@10']} "
              f"candidates={n_cand} ({ann[d]['cand_frac']:.1%} of corpus/query)")
    out["q55_ann_lsh"] = ann

    # semantic dedup: record the derived plane depth at each scale —
    # the +1-plane-per-doubling contract that bounds candidates/member
    planes = {
        d: similarity.derive_lsh_planes(table_rows(d, "embeddings"), 6)
        for d in dirs
    }
    out["derived_lsh_planes"] = planes
    print("derived planes:", planes)

    with open(out_path, "w") as fh:
        json.dump(out, fh, indent=1)
    print("wrote SCALEPROOF.json")


if __name__ == "__main__":
    main()
