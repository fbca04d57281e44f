"""Scale row for the r12 cluster-mix curation stage (verdict item 3).

Runs the flagship ``curate_corpus`` on the x10 fixture twice — stage
OFF vs stage ON (embeddings joined vec_id -> doc_id, k=16, cap = half
the balanced share so the stage has real work on the i.i.d. fixture
geometry) — and records the stage's wall overhead, the docs it
capped, and the id-only join discipline (no vector ever moves through
the document exchange; the clustering cost is q187's, already priced
in the x-family sweep and `q187_kmeans_k`).

The fixture's embeddings are i.i.d. Gaussian (no semantic modes), so
the default soft cap (2n/k) would drop nothing; the halved cap makes
the measurement exercise the drop path honestly. On real corpora the
stage's selectivity is the boilerplate-mode mass — the e2e pytest
plants exactly that geometry and pins the rebalance.

Writes SCALEPROOF.json section `cluster_mix_stage`.

Usage:
    python tools/cluster_mix_scale_proof.py [DOCS_DIR] [EMB_DIR]
    (defaults: scaledata/z10 docs, scaledata/x10 embeddings)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    d = sys.argv[1] if len(sys.argv) > 1 else "scaledata/z10"
    emb_dir = sys.argv[2] if len(sys.argv) > 2 else "scaledata/x10"
    work = "/tmp/cluster_mix_scale_proof"

    from pyspark.sql import functions as F

    from climate_data_pipelines_spark import get_spark
    from climate_data_pipelines_spark.catalog import load_table, table_rows
    from climate_data_pipelines_spark.plans.llm_curation import curate_corpus

    spark = get_spark(app_name="cluster-mix-scale-proof")
    shutil.rmtree(work, ignore_errors=True)
    os.makedirs(work, exist_ok=True)

    mult = max(1, table_rows(d, "documents") // 5000)
    # the Zipf corpus is the realistic pipeline fixture (the soup
    # fixtures saturate the near-dup stage to ~two dozen survivors —
    # Finding 4 — leaving the stage nothing to cap); it ships no
    # embeddings table, so the x10 embeddings join by id (40% doc
    # coverage: the no-embedding exemption path is measured too)
    emb = load_table(spark, emb_dir, "embeddings").select(
        F.col("vec_id").alias("doc_id"), "embedding"
    )
    n_emb = emb.count()
    k = 16
    cap = max(1, n_emb // (2 * k))  # half the balanced share

    section: dict = {
        "dir": d,
        "emb_dir": emb_dir,
        "n_docs": table_rows(d, "documents"),
        "n_embedded": n_emb,
        "k": k,
        "per_cluster_cap": cap,
    }
    for label, kwargs in (
        ("off", {}),
        (
            "on",
            {
                "cluster_mix_embeddings": emb,
                "cluster_k": k,
                "cluster_iters": 6,
                "cluster_cap": cap,
            },
        ),
    ):
        out_dir = f"{work}/out_{label}"
        t0 = time.perf_counter()
        manifest = curate_corpus(
            spark, d, out_dir, alpha=1.0, bench_stride=mult, **kwargs
        )
        sec = time.perf_counter() - t0
        section[label] = {
            "sec": round(sec, 1),
            "docs_kept": manifest["total_docs"],
            "stage_recorded": bool(manifest["stages"].get("cluster_mix")),
        }
        print(f"{label}: {section[label]}")
    section["stage_overhead_sec"] = round(
        section["on"]["sec"] - section["off"]["sec"], 1
    )
    section["docs_capped"] = (
        section["off"]["docs_kept"] - section["on"]["docs_kept"]
    )
    section["note"] = (
        "stage overhead = q187's k-means cost on the embedded subset "
        "(one Arrow kernel pass + one (cluster,dim) agg per round, 6 "
        "rounds) + two id-only joins; docs without an embedding row "
        "pass through untouched. Increment runs record the stage as "
        "global_only and never re-run it (manifest contract)."
    )

    # planted dominant-mode point: the stage's actual purpose, at the
    # DEFAULT soft cap — 60% of embeddings are the IDENTICAL vector
    # (the boilerplate extreme: near-duplicate pages embed to the same
    # point), the rest spread across 8 rare modes with noise. A loose
    # dominant blob would be subdivided by k-means into under-cap
    # Voronoi cells (measured: only 437/12,000 capped at k=16 — the
    # soft cap is soft by design); an identical-vector mode collapses
    # every centroid seeded inside it to one point, the duplicates
    # empty out, and the r12 distinct-farthest reseed pushes them to
    # the rare modes — leaving the boilerplate mass as ONE cluster the
    # default cap then cuts. This also exercises the reseed path at
    # pipeline scale.
    dim, n_modes = 32, 8
    mode = F.when(F.col("doc_id") % 10 < 6, F.lit(0)).otherwise(
        (F.col("doc_id") % n_modes) + 1
    )
    noise_on = F.when(F.col("_m") == 0, F.lit(0.0)).otherwise(F.lit(1.0))
    planted = (
        load_table(spark, d, "documents")
        .select("doc_id")
        .filter(F.col("doc_id") < 20_000)
        .withColumn("_m", mode)
        .select(
            "doc_id",
            F.transform(
                F.sequence(F.lit(0), F.lit(dim - 1)),
                lambda i: (
                    # center coordinate for this mode (+-3 lattice)...
                    (F.pmod(F.xxhash64(F.col("_m"), i), F.lit(7)) - 3).cast(
                        "double"
                    )
                    # ...plus per-doc noise in [-0.05, 0.05) — zeroed
                    # for the dominant mode (exact-duplicate vectors)
                    + noise_on
                    * (
                        F.pmod(F.xxhash64(F.col("doc_id"), i), F.lit(100))
                        / 1000.0
                        - 0.05
                    )
                ).cast("float"),
            ).alias("embedding"),
        )
        .localCheckpoint(eager=True)
    )
    n_planted = planted.count()
    out_dir = f"{work}/out_planted"
    t0 = time.perf_counter()
    manifest = curate_corpus(
        spark,
        d,
        out_dir,
        alpha=1.0,
        bench_stride=mult,
        cluster_mix_embeddings=planted,
        cluster_k=k,
        cluster_iters=6,
        cluster_cap=None,  # DEFAULT soft cap = ceil(2n/k)
    )
    sec = time.perf_counter() - t0
    default_cap = -(-2 * n_planted // k)
    section["planted_mode_default_cap"] = {
        "sec": round(sec, 1),
        "n_embedded": n_planted,
        "dominant_mode_frac": 0.6,
        "default_cap": default_cap,
        "docs_kept": manifest["total_docs"],
        "docs_capped": section["off"]["docs_kept"] - manifest["total_docs"],
        "note": (
            "60% of embedded docs are the IDENTICAL vector (the "
            "boilerplate extreme) vs the default soft cap ceil(2n/k): "
            "duplicate centroids inside the zero-radius mode empty "
            "out and the distinct-farthest reseed relocates them, so "
            "the mass stays one cluster and the cap cuts it; rare "
            "modes keep everything. A loose dominant blob instead "
            "subdivides into under-cap Voronoi cells (437/12,000 "
            "capped when measured with noise on) — the soft cap is "
            "soft by design, and the tighter the redundancy, the "
            "harder it bites."
        ),
    }
    print(f"planted: {section['planted_mode_default_cap']}")

    out_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "SCALEPROOF.json",
    )
    out = {}
    if os.path.exists(out_path):
        with open(out_path) as fh:
            out = json.load(fh)
    out["cluster_mix_stage"] = section
    with open(out_path, "w") as fh:
        json.dump(out, fh, indent=1)
    print("wrote SCALEPROOF.json section cluster_mix_stage")
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
