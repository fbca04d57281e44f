"""Measure curate_increment's O(batch) claim against a full re-run
(VERDICT r6 next-step 5): day-0 curates an x100 base corpus (500k
docs), day-1 appends an x10-sized batch (50k docs) two ways —

  1. ``curate_increment``: the new batch is quality-gated, deduped
     within itself, exact- and near-dup-deduped AGAINST the base
     (digest anti-join + cross-corpus LSH; the base text never
     reshuffles), decontaminated, and appended as new shards;
  2. a from-scratch ``curate_corpus`` over the combined 550k-doc
     universe — what a pipeline without an incremental path pays
     every day.

The increment must cost O(batch + base-bucket-probe), not O(total):
the recorded row is the two wall times plus a parity check that both
routes keep the SAME number of surviving documents (alpha=1.0
isolates dedup semantics — mixing is global and intentionally not
re-run per increment; equivalence classes match by
tests/test_llm_curation.py::test_curate_increment_matches_full_rerun,
so the totals must too, even when the two routes elect different
representatives). Merges a ``curate_increment`` row into
SCALEPROOF.json.

Usage:
    python tools/gen_scale_fixture.py scaledata/x100 100
    python tools/gen_scale_fixture.py scaledata/x10 10
    python tools/increment_scale_proof.py scaledata/x100 scaledata/x10
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH_ID_OFFSET = 10_000_000  # namespace day-1 ids (global-id precondition)


def main() -> None:
    base_dir = sys.argv[1] if len(sys.argv) > 1 else "scaledata/x100"
    batch_dir = sys.argv[2] if len(sys.argv) > 2 else "scaledata/x10"
    work = sys.argv[3] if len(sys.argv) > 3 else "/tmp/increment_scale_proof"

    from pyspark.sql import functions as F

    from climate_data_pipelines_spark import get_spark
    from climate_data_pipelines_spark.catalog import load_table, table_rows
    from climate_data_pipelines_spark.plans.llm_curation import (
        curate_corpus,
        curate_increment,
    )

    spark = get_spark(app_name="increment-scale-proof")
    mult = max(1, table_rows(base_dir, "documents") // 5000)
    shutil.rmtree(work, ignore_errors=True)
    os.makedirs(work, exist_ok=True)

    # ---- day 0: full curation of the base corpus ----
    t0 = time.perf_counter()
    base_manifest = curate_corpus(
        spark, base_dir, f"{work}/base", alpha=1.0, bench_stride=mult
    )
    day0_sec = time.perf_counter() - t0
    print(f"day0 curate_corpus({base_dir}): {day0_sec:.1f}s, "
          f"{base_manifest['total_docs']} docs kept")

    # ---- the day-1 batch: x10-shaped, ids namespaced, no bench docs
    # (the eval set is fixed — real benchmarks don't grow with the
    # crawl; keeping src0 out of the batch makes the combined
    # universe's bench identical to day-0's) ----
    batch = (
        load_table(spark, batch_dir, "documents")
        .filter(F.col("source") != "src0")
        .withColumn("doc_id", F.col("doc_id") + F.lit(BATCH_ID_OFFSET))
    )
    batch_n = batch.count()
    bench = load_table(spark, base_dir, "documents").filter(
        (F.col("source") == "src0") & (F.col("doc_id") % mult == 0)
    )

    # ---- route 1: the increment ----
    t0 = time.perf_counter()
    inc_manifest = curate_increment(
        spark, batch, f"{work}/base", alpha=1.0, benchmark=bench
    )
    inc_sec = time.perf_counter() - t0
    print(f"curate_increment({batch_n} new docs): {inc_sec:.1f}s, "
          f"combined manifest {inc_manifest['total_docs']} docs")

    # ---- route 2: from-scratch re-run over the combined universe ----
    combined_dir = f"{work}/combined"
    os.makedirs(combined_dir, exist_ok=True)
    (
        load_table(spark, base_dir, "documents")
        .unionByName(batch)
        .repartition(32)
        .write.mode("overwrite")
        .parquet(f"{combined_dir}/documents.parquet")
    )
    t0 = time.perf_counter()
    full_manifest = curate_corpus(
        spark, combined_dir, f"{work}/full_rerun", alpha=1.0,
        bench_stride=mult,
    )
    full_sec = time.perf_counter() - t0
    print(f"full curate_corpus(combined): {full_sec:.1f}s, "
          f"{full_manifest['total_docs']} docs kept")

    parity = inc_manifest["total_docs"] == full_manifest["total_docs"]
    row = {
        "base_dir": base_dir,
        "batch_dir": batch_dir,
        "base_docs_in": table_rows(base_dir, "documents"),
        "batch_docs_in": batch_n,
        "day0_sec": round(day0_sec, 1),
        "increment_sec": round(inc_sec, 1),
        "full_rerun_sec": round(full_sec, 1),
        "speedup_vs_rerun": round(full_sec / inc_sec, 2),
        "docs_kept_increment": inc_manifest["total_docs"],
        "docs_kept_full_rerun": full_manifest["total_docs"],
        "parity_docs_equal": parity,
        "note": (
            "day-N append via digest anti-join + cross-corpus LSH vs "
            "from-scratch curate_corpus over the combined universe; "
            "alpha=1.0 isolates dedup semantics (mixing is global by "
            "design). Equal survivor totals = both routes keep one "
            "representative per equivalence class (parity test: "
            "tests/test_llm_curation.py). The increment reads base "
            "dedup state from the PERSISTED index (digests + MinHash "
            "signatures written at curate_corpus time) — its only "
            "data-dependent work is the batch scan + index joins, "
            "never a base-corpus re-scan/re-hash; at fixture scale "
            "both routes are stage-overhead-bound, so the wall ratio "
            "understates the asymptotic batch/corpus advantage."
        ),
    }
    out_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "SCALEPROOF.json",
    )
    data = {}
    if os.path.exists(out_path):
        with open(out_path) as fh:
            data = json.load(fh)
    # key by batch size so the O(batch) claim accumulates POINTS
    # (r7 verdict item 9: a single x10-on-x100 row can't distinguish
    # O(batch) from O(total·const)); the legacy unsuffixed key keeps
    # naming continuity for the x10 batch
    key = "curate_increment"
    if os.path.basename(batch_dir.rstrip("/")) != "x10":
        key = f"curate_increment_{os.path.basename(batch_dir.rstrip('/'))}"
    data[key] = row
    with open(out_path, "w") as fh:
        json.dump(data, fh, indent=1)
    print(json.dumps(row, indent=1))
    if not parity:
        print("PARITY FAILURE: increment and full re-run kept different "
              "survivor counts", file=sys.stderr)
        sys.exit(1)
    print("wrote SCALEPROOF.json [curate_increment]")


if __name__ == "__main__":
    main()
