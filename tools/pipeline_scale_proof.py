"""Measure the FLAGSHIP curation pipeline with the full r10 stage
recipe ON (VERDICT r10 item 2): the SCALEPROOF ``llm_curation_pipeline``
row predates the gate composition — it measures the r6-era stage list
(quality → dedup → decon → mix → shards). This tool re-measures
``curate_corpus`` with url_dedup + domain_gate + c4 + gopher enabled
at x1/x10/x100 (plus any zipf dir passed), and one gates-on
``curate_increment`` row against the x100 base, writing
``llm_curation_pipeline_gated`` / ``curate_increment_gated`` rows into
SCALEPROOF.json.

Fixture adaptation (recorded in the row): the scale fixtures are
single-line unpunctuated token soups, which the C4 line scrub would
drop to ZERO docs (no line has terminal punctuation), making a
c4-ON measurement vacuous. Each doc's text is therefore reshaped —
tokens re-joined into 8-word lines ending in '.' — with pure JVM
expressions before the corpus is written to the temp sf dir the
pipeline reads. The reshape is deterministic per text, so the
fixture's dup/near-dup structure ("text + ' dup'" trailing-token
copies) is preserved; docs under 3 lines (< ~17 tokens) now FAIL the
C4 minimum — a real, intended selectivity. URLs are synthesized as
``http://d<id %% n_domains>.example.invalid/doc/<id>`` (~50 docs per
domain, so the reputation gate sees real domains).

Increment parity: the recorded invariant is APPEND-ONLY exactness —
the increment preserves every base-run keep and adds only fresh batch
survivors (``append_only_ok``). Exact-TOTALS parity with a
from-scratch rerun does NOT hold on this fixture and is recorded as
such with a divergence breakdown: the x10 batch is an independent
word-soup sample, and on the 30-type soup random batch docs BRIDGE
existing base near-dup clusters — the rerun merges those clusters
(dropping absorbed reps, shifting min-id keepers), which an
append-only increment definitionally never replays. Measured r11:
domain-gate flips 0, every increment-vs-rerun divergence accounted
to merges/rep-shifts. Exact-totals parity for bridge-free batches is
pinned in pytest (tests/test_llm_curation.py). The day-1 batch also
replaces every 10th doc with an EXACT (text, url) copy of its base
counterpart so the URL stage has real cross-day work (ties keep the
smallest id — the base doc — in both routes).

Usage:
    python tools/gen_scale_fixture.py scaledata/x1 1
    python tools/gen_scale_fixture.py scaledata/x10 10
    python tools/gen_scale_fixture.py scaledata/x100 100
    python tools/pipeline_scale_proof.py [--zipf scaledata/z10]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH_ID_OFFSET = 10_000_000
WORDS_PER_LINE = 8

STAGES = "url_dedup + domain_gate + c4 + gopher (containment off)"

GATED_KWARGS = dict(
    alpha=1.0,
    url_col="url",
    domain_gate=True,
    c4=True,
    gopher=True,
)


def _c4_compatible(docs):
    """Reshape soup text into 8-word '.'-terminated lines and attach
    a synthetic URL — all JVM expressions, written once to the temp
    corpus (never timed)."""
    from pyspark.sql import functions as F

    toks = F.filter(F.split("text", r"\s+"), lambda t: t != "")
    n_lines = F.ceil(F.size(toks) / WORDS_PER_LINE).cast("int")
    lines = F.transform(
        F.sequence(F.lit(0), F.greatest(n_lines - 1, F.lit(0))),
        lambda i: F.concat(
            F.array_join(F.slice(toks, i * WORDS_PER_LINE + 1, WORDS_PER_LINE), " "),
            F.lit("."),
        ),
    )
    url = F.concat(
        F.lit("http://d"),
        F.pmod(F.col("doc_id"), F.lit(10_000)).cast("string"),
        F.lit(".example.invalid/doc/"),
        F.col("doc_id").cast("string"),
    )
    return docs.withColumn("text", F.array_join(lines, "\n")).withColumn(
        "url", url
    )


def _write_corpus(spark, docs, out_dir: str) -> None:
    os.makedirs(out_dir, exist_ok=True)
    docs.repartition(32).write.mode("overwrite").parquet(
        f"{out_dir}/documents.parquet"
    )


def main() -> None:
    argv = sys.argv[1:]
    zipf_dir = None
    if "--zipf" in argv:
        i = argv.index("--zipf")
        zipf_dir = argv[i + 1]
        del argv[i : i + 2]
    dirs = argv or ["scaledata/x1", "scaledata/x10", "scaledata/x100"]
    if zipf_dir:
        dirs = dirs + [zipf_dir]
    work = "/tmp/pipeline_scale_proof"

    from pyspark.sql import functions as F

    from climate_data_pipelines_spark import get_spark
    from climate_data_pipelines_spark.catalog import load_table, table_rows
    from climate_data_pipelines_spark.plans.llm_curation import (
        curate_corpus,
        curate_increment,
    )

    spark = get_spark(app_name="pipeline-scale-proof")
    shutil.rmtree(work, ignore_errors=True)

    rows: dict = {"stages": STAGES, "note": (
        "full curate_corpus with the r10 gate recipe ON: url keep-best "
        "-> domain-reputation gate (persisted gate-input stats) -> C4 "
        "line scrub -> quality + Gopher rules -> exact dedup -> "
        "verified near-dup (LSH+Jaccard+CC) -> bloom decon "
        "(bench_stride-pinned) -> temperature mix -> shard sink. "
        "Fixture text reshaped into 8-word '.'-lines (see tool "
        "docstring) so the C4 stage measures real selectivity instead "
        "of vacuously emptying the soup corpus."
    )}
    base_sec = None
    for d in dirs:
        mult = max(1, table_rows(d, "documents") // 5000)
        tmp_sf = f"{work}/{os.path.basename(d.rstrip('/'))}"
        _write_corpus(spark, _c4_compatible(load_table(spark, d, "documents")), tmp_sf)
        out_dir = f"{tmp_sf}_out"
        t0 = time.perf_counter()
        manifest = curate_corpus(
            spark, tmp_sf, out_dir, bench_stride=mult, **GATED_KWARGS
        )
        sec = time.perf_counter() - t0
        rec = {
            "sec": round(sec, 1),
            "docs_in": table_rows(d, "documents"),
            "docs_kept": manifest["total_docs"],
            "tokens": manifest["total_tokens"],
            "shards": manifest["n_shards"],
            "bench_stride": mult,
        }
        if base_sec is None:
            base_sec = sec
        else:
            rec["time_ratio"] = round(sec / base_sec, 2)
        rows[d] = rec
        print(f"{d}: {json.dumps(rec)}")

    # ---- gates-on increment vs the x100 gated base ----
    x100 = "scaledata/x100"
    inc_row = None
    if x100 in dirs:
        base_docs = _c4_compatible(load_table(spark, x100, "documents"))
        batch_nat = (
            _c4_compatible(
                load_table(spark, "scaledata/x10", "documents").filter(
                    F.col("source") != "src0"
                )
            )
            .withColumn("doc_id", F.col("doc_id") + F.lit(BATCH_ID_OFFSET))
        )
        # every 10th batch doc -> EXACT copy of its base counterpart
        # (same text AND same url), so the URL stage has real work and
        # parity stays exact (see module docstring)
        twin_src = base_docs.select(
            (F.col("doc_id") + F.lit(BATCH_ID_OFFSET)).alias("doc_id"),
            F.col("text").alias("_twin_text"),
            F.col("url").alias("_twin_url"),
        )
        batch = (
            batch_nat.join(twin_src, "doc_id", "left")
            .withColumn(
                "text",
                F.when(
                    (F.col("doc_id") % 10 == 0) & F.col("_twin_text").isNotNull(),
                    F.col("_twin_text"),
                ).otherwise(F.col("text")),
            )
            .withColumn(
                "url",
                F.when(
                    (F.col("doc_id") % 10 == 0) & F.col("_twin_url").isNotNull(),
                    F.col("_twin_url"),
                ).otherwise(F.col("url")),
            )
            .drop("_twin_text", "_twin_url")
            .localCheckpoint(eager=True)
        )
        batch_n = batch.count()
        mult = 100
        bench = _c4_compatible(
            load_table(spark, x100, "documents")
        ).filter((F.col("source") == "src0") & (F.col("doc_id") % mult == 0))

        base_out = f"{work}/x100_out"
        t0 = time.perf_counter()
        inc_manifest = curate_increment(spark, batch, base_out, benchmark=bench)
        inc_sec = time.perf_counter() - t0
        print(f"curate_increment(gated, {batch_n} docs): {inc_sec:.1f}s")

        combined_sf = f"{work}/combined"
        _write_corpus(
            spark,
            _c4_compatible(load_table(spark, x100, "documents")).unionByName(batch),
            combined_sf,
        )
        t0 = time.perf_counter()
        full_manifest = curate_corpus(
            spark, combined_sf, f"{work}/combined_out",
            bench_stride=mult, **GATED_KWARGS,
        )
        full_sec = time.perf_counter() - t0
        # the increment's real contract (see module docstring): every
        # base-run keep preserved, only batch-id docs added
        inc_shards = spark.read.parquet(f"{base_out}/shards")
        base_kept_inc = inc_shards.filter(
            F.col("doc_id") < BATCH_ID_OFFSET
        ).count()
        append_only_ok = base_kept_inc == rows[x100]["docs_kept"]
        full_shards = spark.read.parquet(f"{work}/combined_out/shards")
        inc_row = {
            "stages": STAGES,
            "base_docs_in": table_rows(x100, "documents"),
            "batch_docs_in": batch_n,
            "batch_url_twins": "every 10th doc = exact (text,url) copy of base",
            "increment_sec": round(inc_sec, 1),
            "full_rerun_sec": round(full_sec, 1),
            "speedup_vs_rerun": round(full_sec / inc_sec, 2),
            "docs_kept_increment": inc_manifest["total_docs"],
            "docs_kept_full_rerun": full_manifest["total_docs"],
            "base_docs_kept_increment": base_kept_inc,
            "base_docs_kept_rerun": full_shards.filter(
                F.col("doc_id") < BATCH_ID_OFFSET
            ).count(),
            "append_only_ok": append_only_ok,
            "parity_docs_equal": inc_manifest["total_docs"]
            == full_manifest["total_docs"],
        }
        print(json.dumps(inc_row, indent=1))

    out_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "SCALEPROOF.json",
    )
    data = {}
    if os.path.exists(out_path):
        with open(out_path) as fh:
            data = json.load(fh)
    data["llm_curation_pipeline_gated"] = rows
    if inc_row is not None:
        data["curate_increment_gated"] = inc_row
    with open(out_path, "w") as fh:
        json.dump(data, fh, indent=1)
    print("wrote SCALEPROOF.json")
    if inc_row is not None and not inc_row["append_only_ok"]:
        print("APPEND-ONLY CONTRACT FAILURE: the increment dropped or "
              "duplicated base-run keeps")
        sys.exit(1)


if __name__ == "__main__":
    main()
