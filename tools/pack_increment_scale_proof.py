"""Measure pack_contexts_increment's O(batch) claim (r12 verdict item
3): pack an x100 base corpus (500k docs) once to learn its token
total, then append an x10-sized batch (50k docs) two ways —

  1. ``pack_contexts_increment(batch, base_total)``: the batch's
     spans continue the global token stream from the recorded total;
     only batch text is ever tokenized;
  2. a full ``pack_contexts`` repack over the combined 550k-doc
     corpus — what a pipeline without the increment pays every day.

Both walls are recorded (median of SCALEPROOF_REPEATS noop-sink
runs) plus the parity bit the property test pins, re-checked at
measured scale: the increment's piece rows must equal the full
repack's rows restricted to batch docs — verified DISTRIBUTED via
two exceptAll counts, never a driver collect. Merges a
``pack_increment`` row into SCALEPROOF.json.

Usage:
    python tools/pack_increment_scale_proof.py [scaledata/x100 scaledata/x10]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPEATS = int(os.environ.get("SCALEPROOF_REPEATS", "3"))
BATCH_ID_OFFSET = 10_000_000  # batch ids must sort after every base id
CTX_LEN = 2048


def main() -> None:
    base_dir = sys.argv[1] if len(sys.argv) > 1 else "scaledata/x100"
    batch_dir = sys.argv[2] if len(sys.argv) > 2 else "scaledata/x10"

    from pyspark.sql import functions as F

    from climate_data_pipelines_spark import get_spark
    from climate_data_pipelines_spark.catalog import load_table, table_rows
    from climate_data_pipelines_spark.functions.text import tokens
    from climate_data_pipelines_spark.operators import training

    spark = get_spark(app_name="pack-increment-scale-proof")

    def run_noop(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    base = load_table(spark, base_dir, "documents").select("doc_id", "text")
    batch = load_table(spark, batch_dir, "documents").select(
        (F.col("doc_id") + F.lit(BATCH_ID_OFFSET)).alias("doc_id"), "text"
    )
    union = base.unionByName(batch)
    base_docs = table_rows(base_dir, "documents")
    batch_docs = table_rows(batch_dir, "documents")

    # the recorded continuation point: the base corpus's token total
    # (in production this is the manifest's packing block — here one
    # agg with the SAME tokenizer pack_contexts counts with)
    base_total = int(
        base.agg(F.sum(F.size(tokens("text"))).alias("t")).collect()[0]["t"]
    )
    print(f"base: {base_docs} docs / {base_total} tokens; "
          f"batch: {batch_docs} docs")

    # warmups (plan compile + Arrow spinup), untimed
    run_noop(training.pack_contexts_increment(batch, base_total, CTX_LEN))
    run_noop(training.pack_contexts(union, ctx_len=CTX_LEN))

    inc_s, full_s = [], []
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        run_noop(training.pack_contexts_increment(batch, base_total, CTX_LEN))
        inc_s.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        run_noop(training.pack_contexts(union, ctx_len=CTX_LEN))
        full_s.append(time.perf_counter() - t0)
    inc_sec = statistics.median(inc_s)
    full_sec = statistics.median(full_s)

    # parity at measured scale: increment rows == full-repack rows
    # restricted to batch docs (distributed set equality)
    inc = training.pack_contexts_increment(batch, base_total, CTX_LEN)
    full_batch = training.pack_contexts(union, ctx_len=CTX_LEN).filter(
        F.col("doc_id") >= BATCH_ID_OFFSET
    )
    n_inc = inc.count()
    parity = (
        inc.exceptAll(full_batch).isEmpty()
        and full_batch.exceptAll(inc).isEmpty()
    )
    print(f"increment {inc_sec:.1f}s vs full repack {full_sec:.1f}s; "
          f"{n_inc} batch pieces; parity_ok={parity}")

    row = {
        "base_dir": base_dir,
        "batch_dir": batch_dir,
        "base_docs": base_docs,
        "batch_docs": batch_docs,
        "base_tokens": base_total,
        "ctx_len": CTX_LEN,
        "pieces_batch": n_inc,
        "increment_sec": round(inc_sec, 2),
        "full_repack_sec": round(full_sec, 2),
        "speedup_vs_repack": round(full_sec / inc_sec, 2),
        "parity_ok": bool(parity),
        "repeats": REPEATS,
        "note": (
            "append-only packing continuation (operators/training.py "
            "pack_contexts_increment) vs a full pack_contexts repack "
            "of the combined corpus; the increment tokenizes ONLY the "
            "batch — its data-dependent work is the batch prefix sum "
            "+ span fan-out, never a base re-tokenize — so the wall "
            "gap widens with base/batch ratio. Parity is the property "
            "test's row-identical contract (tests/test_properties.py) "
            "re-checked distributed at this scale."
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
    data["pack_increment"] = row
    with open(out_path, "w") as fh:
        json.dump(data, fh, indent=1)
    print(json.dumps(row, indent=1))
    if not parity:
        print("PARITY FAILURE: increment pieces differ from the full "
              "repack's batch rows", file=sys.stderr)
        sys.exit(1)
    print("wrote SCALEPROOF.json [pack_increment]")


if __name__ == "__main__":
    main()
