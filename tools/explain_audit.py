"""Plan audit: dump `.explain("formatted")` for the headline queries
and grep them for the scale invariants SCALE.md claims.

Usage: python tools/explain_audit.py [sf_dir] > docs/PLANS.md

For each audited query it records the formatted physical plan plus a
PASS/WARN line per invariant:
  - scans project only needed columns (ReadSchema, no SELECT *);
  - filters reach the parquet scan (PushedFilters non-empty when the
    query filters base columns);
  - small dimensions broadcast (BroadcastHashJoin) where expected;
  - aggregates are partial+final (two HashAggregate levels);
  - no CollectLimit/driver materialization inside the plan.
"""

from __future__ import annotations

import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

AUDITS = {
    # name -> invariants to grep for (substring, must_be_present)
    "q02_time_range": [("PushedFilters: [IsNotNull(l_shipdate), GreaterThanOrEqual", True)],
    "q09_multiway_join": [("BroadcastHashJoin", True)],
    "q17_agg_suite": [("HashAggregate", True), ("Exchange", True)],
    "q23_topk_per_group": [("WindowGroupLimit", True)],
    "q36_exact_dedup": [("HashAggregate", True)],
    "q38_cosine_topk": [("BroadcastNestedLoopJoin", True)],
    "q41_minhash_signatures": [("HashAggregate", True)],
    "q74_salted_skew_join": [("BroadcastHashJoin", True)],
    "q76_tile_rollup": [("HashAggregate", True)],
    "q85_merge_upsert": [("Union", True)],
    # max_by's non-primitive agg buffer rules out HashAggregateExec;
    # partial+final SortAggregate is the expected plan (still one
    # key-bounded shuffle, no window sort of each key's full history)
    "q86_latest_per_key": [("SortAggregate", True), ("Window", False)],
    # station dim broadcast: nested-loop probe of a tiny table, then a
    # key-grouped arg-min — no CartesianProduct shuffle
    "q101_nearest_station": [("BroadcastNestedLoopJoin", True), ("CartesianProduct", False)],
    "q102_anomaly": [("Window", True), ("Join", False)],
    "q104_time_weighted_avg": [("Window", True), ("Join", False)],
    # benchmark shingles broadcast; the train side must not shuffle on
    # the shingle key (no SortMergeJoin anywhere in the plan)
    "q106_decontaminate": [("BroadcastHashJoin LeftSemi", True), ("SortMergeJoin", False)],
    # vocabulary dim broadcasts; per-doc argmax is an agg, not a window
    "q109_tfidf_top_term": [("BroadcastHashJoin", True), ("Window", False)],
    # single partial+final agg, no window sort
    "q110_per_key_trend": [("HashAggregate", True), ("Window", False)],
    # global top-k must plan as a per-partition take + driver merge,
    # never a full global sort
    "q111_vocab_topk": [("TakeOrderedAndProject", True), ("Sort ", False)],
    # centroid agg is keyed on (label, dim) — no window, no collect
    "q113_label_centroids": [("HashAggregate", True), ("Window", False)],
    # one lazy plan: the only wide exchange is the dedup digest agg
    "q114_corpus_curation": [("HashAggregate", True), ("Window", False)],
    # linear repetition ratio: no distinct-gram nested loop in the plan
    "q81_repetition_ratio": [("array_distinct", False)],
    # fractional upsample: stateless projection + explode, no join
    "q117_fractional_upsample": [("Join", False), ("Exchange", False)],
    # bigram LM: vocab dims broadcast under AQE at this sf; the doc
    # score is a keyed agg, not a window over the exploded table
    "q118_bigram_lm_score": [("HashAggregate", True), ("Window", False)],
    # line dedup: keeper via min-struct agg (SortAggregate — struct
    # buffer), NOT a row_number window over the whole corpus
    "q119_line_dedup": [("Window", False)],
    # chunker: bounded explode + keyed agg, no window
    "q120_chunk_windows": [("Window", False)],
    # simhash: ONE vote aggregate on doc_id, no window, no join
    "q123_simhash_fingerprints": [("HashAggregate", True), ("Window", False), ("Join", False)],
    # mixture sampling: targets + scalar total broadcast; corpus never
    # shuffled (no exchange keyed on the corpus side before the filter
    # — the only exchanges feed the tiny rate dim)
    "q125_token_budget_mix": [("BroadcastHashJoin", True), ("Window", False)],
    # repeated n-grams: digest-keyed aggs; no window over the corpus
    "q127_repeated_ngrams": [("HashAggregate", True), ("Window", False)],
    # percentile selection: 1-row threshold broadcast back via a
    # nested-loop probe; no window, no corpus shuffle
    "q128_quality_select": [("BroadcastNestedLoopJoin", True), ("Window", False)],
    # minhash at production width: same single-shuffle signature agg
    # shape as q41 — 8 salted digests, no window, banded equi-join
    "q129_minhash64_candidates": [("HashAggregate", True), ("Window", False)],
    # land mask: packaged coastline dim broadcast left-semi joined
    "q92_land_mask_grid": [("BroadcastHashJoin LeftSemi", True)],
    # PNG decode: Arrow-batched python stages, no shuffle in the plan
    "q54_image_features": [("MapInPandas", True), ("Exchange", False)],
    # graded contamination: benchmark shingles broadcast, the train
    # side never shuffles on the shingle key
    "q130_contamination_rate": [("BroadcastHashJoin", True), ("SortMergeJoin", False)],
    # substring spans: digest-keyed aggs + hit-only windows, no
    # cartesian anywhere
    "q132_repeated_spans": [("HashAggregate", True), ("CartesianProduct", False)],
    # DSIR weights: the log-ratio feature dim broadcasts; the raw
    # corpus is never sort-merge joined on the bucket key
    "q133_dsir_weights": [("BroadcastHashJoin", True), ("SortMergeJoin", False)],
    # sessionization: lag window + island sum + session agg all reuse
    # ONE user_id hash partitioning; the agg must not add an exchange
    # (exactly-one-exchange is pinned by tests/test_sessions.py)
    "q137_sessionize": [("Window", True), ("Exchange", True)],
    # stratified sample: stateless per-row hash predicate — no
    # shuffle, no join, nothing but scan+filter
    "q138_stratified_sample": [("Exchange", False), ("Join", False)],
    # bloom decontamination: every probe join broadcasts (the
    # position dims and the exact shingle set); no sort-merge join
    "q139_bloom_decontaminate": [("BroadcastHashJoin LeftSemi", True), ("SortMergeJoin", False)],
    # domain cap: one group exchange + window rank, no join
    "q142_domain_cap": [("Window", True), ("Join", False)],
    # quality calibration: percent_rank window per lang; the score
    # join stays broadcast at this sf (docs dim is small), and no
    # global sort appears (window sort is per-partition)
    "q143_quality_calibrate": [("Window", True), ("CartesianProduct", False)],
    # ranked-BPE tokenize: one Arrow kernel, narrow projection — no
    # shuffle, no join (the train phase runs before the plan exists)
    "q164_bpe_tokenize_ranked": [
        ("ArrowEvalPython", True), ("Exchange", False), ("Join", False),
    ],
    # binned range join: the interval containment must plan as an
    # EQUI-join on the bin key, never a nested-loop/cartesian
    "q165_binned_range_join": [
        ("BroadcastNestedLoopJoin", False), ("CartesianProduct", False),
        ("HashAggregate", True),
    ],
    # temperature mix: the derived-target normalization is a window
    # over the |domains|-row table; the corpus side must join its
    # keep-rate dim broadcast, never sort-merge shuffle on source
    "q168_temperature_mix": [
        ("BroadcastHashJoin", True), ("SortMergeJoin", False),
    ],
    # trainable classifier scoring: the (dim+1)-row weight table must
    # broadcast onto the feature rows (a shuffle join of weights
    # against a 100 TB feature table would be wrong), and the margin
    # sum is a partial+final agg on the doc key
    "q173_quality_classifier": [
        ("BroadcastHashJoin", True), ("HashAggregate", True),
    ],
    # WARC ingest: one Arrow record-walk kernel; the HTML→text chain
    # is expressions after it (no extra Python eval), no join anywhere
    "q174_warc_ingest": [
        ("ArrowEvalPython", False), ("FlatMapGroupsInPandas", True),
        ("MapInPandas", True), ("Join", False),
    ],
    # URL dedup: the whole normalize chain must fold into ONE project
    # (no Python eval), and the keep-best must be the single-exchange
    # partial+final min_by aggregate — never the naive corpus window
    "q175_url_dedup": [
        ("Window", False), ("EvalPython", False),
        ("partial_min_by", True), ("Join", False),
    ],
    # containment verify: candidate pairs from the banded equi-join,
    # never an all-pairs product
    "q176_containment_neardup": [
        ("CartesianProduct", False), ("BroadcastNestedLoopJoin", False),
    ],
    # trigram LM: all five count-dim probes broadcast while the vocab
    # fits (AQE decides), no all-pairs anywhere; the one BNLJ is the
    # 1-row n_total broadcast cross join — cheap by construction
    "q177_trigram_lm_score": [
        ("BroadcastHashJoin", True), ("CartesianProduct", False),
        ("EvalPython", False),
    ],
    # capped simhash: the salted band join stays a hash equi-join —
    # the salt/width window runs over (band,bv) keys, and no product
    # node may appear even on degenerate hot values
    "q178_simhash_capped_candidates": [
        ("Window", True), ("CartesianProduct", False),
        ("BroadcastNestedLoopJoin", False), ("EvalPython", False),
    ],
    # small-in-large containment: the visible (post-checkpoint) plan
    # is the verify — the b_ids endpoint semi-join is CORRECTLY a
    # sort-merge (the endpoint set is candidate-derived, unbounded by
    # design, never broadcast), the array verify is pure expressions,
    # and no product node may appear. The broadcast prefix-set
    # semi-join lives inside the checkpointed candidate stage (hint
    # verified separately; it cannot show in this plan).
    "q179_small_in_large_containment": [
        ("SortMergeJoin LeftSemi", True), ("CartesianProduct", False),
        ("BroadcastNestedLoopJoin", False), ("EvalPython", False),
    ],
    # corpus datasheet: one partial+final aggregate pass — no window,
    # no join, no Python
    "q180_corpus_datasheet": [
        ("HashAggregate", True), ("Window", False), ("Join", False),
        ("EvalPython", False),
    ],
    # r11: the final selection plan must scan the materialized
    # assignment checkpoint (NO re-run of the Arrow assignment
    # kernel — it appeared three times before the checkpoint fix)
    # and prune map-side before its one cluster-keyed exchange
    "q187_kmeans_mix": [
        ("WindowGroupLimit", True), ("EvalPython", False),
        ("BroadcastHashJoin", True),
    ],
    # r11: projection is the declared Arrow kernel; the fit's
    # sufficient-statistics pass happens before this plan, so the
    # output plan is kernel + string projection, no join/window
    "q188_pca_project": [
        ("ArrowEvalPython", True), ("Window", False), ("Join", False),
    ],
    # r12: context packing — prefix sum must be the hierarchical plan
    # (partitioned window + broadcast offsets), the span fan-out a
    # pure-expression explode; no Python, no product joins
    "q189_context_packing": [
        ("Window", True), ("BroadcastHashJoin", True),
        ("Generate", True), ("EvalPython", False),
        ("CartesianProduct", False), ("BroadcastNestedLoopJoin", False),
    ],
    # r12: sequence manifest — one seq-keyed aggregate over the
    # packing (ObjectHashAggregate: collect_list buffer); bounded
    # groups, no Python, no product joins
    "q190_sequence_manifest": [
        ("ObjectHashAggregate", True), ("EvalPython", False),
        ("CartesianProduct", False), ("BroadcastNestedLoopJoin", False),
    ],
    # r13: leakage-safe split — everything above the md5 bucketing is
    # the q122 verified-CC machinery (already audited there); the
    # split itself must add NO Python and no product joins
    "q191_leakage_safe_split": [
        ("EvalPython", False),
        ("CartesianProduct", False), ("BroadcastNestedLoopJoin", False),
    ],
    # r13: length-bucketed batching — the in-bucket rank must be the
    # hierarchical plan (partitioned window + broadcast block
    # offsets), never a per-bucket corpus-sized window; no Python,
    # no product joins
    "q192_length_bucket_batches": [
        ("Window", True), ("BroadcastHashJoin", True),
        ("EvalPython", False),
        ("CartesianProduct", False), ("BroadcastNestedLoopJoin", False),
    ],
}


def formatted_plan(df) -> str:
    jdf = df._jdf
    return jdf.queryExecution().explainString(
        df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    from climate_data_pipelines_spark import get_spark
    from climate_data_pipelines_spark.queries import REGISTRY

    spark = get_spark(app_name="explain_audit")
    out = io.StringIO()
    out.write("# Physical-plan audits (generated by tools/explain_audit.py)\n\n")
    out.write(f"Scale factor dir: `{sf_dir}`. Invariants per SCALE.md.\n")
    for name, invariants in AUDITS.items():
        df = REGISTRY[name].fn(spark, sf_dir)
        plan = formatted_plan(df)
        out.write(f"\n## {name}\n\n")
        for needle, want in invariants:
            ok = (needle in plan) == want
            out.write(f"- {'PASS' if ok else 'WARN'}: `{needle}` "
                      f"{'present' if want else 'absent'}\n")
        out.write("\n```\n")
        # keep the doc reviewable: first 60 lines of the formatted plan
        out.write("\n".join(plan.splitlines()[:60]))
        out.write("\n```\n")
    print(out.getvalue())


if __name__ == "__main__":
    main()
