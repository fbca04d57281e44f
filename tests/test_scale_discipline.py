"""Automated scale-discipline checks over the whole query registry
(SURVEY.md §2.11 '100 TB design rule'): the rules SCALE.md claims are
enforced here, not just documented."""

from __future__ import annotations

import pytest

from climate_data_pipelines_spark.queries import REGISTRY

# Queries whose PURPOSE is the Python-execution surface (Arrow-batched
# pandas UDFs / UDTFs) — everything else must stay fully JVM-side.
PYTHON_SURFACE = {
    "q34_python_udf",
    "q54_image_features",  # mapInPandas multimodal decode
    "q56_pandas_udf",
    "q57_grouped_pandas",
    "q72_minhash_lsh_ml",  # MLlib MinHashLSH model fit
    "q88_hll_sketch_merge",
    "q89_udtf_sentences",
    "q91_cogrouped_asof",
    "q131_compression_ratio",  # zlib DEFLATE pandas_udf (byte codec)
    "q55_ann_lsh_topk",  # one-matmul LSH signature kernel (Arrow)
    "q135_mvt_tiles",  # per-tile MVT protobuf encode (applyInPandas)
    "q140_pq_ann_topk",  # PQ sub-code encode kernel (Arrow); ADC scan
    # itself is expression-only
    "q144_audio_features",  # WAV fixture render + decode (mapInPandas)
    "q155_jpeg_features",  # baseline-JPEG decode (mapInPandas byte codec)
    "q157_video_features",  # Y4M video decode (mapInPandas byte codec)
    "q158_frame_sample",  # Y4M frame sampling (mapInPandas byte codec)
    "q172_avi_mjpeg_frames",  # MJPEG-in-AVI decode (mapInPandas byte
    # codec: RIFF walk + per-frame baseline JPEG)
    "q174_warc_ingest",  # WARC record walk (mapInPandas byte codec —
    # no JVM WARC reader exists; the HTML→text chain after it is
    # expression-only, asserted by tools/explain_audit.py)
    "q164_bpe_tokenize_ranked",  # ranked-merge BPE kernel (Arrow,
    # broadcast pair->rank dict — the 32k-vocab path)
    "q166_semantic_decontaminate",  # one-matmul LSH signature kernel
    # (Arrow) stays live on the TRAIN side: the big corpus pipelines
    # scan->sig->join without materializing a bucket table
    "q187_kmeans_mix",  # k-means assignment kernel (Arrow matmul+
    # argmin — the _lsh_signatures exception rule); since the r11
    # checkpoint fix the FINAL plan scans the materialized assignment
    # table and shows no EvalPython node, but the kernel is this
    # operator's declared Python surface either way
    "q188_pca_project",  # sufficient-statistics kernel (mapInPandas:
    # (n, sum, gram) per partition) + Arrow projection matmul
}

# Iterative/recursive queries execute jobs during plan construction
# (connected components' convergence loop) — exclude from the cheap
# plan-string sweep to keep the test fast; they have their own tests.
SLOW_CONSTRUCTION = {
    "q90_dedup_clusters",
    "q161_pagerank",
    "q162_bpe_merges",
    "q163_bpe_tokenize",
    "q164_bpe_tokenize_ranked",
    "q167_image_neardup",  # decode+hash pass checkpointed at construction
    "q169_audio_neardup",  # same shape, WAV energy-envelope hash
    "q170_video_neardup",  # same shape, Y4M brightness-profile hash
    "q187_kmeans_mix",  # 6 Lloyd rounds (collects + localCheckpoints)
    # run at plan-construction time; plan claims covered by
    # tools/explain_audit.py + tests/test_similarity.py
    "q188_pca_project",  # PCA sufficient-stats aggregate runs at
    # construction; same coverage as q187
}


@pytest.fixture(scope="module")
def plans(spark, sf_dir):
    out = {}
    for name, spec in REGISTRY.items():
        if name in SLOW_CONSTRUCTION:
            continue
        df = spec.fn(spark, sf_dir)
        out[name] = df._jdf.queryExecution().executedPlan().toString()
    return out


def test_no_python_execution_outside_declared_surface(plans):
    offenders = [
        name
        for name, plan in plans.items()
        if name not in PYTHON_SURFACE
        and ("EvalPython" in plan or "FlatMapGroupsInPandas" in plan
             or "MapInPandas" in plan or "PythonUDTF" in plan)
    ]
    assert offenders == [], f"Python execution nodes leaked into: {offenders}"


def test_no_cartesian_products(plans):
    # cross joins must be explicit broadcast probes, never a
    # CartesianProduct shuffle (the 100x100 TB accident)
    offenders = [n for n, p in plans.items() if "CartesianProduct" in p]
    assert offenders == [], f"CartesianProduct in: {offenders}"


def test_global_sorts_only_with_limits(plans):
    # a global Sort (non-partial) is only acceptable under a limit
    # (TakeOrderedAndProject) or for explicitly-declared ordered output
    ALLOWED_GLOBAL_SORT = {"q21_sort_limit"}
    offenders = []
    for name, plan in plans.items():
        if name in ALLOWED_GLOBAL_SORT:
            continue
        for line in plan.splitlines():
            s = line.strip().lstrip("+-:* ")
            if s.startswith("Sort ") and "false, 0" not in line:
                offenders.append(name)
                break
    assert offenders == [], f"unexpected global sort in: {offenders}"


def test_driver_window_covers_priority_queries():
    # the verification driver checks the FIRST 50 entries of
    # __spark_entry__.queries() per round; pin the round-3 window so a
    # stray registration cannot silently evict a priority query
    import __spark_entry__ as entry_mod
    from climate_data_pipelines_spark.queries import DRIVER_WINDOW

    assert len(DRIVER_WINDOW) == 50
    assert len(set(DRIVER_WINDOW)) == 50
    assert all(n in REGISTRY for n in DRIVER_WINDOW)
    # the exported dict (what the driver consumes) leads with the window
    exported = list(entry_mod.queries())
    assert exported[: len(DRIVER_WINDOW)] == DRIVER_WINDOW
    assert set(exported) == set(REGISTRY)
    # REGISTRY itself stays in definition order (no import-time
    # reordering — round-2 advice): q01 is the first registration
    assert next(iter(REGISTRY)).startswith("q01")
    # round 3 deliberately admits the rows-only-by-design queries
    # (q34/q42/q54/q55/q59/q69/q73/q84, plus the new q126) — they have
    # never had ANY driver row and the weaker rows-only check is still
    # a driver row; cap the spend so oracle slots stay the majority
    weak = [n for n in DRIVER_WINDOW if REGISTRY[n].oracle is None]
    assert len(weak) <= 9, f"too many rows-only window slots: {weak}"


def test_every_rows_only_query_has_replay_invariant():
    # the replay harness's verdict for an oracle-less query is only as
    # strong as its invariant: every rows-only registry entry must be
    # gated (r7 closed the 11 grandfathered r1–r4 gaps; this pins the
    # discipline for future registrations)
    from climate_data_pipelines_spark.invariants import INVARIANTS

    rows_only = {n for n, s in REGISTRY.items() if s.oracle is None}
    ungated = sorted(rows_only - set(INVARIANTS))
    assert ungated == [], f"rows-only queries without invariants: {ungated}"
    stale = sorted(set(INVARIANTS) - set(REGISTRY))
    assert stale == [], f"invariants for unknown queries: {stale}"


def test_repetition_ratio_is_linear_per_row(plans):
    # the Gopher repetition signal must not be the O(distinct·n)
    # nested loop (filter-per-distinct-gram): the linear form has no
    # ArrayFilter inside an ArrayTransform over the gram array —
    # assert the plan carries the run-length aggregate and no
    # lambda-filter-count shape
    plan = plans["q81_repetition_ratio"]
    assert "aggregate(array_sort(" in plan.replace(" ", "").lower() or "aggregate" in plan.lower()
    # the quadratic form compiled to transform(array_distinct(...),
    # ... size(filter(...))) — reject its signature outright
    assert "array_distinct" not in plan, "quadratic distinct-gram loop is back"
