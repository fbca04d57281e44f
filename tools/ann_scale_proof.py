"""ANN pruning proof on CLUSTERED embeddings (VERDICT r5 item 3).

The main scale proof (tools/scale_proof.py) measures ANN on the
fixture-shaped i.i.d. Gaussian corpus, where every vector is ~orthogonal
to every other and *no index can prune*: q55's candidate fraction sat at
~99% of the corpus at every scale (SCALEPROOF.json, Finding 3). That is
a property of the DATA, not the plans — but it left the engine's
headline ANN claim ("bucketed, not all-pairs") empirically unproven.

This tool measures the same operators on mixture-of-Gaussians corpora
(tools/gen_scale_fixture.py --mog: 64 centers, ~0.92 within-cluster
pairwise cosine, 10% i.i.d. background — the geometry real embedding
corpora have) with CORPUS-DERIVED parameters:

- LSH  (q55 family): n_planes from ``derive_lsh_planes`` (+1 plane per
  corpus doubling), 8 tables, Hamming-1 multiprobe;
- IVF  (q73 family): ``derive_ivf_params`` with the clustered
  ``probe_frac=1/32`` working point (sqrt(N) cells, probe a few %%);
- PQ   (q140 family): m=16 x 256 codes + 8k-wide exact re-rank —
  measured for recall; its candidate set is the full code table by
  design (the PQ win is 16x memory, not row pruning), so its
  "cand_frac" is the re-rank width.

For each dir: recall@10 vs the exact cosine baseline, candidate count,
candidate fraction of (corpus x queries), wall seconds. Results merge
into SCALEPROOF.json under "ann_clustered" (per-dir entries keyed by
basename, preserved across chunked invocations — the x100 run exceeds a
single command window when batched with everything else).

Usage:
    python tools/gen_scale_fixture.py scaledata/mog_x1 1 --mog
    python tools/gen_scale_fixture.py scaledata/mog_x10 10 --mog
    python tools/gen_scale_fixture.py scaledata/mog_x100 100 --mog
    python tools/ann_scale_proof.py scaledata/mog_x1 scaledata/mog_x10
    python tools/ann_scale_proof.py scaledata/mog_x100

Env: ANNPROOF_ONLY — comma-separated method substrings (lsh,ivf,pq)
     to limit a chunked run.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "SCALEPROOF.json",
)


def main() -> None:
    dirs = sys.argv[1:]
    if not dirs:
        raise SystemExit("usage: ann_scale_proof.py MOG_DIR [MOG_DIR ...]")
    only = [s for s in os.environ.get("ANNPROOF_ONLY", "").split(",") if s]

    from climate_data_pipelines_spark import get_spark
    from climate_data_pipelines_spark.catalog import load_table, table_rows
    from climate_data_pipelines_spark.operators import similarity
    from climate_data_pipelines_spark.queries import _query_vectors

    spark = get_spark(app_name="ann-scale-proof")

    out: dict = {}
    if os.path.exists(OUT_PATH):
        with open(OUT_PATH) as fh:
            out = json.load(fh)
    blk = out.setdefault("ann_clustered", {})
    blk["fixture"] = (
        "gen_scale_fixture --mog: 64 centers, ~0.92 within-cluster "
        "pairwise cosine, 10% iid background, dim 64"
    )

    def recall_and_stats(name, d, topk_fn, cand_fn):
        n_vec = table_rows(d, "embeddings")
        emb = load_table(spark, d, "embeddings")
        q = _query_vectors(spark, d)
        exact: dict = {}
        for r in similarity.cosine_topk(emb, q, k=10).collect():
            exact.setdefault(r["query_id"], set()).add(r["vec_id"])
        approx: dict = {}
        t0 = time.perf_counter()
        for r in topk_fn(emb, q).collect():
            approx.setdefault(r["query_id"], set()).add(r["vec_id"])
        sec = time.perf_counter() - t0
        hits = sum(len(exact[k_] & approx.get(k_, set())) for k_ in exact)
        total = sum(len(v) for v in exact.values())
        n_cand = cand_fn(emb, q, n_vec, len(exact))
        entry = {
            "recall@10": round(hits / total, 3) if total else 0.0,
            "candidates": n_cand,
            "corpus": n_vec,
            "cand_frac": round(n_cand / (n_vec * max(1, len(exact))), 4),
            "sec": round(sec, 3),
        }
        blk.setdefault(name, {})[os.path.basename(d.rstrip("/"))] = entry
        print(f"{name} {d}: recall@10={entry['recall@10']} "
              f"cand_frac={entry['cand_frac']:.2%} sec={entry['sec']}")

    for d in dirs:
        n_vec = table_rows(d, "embeddings")

        if not only or any(s in "lsh" for s in only):
            n_planes = similarity.derive_lsh_planes(n_vec, 8)
            blk.setdefault("lsh", {})[
                f"derived_planes_{os.path.basename(d.rstrip('/'))}"
            ] = n_planes
            recall_and_stats(
                "lsh", d,
                lambda emb, q: similarity.ann_lsh_topk(
                    emb, q, k=10, n_planes=None, n_tables=8,
                    multiprobe_bits=1, corpus_n=n_vec,
                ),
                # k wider than any candidate set -> row count IS the
                # distinct candidate count
                lambda emb, q, n, nq: similarity.ann_lsh_topk(
                    emb, q, k=1 << 30, n_planes=None, n_tables=8,
                    multiprobe_bits=1, corpus_n=n_vec,
                ).count(),
            )

        if not only or any(s in "ivf" for s in only):
            n_cells, n_probe = similarity.derive_ivf_params(
                n_vec, probe_frac=1.0 / 32.0
            )
            blk.setdefault("ivf", {})[
                f"derived_params_{os.path.basename(d.rstrip('/'))}"
            ] = [n_cells, n_probe]
            recall_and_stats(
                "ivf", d,
                lambda emb, q: similarity.ann_ivf_topk(
                    emb, q, k=10, n_cells=None, n_probe=None,
                    corpus_n=n_vec, probe_frac=1.0 / 32.0,
                ),
                lambda emb, q, n, nq: similarity.ann_ivf_topk(
                    emb, q, k=1 << 30, n_cells=None, n_probe=None,
                    corpus_n=n_vec, probe_frac=1.0 / 32.0,
                ).count(),
            )

        if not only or any(s in "pq" for s in only):
            # Re-rank width is PQ's recall knob: ADC quantization error
            # is fixed while within-cluster neighbor gaps shrink as
            # clusters densify, so the exact re-rank must cover the
            # growing confusion set. ~0.16% of the corpus per query
            # (floor 8x k) measured: recall 1.0 at x1/x10 vs 0.567 with
            # the fixed 8x width at x10. Still a constant ~1.6%
            # cand_frac — the PQ story stays "16x memory + tiny exact
            # tail", never a full raw-vector scan.
            rf = max(8, -(-n_vec // 625))  # rf*k = 1.6% of corpus
            blk.setdefault("pq", {})[
                f"rerank_factor_{os.path.basename(d.rstrip('/'))}"
            ] = rf
            recall_and_stats(
                "pq", d,
                lambda emb, q: similarity.pq_topk(
                    emb, q, k=10, rerank_factor=rf
                ),
                # PQ's ADC pass scans every CODE row by design (the win
                # is 16x memory, not row pruning); the raw-vector reads
                # are the re-rank tail — the honest "candidate" count,
                # sized by the ACTUAL query count (r6 review finding)
                lambda emb, q, n, nq, _rf=rf: _rf * 10 * nq,
            )

    with open(OUT_PATH, "w") as fh:
        json.dump(out, fh, indent=1)
    print("wrote SCALEPROOF.json (ann_clustered)")


if __name__ == "__main__":
    main()
