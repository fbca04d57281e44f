"""Price the SemDeDup composition (r12 verdict item 6): the
project-then-cluster recipe the q187/q188 docstrings sell — fit PCA
at embedding width (dim 768), project to a small dim, k-means the
projections — measured END-TO-END against clustering the raw dim-768
vectors directly, on one corpus with planted structure:

- fixture: 50k deterministic hash-seeded dim-768 vectors, 8 planted
  modes (per-mode center + small per-vector noise) — no driver data,
  no RNG state;
- route A (raw): kmeans_clusters(k=64, iters=6) on dim 768;
- route B (composed): pca_fit(n_components=16) + pca_project +
  kmeans_clusters(k=64, iters=6) on the dim-16 projections.

Both routes' assignments are scored in the SAME space so the quality
trade is honest: RAW-space within-cluster inertia (Σ|x-μ_c|², from
one (cluster,dim)-keyed agg of sums/squares — k·dim driver rows) and
planted-mode purity (majority-mode share per cluster, k×8 rows).
Merges a ``pca_kmeans_compose`` row into SCALEPROOF.json.

Usage:
    python tools/pca_kmeans_compose_proof.py [n_vectors]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DIM = 768
PROJ_DIM = 16
K = 64
ITERS = 6
N_MODES = 8


def main() -> None:
    n_vec = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000

    from pyspark.sql import functions as F

    from climate_data_pipelines_spark import get_spark
    from climate_data_pipelines_spark.operators import similarity

    spark = get_spark(app_name="pca-kmeans-compose-proof")

    # 8-mode planted corpus: center[d] per mode in [-1, 1), noise in
    # [-0.1, 0.1) — hash-seeded expressions, generated distributed
    mode = F.pmod(F.xxhash64(F.col("id")), F.lit(N_MODES))
    vecs = (
        spark.range(n_vec)
        .select(
            F.col("id").alias("vec_id"),
            F.transform(
                F.sequence(F.lit(0), F.lit(DIM - 1)),
                lambda i: (
                    F.pmod(F.xxhash64(mode, i), F.lit(2000)).cast("double")
                    / 1000.0
                    - 1.0
                    + (
                        F.pmod(F.xxhash64(F.col("id"), i, F.lit("n")),
                               F.lit(1000)).cast("double")
                        / 5000.0
                        - 0.1
                    )
                ).cast("float"),
            ).alias("embedding"),
        )
        .repartition(64)
        .localCheckpoint(eager=True)  # time the routes, not the gen
    )

    def raw_space_scores(assigned) -> tuple[float, float]:
        """(inertia, purity) of an assignment, ALWAYS in raw space:
        inertia from per-(cluster,dim) sum/sumsq/count (k·dim driver
        rows); purity from the planted mode id, recomputed from
        vec_id (k×N_MODES rows)."""
        j = vecs.join(assigned.select("vec_id", "cluster"), "vec_id")
        per = (
            j.select("cluster", F.posexplode("embedding").alias("dim", "x"))
            .groupBy("cluster", "dim")
            .agg(
                F.sum("x").alias("sx"),
                F.sum(F.col("x") * F.col("x")).alias("sxx"),
                F.count("*").alias("n"),
            )
            .collect()
        )
        inertia = sum(r["sxx"] - r["sx"] ** 2 / r["n"] for r in per)
        pm = (
            j.withColumn(
                "mode", F.pmod(F.xxhash64(F.col("vec_id")), F.lit(N_MODES))
            )
            .groupBy("cluster", "mode")
            .agg(F.count("*").alias("n"))
            .collect()
        )
        by_c: dict[int, dict[int, int]] = {}
        for r in pm:
            by_c.setdefault(r["cluster"], {})[r["mode"]] = r["n"]
        total = sum(sum(v.values()) for v in by_c.values())
        purity = sum(max(v.values()) for v in by_c.values()) / total
        return float(inertia), float(purity)

    # ---- route A: raw dim-768 k-means ----
    t0 = time.perf_counter()
    raw_assigned, raw_inertia_trace = similarity.kmeans_clusters(
        vecs, k=K, iters=ITERS
    )
    raw_assigned = raw_assigned.localCheckpoint(eager=True)
    raw_sec = time.perf_counter() - t0
    raw_inertia, raw_purity = raw_space_scores(raw_assigned)
    print(f"raw dim-{DIM} kmeans: {raw_sec:.1f}s, inertia {raw_inertia:.3e}, "
          f"purity {raw_purity:.3f}")

    # ---- route B: pca_fit → project → k-means on dim-16 ----
    t0 = time.perf_counter()
    comps, mean, evr = similarity.pca_fit(vecs, n_components=PROJ_DIM)
    fit_sec = time.perf_counter() - t0
    t1 = time.perf_counter()
    proj = (
        similarity.pca_project(vecs, comps, mean)
        .select("vec_id", F.col("pca").alias("embedding"))
        .localCheckpoint(eager=True)  # kmeans re-reads it every round
    )
    comp_assigned, comp_inertia_trace = similarity.kmeans_clusters(
        proj, k=K, iters=ITERS
    )
    comp_assigned = comp_assigned.localCheckpoint(eager=True)
    cluster_sec = time.perf_counter() - t1
    composed_sec = fit_sec + cluster_sec
    comp_inertia, comp_purity = raw_space_scores(comp_assigned)
    print(f"composed pca({PROJ_DIM})+kmeans: {composed_sec:.1f}s "
          f"(fit {fit_sec:.1f}s), raw-space inertia {comp_inertia:.3e}, "
          f"purity {comp_purity:.3f}, evr_sum {float(evr.sum()):.3f}")

    row = {
        "n_vectors": n_vec,
        "dim": DIM,
        "proj_dim": PROJ_DIM,
        "k": K,
        "iters": ITERS,
        "planted_modes": N_MODES,
        "raw_sec": round(raw_sec, 1),
        "composed_sec": round(composed_sec, 1),
        "composed_fit_sec": round(fit_sec, 1),
        "composed_project_cluster_sec": round(cluster_sec, 1),
        "speedup": round(raw_sec / composed_sec, 2),
        "evr_captured": round(float(evr.sum()), 4),
        "raw_inertia_raw_space": round(raw_inertia, 1),
        "composed_inertia_raw_space": round(comp_inertia, 1),
        "inertia_ratio": round(comp_inertia / raw_inertia, 4),
        "raw_mode_purity": round(raw_purity, 4),
        "composed_mode_purity": round(comp_purity, 4),
        "note": (
            "SemDeDup project-then-cluster (similarity.py pca_fit + "
            "pca_project + kmeans_clusters) vs clustering raw dim-768 "
            "directly, same k/iters; both assignments scored in RAW "
            "space (within-cluster inertia + planted-mode purity) so "
            "the quality side of the trade is comparable. The "
            "composed route pays one extra corpus pass (the PCA fit) "
            "to shrink every k-means round's matmul and (cluster,dim) "
            "agg by dim/proj_dim."
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
    data["pca_kmeans_compose"] = row
    with open(out_path, "w") as fh:
        json.dump(data, fh, indent=1)
    print(json.dumps(row, indent=1))
    print("wrote SCALEPROOF.json [pca_kmeans_compose]")


if __name__ == "__main__":
    main()
