"""q187 k-means at IVF-coarse-quantizer k (r11 verdict item 5).

`kmeans_clusters`' docstring sells two shapes: k=16 for cluster-
balanced mixing (the q187 query, already in the permanent x-family
sweep) and "a trainable IVF coarse quantizer" — which in practice
means k=256-1024. The three terms that grow with k are the per-round
driver collect (k·dim rows of (cluster, dim, sx, n, sd2)), the
broadcast centroid closure shipped into every assignment task
(k·dim·8 bytes inside the Arrow kernel), and the per-round reseed
probe when clusters empty out. This tool measures them at k=16 and
k=256 on the x10 fixture (20k vectors, dim 64) and records wall per
Lloyd round, driver rows/bytes per round, the inertia curve
endpoints, and whether any reseed fired.

Results land under SCALEPROOF.json section `q187_kmeans_k`.

Usage:
    python tools/kmeans_scale_proof.py [scaledata/x10]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ITERS = 6


def main() -> None:
    d = sys.argv[1] if len(sys.argv) > 1 else "scaledata/x10"

    from climate_data_pipelines_spark import get_spark
    from climate_data_pipelines_spark.catalog import load_table
    from climate_data_pipelines_spark.operators import similarity

    spark = get_spark(app_name="kmeans-scale-proof")
    emb = load_table(spark, d, "embeddings").select("vec_id", "embedding")
    n_vecs = emb.count()
    dim = len(
        emb.select("embedding").filter("embedding is not null").first()[0]
    )

    section: dict = {"dir": d, "n_vecs": n_vecs, "dim": dim, "points": {}}
    for k in (16, 256):
        # warmup (Arrow worker spinup + scan cache) then one timed run
        similarity.kmeans_clusters(emb, k=k, iters=1)
        t0 = time.perf_counter()
        assigned, inertia = similarity.kmeans_clusters(emb, k=k, iters=ITERS)
        n_assigned = assigned.count()  # materialize the final table
        wall = time.perf_counter() - t0
        monotone = all(
            inertia[i] <= inertia[i - 1] * (1 + 1e-9)
            for i in range(1, len(inertia))
        )
        rec = {
            "k": k,
            "iters": ITERS,
            "wall_sec": round(wall, 3),
            "sec_per_round": round(wall / ITERS, 3),
            "driver_rows_per_round": k * dim,
            # (cluster int, dim int, sx double, n long, sd2 double)
            "driver_bytes_per_round_approx": k * dim * 32,
            "broadcast_closure_bytes": k * dim * 8,
            "inertia_first": round(inertia[0], 1),
            "inertia_last": round(inertia[-1], 1),
            "inertia_monotone": monotone,
            "n_assigned": n_assigned,
        }
        section["points"][f"k{k}"] = rec
        print(f"k={k}: {rec}")

    out_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "SCALEPROOF.json",
    )
    out = {}
    if os.path.exists(out_path):
        with open(out_path) as fh:
            out = json.load(fh)
    out["q187_kmeans_k"] = section
    with open(out_path, "w") as fh:
        json.dump(out, fh, indent=1)
    print("wrote SCALEPROOF.json section q187_kmeans_k")


if __name__ == "__main__":
    main()
