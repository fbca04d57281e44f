"""Per-chain core-scaling matrix at the 5M-doc zipf fixture (r13
verdict item 7): the sf0.1 bench is fixed-cost/latency-bound (8-core
total ~= 32-core total), so the driver's reduced-core pass cannot show
whether the heavy chains actually parallelize. This runs 2-3 HEAVY
chains — where task time dwarfs protocol latency — at {8, 32} cores in
fresh subprocesses and records wall ratios next to the z1000 recheck
in SCALEPROOF.json. Expected: ratio_8_over_32 approaching the core
ratio (4x) for compute-bound chains, minus the serial fraction
(shuffles, driver stages) per Amdahl.

Usage:
    python tools/gen_scale_fixture.py scaledata/z1000 1000 --zipf --docs-only
    python tools/gen_scale_fixture.py scaledata/x100 100 --mog
    python tools/core_scaling_matrix.py

Chains:
- dedup_verify_cc: the q122 shape end-to-end on z1000 — signatures,
  banded candidates, jaccard verify, connected components (the
  candidate graph exceeds SPARK_GRAFT_CC_LOCAL_MAX, so the DISTRIBUTED
  CC path runs); candidate count printed for bit-reproducibility vs
  the recorded 252,869.
- trigram_lm: the q177 stupid-backoff shape on z1000 (tokenize +
  n-gram aggregates — pure CPU over text).
- kmeans: kmeans_clusters k=16, iters=6 over the x100 MoG embeddings
  (200k vectors), the Arrow-kernel chain.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

CHILD = r"""
import os, sys, time, json
sys.path.insert(0, sys.argv[1])
chain, sf_dir = sys.argv[2], sys.argv[3]
os.environ["SPARK_GRAFT_CPUS"] = sys.argv[4]
from climate_data_pipelines_spark import get_spark
from climate_data_pipelines_spark.catalog import load_table
from pyspark.sql import functions as F

spark = get_spark(app_name=f"core-scaling-{chain}")

def noop(df):
    df.write.format("noop").mode("overwrite").save()

extra = {}
t0 = time.perf_counter()
if chain == "dedup_verify_cc":
    from climate_data_pipelines_spark.operators import dedup
    from climate_data_pipelines_spark.queries import MINHASH_BANDS, MINHASH_N
    docs = load_table(spark, sf_dir, "documents")
    sigs = dedup.minhash_signatures(docs, k=3, n_hashes=MINHASH_N)
    cand = dedup.minhash_lsh_candidates(
        sigs, n_hashes=MINHASH_N, bands=MINHASH_BANDS
    ).localCheckpoint(eager=True)
    extra["candidates"] = cand.count()
    edges = dedup.jaccard_on_pairs(docs, cand, k=3).filter(
        F.col("jaccard") >= 0.5).select("id_a", "id_b")
    comp = dedup.connected_components(edges, id_a="id_a", id_b="id_b")
    noop(comp)
elif chain == "trigram_lm":
    from climate_data_pipelines_spark.operators import training
    docs = load_table(spark, sf_dir, "documents")
    noop(training.trigram_lm_score(docs))
elif chain == "kmeans":
    from climate_data_pipelines_spark.operators import similarity
    emb = load_table(spark, sf_dir, "embeddings")
    assigned, inertia = similarity.kmeans_clusters(emb, k=16, iters=6)
    noop(assigned)
    extra["inertia_final"] = round(inertia[-1], 3)
else:
    raise SystemExit(f"unknown chain {chain}")
print("CSRESULT " + json.dumps(
    {"wall": round(time.perf_counter() - t0, 1), **extra}))
"""

CHAINS = [
    ("dedup_verify_cc", os.path.join(HERE, "scaledata/z1000")),
    ("trigram_lm", os.path.join(HERE, "scaledata/z1000")),
    ("kmeans", os.path.join(HERE, "scaledata/x100")),
]


def main() -> None:
    out: dict = {}
    for chain, sf_dir in CHAINS:
        if not os.path.exists(os.path.join(sf_dir, "documents.parquet")):
            print(f"SKIP {chain}: fixture {sf_dir} missing")
            continue
        row: dict = {"fixture": sf_dir.replace(HERE + "/", "")}
        for cpus in ("32", "8"):
            env = dict(os.environ)
            env["SPARK_GRAFT_SF_DIR"] = sf_dir
            env["SPARK_GRAFT_CPUS"] = cpus
            t0 = time.time()
            res = subprocess.run(
                [sys.executable, "-c", CHILD, HERE, chain, sf_dir, cpus],
                capture_output=True, text=True, env=env, timeout=7200,
            )
            rec = None
            for line in res.stdout.splitlines():
                if line.startswith("CSRESULT "):
                    rec = json.loads(line[len("CSRESULT "):])
            if rec is None:
                sys.stderr.write(res.stdout[-1500:] + res.stderr[-1500:])
                row[f"c{cpus}_error"] = True
                continue
            row[f"c{cpus}_wall_s"] = rec.pop("wall")
            row.update({f"c{cpus}_{k}": v for k, v in rec.items()})
            print(f"{chain} @ {cpus} cores: {row[f'c{cpus}_wall_s']} s "
                  f"(subprocess total {time.time()-t0:.0f} s)", flush=True)
        if "c32_wall_s" in row and "c8_wall_s" in row:
            row["ratio_8_over_32"] = round(
                row["c8_wall_s"] / row["c32_wall_s"], 2
            )
        out[chain] = row
    path = os.path.join(HERE, "SCALEPROOF.json")
    rec = {}
    if os.path.exists(path):
        with open(path) as fh:
            rec = json.load(fh)
    rec["core_scaling_r14"] = out
    with open(path, "w") as fh:
        json.dump(rec, fh, indent=1, sort_keys=True)
    print(json.dumps({"core_scaling_r14": out}, indent=1))


if __name__ == "__main__":
    main()
