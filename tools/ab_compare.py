"""Interleaved A/B benchmark of one or more queries across two source
trees (optimization guide §1 under a noisy host: sequential sweeps on
this box drift by 1.3-2.2x on neighbor load alone, so every comparison
must alternate A and B within the same window to cancel drift).

Usage:
    python tools/ab_compare.py --a DIR_A --b DIR_B [--reps N] [--runs K] q119 q141 ...

For each query, runs N alternating subprocess measurements
(A,B,A,B,...). Each subprocess imports the engine from ONE tree, warms
the session, runs the query via the noop sink K times and prints the
minimum (the noise-robust statistic on a steal-prone host: inflation
is one-sided). Reports per-query A/B medians-of-mins and the ratio.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

CHILD = r"""
import json, os, sys, time
sys.path.insert(0, sys.argv[1])
os.chdir(sys.argv[1])
from climate_data_pipelines_spark import get_spark
from climate_data_pipelines_spark.queries import REGISTRY

spark = get_spark(app_name="ab-compare")
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

def run(df):
    df.write.format("noop").mode("overwrite").save()

run(REGISTRY["q17_agg_suite"].fn(spark, sf_dir))  # warm session/footers
name = sys.argv[2]
runs = int(sys.argv[3])
walls = []
for _ in range(runs):
    t0 = time.perf_counter()
    run(REGISTRY[name].fn(spark, sf_dir))
    walls.append(time.perf_counter() - t0)
    try:
        for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
            rdd.unpersist(False)
    except Exception:
        pass
print("ABRESULT " + json.dumps({"min": min(walls), "walls": walls}))
"""


def measure(tree: str, name: str, runs: int) -> float | None:
    env = dict(os.environ)
    env.setdefault("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    env.setdefault("SPARK_GRAFT_CPUS", "32")
    out = subprocess.run(
        [sys.executable, "-c", CHILD, tree, name, str(runs)],
        capture_output=True, text=True, env=env, timeout=600,
    )
    for line in out.stdout.splitlines():
        if line.startswith("ABRESULT "):
            return json.loads(line[len("ABRESULT "):])["min"]
    sys.stderr.write(out.stdout[-2000:] + out.stderr[-2000:])
    return None


def main() -> None:
    args = sys.argv[1:]

    def opt(flag, default=None):
        if flag in args:
            i = args.index(flag)
            v = args[i + 1]
            del args[i:i + 2]
            return v
        return default

    tree_a = opt("--a", "/root/repo_ab")
    tree_b = opt("--b", "/root/repo")
    reps = int(opt("--reps", "4"))
    runs = int(opt("--runs", "3"))
    queries = args
    results = {}
    for name in queries:
        full = name
        a_mins, b_mins = [], []
        for r in range(reps):
            for label, tree, acc in (("A", tree_a, a_mins), ("B", tree_b, b_mins)):
                m = measure(tree, full, runs)
                if m is not None:
                    acc.append(m)
                print(f"  {full} rep{r} {label}: {m if m is None else round(m,3)}",
                      flush=True)
        med_a = statistics.median(a_mins) if a_mins else None
        med_b = statistics.median(b_mins) if b_mins else None
        results[full] = {"A": med_a, "B": med_b,
                         "ratio_B_over_A": round(med_b / med_a, 3)
                         if med_a and med_b else None,
                         "a_mins": [round(x, 3) for x in a_mins],
                         "b_mins": [round(x, 3) for x in b_mins]}
        print(json.dumps({full: results[full]}), flush=True)
    print("ABSUMMARY " + json.dumps(results))


if __name__ == "__main__":
    main()
