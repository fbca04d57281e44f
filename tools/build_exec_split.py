"""Per-query DRIVER PLAN-BUILD vs EXECUTION wall split (r13 verdict
item 8): `fn(spark, sf_dir)` wall (pure driver work — py4j plan
construction plus any eager driver-side stages the operator runs) vs
the noop-sink execution wall of the returned frame. The simhash family
hid 1.1-1.4 s/query of py4j plan-build in r12 that only this split
exposes; this makes the "none remain" claim a recorded measurement.

Usage: python tools/build_exec_split.py qNNN [qMMM ...] [--runs N]
       python tools/build_exec_split.py --all        (whole registry)

Prints one JSON line per query: {"query": ..., "build_s": median,
"exec_s": median, "runs": N} — build_s is the driver-side wall of the
query-function call, exec_s the subsequent noop write.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    runs = 3
    if "--runs" in sys.argv:
        runs = int(sys.argv[sys.argv.index("--runs") + 1])
        if str(runs) in args:
            args.remove(str(runs))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from climate_data_pipelines_spark import get_spark
    from climate_data_pipelines_spark.queries import REGISTRY

    if "--all" in sys.argv:
        args = list(REGISTRY)

    spark = get_spark(app_name="build-exec-split")

    def run(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    run(REGISTRY["q17_agg_suite"].fn(spark, sf_dir))  # warm session

    for name in args:
        full = name if name in REGISTRY else next(
            (n for n in REGISTRY if n.startswith(name)), None
        )
        if full is None:
            print(json.dumps({"query": name, "error": "unknown"}))
            continue
        builds, execs = [], []
        for _ in range(runs):
            t0 = time.perf_counter()
            df = REGISTRY[full].fn(spark, sf_dir)
            t1 = time.perf_counter()
            run(df)
            t2 = time.perf_counter()
            builds.append(t1 - t0)
            execs.append(t2 - t1)
            try:
                for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
                    rdd.unpersist(False)
            except Exception:
                pass
        print(json.dumps({
            "query": full,
            "build_s": round(statistics.median(builds), 3),
            "exec_s": round(statistics.median(execs), 3),
            "build_min": round(min(builds), 3),
            "exec_min": round(min(execs), 3),
            "runs": runs,
        }), flush=True)


if __name__ == "__main__":
    main()
