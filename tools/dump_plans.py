"""Dump `.explain("formatted")` for named queries to plans/r14/.

Usage: python tools/dump_plans.py <suffix> qNN [qMM ...]
       python tools/dump_plans.py before q122_verified_dedup_clusters

Writes plans/r14/<query>_<suffix>.txt — the optimization-round
deliverable (the judge diffs _before vs _after against the claims in
OPTIMIZATION_r14.md).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from climate_data_pipelines_spark import get_spark
    from climate_data_pipelines_spark.queries import REGISTRY

    spark = get_spark(app_name="dump-plans")
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_dir = os.path.join(here, "plans", "r14")
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        spec = REGISTRY.get(name)
        if spec is None:
            # allow prefix match (q122 -> q122_verified_dedup_clusters)
            full = [n for n in REGISTRY if n.startswith(name)]
            if len(full) != 1:
                print(f"SKIP {name}: unknown")
                continue
            name = full[0]
            spec = REGISTRY[name]
        df = spec.fn(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan)} chars)")


if __name__ == "__main__":
    main()
