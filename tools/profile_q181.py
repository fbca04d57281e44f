"""Stage-level profile of q181 perplexity_bucket_mix at a zipf scale
point (VERDICT r9 item 1: the z100 curve is x34 with no analysis).

Each stage is forced with a hash-of-all-columns sink (a bare count(*)
lets Catalyst prune the score expressions and the dim joins' payload,
underestimating the stage) and run twice (first run pays page-cache
and JIT warmup; the second is the comparable number).

Usage: python tools/profile_q181.py scaledata/z100
"""
import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, ".")
from climate_data_pipelines_spark.session import get_spark  # noqa: E402
from climate_data_pipelines_spark.operators import training  # noqa: E402
from climate_data_pipelines_spark.operators.scale import (  # noqa: E402
    spread_for_cpu,
)
from climate_data_pipelines_spark.functions.text import (  # noqa: E402
    shingles,
    tokens,
)


def force(df):
    # bit_xor never overflows (sum of xxhash64 longs throws under ANSI)
    return df.select(F.xxhash64(*df.columns).alias("h")).agg(
        F.expr("bit_xor(h)")
    ).first()[0]


def clk(label, fn, repeats=2):
    times = []
    out = None
    for _ in range(repeats):
        t0 = time.time()
        out = fn()
        times.append(time.time() - t0)
    ts = "/".join(f"{t:.2f}" for t in times)
    print(f"{label:50s} {ts:>16s}s  {out}")


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "scaledata/z100"
    spark = get_spark()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    print(f"docs: {docs.count()}")

    held = spread_for_cpu(docs.filter(F.size(tokens("text")) >= 3))
    occ = held.select(F.explode(shingles("text", 3)).alias("t"))
    clk("occurrences (spread)", lambda: occ.count())
    clk("distinct trigram vocab (spread)",
        lambda: occ.agg(F.countDistinct("t")).first()[0])

    clk("D q177 shape (score 20%)",
        lambda: force(training.trigram_lm_score(docs)))
    clk("A score_all=True",
        lambda: force(training.trigram_lm_score(docs, score_all=True)))

    def b():
        s = training.trigram_lm_score(docs, score_all=True)
        return force(docs.select("doc_id", "lang").join(s, "doc_id"))
    clk("B A + join-back(lang)", b)

    clk("C full perplexity_bucket_mix",
        lambda: force(training.perplexity_bucket_mix(docs)))
    spark.stop()


if __name__ == "__main__":
    main()
