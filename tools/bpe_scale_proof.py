"""Measure a production-sized BPE train: 1,000 merges in bounded
driver round-trips (VERDICT r5 item 5).

The registry fixture cannot exercise this — its 30-word soup
vocabulary exhausts after ~200 merges — so this tool builds a
large-vocabulary corpus (seeded: 20k distinct random words, Zipf-ish
rank weighting, 50k docs x ~100 tokens ~ the x10 document count) and
trains ``bpe_train(n_merges=1000, batch_m=64)``: top-64
non-overlapping pairs per round, so the driver round-trips drop from
1,000 sequential Spark jobs to ~1000/64 + a few overlap-limited
rounds. For comparison it also times a 50-merge CLASSIC (m=1) train
on the same corpus and extrapolates its per-merge cost to 1,000.

Results merge into SCALEPROOF.json under "bpe_train_1k".

Usage: python tools/bpe_scale_proof.py [N_MERGES] [BATCH_M]
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

N_DOCS = 50_000
TOKENS_PER_DOC = 100
VOCAB_N = 20_000


def build_corpus(spark):
    import numpy as np

    rng = np.random.default_rng(20260814)
    letters = np.array(list("abcdefghijklmnopqrstuvwxyz"))
    vocab = []
    seen = set()
    while len(vocab) < VOCAB_N:
        k = int(rng.integers(3, 13))
        w = "".join(letters[rng.integers(0, 26, k)])
        if w not in seen:
            seen.add(w)
            vocab.append(w)
    # Zipf-ish: p(rank) ~ 1/(rank+10)
    p = 1.0 / (np.arange(VOCAB_N) + 10.0)
    p /= p.sum()
    rows = []
    for d in range(N_DOCS):
        idx = rng.choice(VOCAB_N, TOKENS_PER_DOC, p=p)
        rows.append((d, " ".join(vocab[i] for i in idx)))
    return spark.createDataFrame(rows, "doc_id long, text string").repartition(32)


def main() -> None:
    n_merges = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
    batch_m = int(sys.argv[2]) if len(sys.argv) > 2 else 64

    from climate_data_pipelines_spark import get_spark
    from climate_data_pipelines_spark.operators import textops

    spark = get_spark(app_name="bpe-scale-proof")
    corpus = build_corpus(spark).localCheckpoint(eager=True)
    n_corpus_tokens = N_DOCS * TOKENS_PER_DOC

    t0 = time.perf_counter()
    classic = textops.bpe_train(corpus, n_merges=50, batch_m=1).collect()
    classic_sec = time.perf_counter() - t0
    per_merge = classic_sec / max(1, len(classic))

    t0 = time.perf_counter()
    merges = textops.bpe_train(
        corpus, n_merges=n_merges, batch_m=batch_m
    ).collect()
    batched_sec = time.perf_counter() - t0

    entry = {
        "corpus": {
            "docs": N_DOCS,
            "tokens": n_corpus_tokens,
            "distinct_words": VOCAB_N,
        },
        "classic_m1_50_merges_sec": round(classic_sec, 1),
        "classic_m1_per_merge_sec": round(per_merge, 3),
        f"classic_m1_{n_merges}_merges_extrapolated_sec": round(
            per_merge * n_merges, 1
        ),
        "batched": {
            "batch_m": batch_m,
            "n_merges": len(merges),
            "sec": round(batched_sec, 1),
            "sec_per_merge": round(batched_sec / max(1, len(merges)), 3),
        },
    }
    out = {}
    if os.path.exists(OUT_PATH):
        with open(OUT_PATH) as fh:
            out = json.load(fh)
    out["bpe_train_1k"] = entry
    with open(OUT_PATH, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(entry))
    print("wrote SCALEPROOF.json (bpe_train_1k)")


if __name__ == "__main__":
    main()
