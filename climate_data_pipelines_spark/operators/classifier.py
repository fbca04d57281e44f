"""Trainable text-quality classifier — logistic regression over hashed
n-gram features, trained IN-ENGINE by full-batch gradient descent.

The reference pipeline's quality filters are static heuristics
(length/punctuation/stopword ratios — re-expressed as
``textops.quality_score`` / q44); production LLM curation pipelines
additionally train a *classifier* against labeled reference documents
and keep what the model scores as high-quality (the GPT-3 appendix-A
"quality classifier" / CCNet linear-model pattern, both public). This
module is that step, Spark-first:

- **Feature extraction is pure JVM expressions** (normalize → split →
  bigram zip → crc32 hashing → presence aggregate): no UDFs, map-side
  combined shuffles on corpus-scale keys — nothing corpus-sized ever
  converges to one node.
- **The model is driver-sized, the data is not.** Weights and the
  Adagrad accumulator are (dim+1)-float vectors (a few KB); per
  training epoch exactly ONE distributed job runs: broadcast-join the
  weight table onto the feature rows → per-document margins (shuffle
  on the doc key) → residuals join back → per-feature gradient
  (shuffle on the feature key) → collect the (dim+1)-row gradient.
  Driver traffic per epoch is the gradient vector — the same
  bounded-by-vocabulary discipline as BPE training — so the labeled
  corpus itself can be 100 TB.
- **Adagrad** (Duchi et al. 2011, public) does the per-feature step
  scaling full-batch logistic GD otherwise needs hundreds of epochs
  for; the accumulator lives with the weights on the driver, and the
  whole trajectory is deterministic given the input (no sampling, no
  randomized init).
- **Reproducible outside Spark:** crc32 (not a JVM-only seeded hash)
  makes the feature mapping computable with stdlib ``zlib.crc32`` —
  the replay invariant retrains the exact model in numpy from the raw
  texts and pins weight parity (float-sum ordering is the only
  divergence, so parity is tolerance-based).

Hashed features (Weinberger et al. 2009, public) bound the model at
``dim`` regardless of vocabulary, which is what keeps the broadcast
side constant-size at any corpus scale.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F

from climate_data_pipelines_spark.functions.text import normalize_text, tokens
from climate_data_pipelines_spark.operators.scale import local_df

# margins are clamped to ±MARGIN_CLIP before the sigmoid in BOTH the
# engine and the numpy twin, so near-separable fits stay finite and
# bit-comparable instead of racing to inf at different float orders
MARGIN_CLIP = 30.0


def _grams(text_col: str, bigrams: bool):
    toks = tokens(normalize_text(F.col(text_col)))
    if not bigrams:
        return toks
    bi = F.zip_with(
        F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))),
        F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    return F.concat(toks, bi)


def hashed_features(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    dim: int = 1024,
    bigrams: bool = True,
) -> DataFrame:
    """(id, feat, x): binary presence of hashed uni+bigram features,
    plus a constant bias row ``(id, dim, 1.0)`` for EVERY input row —
    empty documents still carry exactly one feature and always receive
    a score.

    feat = crc32(utf8(gram)) mod dim — crc32 over xxhash64 so the
    mapping is reproducible in stdlib Python (``zlib.crc32``), which
    the replay invariant uses to retrain the numpy twin from raw text.
    Presence (0/1) rather than tf: the distinct-collapse is one
    map-side-combined shuffle, and on short web documents presence is
    what the public linear-classifier pipelines use. Everything here
    is built-in expressions.
    """
    feats = (
        df.select(F.col(id_col), F.explode(_grams(text_col, bigrams)).alias("g"))
        .select(
            id_col,
            F.pmod(F.crc32(F.encode(F.col("g"), "utf-8")), F.lit(dim))
            .cast("int")
            .alias("feat"),
        )
        .distinct()
        .select(id_col, "feat", F.lit(1.0).alias("x"))
    )
    bias = df.select(
        F.col(id_col), F.lit(int(dim)).alias("feat"), F.lit(1.0).alias("x")
    )
    return feats.unionByName(bias)


def train_quality_classifier(
    features: DataFrame,
    labels: DataFrame,
    dim: int,
    epochs: int = 12,
    lr: float = 0.5,
    l2: float = 1e-6,
    id_col: str = "doc_id",
    label_col: str = "label",
    grad_tol: float = 1e-3,
) -> DataFrame:
    """Full-batch logistic regression with Adagrad over hashed
    features.

    ``features`` is ``hashed_features`` output; ``labels`` is
    (id, 0/1). Returns the learned (feat, weight) table — (dim+1)
    rows, the bias at index ``dim`` — composable with
    ``classifier_score``.

    Loop shape (the 100 TB contract): the labeled feature table is
    repartitioned BY DOC and persisted once (r9 — ``persist``, not
    ``localCheckpoint``: a checkpoint's LogicalRDD drops the
    outputPartitioning metadata, a cached plan keeps it), so the
    per-epoch margin aggregate reuses the cached co-location and
    every epoch's only LIVE exchange is the (dim+1)-row feature
    gradient (plus the broadcast of the weights/residuals). Before
    this, each epoch re-shuffled the corpus-sized feature table by
    doc — at the ×100 fixture that was ~13M combined rows × 12
    epochs of pure re-exchange. Each epoch is one lazy plan ending
    in a (dim+1)-row collect:

        fl(cached, hash(doc)) ⋈_bcast weights → Σ per doc  [no exch]
          → clamp ±30 → sigmoid residual → ⋈ fl on id      [bcast]
          → Σ per feat (gradient) → collect dim+1 rows     [dim-sized]

    Weights and the Adagrad accumulator update on the driver (plain
    floats): the model is vocabulary-bounded like BPE's merge table,
    so driver state never scales with the corpus. Gradient sums are
    unordered float adds, so retrained weights match the in-memory
    twin to ~1e-9 relative, not bit-exactly — the invariant uses a
    tolerance.

    EARLY STOPPING (r9): training stops after the epoch whose
    regularized gradient RMS (sqrt(mean(g_i²)) over dim+1 entries)
    falls below ``grad_tol`` — the PageRank convergence pattern, at
    zero extra cost because the full gradient already reaches the
    driver each epoch. The rule is mirrored VERBATIM in
    :func:`numpy_twin_train` so the parity invariant replays the
    same trajectory; both twins compare the same quantity, and the
    measured fixture trajectory (rms ~1.2e-2 at epoch 12, ~1.3e-3 at
    epoch 29) sits orders of magnitude from the default tol, so the
    float-ordering divergence (~1e-12) cannot flip the stop epoch.
    Well-separated corpora (residuals → 0 exponentially) stop in a
    handful of epochs; the default fixture runs all 12.
    """
    spark = features.sparkSession
    fl = (
        features.join(
            labels.select(
                F.col(id_col), F.col(label_col).cast("double").alias("_y")
            ),
            id_col,
        )
        .repartition(F.col(id_col))
        .persist()
    )
    n = fl.select(id_col).distinct().count()
    if n == 0:
        fl.unpersist()
        raise ValueError("train_quality_classifier: no labeled documents")

    w = [0.0] * (dim + 1)
    acc = [0.0] * (dim + 1)
    for _ in range(max(1, epochs)):
        # Arrow-path creation (scale.local_df): the pickled-list path
        # cost 32 Python-worker tasks per epoch just to build the
        # (dim+1)-row weight broadcast
        wdf = local_df(
            spark, [(i, wi) for i, wi in enumerate(w)], "feat int, w double"
        )
        margins = (
            fl.join(F.broadcast(wdf), "feat")
            .groupBy(id_col, "_y")
            .agg(F.sum(F.col("x") * F.col("w")).alias("_m"))
        )
        clamped = F.greatest(
            F.least(F.col("_m"), F.lit(MARGIN_CLIP)), F.lit(-MARGIN_CLIP)
        )
        resid = margins.select(
            F.col(id_col),
            (F.lit(1.0) / (F.lit(1.0) + F.exp(-clamped)) - F.col("_y")).alias(
                "_r"
            ),
        )
        # Measured negative result (r8): an explicit broadcast hint on
        # resid (n rows, ~6 MB at the 500k-doc fixture) made the x1
        # run 2× SLOWER and x100 no faster — AQE already converts this
        # join to a broadcast at runtime from the shuffle's actual
        # size, and the hint only added an extra per-epoch
        # materialization job to build the broadcast eagerly. Leave
        # the plan lazy; AQE picks the right side at every scale.
        grad_rows = (
            fl.join(resid, id_col)
            .groupBy("feat")
            .agg(F.sum(F.col("x") * F.col("_r")).alias("g"))
            .collect()
        )
        grad = {r["feat"]: r["g"] for r in grad_rows}
        sq = 0.0
        for i in range(dim + 1):
            g = grad.get(i, 0.0) / n + l2 * w[i]
            sq += g * g
            acc[i] += g * g
            w[i] -= lr * g / math.sqrt(acc[i] + 1e-8)
        if math.sqrt(sq / (dim + 1)) < grad_tol:
            break  # converged — mirrored in numpy_twin_train
    fl.unpersist()
    return local_df(
        spark, [(i, wi) for i, wi in enumerate(w)], "feat int, weight double"
    )


def classifier_score(
    features: DataFrame,
    weights: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, score): sigmoid(w·x) per document. Weights broadcast (dim+1
    rows); one shuffle on the doc key — scoring a 100 TB corpus is one
    broadcast join + one aggregate."""
    clamped = F.greatest(
        F.least(F.col("_m"), F.lit(MARGIN_CLIP)), F.lit(-MARGIN_CLIP)
    )
    return (
        features.join(F.broadcast(weights), "feat")
        .groupBy(id_col)
        .agg(F.sum(F.col("x") * F.col("weight")).alias("_m"))
        .select(
            F.col(id_col),
            (F.lit(1.0) / (F.lit(1.0) + F.exp(-clamped))).alias("score"),
        )
    )


def numpy_twin_train(
    texts: list[tuple[int, str]],
    labels: dict[int, int],
    dim: int,
    epochs: int = 12,
    lr: float = 0.5,
    l2: float = 1e-6,
    bigrams: bool = True,
    grad_tol: float = 1e-3,
) -> list[float]:
    """In-memory reference trainer for the replay invariant: identical
    feature extraction (lowercase/collapse-whitespace → whitespace
    tokens → bigrams → zlib.crc32 mod dim → binary presence + bias)
    and identical Adagrad full-batch GD, in numpy. Independent of
    every Spark API — the parity check is a true twin, not a re-run.
    """
    import numpy as np

    rows: list[tuple[int, dict[int, float]]] = []
    for doc_id, text in texts:
        if doc_id not in labels:
            continue
        rows.append((doc_id, python_features(text, dim, bigrams)))

    n = len(rows)
    X = np.zeros((n, dim + 1))
    y = np.zeros(n)
    for i, (doc_id, feats) in enumerate(rows):
        y[i] = labels[doc_id]
        for f, v in feats.items():
            X[i, f] = v
    w = np.zeros(dim + 1)
    acc = np.zeros(dim + 1)
    for _ in range(max(1, epochs)):
        m = np.clip(X @ w, -MARGIN_CLIP, MARGIN_CLIP)
        r = 1.0 / (1.0 + np.exp(-m)) - y
        g = X.T @ r / n + l2 * w
        acc += g * g
        w = w - lr * g / np.sqrt(acc + 1e-8)
        # early stop mirrored from train_quality_classifier: same
        # post-update gradient-RMS rule, same default tol
        if float(np.sqrt(np.mean(g * g))) < grad_tol:
            break
    return [float(v) for v in w]


def python_features(text: str, dim: int, bigrams: bool = True) -> dict[int, float]:
    """Stdlib twin of ``hashed_features`` for one document: the same
    normalize → tokenize → bigram → crc32 → presence mapping, plus the
    bias at index ``dim``."""
    import re
    import zlib

    toks = re.sub(r"\s+", " ", (text or "").lower()).strip().split(" ")
    toks = [t for t in toks if t]
    grams = set(toks)
    if bigrams:
        grams |= {f"{a} {b}" for a, b in zip(toks, toks[1:])}
    fv = {zlib.crc32(g.encode("utf-8")) % dim: 1.0 for g in grams}
    fv[dim] = 1.0
    return fv
