"""Embedding-vector math as Spark higher-order functions.

North-star similarity surface (SURVEY.md §2.11). All expression-level:
``zip_with`` + ``aggregate`` run inside codegen on the JVM — no Python,
no UDF, fully distributed. Inputs are ``array<float>`` columns; math is
done in double after an explicit element cast so results are
deterministic and match a double-precision oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column | str, b: Column | str) -> Column:
    """Dot product of two array columns (element-wise into double)."""
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    return F.aggregate(
        F.zip_with(ca, cb, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column | str) -> Column:
    """L2 norm of an array column."""
    ca = F.col(a) if isinstance(a, str) else a
    return F.sqrt(
        F.aggregate(
            ca,
            F.lit(0.0),
            lambda acc, v: acc + v.cast("double") * v.cast("double"),
        )
    )


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity between two array columns (double). A
    zero-norm input scores 0.0, NOT NaN: Spark orders NaN above every
    number, so an unguarded 0/0 would rank a zero embedding #1 in
    every top-k and pass every >= threshold near-dup filter."""
    denom = norm(a) * norm(b)
    return F.when(denom > 0, dot(a, b) / denom).otherwise(F.lit(0.0))


def sq_l2(a: Column | str, b: Column | str) -> Column:
    """Squared L2 distance between two array columns (double) — the
    IVF coarse-quantizer probe metric."""
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    return F.aggregate(
        F.zip_with(
            ca,
            cb,
            lambda x, y: (x.cast("double") - y.cast("double"))
            * (x.cast("double") - y.cast("double")),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_normalize(a: Column | str) -> Column:
    """Unit-normalize an array column (double elements); zero vectors
    pass through unchanged (norm guard avoids div-by-zero NaNs)."""
    ca = F.col(a) if isinstance(a, str) else a
    n = norm(ca)
    return F.when(
        n > 0, F.transform(ca, lambda x: x.cast("double") / n)
    ).otherwise(F.transform(ca, lambda x: x.cast("double")))
