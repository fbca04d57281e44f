"""Python UDF surface (SURVEY.md §2.8) — the deliberate slow path.

NOTE: no ``from __future__ import annotations`` here — pandas_udf
resolves the pd.Series type hints at definition time, and stringified
annotations break that.

The engine's UDF policy (SURVEY.md §2.8):
- scalar Python UDF: exists for API completeness; never on an
  oracle-checked hot path;
- pandas_udf (Arrow-batched, Series→Series): the canonical vectorized
  escape hatch — the reference's ``globe.is_land(lat[], lon[])``
  lookup (precipitation_pipeline.py:160) maps here when exact-parity
  masking is required;
- grouped applyInPandas: UDTF-shaped per-group custom logic (the
  reference's per-group file emit loop, §2.8 U3).
"""

import numpy as np
import pandas as pd

from pyspark.sql import functions as F
from pyspark.sql import types as T


@F.udf(returnType=T.IntegerType())
def type_weight(event_type):
    """Scalar Python UDF (Q34): arbitrary business-rule mapping —
    the point is the row-at-a-time UDF plumbing + SQL registration."""
    return {"click": 1, "view": 2, "purchase": 5, "signup": 7, "error": 0}.get(
        event_type, -1
    )


@F.pandas_udf(T.BooleanType())
def is_land_stub(v: pd.Series) -> pd.Series:
    """Vectorized pandas UDF (U2): stand-in for the global-land-mask
    grid probe — Arrow batch in, numpy vectorized compute, Arrow batch
    out. Swap the body for ``globe.is_land`` for exact reference
    parity; the plumbing is identical."""
    return pd.Series(np.floor(v.values).astype("int64") % 3 == 0)


ZSCORE_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("z_score", T.DoubleType()),
    ]
)


def zscore_per_group(pdf: pd.DataFrame) -> pd.DataFrame:
    """applyInPandas kernel (U3): per-group z-score normalization."""
    v = pdf["value"]
    z = (v - v.mean()) / v.std(ddof=1)
    return pd.DataFrame({"event_id": pdf["event_id"], "z_score": np.round(z * 1e6) / 1e6})


class SplitSentencesUDTF:
    """Python UDTF (Spark 4 user-defined *table* function): one input
    row → N output rows (doc_id, sent_idx, sentence). The lateral-join
    surface for row-expanding Python logic; registered for SQL use via
    ``register_udtfs``. Row-at-a-time Python — demo surface, not a hot
    path (the expression-level equivalent is textops.sentence_stats).
    """

    def eval(self, doc_id, text):
        import re

        if text is None:
            return
        idx = 0
        for part in re.split(r"[.!?]+", text):
            s = part.strip()
            if s:
                yield doc_id, idx, s
                idx += 1


def register_udtfs(spark) -> None:
    """Register the UDTF surface for the SQL entry point."""
    from pyspark.sql.functions import udtf

    spark.udtf.register(
        "split_sentences",
        udtf(SplitSentencesUDTF, returnType="doc_id bigint, sent_idx int, sentence string"),
    )


ASOF_COGROUP_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("ref_event_id", T.LongType()),
    ]
)


def asof_merge_cogrouped(left_grouped, right_grouped):
    """Cogrouped applyInPandas surface: the two groups for one key
    arrive as pandas frames; pandas.merge_asof attaches the most
    recent right row per left row. The UDF-based twin of
    operators.asof.asof_join (which stays JVM-side) — kept as the
    canonical cogroup example and cross-validated against it in tests.

    Caller contract: left columns (user_id, event_id, ts); right
    columns (user_id, ref_event_id, rts). The right side MUST carry
    distinct non-key column names — in a self-cogroup (both sides
    derived from the same scan) Catalyst's attribute dedup otherwise
    prunes the right side's duplicate-named columns away.

    Usage:
        left.groupBy("user_id").cogroup(right.groupBy("user_id"))
            .applyInPandas(asof_merge_cogrouped, ASOF_COGROUP_SCHEMA)
    """

    def merge(l: pd.DataFrame, r: pd.DataFrame) -> pd.DataFrame:
        # a key present on only one side arrives as an EMPTY pdf with
        # no columns — guard both directions before touching columns
        if len(l) == 0:
            return pd.DataFrame(
                {
                    "user_id": pd.array([], dtype="Int64"),
                    "event_id": pd.array([], dtype="Int64"),
                    "ts": pd.array([], dtype="datetime64[us]"),
                    "ref_event_id": pd.array([], dtype="Int64"),
                }
            )
        l = l.sort_values(["ts", "event_id"]).reset_index(drop=True)
        if len(r) == 0:
            out = l[["user_id", "event_id", "ts"]].copy()
            out["ref_event_id"] = pd.array([None] * len(l), dtype="Int64")
            return out
        r = (
            r.sort_values(["rts", "ref_event_id"])
            .rename(columns={"rts": "ts"})[["ts", "ref_event_id"]]
            .reset_index(drop=True)
        )
        merged = pd.merge_asof(l, r, on="ts", direction="backward")
        return merged[["user_id", "event_id", "ts", "ref_event_id"]]

    return merge(left_grouped, right_grouped)
