"""Property-based tests (hypothesis) for semantics-critical helpers.

Each property runs a bounded number of examples, and every example
batches its cases into ONE Spark job — hypothesis explores the input
space, Spark executes once per example, keeping runtime sane.
"""

from __future__ import annotations

import datetime

from hypothesis import given, settings, strategies as st

from pyspark.sql import functions as F

from climate_data_pipelines_spark.functions.scalar import inclusive_month_range
from climate_data_pipelines_spark.operators import climate, scale

_SETTINGS = dict(max_examples=12, deadline=None)

_ym = st.tuples(st.integers(1990, 2030), st.integers(1, 12))
_ts = st.datetimes(
    min_value=datetime.datetime(1990, 1, 1),
    max_value=datetime.datetime(2030, 12, 31),
)


@settings(**_SETTINGS)
@given(
    bounds=st.tuples(_ym, _ym).map(sorted),
    stamps=st.lists(_ts, min_size=1, max_size=30),
)
def test_inclusive_month_range_matches_python_semantics(spark, bounds, stamps):
    (y0, m0), (y1, m1) = bounds
    df = spark.createDataFrame([(t,) for t in stamps], "ts timestamp")
    got = {
        r.ts
        for r in df.filter(inclusive_month_range("ts", y0, m0, y1, m1)).collect()
    }
    # reference semantics: inclusive year-month window, month-granular
    # (precipitation_pipeline.py:66-70)
    want = {
        t
        for t in stamps
        if (y0, m0) <= (t.year, t.month) <= (y1, m1)
    }
    assert got == want


@settings(**_SETTINGS)
@given(
    zoom=st.integers(0, 8),
    pts=st.lists(
        st.tuples(
            st.floats(-84.9, 84.9, allow_nan=False),
            st.floats(-180.0, 179.999, allow_nan=False),
        ),
        min_size=1,
        max_size=30,
    ),
)
def test_tile_assign_always_in_pyramid_bounds(spark, zoom, pts):
    df = spark.createDataFrame(
        [(float(lat), float(lon)) for lat, lon in pts], "lat double, lon double"
    )
    rows = climate.tile_assign(df, zoom).collect()
    n = 2**zoom
    for r in rows:
        assert 0 <= r.x < n
        assert 0 <= r.y < n
        assert r.z == zoom


@settings(**_SETTINGS)
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 5), st.integers(0, 1000)),
        min_size=0,
        max_size=40,
    ),
    dim_keys=st.lists(st.integers(0, 5), min_size=0, max_size=6, unique=True),
    n_salt=st.integers(1, 5),
)
def test_salted_join_equals_plain_join(spark, rows, dim_keys, n_salt):
    fact = spark.createDataFrame(
        [(k, v) for k, v in rows] or [(None, None)], "k int, v int"
    ).filter(F.col("k").isNotNull())
    dim = spark.createDataFrame(
        [(k, f"d{k}") for k in dim_keys] or [(None, None)], "k int, name string"
    ).filter(F.col("k").isNotNull())
    plain = sorted(
        (r.k, r.v, r.name) for r in fact.join(dim, "k").collect()
    )
    salted = sorted(
        (r.k, r.v, r.name)
        for r in scale.salted_join(fact, dim, "k", n_salt=n_salt).collect()
    )
    assert salted == plain


@settings(**_SETTINGS)
@given(
    lat=st.floats(-89.0, 89.0, allow_nan=False),
    lon=st.floats(-179.0, 179.0, allow_nan=False),
    lat_res=st.floats(0.1, 2.0, allow_nan=False),
    lon_res=st.floats(0.1, 2.0, allow_nan=False),
)
def test_polygonize_ring_closed_and_centered(spark, lat, lon, lat_res, lon_res):
    df = spark.createDataFrame([(lat, lon)], "lat double, lon double")
    ring = climate.polygonize(df, lat_res=lat_res, lon_res=lon_res).first().coordinates[0]
    # closed 5-point ring
    assert len(ring) == 5
    assert ring[0] == ring[4]
    # centered on the cell with the given half-resolutions
    lons = [p[0] for p in ring[:4]]
    lats = [p[1] for p in ring[:4]]
    assert abs((max(lons) + min(lons)) / 2 - lon) < 1e-9
    assert abs((max(lats) + min(lats)) / 2 - lat) < 1e-9
    assert abs((max(lons) - min(lons)) - lon_res) < 1e-9
    assert abs((max(lats) - min(lats)) - lat_res) < 1e-9


_word = st.text(alphabet="abcdef", min_size=1, max_size=4)
_doc = st.lists(_word, min_size=0, max_size=25).map(" ".join)


@settings(**_SETTINGS)
@given(
    docs=st.lists(_doc, min_size=1, max_size=8),
    window=st.integers(2, 6),
)
def test_chunk_windows_cover_every_token_in_order(spark, docs, window):
    from climate_data_pipelines_spark.operators import training

    stride = window  # non-overlapping: reassembly must reproduce the doc
    df = spark.createDataFrame(list(enumerate(docs)), "doc_id long, text string")
    out = training.chunk_windows(df, window=window, stride=stride).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append((r.chunk_id, r.chunk_text))
    for i, doc in enumerate(docs):
        toks = doc.split()
        if not toks:
            assert i not in by_doc
            continue
        chunks = [t for _, t in sorted(by_doc[i])]
        assert " ".join(chunks).split() == toks  # full coverage, in order
        assert all(len(c.split()) <= window for c in chunks)


@settings(**_SETTINGS)
@given(docs=st.lists(_doc.filter(lambda d: d.strip()), min_size=1, max_size=8))
def test_line_dedup_idempotent_and_loss_free_on_unique_corpus(spark, docs):
    from climate_data_pipelines_spark.operators import textops

    df = spark.createDataFrame(list(enumerate(docs)), "doc_id long, text string")
    out = textops.line_dedup(df, line_tokens=4)
    # running line_dedup on its own output changes nothing when every
    # surviving line is unique corpus-wide (fixpoint property)
    again = textops.line_dedup(
        out.select(F.col("doc_id"), F.col("text_dedup").alias("text")),
        line_tokens=4,
    )
    a = {(r.doc_id, r.text_dedup) for r in out.collect()}
    b = {(r.doc_id, r.text_dedup) for r in again.collect()}
    assert a == b


@settings(**_SETTINGS)
@given(
    width=st.integers(min_value=1, max_value=40),
    height=st.integers(min_value=1, max_value=40),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_png_roundtrip_property(width, height, seed):
    # pure-python property (no Spark job): encode->decode recovers the
    # exact dimensions and the exact pixel mean for arbitrary gray8
    # images; the decoder's unfilter paths may not perturb pixel sums
    import random

    from climate_data_pipelines_spark.operators import multimodal

    rng = random.Random(seed)
    pixels = bytes(rng.randrange(256) for _ in range(width * height))
    w, h, luma = multimodal.decode_png(
        multimodal.encode_png_gray8(pixels, width, height)
    )
    assert (w, h) == (width, height)
    assert luma == sum(pixels) / (width * height)


@given(
    st.integers(min_value=1, max_value=5),
    st.integers(min_value=1, max_value=5),
    st.data(),
)
@settings(max_examples=25, deadline=None)
def test_bmp_decode_matches_bt601_mean(width, height, data):
    # decode_bmp on an arbitrary constructed 24-bit BMP returns the
    # exact BT.601 mean luma (row padding + bottom-up storage handled)
    from climate_data_pipelines_spark.operators import multimodal
    from tests.test_multimodal_sinks_sources import _bmp24

    rows = [
        [
            (
                data.draw(st.integers(0, 255)),
                data.draw(st.integers(0, 255)),
                data.draw(st.integers(0, 255)),
            )
            for _ in range(width)
        ]
        for _ in range(height)
    ]
    w, h, luma = multimodal.decode_bmp(_bmp24(width, height, rows))
    want = sum(
        0.299 * r + 0.587 * g + 0.114 * b for row in rows for (r, g, b) in row
    ) / (width * height)
    assert (w, h) == (width, height)
    assert abs(luma - want) < 0.01


@given(st.lists(st.integers(0, 255), min_size=1, max_size=30))
@settings(max_examples=25, deadline=None)
def test_pgm_decode_matches_mean(pixels):
    from climate_data_pipelines_spark.operators import multimodal

    n = len(pixels)
    pgm = f"P5 {n} 1 255 ".encode() + bytes(pixels)
    w, h, luma = multimodal.decode_ppm(pgm)
    assert (w, h) == (n, 1)
    assert abs(luma - sum(pixels) / n) < 0.01


@given(
    st.integers(1, 12),
    st.integers(1, 8),
    st.booleans(),
    st.data(),
)
@settings(max_examples=25, deadline=None)
def test_gif_decode_matches_mean(width, height, compress, data):
    # decode_gif on arbitrary constructed grayscale GIFs (both the
    # literal-code path and real LZW with dictionary growth) returns
    # the exact mean pixel value under the identity gray palette
    from climate_data_pipelines_spark.operators import multimodal
    from tests.test_multimodal_sinks_sources import _gif_gray

    n = width * height
    # small alphabet → long dictionary matches; full range → literals
    alphabet = data.draw(st.sampled_from([4, 256]))
    pixels = [data.draw(st.integers(0, alphabet - 1)) for _ in range(n)]
    w, h, luma = multimodal.decode_gif(_gif_gray(width, height, pixels, compress))
    assert (w, h) == (width, height)
    assert abs(luma - sum(pixels) / n) < 0.01


@given(
    width=st.integers(1, 12),
    height=st.integers(1, 12),
    n_frames=st.integers(1, 4),
    colorspace=st.sampled_from(["mono", "420", "420jpeg", "422", "444"]),
    seed=st.integers(0, 2**31 - 1),
)
@settings(max_examples=40, deadline=None)
def test_y4m_roundtrip_property(width, height, n_frames, colorspace, seed):
    # encode→decode is exact for any dims/colorspace/frame count:
    # per-frame mean luma equals numpy's mean of the written Y plane
    import numpy as np

    from climate_data_pipelines_spark.operators import multimodal

    rng = np.random.default_rng(seed)
    frames = [
        rng.integers(0, 256, width * height, dtype=np.uint8).tobytes()
        for _ in range(n_frames)
    ]
    payload = multimodal.encode_y4m(frames, width, height, colorspace=colorspace)
    w, h, fps, lumas = multimodal.decode_y4m(payload)
    assert (w, h, fps) == (width, height, 25.0)
    want = [
        round(float(np.frombuffer(f, dtype=np.uint8).mean()), 4) for f in frames
    ]
    assert lumas == want


_word = st.text(alphabet="abcd", min_size=1, max_size=6)


@given(
    words=st.lists(_word, min_size=1, max_size=20),
    n_merges=st.integers(1, 6),
)
@settings(max_examples=15, deadline=None)
def test_bpe_train_encode_property(spark, words, n_merges):
    # distributed train + encode vs the in-memory reference on an
    # arbitrary small corpus: identical merge tables AND identical
    # token streams (train/encode share one fold, so a greedy-apply
    # divergence would surface here)
    from climate_data_pipelines_spark.operators import textops
    from tests.test_textops import _ref_bpe, _ref_bpe_encode

    corpus = " ".join(words)
    df = spark.createDataFrame([(0, corpus)], "doc_id long, text string")
    got_merges = [
        (r["merge_idx"], r["left"], r["right"], r["pair_count"])
        for r in textops.bpe_train(df, n_merges=n_merges).collect()
    ]
    wc: dict = {}
    for w in words:
        wc[w] = wc.get(w, 0) + 1
    assert got_merges == _ref_bpe(wc, n_merges)
    pairs = [(l, r) for _, l, r, _ in got_merges]
    row = textops.bpe_encode(df, pairs).collect()[0]
    assert row["bpe_tokens"] == _ref_bpe_encode(corpus, pairs)


@settings(**_SETTINGS)
@given(
    values=st.lists(
        st.floats(-100, 100, allow_nan=False, width=32), min_size=1, max_size=25
    ),
    intervals=st.lists(
        st.tuples(st.floats(-120, 120, allow_nan=False, width=32),
                  st.floats(0, 80, allow_nan=False, width=32)),
        min_size=1, max_size=10,
    ),
    bin_width=st.sampled_from([0.7, 5.0, 37.0, 250.0]),
)
def test_binned_range_join_property(spark, values, intervals, bin_width):
    """binned_range_join == plain in-memory interval containment for
    arbitrary (overlapping, empty, multi-bin) intervals and any bin
    width — duplicate-free, boundary-exact (lo inclusive, hi
    exclusive)."""
    from climate_data_pipelines_spark.operators import asof

    fact = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate(values)], "fid long, v double"
    )
    bounds = spark.createDataFrame(
        [(j, float(lo), float(lo + w)) for j, (lo, w) in enumerate(intervals)],
        "bid long, lo double, hi double",
    )
    got = sorted(
        (r["fid"], r["bid"])
        for r in asof.binned_range_join(
            fact, bounds, "v", "lo", "hi", bin_width=bin_width
        ).collect()
    )
    want = sorted(
        (i, j)
        for i, v in enumerate(values)
        for j, (lo, w) in enumerate(intervals)
        if lo <= v < lo + w
    )
    assert got == want


@settings(**_SETTINGS)
@given(
    docs=st.lists(
        st.tuples(st.sampled_from(["a", "b", "c"]),
                  st.integers(1, 8)),
        min_size=2, max_size=30,
    ),
)
def test_temperature_mix_alpha_one_is_identity(spark, docs):
    """alpha=1 derives target_frac == natural share, so keep_rate is
    exactly 1 for every domain — the mix keeps the whole corpus."""
    from climate_data_pipelines_spark.operators import training

    rows = [(i, s, " ".join(["w"] * n)) for i, (s, n) in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = training.temperature_mix(df, alpha=1.0).collect()
    assert len(out) == len(rows)
    assert all(abs(r["keep_rate"] - 1.0) < 1e-9 for r in out)


@settings(**_SETTINGS)
@given(
    toks=st.lists(st.integers(0, 500), min_size=1, max_size=40),
    cap=st.sampled_from([100, 777, 5000]),
    bucket=st.sampled_from([1, 3, 4096]),
)
def test_shard_assign_matches_naive_prefix_sum(spark, toks, cap, bucket):
    """The hierarchical prefix-sum shard assignment must equal the
    naive single-window plan for any token sizes, shard cap, and
    bucket size (including bucket=1: one bucket per doc, offsets
    table does all the work)."""
    from climate_data_pipelines_spark.operators import training

    rows = [(i, " ".join(["w"] * n)) for i, n in enumerate(toks)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_tok"], r["shard"])
        for r in training.shard_assign(
            df, tokens_per_shard=cap, bucket_size=bucket
        ).collect()
    }
    excl = 0
    want = {}
    for i, n in enumerate(toks):
        want[i] = (n, excl // cap)
        excl += n
    assert got == want


@settings(**_SETTINGS)
@given(
    toks=st.lists(st.integers(0, 500), min_size=1, max_size=40),
    ctx=st.sampled_from([64, 257, 2048]),
    bucket=st.sampled_from([1, 3, 4096]),
)
def test_pack_contexts_matches_naive_packing(spark, toks, ctx, bucket):
    """Context packing must equal a driver-side walk of the global
    token stream for any doc sizes, ctx length, and prefix-sum bucket
    size: pieces tile every sequence exactly (zero padding), a doc
    spanning k cuts produces k+1 pieces, zero-token docs pack
    nothing."""
    from climate_data_pipelines_spark.operators import training

    rows = [(i, " ".join(["w"] * n)) for i, n in enumerate(toks)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["doc_id"], r["seq"]): (
            r["doc_offset"], r["seq_offset"], r["n_tok_piece"]
        )
        for r in training.pack_contexts(
            df, ctx_len=ctx, bucket_size=bucket
        ).collect()
    }
    excl = 0
    want = {}
    for i, n in enumerate(toks):
        if n == 0:
            continue
        for seq in range(excl // ctx, (excl + n - 1) // ctx + 1):
            start = max(excl, seq * ctx)
            end = min(excl + n, (seq + 1) * ctx)
            want[(i, seq)] = (start - excl, start - seq * ctx, end - start)
        excl += n
    assert got == want
    # tiling: every sequence except the corpus tail is exactly full
    per_seq: dict[int, int] = {}
    for (_i, seq), (_do, _so, np_) in got.items():
        per_seq[seq] = per_seq.get(seq, 0) + np_
    if per_seq:
        last = max(per_seq)
        assert all(v == ctx for s, v in per_seq.items() if s != last)
        assert 0 < per_seq[last] <= ctx


@settings(**_SETTINGS)
@given(
    toks=st.lists(st.integers(0, 60), min_size=2, max_size=24),
    split=st.integers(1, 23),
    ctx=st.sampled_from([7, 8, 64]),
)
def test_pack_contexts_increment_parity_any_split(spark, toks, split, ctx):
    """Append-only packing parity under hypothesis: for ANY doc sizes,
    split point, and ctx length (including base totals landing exactly
    on a cut), pack_contexts_increment(batch, base_total) equals the
    union repack restricted to batch docs."""
    from climate_data_pipelines_spark.operators import training

    split = min(split, len(toks) - 1)
    rows = [(i, " ".join(["w"] * n)) for i, n in enumerate(toks)]
    base, batch = rows[:split], rows[split:]
    schema = "doc_id long, text string"
    base_df = spark.createDataFrame(base, schema)
    batch_df = spark.createDataFrame(batch, schema)
    base_total = sum(n for _, n in zip(range(split), toks))
    inc = {
        (r["doc_id"], r["seq"]): (
            r["doc_offset"], r["seq_offset"], r["n_tok_piece"]
        )
        for r in training.pack_contexts_increment(
            batch_df, base_total, ctx_len=ctx
        ).collect()
    }
    union = {
        (r["doc_id"], r["seq"]): (
            r["doc_offset"], r["seq_offset"], r["n_tok_piece"]
        )
        for r in training.pack_contexts(
            base_df.unionByName(batch_df), ctx_len=ctx
        ).collect()
        if r["doc_id"] >= split
    }
    assert inc == union


_word = st.text(alphabet="abcdefgh", min_size=1, max_size=3)


@settings(max_examples=8, deadline=None)
@given(
    docs=st.lists(
        st.lists(_word, min_size=0, max_size=24), min_size=2, max_size=14
    ),
    threshold=st.sampled_from([0.7, 0.8, 0.9, 1.0]),
)
def test_small_in_large_containment_lossless_property(spark, docs, threshold):
    """q179's pigeonhole claim under adversarial random corpora: every
    (small, any) pair with cont(small→large) ≥ t must be found —
    including threshold-exact and duplicate-text pairs — and nothing
    below t may appear."""
    from climate_data_pipelines_spark.functions.text import shingles
    from climate_data_pipelines_spark.operators import dedup

    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    small_max = 16
    got = {
        (r.id_small, r.id_large)
        for r in dedup.containment_small_in_large(
            df, k=3, threshold=threshold, small_max=small_max
        ).collect()
    }
    # brute-force ground truth with the ENGINE's shingle definition
    sh_rows = df.select(
        "doc_id", F.array_distinct(shingles("text", 3)).alias("s")
    ).collect()
    sets = {r.doc_id: set(r.s) for r in sh_rows}
    want = set()
    for a, sa in sets.items():
        if not (1 <= len(sa) <= small_max):
            continue
        for b, sb in sets.items():
            if a != b and len(sa & sb) / len(sa) >= threshold:
                want.add((a, b))
    assert got == want


@settings(max_examples=8, deadline=None)
@given(
    docs=st.lists(
        st.lists(_word, min_size=3, max_size=20), min_size=6, max_size=16
    ),
)
def test_trigram_lm_score_all_superset_of_heldout(spark, docs):
    """score_all must reproduce the heldout split's scores EXACTLY (it
    widens the scored set, never changes the LM) — the q181 scorer and
    the q177 scorer may not drift apart."""
    from climate_data_pipelines_spark.operators import training

    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    held = {
        r.doc_id: (r.n_trigrams, r.avg_logscore)
        for r in training.trigram_lm_score(df).collect()
    }
    full = {
        r.doc_id: (r.n_trigrams, r.avg_logscore)
        for r in training.trigram_lm_score(df, score_all=True).collect()
    }
    assert set(held) <= set(full)
    for k, v in held.items():
        assert full[k] == v


@settings(**_SETTINGS)
@given(
    toks=st.lists(st.integers(0, 300), min_size=1, max_size=30),
    batch=st.sampled_from([1, 2, 8]),
    block=st.sampled_from([1, 4, 4096]),
)
def test_length_bucket_batches_matches_naive(spark, toks, batch, block):
    """Length-bucketed batching must equal a driver-side walk for ANY
    doc sizes, batch size, and id-block size (the hierarchical rank's
    internal knob must be invisible): bucket = ceil(log2(n_tok)),
    tile id-ordered members into batches of `batch`, report
    count/max/sum/padding per batch; zero-token docs are excluded and
    every batch except a bucket's last is full."""
    import math

    from climate_data_pipelines_spark.operators import training

    rows = [(i * 7, " ".join(["w"] * n)) for i, n in enumerate(toks)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["len_bucket"], r["batch"]): (
            r["n_docs"], r["max_tok"], r["sum_tok"], r["padding_frac"]
        )
        for r in training.length_bucket_batches(
            df, batch_size=batch, block_size=block
        ).collect()
    }
    by_bucket: dict[int, list[int]] = {}
    for i, n in enumerate(toks):
        if n == 0:
            continue
        by_bucket.setdefault(math.ceil(math.log2(n)), []).append(n)
    want = {}
    for b, lens in by_bucket.items():  # already id-ordered
        for j in range(0, len(lens), batch):
            chunk = lens[j:j + batch]
            mx, sm, nd = max(chunk), sum(chunk), len(chunk)
            # HALF_UP like Spark/DuckDB ROUND, not Python's banker's
            pad = math.floor((nd * mx - sm) * 1e6 / (nd * mx) + 0.5) / 1e6
            want[(b, j // batch)] = (nd, mx, sm, pad)
    assert got == want
    # every batch except a bucket's last is exactly full
    for (b, k), (nd, _mx, _sm, _pad) in got.items():
        if k < max(kk for (bb, kk) in got if bb == b):
            assert nd == batch
