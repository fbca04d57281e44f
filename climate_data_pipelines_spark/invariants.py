"""Invariant checks for rows-only registry queries.

A query whose semantics are approximate or binary (``oracle_sql()``
omitted by design) still has a FALSIFIABLE contract — a sketch has a
bounded error, an ANN path has a recall floor vs its exact twin, a
binary encoder round-trips. The driver's gate for these is only
``rows > 0``; this module carries the real assertions so the replay
harness (tools/check_oracle.py) can print an invariant verdict per
rows-only query instead of a bare row count (VERDICT r4 next-step 5).

Each invariant is ``fn(spark, sf_dir) -> (ok: bool, detail: str)``.
They re-derive the query output themselves (same registry callables),
so they compose with any session the harness uses.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import functions as F


def _recall_vs_exact(spark, sf_dir: str, ann_name: str, floor: float):
    """recall@10 of an ANN query vs the oracle-checked exact q38."""
    from climate_data_pipelines_spark.queries import REGISTRY

    exact: dict = {}
    for r in REGISTRY["q38_cosine_topk"].fn(spark, sf_dir).collect():
        exact.setdefault(r["query_id"], set()).add(r["vec_id"])
    approx: dict = {}
    for r in REGISTRY[ann_name].fn(spark, sf_dir).collect():
        approx.setdefault(r["query_id"], set()).add(r["vec_id"])
    hits = sum(len(exact[q] & approx.get(q, set())) for q in exact)
    total = sum(len(v) for v in exact.values())
    recall = hits / total if total else 0.0
    return recall >= floor, f"recall@10={recall:.3f} (floor {floor})"


def inv_q55(spark, sf_dir):
    return _recall_vs_exact(spark, sf_dir, "q55_ann_lsh_topk", 0.9)


def inv_q73(spark, sf_dir):
    return _recall_vs_exact(spark, sf_dir, "q73_ann_ivf_topk", 0.9)


def inv_q59(spark, sf_dir):
    """approx_count_distinct (HLL++) within 5% of the exact count
    per group — the sketch's documented default rsd is 0.05."""
    from climate_data_pipelines_spark.catalog import load_table
    from climate_data_pipelines_spark.queries import REGISTRY

    approx = {
        r["l_returnflag"]: r["approx_parts"]
        for r in REGISTRY["q59_approx_count_distinct"].fn(spark, sf_dir).collect()
    }
    li = load_table(spark, sf_dir, "lineitem")
    exact = {
        r["l_returnflag"]: r["n"]
        for r in li.groupBy("l_returnflag")
        .agg(F.countDistinct("l_partkey").alias("n"))
        .collect()
    }
    if set(approx) != set(exact):
        return False, f"group sets differ: {sorted(approx)} vs {sorted(exact)}"
    worst = max(abs(approx[k] - exact[k]) / exact[k] for k in exact)
    return worst <= 0.05, f"max relative error {worst:.4f} (bound 0.05)"


def inv_q126(spark, sf_dir):
    """Semantic-dedup keeper quality: >=80% of EXACT cosine>=0.99
    near-dup pairs (planted perturbed copies, per the q43-twin blocked
    exact path) land in the same cluster."""
    from climate_data_pipelines_spark.catalog import load_table
    from climate_data_pipelines_spark.operators import similarity

    base = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 40)
    perturbed = base.select(
        (F.col("vec_id") + 10000).alias("vec_id"),
        F.transform("embedding", lambda x, i: x * (1.0 + 0.002 * (i % 3)))
        .cast("array<float>")
        .alias("embedding"),
        "label",
    )
    emb = base.select("vec_id", "embedding", "label").unionByName(perturbed)
    exact = {
        (r.id_a, r.id_b)
        for r in similarity.embedding_neardup_pairs(
            emb.withColumn("_one", F.lit(1)), block_col="_one", threshold=0.99
        ).collect()
    }
    if not exact:
        return False, "no exact near-dup pairs planted — harness bug"
    clusters = {
        r.vec_id: r.cluster
        for r in similarity.semantic_dedup(
            emb, threshold=0.99, corpus_n=emb.count()
        ).collect()
    }
    covered = sum(1 for a, b in exact if clusters.get(a) == clusters.get(b))
    frac = covered / len(exact)
    return frac >= 0.8, f"pair coverage {frac:.3f} ({covered}/{len(exact)}, floor 0.8)"


def inv_q135(spark, sf_dir):
    """MVT wire-format roundtrip: re-encode the q135 pyramid's blobs
    and protobuf-decode one tile — layer name, version 2, extent 4096,
    >=1 feature, all decoded points inside the extent."""
    from climate_data_pipelines_spark import sinks
    from climate_data_pipelines_spark.catalog import load_table
    from climate_data_pipelines_spark.functions import mvt
    from climate_data_pipelines_spark.operators import climate

    ev = load_table(spark, sf_dir, "events")
    pts = (
        ev.filter(F.col("value").isNotNull() & ~F.isnan("value"))
        .withColumn("lat", (F.pmod("user_id", F.lit(170)) - 85).cast("double") + 0.25)
        .withColumn(
            "lon", (F.pmod("event_id", F.lit(360)) - 180).cast("double") + 0.3125
        )
    )
    tiled = climate.tile_assign(pts, 4)
    blob = sinks.encode_mvt_tiles(tiled, layer_name="events").first()
    layers = mvt.decode_tile(bytes(blob.tile))
    if len(layers) != 1:
        return False, f"expected 1 layer, decoded {len(layers)}"
    layer = layers[0]
    if layer["name"] != "events" or layer["version"] != 2 or layer["extent"] != 4096:
        return False, f"layer header wrong: {layer['name']}/{layer['version']}/{layer['extent']}"
    feats = layer["features"]
    if not feats:
        return False, "tile decoded to zero features"
    for f_ in feats:
        px, py = mvt.decode_point(f_["commands"])
        if not (0 <= px <= 4096 and 0 <= py <= 4096):
            return False, f"point ({px},{py}) outside extent"
    return True, (
        f"tile z{blob.z}/{blob.x}/{blob.y} roundtrips: "
        f"{len(feats)} features, header ok"
    )


def inv_q140(spark, sf_dir):
    return _recall_vs_exact(spark, sf_dir, "q140_pq_ann_topk", 0.9)


def inv_q144(spark, sf_dir):
    """Audio features on the deterministic WAV fixture: every doc
    decodes (no quarantined nulls), and duration_s is exactly
    n_samples / sample_rate (to the operator's 1e-6 rounding)."""
    from climate_data_pipelines_spark.queries import REGISTRY

    rows = REGISTRY["q144_audio_features"].fn(spark, sf_dir).collect()
    if not rows:
        return False, "no rows"
    bad_null = [r["doc_id"] for r in rows if r["sample_rate"] is None]
    if bad_null:
        return False, f"{len(bad_null)} docs quarantined on the WAV fixture"
    worst = max(
        abs(r["duration_s"] - r["n_samples"] / r["sample_rate"]) for r in rows
    )
    return worst <= 1e-6, (
        f"{len(rows)} docs decoded, max duration error {worst:.2e}"
    )


def inv_q155(spark, sf_dir):
    """JPEG features vs the lossless PNG twin: q54 and q155 render the
    SAME pixel layout from each document, so the PNG path's exact
    mean_luma is ground truth for the lossy JPEG decode. Every doc
    must decode with identical dimensions and mean_luma within 3 gray
    levels (quantization at the fixture quality preserves DC well
    under that)."""
    from climate_data_pipelines_spark.queries import REGISTRY

    png = {r["doc_id"]: r for r in
           REGISTRY["q54_image_features"].fn(spark, sf_dir).collect()}
    jpg = {r["doc_id"]: r for r in
           REGISTRY["q155_jpeg_features"].fn(spark, sf_dir).collect()}
    if not jpg or set(jpg) != set(png):
        return False, f"doc mismatch: {len(jpg)} jpeg vs {len(png)} png"
    dim_bad = [d for d in jpg
               if (jpg[d]["width"], jpg[d]["height"])
               != (png[d]["width"], png[d]["height"])]
    if dim_bad:
        return False, f"{len(dim_bad)} docs with dimension drift"
    worst = max(abs(jpg[d]["mean_luma"] - png[d]["mean_luma"]) for d in jpg)
    return worst <= 3.0, (
        f"{len(jpg)} docs decoded, max |luma - png twin| = {worst:.3f}"
    )


def inv_q156(spark, sf_dir):
    """Sketch rank-error contract: each approx percentile must fall in
    the EXACT percentile band [q-0.01, q+0.01] for its group (GK
    accuracy 10000 ⇒ rank error ≤ 1e-4·n, far inside the band)."""
    from climate_data_pipelines_spark.catalog import load_table
    from climate_data_pipelines_spark.queries import REGISTRY

    approx = {r["o_orderstatus"]: r for r in
              REGISTRY["q156_approx_percentiles"].fn(spark, sf_dir).collect()}
    bands = F.expr(
        "percentile(o_totalprice, array(0.24, 0.26, 0.49, 0.51, "
        "0.74, 0.76, 0.98, 1.0))"
    )
    exact = {
        r["o_orderstatus"]: r["b"]
        for r in load_table(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(bands.alias("b"))
        .collect()
    }
    if set(approx) != set(exact):
        return False, "group mismatch"
    worst = []
    for g, row in approx.items():
        b = exact[g]
        for i, p in enumerate(["p25", "p50", "p75", "p99"]):
            lo, hi = b[2 * i], b[2 * i + 1]
            if not (lo <= row[p] <= hi):
                worst.append(f"{g}.{p}={row[p]:.2f} outside [{lo:.2f},{hi:.2f}]")
    return not worst, (
        "; ".join(worst) if worst
        else f"{len(approx)} groups x 4 percentiles inside exact bands"
    )


def inv_q157(spark, sf_dir):
    """Video features on the deterministic Y4M fixture: every doc
    decodes (no quarantined nulls), duration_s == n_frames/fps, and
    per-doc mean_luma equals the EXACT numpy mean of the zero-padded
    utf-8 text bytes (the fixture writes those bytes verbatim as the
    luma planes, so the decoder has a closed-form ground truth)."""
    import numpy as np

    from climate_data_pipelines_spark.catalog import load_table
    from climate_data_pipelines_spark.queries import REGISTRY

    rows = REGISTRY["q157_video_features"].fn(spark, sf_dir).collect()
    if not rows:
        return False, "no rows"
    bad_null = [r["doc_id"] for r in rows if r["width"] is None]
    if bad_null:
        return False, f"{len(bad_null)} docs quarantined on the Y4M fixture"
    dur_bad = [
        r["doc_id"] for r in rows
        if abs(r["duration_s"] - r["n_frames"] / r["fps"]) > 1e-6
    ]
    if dur_bad:
        return False, f"{len(dur_bad)} docs with duration != n_frames/fps"
    texts = {
        r["doc_id"]: (r["text"] or " ")
        for r in load_table(spark, sf_dir, "documents")
        .select("doc_id", "text").collect()
    }
    px, max_frames = 16 * 16, 8
    worst = 0.0
    for r in rows:
        data = texts[r["doc_id"]].encode("utf-8")[: px * max_frames]
        n = max(1, -(-len(data) // px))
        padded = np.frombuffer(data.ljust(n * px, b"\x00"), dtype=np.uint8)
        # operator rounds per-frame means to 4 dp before averaging
        frame_means = [
            round(float(padded[i * px : (i + 1) * px].mean()), 4)
            for i in range(n)
        ]
        exact = round(sum(frame_means) / n, 4)
        worst = max(worst, abs(r["mean_luma"] - exact))
        if r["n_frames"] != n:
            return False, f"doc {r['doc_id']}: n_frames {r['n_frames']} != {n}"
    return worst <= 1e-9, (
        f"{len(rows)} docs decoded, max |mean_luma - exact| = {worst:.2e}"
    )


def inv_q158(spark, sf_dir):
    """Frame sampling vs the q157 feature pass: per doc, the number of
    sampled frames must be exactly ceil(n_frames/2) and the kept
    frame_idx values must be the even indices (stride 2 from 0)."""
    from climate_data_pipelines_spark.queries import REGISTRY

    feats = {r["doc_id"]: r["n_frames"] for r in
             REGISTRY["q157_video_features"].fn(spark, sf_dir).collect()}
    sampled: dict = {}
    for r in REGISTRY["q158_frame_sample"].fn(spark, sf_dir).collect():
        sampled.setdefault(r["doc_id"], []).append(r["frame_idx"])
    if not sampled or set(sampled) != set(feats):
        return False, f"doc mismatch: {len(sampled)} sampled vs {len(feats)}"
    for d, idxs in sampled.items():
        want = list(range(0, feats[d], 2))
        if sorted(idxs) != want:
            return False, f"doc {d}: sampled idxs {sorted(idxs)} != {want}"
    n_frames = sum(len(v) for v in sampled.values())
    return True, f"{len(sampled)} docs, {n_frames} sampled frames, stride-2 exact"


def inv_q161(spark, sf_dir):
    """PageRank vs an independent numpy power iteration on the SAME
    edge set (rebuilt via the oracle-green q122 candidate+verify
    stages): per-node rank within 1e-6, total rank = 1."""
    import numpy as np

    from climate_data_pipelines_spark.catalog import load_table
    from climate_data_pipelines_spark.operators import dedup
    from climate_data_pipelines_spark.queries import (
        MINHASH_BANDS, MINHASH_N, REGISTRY,
    )

    docs = load_table(spark, sf_dir, "documents")
    sigs = dedup.minhash_signatures(docs, k=3, n_hashes=MINHASH_N)
    cand = dedup.minhash_lsh_candidates(sigs, n_hashes=MINHASH_N, bands=MINHASH_BANDS)
    edges = [
        (r["id_a"], r["id_b"])
        for r in dedup.jaccard_on_pairs(docs, cand, k=3)
        .filter("jaccard >= 0.5").select("id_a", "id_b").collect()
    ]
    got = {r["doc_id"]: r["rank"]
           for r in REGISTRY["q161_pagerank"].fn(spark, sf_dir).collect()}
    if not edges:
        return len(got) == 0, "no verified edges and no ranked nodes"
    total = sum(got.values())
    if abs(total - 1.0) > 1e-9:
        return False, f"ranks sum to {total}, not 1"
    nodes = sorted({x for e in edges for x in e})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    adj: dict = {}
    for a, b in edges:
        adj.setdefault(idx[a], []).append(idx[b])
        adj.setdefault(idx[b], []).append(idx[a])
    r = np.full(n, 1.0 / n)
    d = 0.85
    for _ in range(200):
        nxt = np.full(n, (1.0 - d) / n)
        for u, vs in adj.items():
            share = d * r[u] / len(vs)
            for v in vs:
                nxt[v] += share
        if np.abs(nxt - r).sum() < 1e-12:
            r = nxt
            break
        r = nxt
    if set(got) != set(nodes):
        return False, f"node set mismatch: {len(got)} vs {len(nodes)}"
    worst = max(abs(got[v] - r[idx[v]]) for v in nodes)
    # the operator only contracts ~tol=1e-6 to the fixed point while
    # the numpy reference converges to 1e-12: accept 2e-6 so the gate
    # has headroom when the iterate stops exactly at its bound
    # (ADVICE r5 — a 1e-6 threshold on a 1e-6 guarantee is zero-margin)
    return worst <= 2e-6, (
        f"{n} nodes, {len(edges)} edges, max |rank - numpy| = {worst:.2e}"
    )


def inv_q162(spark, sf_dir):
    """BPE merge table vs an independent in-memory Sennrich BPE on the
    same word counts: identical (merge_idx, left, right, pair_count)
    sequence — same greedy apply, same (count desc, pair asc)
    tie-break."""
    from climate_data_pipelines_spark.catalog import load_table
    from climate_data_pipelines_spark.queries import REGISTRY

    got = [
        (r["merge_idx"], r["left"], r["right"], r["pair_count"])
        for r in REGISTRY["q162_bpe_merges"].fn(spark, sf_dir).collect()
    ]
    wc: dict = {}
    for r in load_table(spark, sf_dir, "documents").select("text").collect():
        for w in (r["text"] or "").split():
            if w:
                wc[w] = wc.get(w, 0) + 1
    words = {}
    for w, c in wc.items():
        k = tuple(list(w) + ["</w>"])
        words[k] = words.get(k, 0) + c
    want = []
    for i in range(10):
        pairs: dict = {}
        for syms, c in words.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + c
        if not pairs:
            break
        (l, rr), c = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if c < 2:
            break
        want.append((i, l, rr, c))
        new: dict = {}
        for syms, cnt in words.items():
            out: list = []
            for s in syms:
                if out and out[-1] == l and s == rr:
                    out[-1] = l + rr
                else:
                    out.append(s)
            new[tuple(out)] = new.get(tuple(out), 0) + cnt
        words = new
    if got != want:
        return False, (
            f"merge tables differ: spark {got[:3]}... vs ref {want[:3]}..."
        )
    return True, f"{len(got)} merges identical to the in-memory reference"


def inv_q163(spark, sf_dir):
    """Trained-vocab tokenization vs an independent in-memory BPE
    encode: per-doc token ARRAYS identical for every document (the
    engine-side arrays come from the same ``bpe_encode`` projection
    the query counts), and the query's ``n_bpe_tokens`` equals each
    array's length (ADVICE r5: the gate now proves exactly what the
    query description claims)."""
    from climate_data_pipelines_spark.catalog import load_table
    from climate_data_pipelines_spark.operators import textops
    from climate_data_pipelines_spark.queries import REGISTRY

    docs = load_table(spark, sf_dir, "documents")
    merges = [
        (r["left"], r["right"])
        for r in textops.bpe_train(docs, n_merges=6).collect()
    ]
    got = {r["doc_id"]: r["n_bpe_tokens"]
           for r in REGISTRY["q163_bpe_tokenize"].fn(spark, sf_dir).collect()}
    arrays = {r["doc_id"]: list(r["bpe_tokens"])
              for r in textops.bpe_encode(docs, merges).collect()}

    def encode(text):
        out: list = []
        for w in (text or "").split():
            if not w:
                continue
            syms = list(w) + ["</w>"]
            for l, r in merges:
                nxt: list = []
                for s in syms:
                    if nxt and nxt[-1] == l and s == r:
                        nxt[-1] = l + r
                    else:
                        nxt.append(s)
                syms = nxt
            out.extend(syms)
        return out

    texts = {r["doc_id"]: r["text"]
             for r in docs.select("doc_id", "text").collect()}
    if set(got) != set(texts) or set(arrays) != set(texts):
        return False, f"doc mismatch: {len(got)} vs {len(texts)}"
    bad = [d for d in got if arrays[d] != encode(texts[d])]
    if bad:
        return False, f"{len(bad)} docs with token-array drift (e.g. {bad[:3]})"
    bad = [d for d in got if got[d] != len(arrays[d])]
    if bad:
        return False, f"{len(bad)} docs where n_bpe_tokens != len(bpe_tokens)"
    return True, f"{len(got)} docs, trained-vocab token arrays identical"


def inv_q164(spark, sf_dir):
    """Ranked-kernel BPE tokenize vs BOTH engine's expression-fold
    encoder and an independent in-memory ranked encode: per-doc token
    arrays identical across all three, and q164's n_bpe_tokens equals
    the array length. Pins the lowest-rank-first kernel's equivalence
    to replaying merges in training order."""
    from climate_data_pipelines_spark.catalog import load_table
    from climate_data_pipelines_spark.operators import textops
    from climate_data_pipelines_spark.queries import REGISTRY

    docs = load_table(spark, sf_dir, "documents")
    merges = [
        (r["left"], r["right"])
        for r in textops.bpe_train(docs, n_merges=24, batch_m=8).collect()
    ]
    got = {r["doc_id"]: r["n_bpe_tokens"]
           for r in REGISTRY["q164_bpe_tokenize_ranked"].fn(spark, sf_dir).collect()}
    ranked = {r["doc_id"]: list(r["bpe_tokens"])
              for r in textops.bpe_encode_ranked(docs, merges).collect()}
    folded = {r["doc_id"]: list(r["bpe_tokens"])
              for r in textops.bpe_encode(docs, merges).collect()}

    rk = {p: i for i, p in enumerate(merges)}

    def encode(text):
        out: list = []
        for w in (text or "").split():
            if not w:
                continue
            syms = list(w) + ["</w>"]
            while len(syms) > 1:
                best = min(
                    (rk[p] for p in zip(syms, syms[1:]) if p in rk),
                    default=None,
                )
                if best is None:
                    break
                l, r = merges[best]
                nxt: list = []
                i = 0
                while i < len(syms):
                    if i < len(syms) - 1 and syms[i] == l and syms[i + 1] == r:
                        nxt.append(l + r)
                        i += 2
                    else:
                        nxt.append(syms[i])
                        i += 1
                syms = nxt
            out.extend(syms)
        return out

    texts = {r["doc_id"]: r["text"]
             for r in docs.select("doc_id", "text").collect()}
    if not (set(got) == set(texts) == set(ranked) == set(folded)):
        return False, "doc-id set mismatch across encoders"
    bad = [d for d in texts if ranked[d] != folded[d]]
    if bad:
        return False, f"{len(bad)} docs where ranked != expression fold"
    bad = [d for d in texts if ranked[d] != encode(texts[d])]
    if bad:
        return False, f"{len(bad)} docs where ranked != in-memory reference"
    bad = [d for d in texts if got[d] != len(ranked[d])]
    if bad:
        return False, f"{len(bad)} docs where n_bpe_tokens != len(tokens)"
    return True, (
        f"{len(texts)} docs, ranked kernel == expression fold == "
        f"in-memory reference ({len(merges)} merges)"
    )


def _neardup_invariant(spark, sf_dir, qname, payload_fn_name, hashes_fn_name,
                       hash_col, offset, noun):
    """Shared verdict for the perceptual near-dup family
    (q167/q169/q170): the query's pair set must EXACTLY equal a
    brute-force all-pairs Hamming<=3 scan over the same per-item
    fingerprints (the banding path must neither miss a pair —
    pigeonhole at bands > hamming_max — nor emit an unverified one),
    and every planted one-byte edit must be recovered. One
    implementation so the reference construction cannot drift from
    the query's (r6 code-review finding)."""
    import pyspark.sql.functions as F

    from climate_data_pipelines_spark.catalog import load_table
    from climate_data_pipelines_spark.operators import multimodal
    from climate_data_pipelines_spark.queries import REGISTRY

    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in REGISTRY[qname].fn(spark, sf_dir).collect()
    }
    docs = load_table(spark, sf_dir, "documents")
    edited = docs.filter(F.col("doc_id") < 25).select(
        (F.col("doc_id") + offset).alias("doc_id"),
        F.concat(
            F.substring(F.col("text"), 1, F.length("text") - 1), F.lit("#")
        ).alias("text"),
    )
    corpus = docs.select("doc_id", "text").unionByName(edited)
    payload_fn = getattr(multimodal, payload_fn_name)
    hashes_fn = getattr(multimodal, hashes_fn_name)
    hashes = {
        r["doc_id"]: r[hash_col]
        for r in hashes_fn(payload_fn(corpus)).collect()
        if r[hash_col] is not None
    }
    ids = sorted(hashes)
    exact = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            d = bin((hashes[a] ^ hashes[b]) & ((1 << 64) - 1)).count("1")
            if d <= 3:
                exact[(a, b)] = d
    if got != exact:
        miss = set(exact) - set(got)
        extra = set(got) - set(exact)
        return False, (
            f"pair-set mismatch: {len(miss)} missed, {len(extra)} extra "
            f"(e.g. {list(miss)[:3] or list(extra)[:3]})"
        )
    planted = [(v, v + offset) for v in range(25)]
    missing = [pr for pr in planted if pr not in got]
    if missing:
        return False, f"{len(missing)} planted one-byte pairs missed: {missing[:5]}"
    return True, (
        f"{len(got)} near-dup pairs == brute-force Hamming<=3 scan over "
        f"{len(ids)} {noun}; all 25 planted one-byte edits recovered"
    )


def inv_q167(spark, sf_dir):
    return _neardup_invariant(
        spark, sf_dir, "q167_image_neardup",
        "text_as_png_payload", "image_dhashes", "dhash", 500000, "images",
    )


def inv_q169(spark, sf_dir):
    return _neardup_invariant(
        spark, sf_dir, "q169_audio_neardup",
        "text_as_wav_payload", "audio_ehashes", "ehash", 600000, "clips",
    )


def inv_q170(spark, sf_dir):
    return _neardup_invariant(
        spark, sf_dir, "q170_video_neardup",
        "text_as_y4m_payload", "video_vhashes", "vhash", 700000, "clips",
    )


# ---------------------------------------------------------------------------
# round-7 gates for the grandfathered r1–r4 rows-only queries: every
# rows-only registry query is invariant-checked in the replay (the
# discipline VERDICT r6 "what's wrong #2" flagged as unevenly applied)
# ---------------------------------------------------------------------------


def inv_q34(spark, sf_dir):
    """Scalar Python UDF vs its built-in twin: the type_weight mapping
    re-expressed as a JVM-side map literal gives identical weights for
    every event."""
    from climate_data_pipelines_spark.catalog import load_table
    from climate_data_pipelines_spark.queries import REGISTRY

    got = {
        r["event_id"]: r["weight"]
        for r in REGISTRY["q34_python_udf"].fn(spark, sf_dir).collect()
    }
    weights = {"click": 1, "view": 2, "purchase": 5, "signup": 7, "error": 0}
    m = F.create_map(
        *[F.lit(x) for kv in weights.items() for x in kv]
    )
    ev = load_table(spark, sf_dir, "events")
    want = {
        r["event_id"]: r["w"]
        for r in ev.select(
            "event_id",
            F.coalesce(m[F.col("event_type")], F.lit(-1)).alias("w"),
        ).collect()
    }
    if got != want:
        bad = [k for k in want if got.get(k) != want[k]][:5]
        return False, f"{len(want) - sum(got.get(k) == want[k] for k in want)} weight mismatches (e.g. ids {bad})"
    return True, f"{len(got)} UDF weights == built-in map-literal twin"


def inv_q42(spark, sf_dir):
    """xxhash64 SimHash vs an independent reconstruction: collect the
    per-token xxhash64 vocabulary once (the only shared primitive —
    xxhash64 has no pure-Python twin in this container), then rebuild
    every fingerprint's 64 bit-votes and sign-pack in numpy. Catches
    any defect in the explode/conditional-sum/packing plan."""
    import numpy as np

    from climate_data_pipelines_spark.catalog import load_table
    from climate_data_pipelines_spark.functions.text import tokens
    from climate_data_pipelines_spark.queries import REGISTRY

    docs = load_table(spark, sf_dir, "documents")
    vocab = {
        r["tok"]: r["h"]
        for r in docs.select(F.explode(tokens("text")).alias("tok"))
        .distinct()
        .withColumn("h", F.xxhash64("tok"))
        .collect()
    }
    shifts = np.arange(64, dtype=np.uint64)
    want = {}
    for r in docs.select("doc_id", tokens("text").alias("toks")).collect():
        if not r["toks"]:
            continue  # no tokens -> no exploded rows -> no output row
        hs = np.array(
            [vocab[t] for t in r["toks"]], dtype=np.int64
        ).astype(np.uint64)
        bits = (hs[:, None] >> shifts) & np.uint64(1)
        votes = (2 * bits.astype(np.int64) - 1).sum(axis=0)
        fp = int(((votes > 0).astype(np.uint64) << shifts).sum())
        want[r["doc_id"]] = fp - (1 << 64) if fp >= 1 << 63 else fp
    got = {
        r["doc_id"]: r["simhash"]
        for r in REGISTRY["q42_simhash"].fn(spark, sf_dir).collect()
    }
    if got != want:
        bad = [k for k in want if got.get(k) != want.get(k)][:5]
        return False, f"fingerprint mismatch on {len(bad)}+ docs (e.g. {bad})"
    return True, f"{len(got)} fingerprints == numpy vote/pack reconstruction"


def inv_q54(spark, sf_dir):
    """Image features vs raw bytes: the PNG fixtures render each doc's
    utf-8 bytes as gray8 pixels, so width/height follow the documented
    shape formula and mean_luma equals the numpy mean of the padded
    byte array — independent of BOTH the PNG encoder and decoder."""
    from climate_data_pipelines_spark.catalog import load_table
    from climate_data_pipelines_spark.queries import REGISTRY

    got = {
        r["doc_id"]: (r["width"], r["height"], r["mean_luma"])
        for r in REGISTRY["q54_image_features"].fn(spark, sf_dir).collect()
    }
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    bad = []
    for r in docs:
        pix = (r["text"] or "").encode("utf-8")[:4096]
        w = max(8, min(64, int(len(pix) ** 0.5) + 1))
        h = max(1, -(-len(pix) // w))
        padded = pix.ljust(w * h, b"\x00")
        mean = sum(padded) / (w * h)
        gw, gh, gm = got.get(r["doc_id"], (None, None, None))
        if gw != w or gh != h or gm is None or abs(gm - mean) > 1e-9:
            bad.append(r["doc_id"])
    if bad:
        return False, f"{len(bad)} docs off (e.g. {bad[:5]})"
    return True, f"{len(docs)} images: shape + mean_luma == raw-byte stats"


def inv_q69(spark, sf_dir):
    """Seeded Bernoulli sample: deterministic under re-run, row count
    inside 6-sigma binomial bounds, and every sampled row exists in
    the source (semi-join back is lossless)."""
    from climate_data_pipelines_spark.catalog import load_table
    from climate_data_pipelines_spark.queries import REGISTRY

    a = {(r[0], r[1]) for r in REGISTRY["q69_sample"].fn(spark, sf_dir).collect()}
    b = {(r[0], r[1]) for r in REGISTRY["q69_sample"].fn(spark, sf_dir).collect()}
    if a != b:
        return False, f"seeded sample not deterministic: {len(a ^ b)} rows differ"
    n_src = load_table(spark, sf_dir, "lineitem").count()
    p = 0.1
    mean, sigma = n_src * p, (n_src * p * (1 - p)) ** 0.5
    if abs(len(a) - mean) > 6 * sigma:
        return False, f"|{len(a)} - {mean:.0f}| > 6 sigma ({sigma:.1f})"
    src = {
        (r[0], r[1])
        for r in load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_linenumber")
        .collect()
    }
    if not a <= src:
        return False, f"{len(a - src)} sampled rows not in source"
    return True, (
        f"deterministic, {len(a)} rows within 6 sigma of {mean:.0f}, all in source"
    )


def inv_q72(spark, sf_dir):
    """MLlib MinHashLSH candidates: reported estimated distance stays
    <= the threshold, pairs are canonical (a<b, unique), every
    exact-duplicate shingle-set pair is recovered with distance 0
    (identical vectors collide in every hash table), and the reported
    distance tracks the true raw-shingle Jaccard distance within 0.02
    (HashingTF collisions at 2^18 features are the only slack)."""
    from climate_data_pipelines_spark.catalog import load_table
    from climate_data_pipelines_spark.functions.text import shingles
    from climate_data_pipelines_spark.queries import REGISTRY

    rows = REGISTRY["q72_minhash_lsh_ml"].fn(spark, sf_dir).collect()
    pairs = {(r["id_a"], r["id_b"]): r["jaccard_dist"] for r in rows}
    if len(pairs) != len(rows):
        return False, "duplicate pairs in output"
    if any(a >= b for a, b in pairs):
        return False, "non-canonical pair ordering"
    if any(d < 0 or d > 0.9 + 1e-9 for d in pairs.values()):
        return False, "distance outside [0, max_jaccard_distance]"
    sets = {
        r["doc_id"]: frozenset(r["sh"])
        for r in load_table(spark, sf_dir, "documents")
        .select("doc_id", F.array_distinct(shingles("text", 3)).alias("sh"))
        .filter(F.size("sh") > 0)
        .collect()
    }
    ids = sorted(sets)
    checked = 0
    for (a, b), d in pairs.items():
        true_d = 1.0 - len(sets[a] & sets[b]) / len(sets[a] | sets[b])
        if abs(d - true_d) > 0.02:
            return False, f"pair ({a},{b}) est {d} vs true {true_d:.4f}"
        checked += 1
    by_set: dict = {}
    for i in ids:
        by_set.setdefault(sets[i], []).append(i)
    missing = [
        (a, b)
        for dup_ids in by_set.values()
        for ai, a in enumerate(dup_ids)
        for b in dup_ids[ai + 1:]
        if (a, b) not in pairs or pairs[(a, b)] > 1e-9
    ]
    if missing:
        return False, f"exact-duplicate pairs missed: {missing[:5]}"
    return True, (
        f"{checked} pairs within 0.02 of true Jaccard, all exact dups at d=0"
    )


def inv_q84(spark, sf_dir):
    """Stratified sampleBy: deterministic under re-run, strata limited
    to the requested fractions, per-stratum counts inside 6-sigma
    binomial bounds (exact for the p=1.0 stratum), rows a subset of
    the source."""
    from collections import Counter

    from climate_data_pipelines_spark.catalog import load_table
    from climate_data_pipelines_spark.queries import REGISTRY

    fractions = {
        "click": 0.05, "view": 0.02, "purchase": 0.5, "signup": 0.5,
        "error": 1.0,
    }
    a = {
        (r["event_id"], r["event_type"])
        for r in REGISTRY["q84_stratified_sample"].fn(spark, sf_dir).collect()
    }
    b = {
        (r["event_id"], r["event_type"])
        for r in REGISTRY["q84_stratified_sample"].fn(spark, sf_dir).collect()
    }
    if a != b:
        return False, f"seeded sampleBy not deterministic: {len(a ^ b)} differ"
    src = {
        (r["event_id"], r["event_type"])
        for r in load_table(spark, sf_dir, "events")
        .select("event_id", "event_type")
        .collect()
    }
    if not a <= src:
        return False, f"{len(a - src)} sampled rows not in source"
    if {t for _, t in a} - set(fractions):
        return False, "stratum outside the fraction map"
    src_n = Counter(t for _, t in src)
    got_n = Counter(t for _, t in a)
    for t, p in fractions.items():
        n, mean = got_n.get(t, 0), src_n.get(t, 0) * p
        if p == 1.0:
            if n != src_n.get(t, 0):
                return False, f"stratum {t}: p=1.0 but {n} != {src_n.get(t)}"
            continue
        sigma = (src_n.get(t, 0) * p * (1 - p)) ** 0.5
        if abs(n - mean) > 6 * sigma + 5:
            return False, f"stratum {t}: {n} vs mean {mean:.0f} (sigma {sigma:.1f})"
    return True, f"deterministic, {len(a)} rows, all strata in binomial bounds"


def inv_q88(spark, sf_dir):
    """Mergeable HLL rollup: the union of per-day sketches estimates
    the true distinct user count within 5%, and the exact companion
    aggregates (n_events, n_days) are exactly right."""
    from climate_data_pipelines_spark.catalog import load_table
    from climate_data_pipelines_spark.queries import REGISTRY

    row = REGISTRY["q88_hll_sketch_merge"].fn(spark, sf_dir).collect()[0]
    ev = load_table(spark, sf_dir, "events")
    exact = ev.agg(
        F.countDistinct("user_id").alias("u"),
        F.count("*").alias("n"),
        F.countDistinct(F.to_date("ts")).alias("d"),
    ).collect()[0]
    if row["n_events"] != exact["n"]:
        return False, f"n_events {row['n_events']} != {exact['n']}"
    if row["n_days"] != exact["d"]:
        return False, f"n_days {row['n_days']} != {exact['d']}"
    err = abs(row["distinct_users_est"] - exact["u"]) / exact["u"]
    return err <= 0.05, (
        f"HLL union est {row['distinct_users_est']} vs exact {exact['u']} "
        f"(rel err {err:.4f}, bound 0.05)"
    )


def inv_q89(spark, sf_dir):
    """Python UDTF vs an in-memory reference: re-split every collected
    text with the same sentence rule in driver Python and compare the
    full (doc_id, sent_idx, sentence) set."""
    import re

    from climate_data_pipelines_spark.catalog import load_table
    from climate_data_pipelines_spark.queries import REGISTRY

    got = {
        (r["doc_id"], r["sent_idx"], r["sentence"])
        for r in REGISTRY["q89_udtf_sentences"].fn(spark, sf_dir).collect()
    }
    want = set()
    for r in load_table(spark, sf_dir, "documents").select("doc_id", "text").collect():
        if r["text"] is None:
            continue
        idx = 0
        for part in re.split(r"[.!?]+", r["text"]):
            s = part.strip()
            if s:
                want.add((r["doc_id"], idx, s))
                idx += 1
    if got != want:
        return False, f"{len(got ^ want)} sentence rows differ"
    return True, f"{len(got)} UDTF rows == driver re-split"


def inv_q91(spark, sf_dir):
    """Cogrouped-pandas as-of join vs the JVM-side asof.asof_join on
    the identical left/right split: per-left-row matched ref_event_id
    must agree exactly, and no left row may be dropped."""
    from climate_data_pipelines_spark.catalog import load_table
    from climate_data_pipelines_spark.operators import asof
    from climate_data_pipelines_spark.queries import REGISTRY

    got = {
        (r["user_id"], r["event_id"]): r["ref_event_id"]
        for r in REGISTRY["q91_cogrouped_asof"].fn(spark, sf_dir).collect()
    }
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_id", "ts")
    left = ev.filter(F.pmod("event_id", F.lit(2)) == 0)
    right = ev.filter(F.pmod("event_id", F.lit(2)) == 1).select(
        "user_id",
        F.col("event_id").alias("ref_event_id"),
        F.col("ts").alias("rts"),
    )
    want = {
        (r["user_id"], r["event_id"]): r["ref_event_id"]
        for r in asof.asof_join(
            left,
            right,
            on="user_id",
            left_ts="ts",
            right_ts="rts",
            right_vals=["ref_event_id"],
            tie_col="ref_event_id",
        ).collect()
    }
    if len(got) != left.count():
        return False, f"left rows dropped: {len(got)} vs {left.count()}"
    if got != want:
        bad = [k for k in want if got.get(k) != want[k]][:3]
        return False, f"as-of matches differ from JVM twin (e.g. {bad})"
    return True, f"{len(got)} as-of matches == JVM asof_join twin"


def inv_q131(spark, sf_dir):
    """Compression ratio vs direct zlib: byte sizes and the rounded
    ratio recomputed in driver Python on the collected texts must
    match exactly (DEFLATE at a fixed level is deterministic)."""
    import zlib

    from climate_data_pipelines_spark.catalog import load_table
    from climate_data_pipelines_spark.queries import REGISTRY

    got = {
        r["doc_id"]: (r["n_bytes"], r["n_compressed"], r["compression_ratio"])
        for r in REGISTRY["q131_compression_ratio"].fn(spark, sf_dir).collect()
    }
    import math

    bad = []
    for r in load_table(spark, sf_dir, "documents").select("doc_id", "text").collect():
        raw = (r["text"] or "").encode("utf-8")
        nc = len(zlib.compress(raw, 6))
        # oround semantics (half away from zero), NOT Python's
        # banker's round: 93/128 = .7265625 must give .726563
        ratio = math.floor(nc / len(raw) * 1e6 + 0.5) / 1e6 if raw else None
        gb, gc, gr = got.get(r["doc_id"], (None, None, None))
        if gb != len(raw) or gc != nc:
            bad.append(r["doc_id"])
        elif ratio is None:
            if gr is not None:
                bad.append(r["doc_id"])
        elif gr is None or abs(gr - ratio) > 1e-9:
            bad.append(r["doc_id"])
    if bad:
        return False, f"{len(bad)} docs off (e.g. {bad[:5]})"
    return True, f"{len(got)} docs: sizes + rounded ratio == direct zlib"


def inv_q134(spark, sf_dir):
    """Exact-substring dedup contract, checked against a driver-Python
    reconstruction: every 8-token gram that appeared in >=2 documents
    (including the whole-short-doc clamp shingle) must be ABSENT from
    every cleaned text, and the q134 lengths must equal the cleaned
    texts'. (A strict re-scan fixpoint is deliberately NOT asserted:
    stripping can collapse several short docs to identical remainders,
    whose whole-text shingles legitimately re-repeat.)"""
    from collections import defaultdict

    from climate_data_pipelines_spark.catalog import load_table
    from climate_data_pipelines_spark.operators import textops
    from climate_data_pipelines_spark.queries import REGISTRY

    def grams(text: str, k: int = 8):
        toks = [t for t in (text or "").split() if t]
        if not toks:
            return []
        return [
            " ".join(toks[i:i + k])
            for i in range(max(len(toks) - k + 1, 1))
        ]

    docs = load_table(spark, sf_dir, "documents")
    gram_docs: dict = defaultdict(set)
    for r in docs.select("doc_id", "text").collect():
        for g in grams(r["text"]):
            gram_docs[g].add(r["doc_id"])
    repeated = {g for g, ds in gram_docs.items() if len(ds) >= 2}
    cleaned = {
        r["doc_id"]: r["text_dedup"]
        for r in textops.strip_repeated_spans(docs, k=8, min_docs=2)
        .select("doc_id", "text_dedup")
        .collect()
    }
    survivors = [
        (d, g)
        for d, t in cleaned.items()
        for g in grams(t)
        if g in repeated
    ]
    if survivors:
        return False, (
            f"{len(survivors)} repeated grams survive (e.g. {survivors[:3]})"
        )
    got = {
        r["doc_id"]: r["n_chars_dedup"]
        for r in REGISTRY["q134_strip_spans"].fn(spark, sf_dir).collect()
    }
    want = {d: len(t) for d, t in cleaned.items()}
    if got != want:
        bad = [d for d in want if got.get(d) != want[d]][:5]
        return False, f"length mismatch on {len(bad)}+ docs (e.g. {bad})"
    return True, (
        f"all {len(repeated)} corpus-repeated grams stripped from every doc"
    )


def inv_q172(spark, sf_dir):
    """MJPEG-in-AVI frames vs the LOSSLESS Y4M twin: both fixtures
    chunk each document's utf-8 bytes into identical 16×16 luma
    frames, so the raw-container per-frame mean is exact ground truth
    for the JPEG-compressed decode. The (doc_id, frame_idx) sets must
    be identical, every frame's luma within 3 gray levels of the
    twin's (fixture-quality DC quantization stays well under that —
    measured ≤0.2), and the '00dc' byte offsets strictly increasing
    inside each container (a real RIFF walk, not arithmetic)."""
    from climate_data_pipelines_spark.catalog import load_table
    from climate_data_pipelines_spark.operators import multimodal
    from climate_data_pipelines_spark.queries import REGISTRY

    avi = {
        (r["doc_id"], r["frame_idx"]): r
        for r in REGISTRY["q172_avi_mjpeg_frames"].fn(spark, sf_dir).collect()
    }
    docs = load_table(spark, sf_dir, "documents")
    y4m = {
        (r["doc_id"], r["frame_idx"]): r["frame_luma"]
        for r in multimodal.sample_video_frames(
            multimodal.text_as_y4m_payload(docs), every_n=1
        ).collect()
    }
    if not avi or set(avi) != set(y4m):
        only = set(avi) ^ set(y4m)
        return False, (
            f"frame-set mismatch: {len(avi)} avi vs {len(y4m)} y4m "
            f"(e.g. {list(only)[:3]})"
        )
    worst = max(abs(avi[k]["frame_luma"] - y4m[k]) for k in avi)
    if worst > 3.0:
        return False, f"max |frame luma - y4m twin| = {worst:.3f} > 3.0"
    by_doc: dict[int, list] = {}
    for (d, i), r in avi.items():
        by_doc.setdefault(d, []).append((i, r["byte_offset"]))
    bad = [
        d for d, fr in by_doc.items()
        if [o for _, o in sorted(fr)] != sorted({o for _, o in fr})
    ]
    if bad:
        return False, f"{len(bad)} docs with non-increasing chunk offsets"
    return True, (
        f"{len(avi)} frames across {len(by_doc)} AVI containers; "
        f"max |luma - lossless twin| = {worst:.3f}; offsets strictly "
        "increasing"
    )


def inv_q173(spark, sf_dir):
    """Trainable classifier, two gates: (1) holdout accuracy strictly
    beats the majority-class baseline (the model actually LEARNED the
    seed rule, it is not predicting the base rate); (2) the engine's
    trained weights match an independent stdlib+numpy retrain — same
    crc32 feature mapping via ``zlib.crc32``, same Adagrad trajectory,
    zero Spark APIs — to 1e-6 relative. Float-sum ordering is the only
    permitted divergence between the twins."""
    from climate_data_pipelines_spark.catalog import load_table
    from climate_data_pipelines_spark.operators import classifier
    from climate_data_pipelines_spark.queries import REGISTRY

    out = REGISTRY["q173_quality_classifier"].fn(spark, sf_dir).collect()
    if not out:
        return False, "empty holdout"
    acc = sum(1 for r in out if r["predicted"] == r["label"]) / len(out)
    pos = sum(r["label"] for r in out) / len(out)
    majority = max(pos, 1.0 - pos)
    if acc <= majority:
        return False, f"accuracy {acc:.3f} <= majority baseline {majority:.3f}"

    docs = load_table(spark, sf_dir, "documents")
    texts = [
        (r["doc_id"], r["text"])
        for r in docs.select("doc_id", "text").collect()
    ]
    labels = {
        d: (1 if "spark" in (t or "").lower().split() else 0)
        for d, t in texts
        if d % 5 != 0
    }
    w_np = classifier.numpy_twin_train(texts, labels, dim=1024)

    feats = classifier.hashed_features(docs, dim=1024)
    train_ids = docs.filter(F.col("doc_id") % 5 != 0).select("doc_id")
    lab_df = spark.createDataFrame(
        [(d, y) for d, y in labels.items()], "doc_id long, label int"
    )
    w_rows = classifier.train_quality_classifier(
        feats.join(train_ids, "doc_id", "left_semi"), lab_df, dim=1024
    ).collect()
    w_spark = [0.0] * len(w_np)
    for r in w_rows:
        w_spark[r["feat"]] = r["weight"]
    scale = max(max(abs(v) for v in w_np), 1e-12)
    max_rel = max(
        abs(a - b) for a, b in zip(w_spark, w_np)
    ) / scale
    if max_rel > 1e-6:
        return False, (
            f"weight divergence {max_rel:.2e} rel vs numpy twin (>1e-6)"
        )
    return True, (
        f"holdout acc={acc:.3f} > majority {majority:.3f}; "
        f"max weight delta {max_rel:.2e} rel vs numpy twin"
    )


def inv_q187(spark, sf_dir):
    """q187 cluster-balanced mix: (a) Lloyd inertia is non-increasing
    across iterations (the algorithm's defining monotonicity — a
    broken assignment kernel or centroid aggregate breaks it
    immediately); (b) the kept set respects the per-cluster cap and
    keeps exactly min(cap, cluster_n) members per cluster (the
    centrality window did its job); (c) the run is deterministic, so
    the re-derived assignment table agrees with the query's kept rows
    on (id -> cluster)."""
    from climate_data_pipelines_spark.catalog import load_table
    from climate_data_pipelines_spark.operators import similarity
    from climate_data_pipelines_spark.queries import REGISTRY

    emb = load_table(spark, sf_dir, "embeddings")
    assigned, inertia = similarity.kmeans_clusters(emb, k=16, iters=6)
    rises = [
        (i, inertia[i - 1], inertia[i])
        for i in range(1, len(inertia))
        if inertia[i] > inertia[i - 1] * (1 + 1e-9)
    ]
    if rises:
        return False, f"inertia increased: {rises[:3]}"
    sizes = {
        r["cluster"]: r["n"]
        for r in assigned.groupBy("cluster").agg(F.count("*").alias("n")).collect()
    }
    n = sum(sizes.values())
    kept = REGISTRY["q187_kmeans_mix"].fn(spark, sf_dir).collect()
    per = {}
    amap = {r["vec_id"]: (r["cluster"], r["d2"]) for r in assigned.collect()}
    # Spark float-sum order (shuffle fetch order) is not
    # bit-deterministic, so a last-ulp centroid difference between the
    # query's run and this re-derivation can flip a point that sits on
    # a cluster boundary. Tolerate a mismatch ONLY when the two runs'
    # d2 for that point agree to eps rel — i.e. the point is
    # (near-)equidistant to its two candidate centroids, the exact
    # boundary-flip signature; any real assignment bug moves d2.
    eps = 1e-6
    flips = 0
    cluster_n_q: dict = {}  # the QUERY RUN's own per-cluster sizes
    for r in kept:
        per[r["cluster"]] = per.get(r["cluster"], 0) + 1
        cluster_n_q[r["cluster"]] = r["cluster_n"]
        got = amap.get(r["vec_id"])
        if got is None:
            return False, (
                f"vec {r['vec_id']} kept but absent from re-derived assignment"
            )
        if got[0] != r["cluster"]:
            if abs(got[1] - r["d2"]) <= eps * max(1.0, abs(r["d2"])):
                flips += 1
                continue
            return False, (
                f"vec {r['vec_id']} kept in cluster {r['cluster']} "
                f"(d2={r['d2']:.6g}) but re-derived assignment says "
                f"{got[0]} (d2={got[1]:.6g}) — beyond boundary tolerance"
            )
    # Cap check against the QUERY RUN'S OWN sizes (the cluster_n
    # column), not the re-derived ones: boundary flips — including
    # flips of NON-kept vecs this loop can never observe — shift the
    # re-derived sizes, so any flip-budget against them is either
    # leaky (global slack) or spuriously strict (per-cluster slack,
    # r13 review). Same-run cnt vs min(cap, cluster_n) is exact and
    # deterministic: the rank window and the cap derive from the same
    # assignment. Cross-run parity is still pinned two ways: the
    # d2-tolerance assignment check above, and the total-count check
    # below (totals are invariant under boundary flips).
    n_q = sum(cluster_n_q.values())
    if n_q != n:
        return False, (
            f"query-run total {n_q} != re-derived assignment total {n}"
        )
    cap_q = -(-2 * n_q // 16)
    for c, cnt in per.items():
        want = min(cap_q, cluster_n_q[c])
        if cnt != want:
            return False, (
                f"cluster {c}: kept {cnt}, expected {want} "
                f"(cap {cap_q}, cluster_n {cluster_n_q[c]})"
            )
    drop = inertia[-1] / inertia[0] if inertia[0] else 1.0
    return True, (
        f"inertia monotone over {len(inertia)} iters "
        f"(final/initial {drop:.3f}); {len(kept)}/{n} kept under cap "
        f"{cap_q}; {flips} boundary flips tolerated"
    )


def inv_q188(spark, sf_dir):
    """q188 PCA: the distributed sufficient-statistics fit must equal
    a driver-side numpy PCA over the same vectors — components (after
    the shared sign canonicalization), explained-variance ratios
    (descending), and projections, all within float tolerance."""
    import numpy as np

    from climate_data_pipelines_spark.catalog import load_table
    from climate_data_pipelines_spark.operators import similarity

    emb = load_table(spark, sf_dir, "embeddings")
    comps, mean, evr = similarity.pca_fit(emb, n_components=8)
    # mirror pca_fit/pca_project's row set exactly: they exclude
    # ragged (wrong-dim) vectors and project them to null, so the
    # reference collect must filter on size == dim too — otherwise a
    # fixture with one ragged embedding breaks np.stack / the
    # positional zip below.
    dim = len(
        emb.select("embedding")
        .filter(F.col("embedding").isNotNull() & (F.size("embedding") > 0))
        .first()["embedding"]
    )
    rows = emb.select("vec_id", "embedding").filter(
        F.col("embedding").isNotNull() & (F.size("embedding") == dim)
    ).collect()
    X = np.stack([np.asarray(r["embedding"], dtype=np.float64) for r in rows])
    mu = X.mean(axis=0)
    cov = (X.T @ X) / len(X) - np.outer(mu, mu)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][:8]
    ref = evecs[:, order].T
    for i in range(len(ref)):
        j = int(np.abs(ref[i]).argmax())
        if ref[i, j] < 0:
            ref[i] = -ref[i]
    comp_err = float(np.abs(comps - ref).max())
    if comp_err > 1e-8:
        return False, f"component mismatch vs numpy: max abs {comp_err:.2e}"
    if not all(evr[i] >= evr[i + 1] - 1e-12 for i in range(len(evr) - 1)):
        return False, f"explained variance not descending: {evr.tolist()}"
    ref_evr = np.maximum(evals[order], 0.0) / np.trace(cov)
    evr_err = float(np.abs(evr - ref_evr).max())
    if evr_err > 1e-9:
        return False, f"evr mismatch: {evr_err:.2e}"
    got = {
        r["vec_id"]: np.asarray(r["pca"])
        for r in similarity.pca_project(emb, comps, mean)
        .select("vec_id", "pca")
        .filter(F.col("pca").isNotNull())
        .collect()
    }
    proj_ref = (X - mu) @ ref.T
    perr = max(
        float(np.abs(got[r["vec_id"]] - proj_ref[i]).max())
        for i, r in enumerate(rows)
    )
    if perr > 1e-8:
        return False, f"projection mismatch: max abs {perr:.2e}"
    return True, (
        f"components/evr/projections match numpy (max errs "
        f"{comp_err:.1e}/{evr_err:.1e}/{perr:.1e}); "
        f"evr[0..2]={[round(float(v), 4) for v in evr[:3]]}"
    )


INVARIANTS: dict[str, Callable] = {
    "q34_python_udf": inv_q34,
    "q42_simhash": inv_q42,
    "q54_image_features": inv_q54,
    "q69_sample": inv_q69,
    "q72_minhash_lsh_ml": inv_q72,
    "q84_stratified_sample": inv_q84,
    "q88_hll_sketch_merge": inv_q88,
    "q89_udtf_sentences": inv_q89,
    "q91_cogrouped_asof": inv_q91,
    "q131_compression_ratio": inv_q131,
    "q134_strip_spans": inv_q134,
    "q55_ann_lsh_topk": inv_q55,
    "q73_ann_ivf_topk": inv_q73,
    "q140_pq_ann_topk": inv_q140,
    "q144_audio_features": inv_q144,
    "q59_approx_count_distinct": inv_q59,
    "q126_semantic_dedup": inv_q126,
    "q135_mvt_tiles": inv_q135,
    "q155_jpeg_features": inv_q155,
    "q156_approx_percentiles": inv_q156,
    "q157_video_features": inv_q157,
    "q158_frame_sample": inv_q158,
    "q161_pagerank": inv_q161,
    "q162_bpe_merges": inv_q162,
    "q163_bpe_tokenize": inv_q163,
    "q164_bpe_tokenize_ranked": inv_q164,
    "q167_image_neardup": inv_q167,
    "q169_audio_neardup": inv_q169,
    "q170_video_neardup": inv_q170,
    "q187_kmeans_mix": inv_q187,
    "q188_pca_project": inv_q188,
    "q172_avi_mjpeg_frames": inv_q172,
    "q173_quality_classifier": inv_q173,
}
