"""LLM-pipeline operator tests (SURVEY §5.2 item 4): Python oracles for
the R-checked dedup/similarity qids, with the same pinned seeds."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tile_etl_spark import registry

registry.load_all()

def py_shingles(text: str, k: int = 3) -> set[str]:
    w = text.split(" ")
    return {" ".join(w[i : i + k]) for i in range(len(w) - k + 1)}


def py_jaccard(a: set, b: set) -> float:
    return len(a & b) / len(a | b) if a | b else 0.0


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    from tile_etl_spark.io import load

    return {
        r["doc_id"]: r["text"]
        for r in load(spark, sf_dir, "documents").collect()
    }


def test_dedup_near_pairs_match_python_oracle(spark, sf_dir, docs):
    """Every emitted pair must truly have Jaccard >= 0.8 (exact,
    recomputed in Python), with the reported value correct."""
    out = registry.QUERIES["q_dedup_near"](spark, sf_dir).collect()
    assert out, "fixture contains near-duplicates; none found"
    for r in out:
        j = py_jaccard(py_shingles(docs[r["d1"]]), py_shingles(docs[r["d2"]]))
        assert j >= 0.8, (r["d1"], r["d2"], j)
        assert abs(j - r["jaccard"]) < 1e-6


def test_dedup_near_recall_vs_exact(spark, sf_dir, docs):
    """LSH recall against the exhaustive Jaccard >= 0.8 ground truth.
    With 64 perms / 16 bands, P(candidate | J=0.8) ~ 1 - (1-0.8^4)^16
    ~ 0.9996 — assert full recall on the fixture (deterministic given
    pinned seeds)."""
    ids = sorted(docs)
    sh = {i: py_shingles(docs[i]) for i in ids}
    truth = {
        (a, b)
        for ai, a in enumerate(ids)
        for b in ids[ai + 1 :]
        if py_jaccard(sh[a], sh[b]) >= 0.8
    }
    got = {
        (r["d1"], r["d2"])
        for r in registry.QUERIES["q_dedup_near"](spark, sf_dir).collect()
    }
    assert truth, "fixture should contain true near-dup pairs"
    missed = truth - got
    assert not missed, f"LSH missed {len(missed)}/{len(truth)} true pairs"
    assert got <= truth  # exact-verify stage guarantees precision 1.0


def test_simhash_matches_python_recompute(spark, sf_dir, docs):
    """Spark's all-expression SimHash == bit-exact Python recompute
    (same xxhash64 via a Spark round trip on the vocabulary)."""
    from pyspark.sql import functions as F
    from tile_etl_spark.llm.dedup import simhash64
    from tile_etl_spark.io import load

    d = load(spark, sf_dir, "documents")
    got = {r["doc_id"]: r["simhash"] for r in simhash64(d).collect()}

    vocab = sorted({w for t in docs.values() for w in t.split(" ")})
    vdf = spark.createDataFrame([(w,) for w in vocab], "w STRING")
    h = {
        r["w"]: r["h"]
        for r in vdf.select("w", F.xxhash64("w").alias("h")).collect()
    }
    for doc_id, text in list(docs.items())[:50]:
        votes = [0] * 64
        for w in set(text.split(" ")):
            hw = h[w]
            for j in range(64):
                votes[j] += 1 if (hw >> j) & 1 else -1
        sim = 0
        for j in range(64):
            if votes[j] > 0:
                sim |= 1 << j
        if sim >= 1 << 63:
            sim -= 1 << 64
        assert sim == got[doc_id], doc_id

    # THE QID'S ACTUAL OUTPUT (band bucketing + Hamming <= 3 pairs) was
    # previously untested beyond the signature math: recompute the full
    # candidate-and-filter stage in Python from the (already bit-pinned)
    # signatures over ALL docs and require exact pair-set equality.
    def bands_of(v):
        u = v & ((1 << 64) - 1)
        return [(b, (u >> (16 * b)) & 0xFFFF) for b in range(4)]

    buckets: dict = {}
    for doc_id, v in got.items():
        for key in bands_of(v):
            buckets.setdefault(key, []).append(doc_id)
    expected = {}
    for members in buckets.values():
        ms = sorted(members)
        for i, d1 in enumerate(ms):
            for d2 in ms[i + 1 :]:
                u = (got[d1] ^ got[d2]) & ((1 << 64) - 1)
                hd = bin(u).count("1")
                if hd <= 3:
                    expected[(d1, d2)] = hd
    emitted = {
        (r["d1"], r["d2"]): r["hamming"]
        for r in registry.QUERIES["q_dedup_simhash"](spark, sf_dir).collect()
    }
    assert emitted == expected, (
        len(emitted), len(expected),
        set(emitted) ^ set(expected),
    )


def test_ann_ivf_recall(spark, sf_dir):
    """IVF (6/16 cells probed) must beat its scan fraction. The bound
    is deliberately modest: the synthetic vectors are near-uniform so
    cells barely cluster (recall ≈ scanned fraction + margin, measured
    0.64 across SFs); real embedding corpora cluster and clear 0.9."""
    exact = registry.QUERIES["q_sim_cosine_topk"](spark, sf_dir).collect()
    ann = registry.QUERIES["q_sim_ann_ivf"](spark, sf_dir).collect()
    e = {(r["probe_id"], r["vec_id"]) for r in exact}
    a = {(r["probe_id"], r["vec_id"]) for r in ann}
    recall = len(e & a) / len(e)
    assert recall >= 0.55, f"IVF recall {recall:.2f} too low"
    # EVERY ANN hit's similarity must recompute exactly from the raw
    # vectors — checking only hits that overlap the exact top-5 left
    # ANN-only rows unverified (a scoring bug confined to candidates
    # outside the exact top-5 would have passed)
    import numpy as np

    from tile_etl_spark.io import load

    vec = {
        r["vec_id"]: np.asarray(r["e"])
        for r in load(spark, sf_dir, "embeddings")
        .selectExpr("vec_id", "CAST(embedding AS ARRAY<DOUBLE>) AS e")
        .collect()
    }

    def cos(a, b):
        return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))

    for r in ann:
        want = cos(vec[r["probe_id"]], vec[r["vec_id"]])
        assert abs(want - r["cos_sim"]) < 2e-6, (r, want)
    ex = {(r["probe_id"], r["vec_id"]): r["cos_sim"] for r in exact}
    for r in ann:
        key = (r["probe_id"], r["vec_id"])
        if key in ex:
            assert abs(ex[key] - r["cos_sim"]) < 1e-9


def test_multimodal_decode_shapes(spark, sf_dir, docs):
    """q_multimodal_decode is R-checked, so this is its only gate:
    recompute the ENTIRE fake-decode from each payload's known
    derivation (header = md5(text) digest bytes, body = text bytes)
    for EVERY row, and pin the exact row count — the old spot-check of
    rows[:20] with range bounds let a constant-output or row-dropping
    regression pass."""
    import hashlib

    rows = registry.QUERIES["q_multimodal_decode"](spark, sf_dir).collect()
    assert len(rows) == len(docs)
    for r in rows:
        h = hashlib.md5(docs[r["doc_id"]].encode()).digest()
        w, ht, c = 64 + h[0] % 192, 64 + h[1] % 192, 1 + h[2] % 4
        scale = 64 / max(w, ht)
        assert (r["width"], r["height"], r["n_channels"]) == (w, ht, c), r
        assert (r["resized_w"], r["resized_h"]) == (
            int(round(w * scale)),
            int(round(ht * scale)),
        ), r
        assert r["n_bytes"] == 16 + len(docs[r["doc_id"]].encode()), r


def test_multimodal_framesample_covers_blob(spark, sf_dir, docs):
    """Exact coverage: every blob yields ceil(len/256) frames (the old
    `count >= 1` let a stride bug that drops all but the first frame
    pass), and frame 0's hash recomputes from the known payload bytes
    for every doc."""
    import hashlib
    import math

    out = registry.QUERIES["q_multimodal_framesample"](spark, sf_dir)
    counts = {
        r["doc_id"]: r["n"]
        for r in out.groupBy("doc_id").agg(F.count("*").alias("n")).collect()
    }
    frame0 = {
        r["doc_id"]: r["frame_hash"]
        for r in out.where(F.col("frame_no") == 0).collect()
    }
    assert set(counts) == set(docs)
    for doc_id, text in docs.items():
        blob = hashlib.md5(text.encode()).digest() + text.encode()
        assert counts[doc_id] == math.ceil(len(blob) / 256), doc_id
        assert (
            frame0[doc_id] == hashlib.md5(blob[:256]).hexdigest()[:16]
        ), doc_id


def test_ann_lsh_collision_and_recall(spark, sf_dir):
    """Every LSH hit must actually collide with its probe in >= 1 band
    (bit-exact numpy recompute of the fixed-seed signature family),
    carry the exact tier's similarity, and clear a fixture-calibrated
    recall bound (near-uniform vectors: measured 0.56/0.58 at
    sf0.001/0.01 for a ~0.33 candidate fraction)."""
    import numpy as np

    from tile_etl_spark.io import load
    from tile_etl_spark.llm.similarity import (
        N_PROBES,
        lsh_band_codes,
        lsh_hyperplanes,
    )

    ann = registry.QUERIES["q_sim_ann_lsh"](spark, sf_dir).collect()
    assert ann, "LSH ANN returned no rows"

    rows = (
        load(spark, sf_dir, "embeddings")
        .selectExpr("vec_id", "CAST(embedding AS ARRAY<DOUBLE>) AS e")
        .collect()
    )
    vid_to_vec = {r["vec_id"]: np.asarray(r["e"]) for r in rows}
    E = np.stack([vid_to_vec[v] for v in sorted(vid_to_vec)])
    vids = np.array(sorted(vid_to_vec))
    H = lsh_hyperplanes(E.shape[1])
    codes = {v: c for v, c in zip(vids, lsh_band_codes(E, H))}
    for r in ann:
        pc, vc = codes[r["probe_id"]], codes[r["vec_id"]]
        assert (pc == vc).any(), (r["probe_id"], r["vec_id"])

    exact = registry.QUERIES["q_sim_cosine_topk"](spark, sf_dir).collect()
    ex = {(r["probe_id"], r["vec_id"]): r["cos_sim"] for r in exact}
    a = {(r["probe_id"], r["vec_id"]) for r in ann}
    recall = len(set(ex) & a) / len(ex)
    assert recall >= 0.45, f"LSH recall {recall:.2f} too low"

    def cos(x, y):
        return float(x @ y / (np.linalg.norm(x) * np.linalg.norm(y)))

    # EVERY hit's similarity recomputes from the raw vectors (not just
    # hits overlapping the exact top-5 — see the IVF test note)
    for r in ann:
        want = cos(vid_to_vec[r["probe_id"]], vid_to_vec[r["vec_id"]])
        assert abs(want - r["cos_sim"]) < 2e-6, (r, want)
    for r in ann:
        key = (r["probe_id"], r["vec_id"])
        if key in ex:
            assert abs(ex[key] - r["cos_sim"]) < 1e-9
    assert len(a) == N_PROBES * 5  # full top-k emitted per probe


def test_embed_pca_matches_numpy(spark, sf_dir):
    """The two-pass distributed PCA must reproduce numpy PCA on the
    same vectors (after the largest-|loading|-positive sign pin)."""
    import numpy as np
    import pandas as pd

    out = (
        registry.QUERIES["q_embed_pca"](spark, sf_dir)
        .toPandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    X = np.stack(emb.sort_values("vec_id").embedding.to_numpy()).astype(
        np.float64
    )
    mu = X.mean(axis=0)
    cov = np.cov(X.T, ddof=0)
    vals, vecs = np.linalg.eigh(cov)
    comp = vecs[:, np.argsort(vals)[::-1][:2]].T
    for i in range(2):
        if comp[i, np.abs(comp[i]).argmax()] < 0:
            comp[i] = -comp[i]
    P = (X - mu) @ comp.T
    assert np.allclose(out[["pc1", "pc2"]].to_numpy(), P, atol=1e-6)
    # projection onto orthonormal components preserves variance order
    assert out.pc1.var() >= out.pc2.var()


def test_compress_ratio_matches_python_recompute(spark, sf_dir):
    """Every emitted zlib ratio must equal the in-process recompute
    bit-for-bit (same zlib, same level, same rounding)."""
    import zlib

    import duckdb

    from tile_etl_spark import registry

    rows = registry.QUERIES["q_text_compress_ratio"](spark, sf_dir).collect()
    assert rows
    con = duckdb.connect()
    texts = dict(
        con.execute(
            f"SELECT doc_id, text FROM read_parquet('{sf_dir}/documents.parquet')"
        ).fetchall()
    )
    for r in rows:
        raw = texts[r["doc_id"]].encode("utf-8")
        want = round(len(zlib.compress(raw, 6)) / max(len(raw), 1), 6)
        assert r["zlib_ratio"] == want, r["doc_id"]
        band = (
            "template" if want < 0.3
            else "gibberish" if want > 0.9
            else "prose"
        )
        assert r["verdict"] == band


def test_hybrid_rrf_fusion_semantics(spark, sf_dir):
    """rrf_score must be exactly reconstructible from the emitted
    per-list ranks, and a doc present in BOTH lists must outrank any
    doc whose single list rank is no better."""
    rows = registry.QUERIES["q_hybrid_rrf"](spark, sf_dir).collect()
    assert rows, "fused list is empty"
    for r in rows:
        want = 0.0
        if r["lex_rank"] > 0:
            want += 1.0 / (60 + r["lex_rank"])
        if r["dense_rank"] > 0:
            want += 1.0 / (60 + r["dense_rank"])
        assert abs(r["rrf_score"] - round(want, 6)) < 1e-9, r
    both = [r for r in rows if r["lex_rank"] > 0 and r["dense_rank"] > 0]
    singles = [r for r in rows if (r["lex_rank"] > 0) != (r["dense_rank"] > 0)]
    for b in both:
        worst = max(b["lex_rank"], b["dense_rank"])
        for s in singles:
            srank = max(s["lex_rank"], s["dense_rank"])
            if srank >= worst:
                assert b["rank"] < s["rank"], (b, s)


def test_exact_jaccard_prune_is_result_identical(spark, sf_dir):
    """The adaptive candidate prune (100 TB path) must change only the
    plan, never the values: pruned and prune-free runs agree exactly,
    and auto mode picks prune-free at fixture scale."""
    from tile_etl_spark.io import load
    from tile_etl_spark.llm import dedup as D

    docs = D._parallelize_docs(load(spark, sf_dir, "documents"))
    sh = D.shingles_df(docs)
    sigs = D.minhash_signatures(docs, shingles=sh)
    pairs = D.lsh_candidate_pairs(sigs)

    def rows(prune):
        out = D.exact_jaccard(docs, pairs, prune=prune)
        return sorted(
            (r["d1"], r["d2"], round(r["jaccard"], 9))
            for r in out.collect()
        )

    assert rows(True) == rows(False)
    # fixture corpus is far below the prune threshold → auto == False
    est = int(
        docs._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
    )
    assert est <= D._JACCARD_PRUNE_BYTES


def test_minhash_hashed_input_matches_string_path(spark, sf_dir):
    """r14: q_dedup_near persists the xxhash64-HASHED shingle table and
    feeds it to minhash_signatures via ``hashed=`` — the signatures
    must be BIT-IDENTICAL to the string path (the permutations consume
    xxhash64(shingle) either way; the param only moves where the hash
    is computed). A drift here would silently change LSH candidates."""
    from pyspark.sql import functions as F

    from tile_etl_spark.io import load
    from tile_etl_spark.llm import dedup as D

    docs = D._parallelize_docs(load(spark, sf_dir, "documents"))
    sh = D.shingles_df(docs)
    hashed = sh.select("doc_id", F.xxhash64("shingle").alias("shingle"))

    def rows(df):
        return sorted(
            (r["doc_id"], tuple(r["sig"])) for r in df.collect()
        )

    a = rows(D.minhash_signatures(docs))
    b = rows(D.minhash_signatures(docs, hashed=hashed))
    assert a == b and len(a) > 0
