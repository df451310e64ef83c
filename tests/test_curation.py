"""Targeted tests for the curation operators (llm/curation.py) beyond
the auto parity sweep: graph resolution on adversarial shapes, PII
patterns on synthetic rows (the fixture corpus contains none), and
packing invariants."""

from __future__ import annotations

from pyspark.sql import functions as F

from tile_etl_spark import registry
from tile_etl_spark.llm.curation import (
    PACK_BUDGET,
    connected_components,
    scrub_text,
)

registry.load_all()


def test_connected_components_chain(spark):
    """A 6-node path graph (worst case for label propagation: diameter
    5 needs multiple rounds, unlike the clique-like near-dup graphs)
    plus an isolated edge — every node must resolve to its component's
    min id."""
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6), (10, 11)],
        "src long, dst long",
    )
    got = {
        r["node"]: r["component"]
        for r in connected_components(edges).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 6: 1, 10: 10, 11: 10}


def test_dedup_cluster_invariants(spark, sf_dir):
    """Structural invariants independent of the oracle: reps are
    members of their own cluster, exactly one survivor per cluster,
    cluster_size sums to the corpus size."""
    rows = registry.QUERIES["q_dedup_cluster"](spark, sf_dir).collect()
    by_rep = {}
    for r in rows:
        by_rep.setdefault(r["cluster_rep"], []).append(r)
    n_docs = len(rows)
    assert sum(len(v) for v in by_rep.values()) == n_docs
    for rep, members in by_rep.items():
        ids = {m["doc_id"] for m in members}
        assert rep in ids  # rep is a member
        assert rep == min(ids)  # rep is the min id
        survivors = [m for m in members if m["is_survivor"] == 1]
        assert len(survivors) == 1 and survivors[0]["doc_id"] == rep
        assert all(m["cluster_size"] == len(members) for m in members)


def test_scrub_text_masks_pii(spark):
    """The RE2-safe email/phone/IP patterns on synthetic rows — the
    fixture corpus has no PII, so the H-check exercises them only as
    identity transforms."""
    df = spark.createDataFrame(
        [
            ("mail me at jane.doe+spam@example.co.uk please",),
            ("call +1 (555) 123-4567 now",),
            ("server at 192.168.0.1 down",),
            ("nothing sensitive here",),
        ],
        "text string",
    )
    got = [r["out"] for r in df.select(scrub_text("text").alias("out")).collect()]
    assert got[0] == "mail me at <EMAIL> please"
    assert got[1] == "call <PHONE> now"
    assert got[2] == "server at <IPV4> down"
    assert got[3] == "nothing sensitive here"


def test_pack_sequences_invariants(spark, sf_dir):
    """Every bin fits the budget unless it holds a single over-budget
    doc; bin ids are dense from 0 per (lang, chunk) shard."""
    rows = registry.QUERIES["q_pack_sequences"](spark, sf_dir).collect()
    by_shard = {}
    for r in rows:
        by_shard.setdefault((r["lang"], r["chunk"]), []).append(r)
    assert len(by_shard) > 1  # the chunking actually shards
    for shard, bins in by_shard.items():
        ids = sorted(b["bin_id"] for b in bins)
        assert ids == list(range(len(ids))), shard  # dense 0..n-1
        for b in bins:
            assert b["bin_tokens"] <= PACK_BUDGET or b["n_docs"] == 1, (
                shard,
                b,
            )


def test_data_split_partitions_corpus(spark, sf_dir):
    """Splits are exhaustive and deterministic: per-lang totals equal
    the corpus per-lang totals, and a re-run hashes identically."""
    from tile_etl_spark.io import load

    got = registry.QUERIES["q_data_split"](spark, sf_dir)
    per_lang = {
        r["lang"]: r["n"]
        for r in got.groupBy("lang")
        .agg(F.sum("n_docs").alias("n"))
        .collect()
    }
    want = {
        r["lang"]: r["n"]
        for r in load(spark, sf_dir, "documents")
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert per_lang == want
    again = registry.QUERIES["q_data_split"](spark, sf_dir)
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, again.collect())
    )


def test_text_normalize_on_messy_rows(spark):
    """Normalization on synthetic punctuated/mixed-case rows (the
    fixture corpus is already canonical)."""
    from tile_etl_spark.llm.text import q_text_normalize  # noqa: F401

    df = spark.createDataFrame(
        [("Hello,   WORLD!!",), ("already clean",), ("  pad  ",)],
        "text string",
    )
    normalized = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9 ]", ""),
            " +",
            " ",
        )
    )
    got = [r["n"] for r in df.select(normalized.alias("n")).collect()]
    assert got == ["hello world", "already clean", "pad"]


def test_epoch_shuffle_invariants(spark, sf_dir):
    """Every (epoch, doc) appears exactly once; per-shard positions are
    contiguous 1..n; the two epochs produce genuinely different orders
    (the whole point of re-shuffling per epoch)."""
    rows = registry.QUERIES["q_epoch_shuffle"](spark, sf_dir).collect()
    n_docs = len({r["doc_id"] for r in rows})
    by_epoch: dict = {}
    for r in rows:
        by_epoch.setdefault(r["epoch"], []).append(r)
    assert set(by_epoch) == {0, 1}
    for ep, es in by_epoch.items():
        assert len(es) == n_docs  # each doc placed exactly once
        shards: dict = {}
        for r in es:
            shards.setdefault(r["shard"], []).append(r["pos"])
        for poss in shards.values():
            assert sorted(poss) == list(range(1, len(poss) + 1))
    order0 = {
        r["doc_id"]: (r["shard"], r["pos"]) for r in by_epoch[0]
    }
    order1 = {
        r["doc_id"]: (r["shard"], r["pos"]) for r in by_epoch[1]
    }
    moved = sum(1 for d in order0 if order0[d] != order1[d])
    assert moved > n_docs * 0.8  # epochs differ for the vast majority


def test_dedup_incremental_subset_of_full_ngram(spark, sf_dir):
    """Incremental pairs are exactly the full exact-tier pairs that
    cross the new/index source boundary — no extra, none lost."""
    inc = {
        (r["new_id"], r["idx_id"])
        for r in registry.QUERIES["q_dedup_incremental"](
            spark, sf_dir
        ).collect()
    }
    full = registry.QUERIES["q_dedup_ngram"](spark, sf_dir).collect()
    from tile_etl_spark.io import load
    from tile_etl_spark.llm.dedup import _INC_NEW_SOURCES

    src = {
        r["doc_id"]: r["source"]
        for r in load(spark, sf_dir, "documents")
        .select("doc_id", "source")
        .collect()
    }
    want = set()
    for r in full:
        a_new = src[r["d1"]] in _INC_NEW_SOURCES
        b_new = src[r["d2"]] in _INC_NEW_SOURCES
        if a_new != b_new:
            nid, iid = (r["d1"], r["d2"]) if a_new else (r["d2"], r["d1"])
            want.add((nid, iid))
    assert inc == want
