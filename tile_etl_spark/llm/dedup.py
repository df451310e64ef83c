"""Deduplication operators over the ``documents`` table.

Scale design notes (the whole point of these implementations):

- **Exact dedup** is a hash groupBy — one shuffle keyed by content
  hash; survivors via min(doc_id). Never a pairwise comparison.
- **MinHash/LSH near-dup** does O(n) signature work per doc and meets
  candidates only inside LSH band buckets — the classic way to avoid
  the O(n²) pair explosion. All stages are explodes + hash groupBys;
  band-bucket skew (giant clusters of near-identical docs) is the one
  hazard, bounded by capping bucket size before pairing.
- **SimHash** reduces each doc to one 64-bit integer; candidate pairs
  share a 16-bit band (4 exact-match buckets per doc), verified by
  Hamming distance — integer ops end to end.
- **n-gram Jaccard** is the exact (quadratic within shingle-bucket)
  method, H-checkable in SQL; at scale it runs only on LSH survivors.
- **Embedding near-dup** is cosine ≥ threshold on normalized vectors;
  the all-pairs form here is for the verification tier — the ANN path
  is in tile_etl_spark.llm.similarity.

Every hash is seeded/constant: results are bit-stable across runs and
cluster layouts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tile_etl_spark.io import load, plan_memo
from tile_etl_spark.registry import query
from tile_etl_spark.session import ensure_session_determinism

# Scoped persist lifecycle — see tile_etl_spark.cache for the contract.
from tile_etl_spark.cache import persist_scoped as _persist  # noqa: E402
from tile_etl_spark.cache import release_cached, scope as _scope  # noqa: E402,F401


# --- exact ------------------------------------------------------------


@query(
    "q_dedup_exact",
    oracle="""
    SELECT md5(text) AS content_hash,
           CAST(min(doc_id) AS BIGINT) AS survivor_id,
           CAST(count(*) AS BIGINT) AS n_copies
    FROM documents
    GROUP BY md5(text)
    """,
)
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: content-hash groupBy, min-id survivor, copy count.
    One shuffle on md5(text); partial aggregation collapses duplicates
    map-side first.

    r13 (VERDICT r12 #3a): the proposed 16-byte ``unhex(md5)`` binary
    shuffle key was A/B'd (same JVM, alternating arms, 7 reps, values
    bit-identical) and LOST at both SFs — sf0.1 median 0.480 s vs
    0.563 binary, sf1 0.539 vs 0.689. Mechanism: map-side partial agg
    already collapses duplicates, so the shuffle carries ~one row per
    DISTINCT hash (5k at sf0.1), and halving key bytes on that volume
    saves nothing while the per-row ``unhex`` plus post-agg re-``hex``
    add real work. The string-key form IS the floor here; the residual
    over DuckDB is the job floor + doc-text scan, not the key width."""
    ensure_session_determinism(spark)
    d = load(spark, sf_dir, "documents")
    return d.groupBy(
        F.md5(F.col("text").cast("binary")).alias("content_hash")
    ).agg(
        F.min("doc_id").alias("survivor_id"),
        F.count(F.lit(1)).alias("n_copies"),
    )


# --- shared shingling --------------------------------------------------


def let_tokens(body):
    """LET-BIND the token array of ``text``: evaluate ``split`` exactly
    once per row and hand it to ``body`` as a lambda variable. A
    free-standing split column gets re-inlined by Catalyst's projection
    collapse at EVERY reference (a body with n references pays n full
    splits per row; the shingle builder's ~3·shingles references were
    ~2× of its runtime). The single-element
    ``transform(array(split), w -> body(w))`` wrapper makes every
    reference a lambda-variable read instead."""
    return F.element_at(
        F.transform(F.array(F.split("text", " ")), body), 1
    )


def shingle_array(k: int = 3):
    """Distinct k-word shingles of `text` as an array column. Guarded:
    docs shorter than k words yield an EMPTY array (Spark's sequence
    descends when start > stop — never rely on it clamping).

    Token array let-bound (same trick as ``let_tokens``: the single-
    element transform makes every reference a lambda-variable read, not
    a re-inlined split — measured 0.69 s vs 0.36 s warm for the shingle
    scan at sf0.1). Emitted as ONE parsed SQL expression: the Python-
    built Column tree cost ~0.09 s of Py4J round-trips per builder
    invocation, and this helper is on nearly every dedup/text plan."""
    parts = ", ".join(f"element_at(w, i + {j + 1})" for j in range(k))
    return F.expr(
        "element_at(transform(array(split(text, ' ')), w -> "
        f"CASE WHEN size(w) < {k} THEN cast(array() as array<string>) "
        f"ELSE array_distinct(transform(sequence(0, size(w) - {k}), "
        f"i -> concat_ws(' ', {parts}))) END), 1)"
    )


def _parallelize_docs(docs: DataFrame) -> DataFrame:
    """Spread docs across all cores before per-doc shingling/hashing.

    The fixture parquet is one file → ONE input partition, so the
    interpreted higher-order shingle transform (~1 ms/doc) runs serially
    — measured 5.8 s for 5 k docs at sf0.1, dominating the whole dedup
    pipeline. A numbered repartition (exempt from AQE coalescing) makes
    it embarrassingly parallel. On a real cluster the scan already has
    natural parallelism and this is a cheap balance guard against
    few-large-files layouts."""
    return docs.repartition(
        docs.sparkSession.sparkContext.defaultParallelism, "doc_id"
    )


def shingles_df(docs: DataFrame, k: int = 3) -> DataFrame:
    """(doc_id, shingle) — distinct k-word shingles, via a pure
    transform over the token array (no Python)."""
    return docs.select("doc_id", F.explode(shingle_array(k)).alias("shingle"))


# --- MinHash / LSH ------------------------------------------------------

N_PERM = 64
N_BANDS = 16  # 4 rows per band


def _perm_params(n: int = N_PERM) -> list[tuple[int, int]]:
    """Deterministic (a, b) multiply-shift parameters from a fixed LCG
    (seed pinned — SURVEY §2B requires reproducible signatures).

    The permutation family is Dietzfelbinger multiply-shift:
    ``h_p(x) = (a_p·x + b_p mod 2^64) >>> 32`` with odd 64-bit ``a``.
    Arithmetic mod 2^64 is exactly Java's wrapping long arithmetic, so
    the int64 "overflow" is the DEFINITION of the scheme, not an
    accident — unlike a Mersenne-prime family, whose 61-bit products
    cannot be formed in int64 at all (a bounded-multiplier variant is
    near-linear, correlating the permutations and wrecking the
    agreement-rate ≈ Jaccard estimate). Requires non-ANSI mode
    (``ensure_session_determinism``) — ANSI would raise on the wrap.
    ``a`` / ``b`` are emitted as SIGNED int64 so F.lit round-trips."""

    def signed(v: int) -> int:
        return v - (1 << 64) if v >= (1 << 63) else v

    params, x = [], 42
    for _ in range(n):
        x = (6364136223846793005 * x + 1442695040888963407) % (1 << 64)
        a = x | 1  # odd 64-bit multiplier
        x = (6364136223846793005 * x + 1442695040888963407) % (1 << 64)
        b = x
        params.append((signed(a), signed(b)))
    return params


def minhash_signatures(
    docs: DataFrame,
    n_perm: int = N_PERM,
    shingles: DataFrame | None = None,
    hashed: DataFrame | None = None,
) -> DataFrame:
    """(doc_id, sig ARRAY<BIGINT>[n_perm]) MinHash signatures.

    h_p(s) = (a_p · xxhash64(s) + b_p mod 2^64) >>> 32 over 3-word
    shingles — multiply-shift, see _perm_params for the family.

    Shape: explode shingles → hash once per (doc, shingle) → ONE
    hash-aggregate with n_perm ``min`` expressions. This is the scale
    form on purpose: the mins combine map-side (the shuffle carries one
    64-long row per doc per partition), every expression is codegen'd,
    and nothing is a higher-order function. (A pure array-expression
    version was 50× slower: Catalyst's projection collapse inlines the
    shingle array into each of the 64 lambda references and interprets
    HOFs row-at-a-time — measured at sf0.01. Aggregation is also a
    collapse barrier, so the hash is computed exactly once per
    shingle.)

    Docs with fewer than 3 words have no shingles and therefore no
    signature row — they can never near-dup-match anyway.

    ``hashed`` (r14): a pre-hashed shingle frame — (doc_id, shingle)
    where ``shingle`` is already ``xxhash64`` of the string shingle
    (the exact_jaccard-compatible shape q_dedup_near persists once).
    The permutations then consume the SAME hashes without
    re-shingling or re-hashing, so the signatures are bit-identical
    to the string path by construction.
    """
    params = _perm_params(n_perm)
    if hashed is None:
        sh = shingles_df(docs) if shingles is None else shingles
        hashed = sh.select("doc_id", F.xxhash64("shingle").alias("h"))
    else:
        hashed = hashed.select("doc_id", F.col("shingle").alias("h"))

    # The whole signature as ONE parsed SQL expression — an array of 64
    # min-aggregates: (a·h + b) wraps mod 2^64 (Java long semantics,
    # non-ANSI), then the top 32 bits are the permuted value —
    # multiply-shift. Composing this per-perm from F.lit/F.col Columns
    # was ~6 Py4J round-trips × 64 perms plus one eager analysis per
    # DataFrame step; that put ~1.1 s of DRIVER-side plan construction
    # in front of ~0.6 s of execution at sf0.1 (measured). A single
    # parse + single agg step builds the identical analyzed plan.
    mins = ", ".join(
        f"min(shiftrightunsigned({a}L * h + {b}L, 32))" for a, b in params
    )
    return hashed.groupBy("doc_id").agg(F.expr(f"array({mins}) AS sig"))


# lsh_candidate_pairs flips to the two-pass (count-gated) bucket plan
# once the signature frame's plan-stats estimate crosses this size: the
# single-pass collect_set materializes each bucket's FULL member list
# before the size(ms) <= max_bucket filter runs, so a degenerate bucket
# (a 10M-duplicate cluster) would build a 10M-element aggregation
# buffer — the cap bounds pair GENERATION, not collection memory. The
# two-pass form counts buckets first and joins only qualifying buckets
# into the collect, bounding the aggregate state at max_bucket rows by
# construction; it costs ~+50% at sf0.1 (the HOF band expressions
# defeat exchange reuse, so `bucketed` evaluates twice — measured
# 0.39 → 0.58 s), which is why small corpora keep the single-pass plan
# (their buckets are provably nowhere near the cap). At the 100 TB
# design point the estimate is orders of magnitude past this line, so
# the memory-safe plan is the one that ships.
_LSH_TWOPASS_BYTES = 256 * 1024 * 1024


def lsh_candidate_pairs(
    sigs: DataFrame,
    n_bands: int = N_BANDS,
    max_bucket: int = 1000,
    two_pass: bool | None = None,
) -> DataFrame:
    """(d1, d2) candidate pairs sharing at least one LSH band bucket.

    Explode each signature into n_bands (band_id, band_hash) keys, then
    ONE hash-aggregate collects each bucket's (sorted, deduped) member
    list and the pairs are generated IN-ARRAY — no bucket self-join
    and, on small corpora, no separate bucket-count pass. ``max_bucket``
    caps degenerate buckets (a 10M-duplicate cluster would otherwise
    create a quadratic bucket); capped buckets are still pairwise-
    connected through transitivity of smaller buckets in practice; at
    the test SFs no bucket ever hits the cap. ``two_pass`` (default:
    plan-stats gated, see _LSH_TWOPASS_BYTES) bounds the COLLECTION
    memory too: count buckets first, join only qualifying buckets into
    the collect, so no aggregation buffer ever exceeds max_bucket
    members — the scale-safe plan; both forms produce identical pairs
    (pinned by test). One wide shuffle
    (bucket key) + one distinct shuffle replaces the previous
    count-join-selfjoin chain (3 shuffles → 2, measured 2.0→0.9 s at
    sf0.1 where tiny per-stage data makes stage count the cost)."""
    rows_per_band = N_PERM // n_bands
    # Reference `sig` exactly ONCE: Catalyst's projection collapse
    # inlines the signature expression into every reference, so 16
    # bands × 4 getItems would evaluate the full 64-perm MinHash 64
    # times per row (measured 50× slowdown at sf0.01). A single
    # transform keeps one evaluation; `ms` is a materialized aggregate
    # output (aggregation is a collapse barrier), so the pair-gen
    # references to it are cheap bound attributes. Issued as ONE
    # spark.sql over a temp view of the signature frame: the chained
    # DataFrame form paid ~6 eager analysis passes over plans embedding
    # the 64-perm MinHash tree (~75 ms of driver build at sf0.1).
    # View name is derived from the input PLAN's semantic hash: two
    # in-flight builds over different inputs can never race between
    # createOrReplaceTempView and spark.sql and bind the wrong frame
    # (spark.sql resolves the view eagerly at this call), while
    # rebuilds of the SAME plan reuse the same name — the resolved
    # plan embeds the view name in a SubqueryAlias, so an
    # object-identity name (id(df)) would make every rebuild
    # semantically distinct and defeat persist_scoped's sameSemantics
    # dedupe downstream (measured: the bench re-materialized the
    # candidate cache on every run, +40% on q_dedup_near).
    spark = sigs.sparkSession
    if two_pass is None:
        try:
            est = int(
                sigs._jdf.queryExecution()
                .optimizedPlan()
                .stats()
                .sizeInBytes()
            )
        except Exception:
            est = 0
        two_pass = est > _LSH_TWOPASS_BYTES
    v_sigs = f"__lsh_sigs_{sigs.semanticHash() & 0xFFFFFFFF:x}"
    sigs.createOrReplaceTempView(v_sigs)
    bucketed = f"""
          SELECT doc_id, band.band_id AS band_id, band.band_hash AS band_hash
          FROM {v_sigs}
          LATERAL VIEW explode(transform(sequence(0, {n_bands - 1}),
            b -> struct(
              cast(b as int) AS band_id,
              xxhash64(array_join(transform(
                slice(sig, b * {rows_per_band} + 1, {rows_per_band}),
                x -> cast(x as string)), ',')) AS band_hash
            ))) t AS band
    """
    if two_pass:
        # count-gated collect: no aggregation buffer ever exceeds
        # max_bucket members (count(*) == bucket cardinality — one row
        # per (doc, band) by construction of sigs)
        members = f"""
        ok AS (
          SELECT band_id, band_hash FROM bucketed
          GROUP BY band_id, band_hash
          HAVING count(*) >= 2 AND count(*) <= {max_bucket}
        ),
        members AS (
          SELECT b.band_id, b.band_hash,
                 array_sort(collect_set(b.doc_id)) AS ms
          FROM bucketed b JOIN ok USING (band_id, band_hash)
          GROUP BY b.band_id, b.band_hash
        )
        """
    else:
        members = f"""
        full_members AS (
          SELECT band_id, band_hash,
                 array_sort(collect_set(doc_id)) AS ms
          FROM bucketed GROUP BY band_id, band_hash
        ),
        members AS (
          SELECT ms FROM full_members
          WHERE size(ms) >= 2 AND size(ms) <= {max_bucket}
        )
        """
    return spark.sql(
        f"""
        WITH bucketed AS ({bucketed}),
        {members},
        pairs AS (
          SELECT explode(flatten(transform(ms, (x, i) ->
            transform(slice(ms, i + 2, size(ms)),
                      y -> struct(x AS d1, y AS d2))))) AS p
          FROM members
        )
        SELECT DISTINCT p.d1 AS d1, p.d2 AS d2 FROM pairs
        """
    )


# exact_jaccard auto-prunes the doc set to candidate ids before
# re-shingling once the corpus plan-stats estimate crosses this size:
# below it the extra semi-join stage costs more than the avoided
# shingle explode (measured at sf0.1); above it the explode of
# non-candidate docs dominates and the prune wins. Catalyst's
# sizeInBytes estimate is free (no job) — at the 100 TB design point it
# is orders of magnitude past this line, so the pruned plan is the one
# that ships.
_JACCARD_PRUNE_BYTES = 256 * 1024 * 1024


def exact_jaccard(
    docs: DataFrame,
    pairs: DataFrame,
    shingles: DataFrame | None = None,
    prune: bool | None = None,
) -> DataFrame:
    """Exact shingle-set Jaccard for the given pairs: intersection via
    shingle join restricted to candidates, union by sizes.

    The shingle equality is part of the second JOIN KEY, not a
    post-join filter — the intermediate is the intersection itself,
    never the |A|x|B| cross of each pair's shingle sets.

    ``prune`` controls the semi-join prune of docs to candidate ids
    before shingling. Default (None) decides from Catalyst's plan-size
    estimate: small corpora keep the prune-free plan (the extra stage
    was measured SLOWER at sf0.1 — it serializes LSH and verify behind
    a barrier), large corpora prune so only candidate docs are
    re-shingled. Only applies when this function builds the shingles
    itself; a caller-supplied ``shingles`` frame is used as-is."""
    if shingles is None:
        if prune is None:
            try:
                est = int(
                    docs._jdf.queryExecution()
                    .optimizedPlan()
                    .stats()
                    .sizeInBytes()
                )
            except Exception:
                est = 0
            prune = est > _JACCARD_PRUNE_BYTES
        if prune:
            cand = (
                pairs.select(F.col("d1").alias("doc_id"))
                .unionAll(pairs.select(F.col("d2").alias("doc_id")))
                .distinct()
            )
            docs = docs.join(cand, "doc_id", "left_semi")
    sh = (
        _persist(shingles_df(docs)) if shingles is None else shingles
    )  # consumers: inter (×2 sides) + sizes
    # The sizes/intersection/union composition is issued as ONE
    # spark.sql over temp views of the two input frames: the chained
    # DataFrame form paid ~8 eager analysis passes over plans that
    # already embed the shingle HOF trees (~120 ms of driver build at
    # sf0.1); one SQL statement is one parse+analyze. View names are
    # derived from the frames' semantic hashes: concurrent builds over
    # different inputs cannot bind the wrong frame (spark.sql resolves
    # views eagerly at this call), and rebuilds of the same plan keep
    # the same name so downstream sameSemantics checks still match
    # (see lsh_candidate_pairs). Plan shape is unchanged — the shingle
    # equality stays part of the second JOIN KEY (the intermediate is
    # the intersection itself, never a per-pair shingle cross).
    spark = sh.sparkSession
    v_sh = f"__ej_sh_{sh.semanticHash() & 0xFFFFFFFF:x}"
    v_pairs = f"__ej_pairs_{pairs.semanticHash() & 0xFFFFFFFF:x}"
    sh.createOrReplaceTempView(v_sh)
    pairs.createOrReplaceTempView(v_pairs)
    return spark.sql(
        f"""
        WITH sizes AS (
          SELECT doc_id, count(*) AS n FROM {v_sh} GROUP BY doc_id
        ),
        inter AS (
          SELECT p.d1, p.d2, count(*) AS i
          FROM {v_pairs} p
          JOIN {v_sh} a ON a.doc_id = p.d1
          JOIN {v_sh} b ON b.doc_id = p.d2 AND b.shingle = a.shingle
          GROUP BY p.d1, p.d2
        )
        SELECT it.d1, it.d2,
               CAST(it.i AS DOUBLE) / (na.n + nb.n - it.i) AS jaccard
        FROM inter it
        JOIN sizes na ON it.d1 = na.doc_id
        JOIN sizes nb ON it.d2 = nb.doc_id
        """
    )


# io.source_memo store: sf_dir → (session id, source fingerprint,
# (sh, cand_key, cand, final)). q_dedup_near cannot use io.plan_memo
# (its scope+persist side effects must re-run per call), but ~90 Py4J
# round trips of plan construction (~300 ms warm) are pure given the
# same source — the built frames are memoized and the persists
# REPLAYED on every hit (persist_scoped re-pins a handle an
# intervening scope switch evicted; data lazily rematerializes on the
# next action, exactly as a fresh build would). Bounding/replacement
# semantics live in io.source_memo (ADVICE r7).
_NEAR_MEMO: dict[str, tuple] = {}


# Shared DuckDB CTE block: exact 3-gram-Jaccard ≥ 0.8 pairs (d1 < d2)
# ending in a `njpairs` relation — the oracle twin of
# ngram_jaccard_pairs(). Reused by q_dedup_cluster's transitive-closure
# oracle (llm/curation.py), so both qids agree on the edge set by
# construction.
NGRAM_PAIRS_CTES = """
    words AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    sh AS (
      SELECT doc_id,
             unnest(list_distinct(list_transform(
               generate_series(1, greatest(len(w) - 2, 0)),
               i -> concat_ws(' ', w[i], w[i+1], w[i+2])))) AS shingle
      FROM words
    ),
    sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS i
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    njpairs AS (
      SELECT d1, d2,
             round(CAST(i AS DOUBLE) / (na.n + nb.n - i), 6) AS jaccard
      FROM inter
      JOIN sizes na ON d1 = na.doc_id
      JOIN sizes nb ON d2 = nb.doc_id
      WHERE CAST(i AS DOUBLE) / (na.n + nb.n - i) >= 0.8
    )
"""


@query(
    "q_dedup_near",
    oracle=f"WITH {NGRAM_PAIRS_CTES} SELECT d1, d2, jaccard FROM njpairs",
)
def q_dedup_near(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(64) → LSH(16 bands) → exact-Jaccard verify ≥ 0.8.

    H-CHECKED since round 9 (VERDICT r8 #7): the VERIFIED OUTPUT — all
    pairs with exact 3-gram Jaccard ≥ 0.8 — is SQL-expressible, so the
    DuckDB twin is the exact shingle-equi-join set (NGRAM_PAIRS_CTES,
    shared with q_dedup_ngram). The oracle is a valid twin of this
    LSH-filtered pipeline because the MinHash tier has FULL RECALL on
    the fixtures: at J = 0.8 with 16 bands × 4 rows the per-pair miss
    probability is (1−0.8⁴)¹⁶ ≈ 2.2e−4, the hash seeds and fixtures
    are deterministic, and the recall property test (plain-Python
    ground truth) plus an empirical identity check at sf0.001/sf0.01
    pin that no qualifying pair is dropped — so verified == exact.
    The MinHash/LSH tier itself stays property-checked (the unit test
    also asserts candidate precision; the signatures are exercised
    through the pipeline, not independently recomputed).

    r14 (VERDICT r13 #7): the persisted shingle table is now the
    xxhash64-HASHED form — the sf1 stage decomposition
    (plans/r14/DEDUP_SF1_DECOMP.json) showed the exact-Jaccard verify
    stage dominating the sf1 wall (2.92 s of 2.62 s full; candidate
    counting 0.22 s, shingle explode 0.38 s), and that stage makes
    three passes (two join legs + the sizes aggregate) over the
    cached shingle rows, so narrowing them from ~30-byte strings to
    int64 shrinks every pass (guide §2.3 'narrower types' — here the
    narrowed column IS the cached/joined payload, unlike the
    q_dedup_exact unhex case where partial agg had already collapsed
    the volume). The hash is the same xxhash64 the MinHash
    permutations consume, computed once at persist; intersection
    counts are unchanged unless xxhash64 collides within one doc
    pair's shingle sets (~1e-13 for 100-shingle docs — the committed
    q_dedup_ngram argument). Interleaved same-JVM A/B, values
    bit-identical: see plans/r14/AB_DEDUP_HASHED_SHINGLES.json."""
    import os

    from tile_etl_spark.sources.files import source_fingerprint

    ensure_session_determinism(spark)
    _scope(f"q_dedup_near:{sf_dir}")
    fpr = source_fingerprint(os.path.join(sf_dir, "documents.parquet"))

    def build():
        d = _parallelize_docs(load(spark, sf_dir, "documents"))
        # ONE persisted HASHED shingle explode feeds the signature
        # build AND the exact-Jaccard verify tier — the explode
        # (interpreted HOF over every doc) runs once, and every
        # downstream pass scans/joins int64s instead of strings.
        sh = _persist(
            shingles_df(d).select(
                "doc_id", F.xxhash64("shingle").alias("shingle")
            )
        )
        sigs = minhash_signatures(d, hashed=sh)
        # Explicit dedupe key: the LSH plan's LATERAL VIEW lambdas
        # defeat sameSemantics (see persist_scoped), so rebuilds would
        # otherwise re-materialize the candidate cache on every run.
        cand_key = f"lsh_cand:{sigs.semanticHash()}:{N_BANDS}"
        cand = _persist(lsh_candidate_pairs(sigs), key=cand_key)
        j = exact_jaccard(d, cand, shingles=sh)
        final = j.where(F.col("jaccard") >= 0.8).select(
            "d1", "d2", F.round("jaccard", 6).alias("jaccard")
        )
        return (sh, cand_key, cand, final)

    def replay(payload):
        sh, cand_key, cand, _ = payload
        _persist(sh)
        _persist(cand, key=cand_key)

    from tile_etl_spark.io import source_memo

    return source_memo(_NEAR_MEMO, spark, sf_dir, fpr, build, replay)[-1]


# --- n-gram Jaccard (exact, H-checked) ----------------------------------


@query(
    "q_dedup_ngram",
    oracle=f"WITH {NGRAM_PAIRS_CTES} SELECT d1, d2, jaccard FROM njpairs",
)
def q_dedup_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-gram Jaccard ≥ 0.8 over ALL colliding pairs — the
    ground-truth twin of q_dedup_near (H-checked in DuckDB). The
    shingle equi-join bounds the pair space to docs sharing at least
    one shingle; at 100 TB this exact tier runs after LSH.

    Plan shape: see ngram_jaccard_pairs."""
    ensure_session_determinism(spark)
    _scope(f"q_dedup_ngram:{sf_dir}")
    d = _parallelize_docs(load(spark, sf_dir, "documents"))
    return ngram_jaccard_pairs(d)


def ngram_jaccard_pairs(d: DataFrame, thresh: float = 0.8) -> DataFrame:
    """(d1, d2, jaccard) — exact 3-gram Jaccard ≥ ``thresh`` pairs.

    Plan shape: (1) shingle in parallel once and cache — three plan
    branches (sizes + both join sides) otherwise re-run the serial
    interpreted transform 3×, which dominated the old 10×-DuckDB
    runtime; (2) prune df=1 shingles before the self-join — a shingle
    in a single doc can never produce a pair, and unique shingles are
    the bulk of any real corpus (90 % in the fixture), so the join
    input shrinks ~10× with zero semantic change (intersections only
    involve shared shingles; union sizes still count all shingles).
    Persists register under the CALLER's cache scope."""
    # join on the 64-bit shingle hash, not the string: ~3× narrower
    # shuffle rows and a cheaper join key; intersection counts are
    # unchanged unless xxhash64 collides within one doc pair's shingle
    # set (~1e-13 for 100-shingle docs).
    sh = _persist(
        shingles_df(d).select("doc_id", F.xxhash64("shingle").alias("shingle"))
    )
    shared = sh.join(
        sh.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("df"))
        .where(F.col("df") >= 2)
        .select("shingle"),
        "shingle",
    )
    a = shared.alias("a")
    b = shared.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("d1"), F.col("b.doc_id").alias("d2")
        )
        .agg(F.count(F.lit(1)).alias("i"))
    )
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    j = (
        inter.join(
            sizes.withColumnRenamed("doc_id", "d1").withColumnRenamed("n", "n1"),
            "d1",
        )
        .join(
            sizes.withColumnRenamed("doc_id", "d2").withColumnRenamed("n", "n2"),
            "d2",
        )
        .withColumn(
            "jaccard",
            F.col("i").cast("double") / (F.col("n1") + F.col("n2") - F.col("i")),
        )
    )
    return j.where(F.col("jaccard") >= thresh).select(
        "d1", "d2", F.round("jaccard", 6).alias("jaccard")
    )


# --- incremental dedup: new batch vs stored index -----------------------

# The "new crawl batch": the two newest fixture sources stand in for an
# incremental ingest; everything else is the already-deduped corpus.
_INC_NEW_SOURCES = ("src18", "src19")
# single source of truth for the oracle's IN-lists — the Spark side,
# the DuckDB twin, and the tests all derive from _INC_NEW_SOURCES
_INC_NEW_IN = ", ".join(f"'{s}'" for s in _INC_NEW_SOURCES)


@query(
    "q_dedup_incremental",
    oracle=f"""
    WITH words AS (
      SELECT doc_id, source, string_split(text, ' ') AS w FROM documents
    ),
    sh AS (
      SELECT doc_id, source,
             unnest(list_distinct(list_transform(
               generate_series(1, greatest(len(w) - 2, 0)),
               i -> concat_ws(' ', w[i], w[i+1], w[i+2])))) AS shingle
      FROM words
    ),
    sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS new_id, b.doc_id AS idx_id, count(*) AS i
      FROM sh a JOIN sh b ON a.shingle = b.shingle
      WHERE a.source IN ({_INC_NEW_IN})
        AND b.source NOT IN ({_INC_NEW_IN})
      GROUP BY 1, 2
    )
    SELECT new_id, idx_id,
           round(CAST(i AS DOUBLE) / (na.n + nb.n - i), 6) AS jaccard
    FROM inter
    JOIN sizes na ON new_id = na.doc_id
    JOIN sizes nb ON idx_id = nb.doc_id
    WHERE CAST(i AS DOUBLE) / (na.n + nb.n - i) >= 0.8
    """,
)
def q_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INCREMENTAL NEAR-DUP — dedup a NEW ingest batch against the
    already-deduped stored corpus, the shape a 100 TB pipeline actually
    runs day to day: you never re-dedup the index against itself, you
    join the (small) new batch's shingles against the (huge, stored)
    index's shingle table and verify only new×index candidates. The
    fixture's two newest sources stand in for the new batch.

    Cost asymmetry is the whole point: full re-dedup is
    O((index+batch)²) candidate work, this is O(batch × collision
    rate). At scale the index-side (shingle_hash → doc_id) table is a
    persisted, bucketed-by-hash artifact, so the equi-join is
    co-located with no index shuffle, and the batch side is usually
    small enough to broadcast outright. The shingle equi-join is the
    same LOSSLESS candidate bound as q_dedup_ngram (J ≥ 0.8 requires a
    shared shingle — no recall loss, unlike an LSH tier), intersection
    counts ride the join key, and union sizes come from per-doc counts
    — nothing quadratic in either side alone. Join keys are 64-bit
    shingle hashes (see ngram_jaccard_pairs for the collision bound)."""
    ensure_session_determinism(spark)
    _scope(f"q_dedup_incremental:{sf_dir}")
    d = _parallelize_docs(load(spark, sf_dir, "documents"))
    is_new = F.col("source").isin(*_INC_NEW_SOURCES)
    sh = _persist(
        d.select("doc_id", is_new.alias("is_new"), "text")
        .select(
            "doc_id",
            "is_new",
            F.explode(shingle_array(3)).alias("shingle_s"),
        )
        .select(
            "doc_id", "is_new", F.xxhash64("shingle_s").alias("shingle")
        )
    )  # consumers: sizes + both join sides
    new_sh = sh.where(F.col("is_new")).select(
        F.col("doc_id").alias("new_id"), "shingle"
    )
    idx_sh = sh.where(~F.col("is_new")).select(
        F.col("doc_id").alias("idx_id"), "shingle"
    )
    idx_sizes = idx_sh.groupBy("idx_id").agg(F.count(F.lit(1)).alias("n2"))
    return incremental_pair_verify(new_sh, idx_sh, idx_sizes)


def incremental_pair_verify(
    new_sh: DataFrame,
    idx_sh: DataFrame,
    idx_sizes: DataFrame,
    thresh: float = 0.8,
) -> DataFrame:
    """(new_id, idx_id, jaccard) — verified new-batch × index pairs.

    ``new_sh``: (new_id, shingle) hashed shingles of the incoming
    batch; ``idx_sh``/(``idx_sizes``): the stored index's hashed
    shingle table and per-doc shingle counts — at scale a persisted,
    bucketed-by-shingle artifact, here derived on the fly. New-side
    sizes are computed from the batch itself, so the helper serves
    both the batch builder and the per-micro-batch streaming twin
    (s_dedup_incremental) unchanged."""
    n1 = new_sh.groupBy("new_id").agg(F.count(F.lit(1)).alias("n1"))
    inter = (
        new_sh.join(idx_sh, "shingle")
        .groupBy("new_id", "idx_id")
        .agg(F.count(F.lit(1)).alias("i"))
    )
    j = (
        inter.join(n1, "new_id")
        .join(idx_sizes, "idx_id")
        .withColumn(
            "jaccard",
            F.col("i").cast("double")
            / (F.col("n1") + F.col("n2") - F.col("i")),
        )
    )
    return j.where(F.col("jaccard") >= thresh).select(
        "new_id", "idx_id", F.round("jaccard", 6).alias("jaccard")
    )


# --- SimHash ------------------------------------------------------------


def simhash64(docs: DataFrame) -> DataFrame:
    """(doc_id, simhash BIGINT): 64-bit SimHash over word unigrams.

    bit_j(doc) = sign of Σ_words (±1 per xxhash64(word) bit j).

    Same shape as MinHash, for the same measured reason: explode
    distinct words, hash once per (doc, word), then 64 codegen'd
    conditional-sum aggregates with map-side combine — never an
    interpreted per-row fold over an array column (which also ran on
    a single input partition at sf0.1: 8.6 s → sub-second)."""
    words = docs.select(
        "doc_id",
        F.explode(F.array_distinct(F.split("text", " "))).alias("word"),
    ).select("doc_id", F.xxhash64("word").alias("h"))
    # ONE parsed expression per step (the 64 Python-built sum columns
    # plus the 64-term assembly loop cost ~1.8s of driver-side Py4J per
    # call). The reassembly fold uses shiftleft(1L, j) for EVERY bit:
    # Java shift semantics make shiftleft(1L, 63) == Long.MIN_VALUE,
    # which is exactly the previous top-bit special case.
    votes_expr = ", ".join(
        f"sum(IF((shiftright(h, {j}) & 1) = 1, 1, -1))" for j in range(64)
    )
    votes = words.groupBy("doc_id").agg(
        F.expr(f"array({votes_expr}) AS v")
    )
    return votes.selectExpr(
        "doc_id",
        "aggregate(sequence(0, 63), 0L, (acc, j) -> "
        "acc + IF(element_at(v, j + 1) > 0, shiftleft(1L, j), 0L))"
        " AS simhash",
    )


@query("q_dedup_simhash")
def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup: pairs within Hamming distance ≤ 3 of the
    64-bit signature, found via 4×16-bit band buckets (a pair within
    distance 3 must agree exactly on ≥1 of 4 bands). R-checked; unit
    test recomputes signatures in Python."""
    ensure_session_determinism(spark)
    _scope(f"q_dedup_simhash:{sf_dir}")
    d = _parallelize_docs(load(spark, sf_dir, "documents"))
    s = simhash64(d)
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band_id"),
                F.shiftright("simhash", b * 16)
                .bitwiseAND(F.lit(0xFFFF))
                .alias("band_val"),
            )
            for b in range(4)
        ]
    )
    bucketed = _persist(
        s.select("doc_id", "simhash", F.explode(bands).alias("b")).select(
            "doc_id", "simhash", "b.band_id", "b.band_val"
        )
    )
    a, b = bucketed.alias("a"), bucketed.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("d1"),
            F.col("b.doc_id").alias("d2"),
            F.col("a.simhash").alias("h1"),
            F.col("b.simhash").alias("h2"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("h1").bitwiseXOR(F.col("h2")))
    return pairs.select(
        "d1", "d2", hamming.cast("int").alias("hamming")
    ).where(F.col("hamming") <= 3)


# --- embedding cosine near-dup ------------------------------------------

# Target rows per GEMM block at scale: a (2048 x 2048) pair matrix is
# ~34 MB of doubles — comfortably in-executor. B = max(8, ceil(n/2048)):
# the floor of 8 keeps B(B+1)/2 = 36 block pairs so small corpora still
# fan across the executor threads (measured at sf0.1/2000 vectors:
# B=1 448 ms, B=8 274 ms — one big single-task GEMM loses to the
# parallel grid), while past ~16k vectors B grows with the corpus and
# bounds per-task memory exactly as the kernel's O((n/B)^2) argument
# requires.
_EMBED_BLOCK_ROWS = 2048


def _n_embed_blocks(sf_dir: str) -> int:
    """Block count from the parquet footer's row count (no job)."""
    import os

    try:
        import pyarrow.parquet as pq

        n = pq.ParquetFile(
            os.path.join(sf_dir, "embeddings.parquet")
        ).metadata.num_rows
    except Exception:
        return 8
    return max(8, -(-n // _EMBED_BLOCK_ROWS))


@query(
    "q_dedup_embed",
    oracle="""
    WITH v AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
    )
    SELECT a.vec_id AS v1, b.vec_id AS v2,
           round(list_dot_product(a.e, b.e)
                 / (sqrt(list_dot_product(a.e, a.e))
                    * sqrt(list_dot_product(b.e, b.e))), 6) AS cos_sim
    FROM v a JOIN v b ON a.vec_id < b.vec_id
    WHERE list_dot_product(a.e, b.e)
          / (sqrt(list_dot_product(a.e, a.e))
             * sqrt(list_dot_product(b.e, b.e))) >= 0.4
    """,
)
@plan_memo("embeddings")
def q_dedup_embed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup (cos ≥ threshold), exact all-pairs tier.
    Threshold 0.4 (the synthetic fixture's max pairwise cosine is ~0.5;
    a production near-dup run would use ~0.95 on normalized text
    embeddings). Double-precision dot products in both engines → H. At
    scale the pair space is pruned by LSH bucketing first (similarity
    module); this exact form is the verification tier.

    Distributed block GEMM — NOTHING is collected to the driver. Each
    vector gets ``block = vec_id mod B``; the B(B+1)/2 unordered block
    pairs (i ≤ j) form the task grid. A row with block b is replicated
    to the grid as the LEFT operand of pairs (b, j≥b) and the RIGHT
    operand of pairs (i≤b, b) — ~B copies per row, the irreducible cost
    of exact all-pairs decomposition. One shuffle keyed by (gi, gj),
    then each task multiplies its two row blocks with BLAS
    (``applyInPandas``, Arrow-batched). Per-task memory is
    O((n/B)²·ε + 2·(n/B)·dim) independent of total corpus size: B
    scales with √corpus so the grid, not the driver or any executor,
    absorbs growth. (An interpreted per-pair fold over a theta join was
    ~250× slower at sf0.1; the previous driver-collect variant held the
    whole corpus in one process — fine at test SF, fatal at 100 M
    vectors.)"""
    ensure_session_determinism(spark)
    # No cache scope here: the builder persists nothing, and @plan_memo
    # skips the body on a hit — a scope switch (which unpersists other
    # scopes) would run on the first call only, giving memoized calls
    # different side effects. plan_memo requires side-effect-free.
    import numpy as np

    e = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    B = _n_embed_blocks(sf_dir)
    b = F.pmod(F.col("vec_id"), F.lit(B)).cast("int")
    other = F.explode(F.sequence(F.lit(0), F.lit(B - 1))).alias("ob")
    tagged = e.select("vec_id", "embedding", b.alias("b"), other)
    left = tagged.where(F.col("b") <= F.col("ob")).select(
        F.col("b").alias("gi"),
        F.col("ob").alias("gj"),
        F.lit(0).alias("side"),
        "vec_id",
        "embedding",
    )
    right = tagged.where(F.col("ob") < F.col("b")).select(
        F.col("ob").alias("gi"),
        F.col("b").alias("gj"),
        F.lit(1).alias("side"),
        "vec_id",
        "embedding",
    )
    # Diagonal blocks (gi == gj) appear once, as side 0; the kernel uses
    # that block for both operands, and v1 < v2 drops self/dup pairs.

    def gemm_block_pair(key, pdf):
        import pandas as pd

        gi, gj = int(key[0]), int(key[1])
        lp = pdf[pdf["side"] == 0]
        rp = lp if gi == gj else pdf[pdf["side"] == 1]
        if len(lp) == 0 or len(rp) == 0:
            return pd.DataFrame({"v1": [], "v2": [], "cos_sim": []}).astype(
                {"v1": "int64", "v2": "int64", "cos_sim": "float64"}
            )
        lids = np.asarray(lp["vec_id"], dtype=np.int64)
        rids = np.asarray(rp["vec_id"], dtype=np.int64)
        lm = np.asarray([np.asarray(v, dtype=np.float64) for v in lp["embedding"]])
        rm = np.asarray([np.asarray(v, dtype=np.float64) for v in rp["embedding"]])
        lm = lm / np.linalg.norm(lm, axis=1, keepdims=True)
        rm = rm / np.linalg.norm(rm, axis=1, keepdims=True)
        sims = lm @ rm.T
        if gi == gj:
            # same set on both sides: keep each unordered pair once
            li, rj = np.nonzero((sims >= 0.4) & (lids[:, None] < rids[None, :]))
            v1, v2 = lids[li], rids[rj]
        else:
            # disjoint blocks: every pair appears exactly once in this
            # cell, but vec_id order is uncorrelated with block id —
            # canonicalize to (min, max)
            li, rj = np.nonzero(sims >= 0.4)
            v1 = np.minimum(lids[li], rids[rj])
            v2 = np.maximum(lids[li], rids[rj])
        return pd.DataFrame(
            {
                "v1": v1,
                "v2": v2,
                "cos_sim": np.round(sims[li, rj], 6),
            }
        )

    return (
        left.unionByName(right)
        .groupBy("gi", "gj")
        .applyInPandas(gemm_block_pair, "v1 BIGINT, v2 BIGINT, cos_sim DOUBLE")
    )


@query(
    "q_dedup_contain",
    oracle=f"""
    WITH {NGRAM_PAIRS_CTES.replace("njpairs", "njp_unused")}
    SELECT d1, d2,
           round(CAST(i AS DOUBLE) / least(na.n, nb.n), 6) AS containment,
           round(CAST(i AS DOUBLE) / (na.n + nb.n - i), 6) AS jaccard
    FROM inter
    JOIN sizes na ON d1 = na.doc_id
    JOIN sizes nb ON d2 = nb.doc_id
    WHERE CAST(i AS DOUBLE) / least(na.n, nb.n) >= 0.5
    """,
)
def q_dedup_contain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CONTAINMENT near-dup tier — C(A,B) = |A∩B| / min(|A|,|B|): the
    asymmetric measure that catches SUB-DOCUMENT duplication (a short
    doc quoted wholesale inside a long one), which symmetric Jaccard
    structurally misses — J = i/(na+nb−i) stays low when nb >> na even
    at full containment C = 1. The standard third tier of a real dedup
    stack (exact -> MinHash/Jaccard -> containment for quote/boilerplate
    mining).

    Same plan skeleton as ngram_jaccard_pairs (shared-shingle
    equi-join, df>=2 prune, hash-narrowed keys, one pair aggregate) —
    at 100 TB it rides the same LSH-candidate front end; only the
    scoring expression differs. Emits both containment and jaccard so
    downstream policy can distinguish subset-dups from near-identity."""
    ensure_session_determinism(spark)
    _scope(f"q_dedup_contain:{sf_dir}")
    d = _parallelize_docs(load(spark, sf_dir, "documents"))
    sh = _persist(
        shingles_df(d).select("doc_id", F.xxhash64("shingle").alias("shingle"))
    )
    shared = sh.join(
        sh.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("df"))
        .where(F.col("df") >= 2)
        .select("shingle"),
        "shingle",
    )
    a, b = shared.alias("a"), shared.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("d1"), F.col("b.doc_id").alias("d2"))
        .agg(F.count(F.lit(1)).alias("i"))
    )
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    scored = (
        inter.join(
            sizes.withColumnRenamed("doc_id", "d1").withColumnRenamed("n", "n1"),
            "d1",
        )
        .join(
            sizes.withColumnRenamed("doc_id", "d2").withColumnRenamed("n", "n2"),
            "d2",
        )
        .withColumn(
            "containment",
            F.col("i").cast("double") / F.least("n1", "n2"),
        )
        .withColumn(
            "jaccard",
            F.col("i").cast("double")
            / (F.col("n1") + F.col("n2") - F.col("i")),
        )
    )
    return scored.where(F.col("containment") >= 0.5).select(
        "d1",
        "d2",
        F.round("containment", 6).alias("containment"),
        F.round("jaccard", 6).alias("jaccard"),
    )


@query(
    "q_dedup_url",
    oracle="""
    WITH raw AS (
      SELECT doc_id, n_chars,
             'https://' ||
             CASE WHEN doc_id % 3 = 0 THEN 'WWW.' ELSE '' END ||
             source || '.Example.org/' || lang || '/page-' ||
             CAST(doc_id % 200 AS VARCHAR) ||
             CASE WHEN doc_id % 5 = 0 THEN '/' ELSE '' END ||
             CASE WHEN doc_id % 2 = 0
                  THEN '?utm_source=feed&utm_campaign=x' ELSE '' END ||
             CASE WHEN doc_id % 7 = 0 THEN '#section-2' ELSE '' END
               AS url
      FROM documents
    ),
    canon AS (
      SELECT doc_id, n_chars,
             regexp_replace(regexp_replace(regexp_replace(lower(url),
                     '[?#].*$', ''),
                   '^https://www\\.', 'https://'), '/$', '') AS curl
      FROM raw
    )
    SELECT curl,
           CAST(count(*) AS BIGINT) AS n_dups,
           CAST(min(doc_id) AS BIGINT) AS keep_doc,
           CAST(sum(n_chars) AS BIGINT) AS chars_total
    FROM canon
    GROUP BY curl
    HAVING count(*) > 1
    """,
)
def q_dedup_url(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL-CANONICALIZATION dedup — the zeroth, cheapest dedup tier in
    a web-corpus pipeline (before exact-hash, before MinHash): two
    crawls of the same page differ only in URL NOISE — scheme case,
    'www.' prefix, trailing slash, tracking query params, fragments —
    so canonicalizing the URL (lowercase, strip www./query/fragment/
    trailing slash) and grouping finds them with ONE map-side
    expression and one aggregate, no content reads at all. The fixture
    derives noisy URLs deterministically from doc columns (same recipe
    both engines, noise keyed on doc_id residues; page identity is
    doc_id % 200 so real collisions exist even at the 500-doc small
    scale factors — % 500 was a bijection there, making the r05
    driver row a vacuous 0-row match), and the operator reports
    each duplicated canonical URL with its cluster size, kept
    representative (min doc_id — the same deterministic-survivor rule
    as q_dedup_exact) and reclaimable char volume.

    Scale: one shuffle on the canonical-URL key; at 100 TB this tier
    typically removes 30-50% of a raw crawl before any content-hash
    tier runs — the ordering of tiers IS the cost model."""
    ensure_session_determinism(spark)
    d = load(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://"),
        F.when(F.col("doc_id") % 3 == 0, F.lit("WWW.")).otherwise(F.lit("")),
        F.col("source"),
        F.lit(".Example.org/"),
        F.col("lang"),
        F.lit("/page-"),
        (F.col("doc_id") % 200).cast("string"),
        F.when(F.col("doc_id") % 5 == 0, F.lit("/")).otherwise(F.lit("")),
        F.when(
            F.col("doc_id") % 2 == 0,
            F.lit("?utm_source=feed&utm_campaign=x"),
        ).otherwise(F.lit("")),
        F.when(F.col("doc_id") % 7 == 0, F.lit("#section-2")).otherwise(
            F.lit("")
        ),
    )
    curl = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.lower(url), r"[?#].*$", ""),
            r"^https://www\.",
            "https://",
        ),
        r"/$",
        "",
    )
    return (
        d.select(curl.alias("curl"), "doc_id", "n_chars")
        .groupBy("curl")
        .agg(
            F.count(F.lit(1)).alias("n_dups"),
            F.min("doc_id").alias("keep_doc"),
            F.sum("n_chars").alias("chars_total"),
        )
        .where(F.col("n_dups") > 1)
    )


def _duck_hex15_to_int(expr: str) -> str:
    """Positional-digit expansion of the first 15 hex chars of an
    ALREADY-COMPUTED md5 hex string column (≤ 2^60, fits BIGINT exactly
    in both engines — no hex-cast dialect dependence, same trick as
    operators/analytics.py). Callers must hoist ``md5(...)`` into its
    own CTE stage and pass that column here: inlining md5 into all 15
    digit terms re-evaluated it 15x per row (DuckDB does not CSE
    across the terms) — the r9 sf1 sweep's minhash/simhash oracle
    walls were >5 min from exactly that."""
    digit = f"(strpos('0123456789abcdef', substr({expr}, {{i}}, 1)) - 1)"
    return "(" + " + ".join(
        digit.format(i=i + 1) + f" * {16 ** (14 - i)}" for i in range(15)
    ) + ")"


def _minhash_portable_oracle() -> str:
    """DuckDB twin of the md5-keyed multiply-shift MinHash: HUGEINT
    arithmetic mod 2^64 then integer-divide by 2^32 replicates Java's
    wrapping (a·h + b) >>> 32 bit-for-bit."""
    h = _duck_hex15_to_int("hx")
    mins = []
    for p, (a, b) in enumerate(_perm_params()):
        a_u, b_u = a % (1 << 64), b % (1 << 64)
        mins.append(
            f"min(CAST(((CAST({a_u} AS HUGEINT) * h + {b_u}) % "
            f"18446744073709551616) // 4294967296 AS BIGINT)) AS m{p}"
        )
    cols = ", ".join(f"CAST(m{p} AS VARCHAR)" for p in range(N_PERM))
    return f"""
    WITH words AS (
      SELECT doc_id, string_split(text, ' ') AS w FROM documents
    ),
    sh AS (
      SELECT doc_id,
             unnest(list_distinct(list_transform(
               generate_series(1, greatest(len(w) - 2, 0)),
               i -> concat_ws(' ', w[i], w[i+1], w[i+2])))) AS shingle
      FROM words
    ),
    hexed AS (SELECT doc_id, md5(shingle) AS hx FROM sh),
    hashed AS (SELECT doc_id, {h} AS h FROM hexed),
    sigs AS (SELECT doc_id, {", ".join(mins)} FROM hashed GROUP BY doc_id)
    SELECT doc_id, concat_ws(',', {cols}) AS sig FROM sigs
    """


@query("q_minhash_portable", oracle=_minhash_portable_oracle())
def q_minhash_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CROSS-ENGINE-VERIFIED MinHash signatures: the same 64-permutation
    Dietzfelbinger multiply-shift family as the production pipeline
    (q_dedup_near), but keyed on a PORTABLE shingle hash (first 15 md5
    hex chars as int60) instead of Spark's engine-private xxhash64 — so
    DuckDB can recompute every signature and the driver HASH-CHECKS the
    sketch algebra itself: wrap-around (a·h+b mod 2^64) >>> 32, the
    64-way min-aggregation, and the shingle set construction, all
    bit-for-bit. This closes the one verification gap the R-checked
    near-dup pipeline left: its unit tests prove recall/precision
    against exact Jaccard, this qid proves the signature MATH has no
    engine-specific drift. Production keeps xxhash64 (measurably
    cheaper per shingle); the families are otherwise identical, so a
    green hash here certifies both.

    Same scale shape as minhash_signatures: explode → hash once per
    (doc, shingle) → ONE aggregate with 64 map-side-combining mins;
    signatures emitted as a joined string (ARRAY output is not
    driver-hashable)."""
    ensure_session_determinism(spark)
    d = load(spark, sf_dir, "documents")
    sh = shingles_df(d)
    h = F.conv(
        F.substring(F.md5(F.col("shingle").cast("binary")), 1, 15), 16, 10
    ).cast("bigint")
    hashed = sh.select("doc_id", h.alias("h"))
    # ONE parsed expression (the 64 Python-built min columns + 64-col
    # concat cost ~1s of driver-side Py4J per call — same fix as
    # minhash_signatures); identical aggregate, string-joined output.
    mins_expr = ", ".join(
        f"min(shiftrightunsigned({a}L * h + {b}L, 32))"
        for a, b in _perm_params()
    )
    return (
        hashed.groupBy("doc_id")
        .agg(F.expr(f"array({mins_expr}) AS sig_arr"))
        .selectExpr(
            "doc_id",
            "array_join(transform(sig_arr, x -> cast(x as string)), ',')"
            " AS sig",
        )
    )


def _simhash_portable_oracle() -> str:
    h = _duck_hex15_to_int("hx")
    votes = ", ".join(
        f"sum(CASE WHEN (h // {1 << j}) % 2 = 1 THEN 1 ELSE -1 END) AS v{j}"
        for j in range(60)
    )
    assemble = " + ".join(
        f"(CASE WHEN v{j} > 0 THEN {1 << j} ELSE 0 END)" for j in range(60)
    )
    return f"""
    WITH words AS (
      SELECT doc_id,
             unnest(list_distinct(string_split(text, ' '))) AS word
      FROM documents
    ),
    hexed AS (SELECT doc_id, md5(word) AS hx FROM words),
    hashed AS (SELECT doc_id, {h} AS h FROM hexed),
    votes AS (SELECT doc_id, {votes} FROM hashed GROUP BY doc_id)
    SELECT doc_id, CAST({assemble} AS BIGINT) AS simhash60 FROM votes
    """


@query("q_simhash_portable", oracle=_simhash_portable_oracle())
def q_simhash_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CROSS-ENGINE-VERIFIED SimHash: the same per-bit majority-vote
    construction as the production sketch (simhash64 / q_dedup_simhash)
    on a PORTABLE 60-bit md5-keyed word hash, so DuckDB recomputes
    every signature and the driver hash-checks the bit algebra —
    explode-distinct words, ±1 vote per bit position, sign → bit,
    positional reassembly — bit-for-bit. 60 bits (not 64) keeps every
    intermediate in exact signed-int64 range in BOTH engines: no
    wraparound subtlety in the assembled value, unlike the production
    top-bit special case. Companion of q_minhash_portable — together
    they pin both sketch families' math; production keeps xxhash64 for
    throughput and the R-checked pipelines keep their recall tests.

    Same one-shuffle shape: hash once per (doc, word), 60 map-side
    conditional-sum aggregates, zero HOFs, zero Python."""
    ensure_session_determinism(spark)
    return portable_simhash(load(spark, sf_dir, "documents"))


def portable_simhash(d: DataFrame) -> DataFrame:
    """(doc_id, simhash60) — the md5-keyed 60-bit majority-vote sketch
    of q_simhash_portable, shared with the q_dedup_eval harness."""
    words = d.select(
        "doc_id",
        F.explode(F.array_distinct(F.split("text", " "))).alias("word"),
    )
    h = F.conv(
        F.substring(F.md5(F.col("word").cast("binary")), 1, 15), 16, 10
    ).cast("bigint")
    hashed = words.select("doc_id", h.alias("h"))
    # ONE parsed expression per step (60 Python-built sum columns plus
    # a 60-term assembly loop cost ~1s of driver-side Py4J per call);
    # identical 60 map-side-combining conditional sums, then a bounded
    # fold reassembles the bits from the vote array.
    votes_expr = ", ".join(
        f"sum(IF((shiftright(h, {j}) & 1) = 1, 1, -1))" for j in range(60)
    )
    votes = hashed.groupBy("doc_id").agg(
        F.expr(f"array({votes_expr}) AS v")
    )
    return votes.selectExpr(
        "doc_id",
        "aggregate(sequence(0, 59), 0L, (acc, j) -> "
        "acc + IF(element_at(v, j + 1) > 0, shiftleft(1L, j), 0L))"
        " AS simhash60",
    )


# --- semantic dedup (embedding LSH buckets → within-bucket prune) ------


# Sign-pattern bucket width: 2^_SEM_BITS buckets. Coordinate-sign
# bucketing is the deterministic member of the hyperplane-LSH family
# (axis-aligned hyperplanes): two vectors can only have cosine ≥ τ with
# many shared coordinate signs, so near-dup pairs land in the same
# bucket with high probability while the pair space shrinks by the
# bucket count. Signs are pure comparisons — zero float arithmetic in
# the bucketing stage, so the bucket id is bit-identical cross-engine.
_SEM_BITS = 6
_SEM_TAU = 0.4  # fixture max pairwise cosine ≈ 0.5 (see q_dedup_embed)


@query(
    "q_dedup_semantic",
    oracle=f"""
    WITH v AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
    ),
    b AS (
      SELECT vec_id, e,
             {" || ".join(
                 f"(CASE WHEN e[{d + 1}] > 0 THEN '1' ELSE '0' END)"
                 for d in range(_SEM_BITS)
             )} AS bucket
      FROM v
    ),
    victims AS (
      SELECT DISTINCT hi.vec_id AS victim
      FROM b lo JOIN b hi
        ON lo.bucket = hi.bucket AND lo.vec_id < hi.vec_id
      WHERE list_dot_product(lo.e, hi.e)
            / (sqrt(list_dot_product(lo.e, lo.e))
               * sqrt(list_dot_product(hi.e, hi.e))) >= {_SEM_TAU}
    )
    SELECT b.vec_id, b.bucket,
           CAST(CASE WHEN victims.victim IS NULL THEN 1 ELSE 0 END
                AS INT) AS kept
    FROM b LEFT JOIN victims ON b.vec_id = victims.victim
    """,
)
def q_dedup_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SEMANTIC DEDUP (SemDeDup shape): prune embedding-near-duplicates
    WITHOUT the all-pairs comparison — vectors are LSH-bucketed by
    their first ``_SEM_BITS`` coordinate signs, pairwise cosine runs only
    WITHIN a bucket, and of any near-dup pair (cos ≥ τ) the higher
    vec_id is pruned (rank-based one-pass pruning: a vector survives
    iff no lower-id bucket-mate sits within τ). This is the scale path
    q_dedup_embed's docstring promises: q_dedup_embed is the exact
    O(n²/B) verification tier; THIS qid is the candidate-generation
    tier whose pair space is bucket-bounded.

    Scale shape: one narrow shuffle keyed by the 6-bit bucket id, then
    per-bucket BLAS GEMM inside applyInPandas (Arrow-batched) — per
    task cost O(bucket²·dim), corpus never materializes anywhere
    whole. Giant buckets (mode collapse in the embedding space) are
    the known hazard — the production knob is more sign bits (deeper
    buckets), exactly like adding LSH bands. The kept flag per vector
    (not just the pair list) is what a curation pipeline joins back to
    the corpus to filter.
    """
    ensure_session_determinism(spark)
    import numpy as np
    import pandas as pd

    e = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    bucket = F.concat(
        *[
            F.when(F.element_at("embedding", d + 1) > 0, F.lit("1"))
            .otherwise(F.lit("0"))
            for d in range(_SEM_BITS)
        ]
    )
    tagged = e.select("vec_id", "embedding", bucket.alias("bucket"))

    def prune_bucket(key, pdf):
        ids = np.asarray(pdf["vec_id"], dtype=np.int64)
        order = np.argsort(ids)
        ids = ids[order]
        m = np.asarray(
            [np.asarray(v, dtype=np.float64) for v in pdf["embedding"]]
        )[order]
        m = m / np.linalg.norm(m, axis=1, keepdims=True)
        sims = m @ m.T
        # strict upper triangle: victim column j killed by any row i<j
        killed = (np.triu(sims >= _SEM_TAU, k=1)).any(axis=0)
        return pd.DataFrame(
            {
                "vec_id": ids,
                "bucket": key[0],
                "kept": (~killed).astype("int32"),
            }
        )

    return tagged.groupBy("bucket").applyInPandas(
        prune_bucket, "vec_id BIGINT, bucket STRING, kept INT"
    )


# --- prefix-filtered exact set-similarity join (PPJoin shape) ----------


_SS_TAU = 0.6  # 3-gram-set Jaccard threshold


@query(
    "q_join_setsim",
    oracle=f"""
    WITH words AS (
      SELECT doc_id, string_split(text, ' ') AS w FROM documents
    ),
    t AS (
      SELECT doc_id,
             unnest(list_distinct(list_transform(
               generate_series(1, greatest(len(w) - 2, 0)),
               i -> concat_ws(' ', w[i], w[i+1], w[i+2])))) AS tok
      FROM words
    ),
    sizes AS (SELECT doc_id, count(*) AS n FROM t GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS i
      FROM t a JOIN t b ON a.tok = b.tok AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT d1, d2,
           round(CAST(i.i AS DOUBLE) / (s1.n + s2.n - i.i), 6)
             AS jaccard
    FROM inter i
    JOIN sizes s1 ON i.d1 = s1.doc_id
    JOIN sizes s2 ON i.d2 = s2.doc_id
    WHERE CAST(i.i AS DOUBLE) / (s1.n + s2.n - i.i) >= {_SS_TAU}
    """,
)
def q_join_setsim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PREFIX-FILTERED EXACT SET-SIMILARITY JOIN (the PPJoin family) —
    the EXACT counterpart to MinHash/LSH candidate generation: order
    each document's bigram-token set globally RAREST-FIRST, index only
    its PREFIX of length n − ⌈τ·n⌉ + 1, and generate candidates from
    shared prefix tokens. The prefix bound is the pigeonhole argument:
    two sets with Jaccard ≥ τ overlap in ≥ ⌈τ·n⌉ tokens, so skipping
    the first n − ⌈τ·n⌉ + 1 of either (in the SAME canonical order)
    cannot skip the entire overlap — pruning is LOSSLESS, which the
    oracle PROVES: it brute-forces all shared-token pairs and the
    hash must match exactly. Rarest-first ordering makes prefixes
    maximally selective (common tokens never generate candidates).

    Scale shape: token frequencies are |vocab| rows and per-doc sizes
    are |docs| rows — both UNBOUNDED in the corpus, so neither side is
    broadcast-HINTED (r11 audit: a forced broadcast of a corpus-sized
    aggregate is an executor OOM at 100 TB; the planner's
    autoBroadcastJoinThreshold still broadcasts them while they
    genuinely fit, and plans a shuffled hash join beyond that — the
    equi-join keys keep it co-partitioned either way). Per-doc
    ordering is a doc-partitioned window; candidates come from an
    equi-join on PREFIX tokens only — the frequency-aware exact
    alternative to LSH when recall must be 1.0 — and the verify tier
    is the same intersection-as-join-key shape as exact_jaccard."""
    ensure_session_determinism(spark)
    _scope(f"q_join_setsim:{sf_dir}")
    from pyspark.sql import Window

    d = _parallelize_docs(load(spark, sf_dir, "documents"))
    toks = _persist(shingles_df(d, k=3).withColumnRenamed("shingle", "tok"))
    freq = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    sizes = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    w_ord = Window.partitionBy("doc_id").orderBy("df", "tok")
    # per-doc set size comes from the (broadcastable, |docs|-row) sizes
    # aggregate, NOT a second unordered window over the token rows — a
    # no-order count-over-partition is its OWN WindowExec pass on top
    # of the rarest-first sort below.
    ranked = (
        toks.join(freq, "tok")
        .join(sizes, "doc_id")
        .withColumn("pos", F.row_number().over(w_ord))
    )
    # persisted: the prefix feeds BOTH sides of the candidate
    # self-join, and without the persist the whole freq-join + window
    # stack is computed twice (self-join sides are separate plan
    # branches; the join key is tok, so nothing upstream is reusable).
    prefix = _persist(
        ranked.where(
            F.col("pos")
            <= F.col("n") - F.ceil(F.lit(_SS_TAU) * F.col("n")) + 1
        ).select("doc_id", "tok")
    )
    a, b = prefix.alias("a"), prefix.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.tok") == F.col("b.tok"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("d1"), F.col("b.doc_id").alias("d2")
        )
        .distinct()
    )
    # VERIFY over per-doc token ARRAYS, not a token-level join: the
    # uniform synthetic vocabulary is the adversarial case for
    # rarest-first prefixes (~300 k candidates at sf0.1), and joining
    # each candidate against both token lists shuffled ~15 M rows
    # (3.3 s — the whole query's cost). Collapsing each doc to ONE row
    # carrying its sorted token array makes the verify two doc-count-
    # sized joins plus an in-row array_intersect per candidate
    # (O(|A|+|B|) eval, no row amplification). Two exact prunes run
    # first: the PPJoin LENGTH filter (J ≥ τ ⇒ τ·max(n1,n2) ≤
    # min(n1,n2) — lossless pigeonhole) drops pairs before any
    # intersection is evaluated. Scale note: array rows are doc-sized —
    # right for documents/shingle sets; for multi-MB sets keep the
    # token-level intersection join (exact_jaccard's shape) instead.
    arrs = toks.groupBy("doc_id").agg(
        F.collect_list("tok").alias("ts"), F.count(F.lit(1)).alias("n")
    )
    joined = (
        cand.join(
            arrs.select(
                F.col("doc_id").alias("d1"),
                F.col("ts").alias("t1"),
                F.col("n").alias("n1"),
            ),
            "d1",
        )
        .join(
            arrs.select(
                F.col("doc_id").alias("d2"),
                F.col("ts").alias("t2"),
                F.col("n").alias("n2"),
            ),
            "d2",
        )
        .where(
            F.lit(_SS_TAU) * F.greatest("n1", "n2")
            <= F.least("n1", "n2")
        )
        .select(
            "d1",
            "d2",
            "n1",
            "n2",
            F.size(F.array_intersect("t1", "t2")).alias("i"),
        )
    )
    jac = F.col("i").cast("double") / (
        F.col("n1") + F.col("n2") - F.col("i")
    )
    return joined.where(jac >= _SS_TAU).select(
        "d1", "d2", F.round(jac, 6).alias("jaccard")
    )


# --- sketch-vs-truth evaluation harness --------------------------------


def _simhash_sig_ctes() -> str:
    """DuckDB CTEs ending in ``sigs(doc_id, simhash60)`` — the portable
    SimHash construction, shared text with _simhash_portable_oracle."""
    h = _duck_hex15_to_int("hx")
    votes = ", ".join(
        f"sum(CASE WHEN (h // {1 << j}) % 2 = 1 THEN 1 ELSE -1 END) AS v{j}"
        for j in range(60)
    )
    assemble = " + ".join(
        f"(CASE WHEN v{j} > 0 THEN {1 << j} ELSE 0 END)" for j in range(60)
    )
    return f"""
    swords AS (
      SELECT doc_id,
             unnest(list_distinct(string_split(text, ' '))) AS word
      FROM documents
    ),
    shexed AS (SELECT doc_id, md5(word) AS hx FROM swords),
    shashed AS (SELECT doc_id, {h} AS h FROM shexed),
    svotes AS (SELECT doc_id, {votes} FROM shashed GROUP BY doc_id),
    sigs AS (
      SELECT doc_id, CAST({assemble} AS BIGINT) AS simhash60 FROM svotes
    )
    """


@query(
    "q_dedup_eval",
    oracle=f"""
    WITH {_simhash_sig_ctes()},
    bands AS (
      SELECT doc_id,
             b.b AS band_id,
             (simhash60 // CAST(pow(2, 15 * b.b) AS BIGINT)) % 32768
               AS band_val
      FROM sigs CROSS JOIN (
        SELECT unnest(generate_series(0, 3)) AS b) b
    ),
    bounded AS (
      SELECT doc_id, band_id, band_val FROM bands
      QUALIFY count(*) OVER (PARTITION BY band_id, band_val) <= 150
    ),
    pred AS (
      SELECT DISTINCT a.doc_id AS d1, c.doc_id AS d2
      FROM bounded a JOIN bounded c
        ON a.band_id = c.band_id AND a.band_val = c.band_val
       AND a.doc_id < c.doc_id
    ),
    {NGRAM_PAIRS_CTES},
    joined AS (
      SELECT coalesce(p.d1, t.d1) AS d1,
             CASE WHEN p.d1 IS NOT NULL THEN 1 ELSE 0 END AS in_pred,
             CASE WHEN t.d1 IS NOT NULL THEN 1 ELSE 0 END AS in_truth
      FROM pred p
      FULL OUTER JOIN njpairs t ON p.d1 = t.d1 AND p.d2 = t.d2
    )
    SELECT CAST(sum(in_pred * in_truth) AS BIGINT) AS tp,
           CAST(sum(in_pred * (1 - in_truth)) AS BIGINT) AS fp,
           CAST(sum((1 - in_pred) * in_truth) AS BIGINT) AS fn,
           round(CAST(sum(in_pred * in_truth) AS DOUBLE)
                 / nullif(sum(in_pred), 0), 6) AS precision,
           round(CAST(sum(in_pred * in_truth) AS DOUBLE)
                 / nullif(sum(in_truth), 0), 6) AS recall
    FROM joined
    """,
)
def q_dedup_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SKETCH-QUALITY EVALUATION AS A QUERY — precision/recall of
    SimHash band-bucket candidate generation against exact 3-gram
    Jaccard ≥ 0.8 ground truth, computed INSIDE the engine and
    H-checked: predicted pairs share one of four 15-bit bands of the
    portable 60-bit SimHash; truth is the brute-force n-gram pair set;
    the single audit row carries tp/fp/fn and both metrics. This is
    the measurement a curation team runs before trusting a sketch
    tier at 100 TB — and since both the sketch and the truth are
    deterministic SQL in both engines, the EVALUATION itself is
    cross-engine verified, not just eyeballed (low precision is
    expected and visible: bands are a high-recall candidate filter,
    which is exactly the property being audited).

    Scale shape: candidates via band equi-join buckets (never
    all-pairs hamming); truth via shared-shingle grouping; one full
    outer join of two pair sets; constant-size output."""
    ensure_session_determinism(spark)
    _scope(f"q_dedup_eval:{sf_dir}")
    d = _parallelize_docs(load(spark, sf_dir, "documents"))
    sigs = portable_simhash(d)
    band = F.explode(
        F.array(*[F.lit(b) for b in range(4)])
    ).alias("band_id")
    bands = sigs.select("doc_id", "simhash60", band).select(
        "doc_id",
        "band_id",
        (
            F.expr("shiftright(simhash60, band_id * 15)") % 32768
        ).alias("band_val"),
    )
    # cap degenerate buckets (same knob as lsh_candidate_pairs'
    # max_bucket): a giant band bucket is quadratic; the cap is part of
    # the EVALUATED configuration in both engines, so the metrics stay
    # H-comparable while the cost stays bounded.
    wb = Window.partitionBy("band_id", "band_val")
    bands = (
        bands.withColumn("bn", F.count(F.lit(1)).over(wb))
        .where(F.col("bn") <= 150)
        .drop("bn")
    )
    a, c = bands.alias("a"), bands.alias("c")
    pred = (
        a.join(
            c,
            (F.col("a.band_id") == F.col("c.band_id"))
            & (F.col("a.band_val") == F.col("c.band_val"))
            & (F.col("a.doc_id") < F.col("c.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("d1"), F.col("c.doc_id").alias("d2")
        )
        .distinct()
        .withColumn("in_pred", F.lit(1))
    )
    truth = ngram_jaccard_pairs(d).select("d1", "d2").withColumn(
        "in_truth", F.lit(1)
    )
    joined = pred.join(truth, ["d1", "d2"], "full_outer").select(
        F.coalesce("in_pred", F.lit(0)).alias("in_pred"),
        F.coalesce("in_truth", F.lit(0)).alias("in_truth"),
    )
    tp = F.sum(F.col("in_pred") * F.col("in_truth"))
    return joined.agg(
        tp.cast("bigint").alias("tp"),
        F.sum(F.col("in_pred") * (1 - F.col("in_truth")))
        .cast("bigint")
        .alias("fp"),
        F.sum((1 - F.col("in_pred")) * F.col("in_truth"))
        .cast("bigint")
        .alias("fn"),
        F.round(
            tp.cast("double") / F.nullif(F.sum("in_pred"), F.lit(0)), 6
        ).alias("precision"),
        F.round(
            tp.cast("double") / F.nullif(F.sum("in_truth"), F.lit(0)), 6
        ).alias("recall"),
    )


# --- corpus-overlap estimation from mergeable sketches -----------------


def _sketch_overlap_oracle() -> str:
    """DuckDB twin: per-language portable MinHash (elementwise min over
    the language's shingle hashes — identical to min-merging per-doc
    sketches, min being associative), pairwise agreement-rate estimate,
    and the exact shingle-set Jaccard audit column."""
    h = _duck_hex15_to_int("hx")
    mins = []
    for p, (a, b) in enumerate(_perm_params()):
        a_u, b_u = a % (1 << 64), b % (1 << 64)
        mins.append(
            f"min(CAST(((CAST({a_u} AS HUGEINT) * h + {b_u}) % "
            f"18446744073709551616) // 4294967296 AS BIGINT)) AS m{p}"
        )
    agree = " + ".join(
        f"(CASE WHEN a.m{p} = b.m{p} THEN 1 ELSE 0 END)"
        for p in range(N_PERM)
    )
    return f"""
    WITH words AS (
      SELECT lang, string_split(text, ' ') AS w FROM documents
    ),
    sh AS (
      SELECT DISTINCT lang,
             unnest(list_distinct(list_transform(
               generate_series(1, greatest(len(w) - 2, 0)),
               i -> concat_ws(' ', w[i], w[i+1], w[i+2])))) AS shingle
      FROM words
    ),
    hexed AS (SELECT lang, md5(shingle) AS hx FROM sh),
    hashed AS (SELECT lang, {h} AS h FROM hexed),
    sigs AS (SELECT lang, {", ".join(mins)} FROM hashed GROUP BY lang),
    sizes AS (SELECT lang, count(*) AS n FROM sh GROUP BY lang),
    inter AS (
      SELECT a.lang AS l1, b.lang AS l2, count(*) AS i
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.lang < b.lang
      GROUP BY 1, 2
    )
    SELECT a.lang AS l1, b.lang AS l2,
           round(CAST({agree} AS DOUBLE) / {N_PERM}, 6) AS est_jaccard,
           round(CAST(i.i AS DOUBLE) / (s1.n + s2.n - i.i), 6)
             AS exact_jaccard
    FROM sigs a
    JOIN sigs b ON a.lang < b.lang
    JOIN inter i ON i.l1 = a.lang AND i.l2 = b.lang
    JOIN sizes s1 ON s1.lang = a.lang
    JOIN sizes s2 ON s2.lang = b.lang
    """


@query("q_sketch_overlap", oracle=_sketch_overlap_oracle())
def q_sketch_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CORPUS-OVERLAP ESTIMATION FROM MERGEABLE SKETCHES — "how much
    does source A overlap source B" WITHOUT joining their contents:
    each language's shingle set is reduced to a 64-perm portable
    MinHash sketch, and the pairwise overlap estimate is the sketch
    agreement rate (E[agree] = Jaccard). The per-language sketch is
    the elementwise MIN-MERGE of per-document sketches — min is
    associative, so partitions/sources/days can be sketched
    independently and merged later, the same mergeability contract
    HLL gives distinct counts (and the insert-path of incremental
    maintenance: new docs min-merge into the stored sketch without
    recomputation). ``exact_jaccard`` rides along as the audit column
    (both sides are SQL in both engines), making the estimator's
    error visible per pair.

    Scale shape: sketching is one hash-aggregate to |sources|×64
    values — constant size however big each source; pairwise
    comparison touches ONLY sketches (|sources|² tiny rows). The
    exact audit column is the only content-width join and exists for
    verification, not the production path."""
    ensure_session_determinism(spark)
    _scope(f"q_sketch_overlap:{sf_dir}")
    d = _parallelize_docs(load(spark, sf_dir, "documents"))
    sh = _persist(
        d.select("lang", F.explode(shingle_array(3)).alias("shingle"))
        .distinct()
    )
    # Signature as ONE parsed expression — an array of 64 min-aggregates
    # (same single-parse discipline as minhash_signatures: the previous
    # 64 Python-built min columns plus a 64-term agreement loop cost
    # ~1.5 s of driver-side Py4J per builder call; this form builds in
    # ~0.2 s and produces the identical aggregate).
    H = (
        "cast(conv(substring(md5(cast(shingle as binary)), 1, 15),"
        " 16, 10) as bigint)"
    )
    mins = ", ".join(
        f"min(shiftrightunsigned({a}L * h + {b}L, 32))"
        for a, b in _perm_params()
    )
    sigs = (
        sh.selectExpr("lang", f"{H} AS h")
        .groupBy("lang")
        .agg(F.expr(f"array({mins}) AS sig"))
    )
    sizes = sh.groupBy("lang").agg(F.count(F.lit(1)).alias("n"))
    inter = (
        sh.alias("x")
        .join(
            sh.alias("y"),
            (F.col("x.shingle") == F.col("y.shingle"))
            & (F.col("x.lang") < F.col("y.lang")),
        )
        .groupBy(
            F.col("x.lang").alias("l1"), F.col("y.lang").alias("l2")
        )
        .agg(F.count(F.lit(1)).alias("i"))
    )
    sa = sigs.selectExpr("lang AS l1", "sig AS sig1")
    sb = sigs.selectExpr("lang AS l2", "sig AS sig2")
    pairs = sa.join(sb, F.col("l1") < F.col("l2")).selectExpr(
        "l1",
        "l2",
        "round(cast(size(filter(zip_with(sig1, sig2, (x, y) -> x = y),"
        f" v -> v)) as double) / {N_PERM}, 6) AS est_jaccard",
    )
    return (
        pairs.join(inter, ["l1", "l2"])
        .join(sizes.selectExpr("lang AS l1", "n AS n1"), "l1")
        .join(sizes.selectExpr("lang AS l2", "n AS n2"), "l2")
        .selectExpr(
            "l1",
            "l2",
            "est_jaccard",
            "round(cast(i as double) / (n1 + n2 - i), 6)"
            " AS exact_jaccard",
        )
    )


@query(
    "q_dedup_source_matrix",
    oracle=f"""
    WITH {NGRAM_PAIRS_CTES},
    tagged AS (
      SELECT least(sa.source, sb.source) AS src_a,
             greatest(sa.source, sb.source) AS src_b
      FROM njpairs p
      JOIN documents sa ON p.d1 = sa.doc_id
      JOIN documents sb ON p.d2 = sb.doc_id
    )
    SELECT src_a, src_b, CAST(count(*) AS BIGINT) AS n_pairs
    FROM tagged GROUP BY src_a, src_b
    """,
)
def q_dedup_source_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SOURCE-CONTAMINATION MATRIX — which crawl sources duplicate each
    other: the exact near-dup pair set (3-gram Jaccard ≥ 0.8, the
    q_dedup_ngram tier) rolled up to unordered (source_a, source_b)
    counts. This is the provenance audit a corpus owner runs before
    setting mixture weights: heavy off-diagonal mass means two "sources"
    are substantially the same feed and their weights double-count.

    Cost: the pair mining dominates and is the already-bounded shingle
    equi-join; the rollup adds one broadcast doc→source join per side
    (the doc→source map is a projection of the corpus scan — at 100 TB
    it rides the same scan, not a second pass) and a tiny aggregate
    over pair rows."""
    ensure_session_determinism(spark)
    _scope(f"q_dedup_source_matrix:{sf_dir}")
    d = _parallelize_docs(load(spark, sf_dir, "documents"))
    pairs = ngram_jaccard_pairs(d)
    src = d.select("doc_id", "source")
    tagged = (
        pairs.join(
            src.select(F.col("doc_id").alias("d1"), F.col("source").alias("sa")),
            "d1",
        )
        .join(
            src.select(F.col("doc_id").alias("d2"), F.col("source").alias("sb")),
            "d2",
        )
        .select(
            F.least("sa", "sb").alias("src_a"),
            F.greatest("sa", "sb").alias("src_b"),
        )
    )
    return tagged.groupBy("src_a", "src_b").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs")
    )


@query(
    "q_shingle_novelty",
    oracle="""
    WITH words AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    sh AS (
      SELECT doc_id,
             unnest(list_distinct(list_transform(
               generate_series(1, greatest(len(w) - 2, 0)),
               i -> concat_ws(' ', w[i], w[i+1], w[i+2])))) AS shingle
      FROM words
    ),
    firsts AS (SELECT shingle, min(doc_id) AS first_id FROM sh GROUP BY shingle)
    SELECT sh.doc_id,
           CAST(count(*) AS BIGINT) AS n_shingles,
           CAST(count(*) FILTER (firsts.first_id = sh.doc_id) AS BIGINT)
             AS n_novel,
           round(CAST(count(*) FILTER (firsts.first_id = sh.doc_id)
                      AS DOUBLE) / count(*), 6) AS novelty
    FROM sh JOIN firsts ON sh.shingle = firsts.shingle
    GROUP BY sh.doc_id
    """,
)
def q_shingle_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CORPUS NOVELTY ATTRIBUTION — per document, the fraction of its
    3-gram shingles whose FIRST corpus occurrence (min doc_id — the
    ingest-order proxy) is this document. Novelty ~1 means genuinely
    new content; ~0 means the doc is assembled from already-seen text —
    the streaming-ingest complement to pairwise dedup (it catches
    mosaic/stitched duplication that no single pair crosses the
    Jaccard threshold on).

    Shape: ONE extra aggregate over the shingle table (min doc_id per
    shingle — map-side combined) joined back on the shingle hash, then
    a per-doc rollup. At 100 TB the firsts table IS the incremental
    dedup index's sibling artifact: both are keyed by shingle hash and
    co-partition for free."""
    ensure_session_determinism(spark)
    _scope(f"q_shingle_novelty:{sf_dir}")
    d = _parallelize_docs(load(spark, sf_dir, "documents"))
    sh = _persist(
        shingles_df(d).select(
            "doc_id", F.xxhash64("shingle").alias("shingle")
        )
    )  # consumers: firsts + join side
    firsts = sh.groupBy("shingle").agg(F.min("doc_id").alias("first_id"))
    novel = (F.col("first_id") == F.col("doc_id")).cast("int")
    return (
        sh.join(firsts, "shingle")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_shingles"),
            F.sum(novel).cast("bigint").alias("n_novel"),
            F.round(
                F.sum(novel).cast("double") / F.count(F.lit(1)), 6
            ).alias("novelty"),
        )
    )
