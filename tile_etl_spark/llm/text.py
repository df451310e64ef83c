"""Text-analysis operators over ``documents`` (SURVEY §2B): corpus
stats, tf-idf, language-ID scoring, quality scoring, token counting,
rolling-hash fingerprints. All pure JVM expressions (split / explode /
agg / window) — the shapes that stream through a 100 TB corpus with one
or two shuffles each.
"""

from __future__ import annotations

import os

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tile_etl_spark.cache import persist_scoped, scope
from tile_etl_spark.io import load, table_view
from tile_etl_spark.operators.windows import (
    bounded_window_key,
    pid_hist_window,
)
from tile_etl_spark.registry import query
from tile_etl_spark.session import ensure_session_determinism

# Corpus row counts collected once per (session, sf_dir, source
# fingerprint) — a bounded broadcast-build step (1 row) like the probe
# collects in similarity.py; the fingerprint key means a changed source
# file recounts instead of reusing a stale N.
_CORPUS_N: dict[tuple, int] = {}

# io.source_memo store: sf_dir → (session id, source fingerprint,
# (tfc, idf, final)) — the same bounded build-memo protocol as
# q_dedup_near's _NEAR_MEMO (semantics live in io.source_memo).
_TFIDF_MEMO: dict[str, tuple] = {}


def _corpus_count(spark: SparkSession, sf_dir: str, view: str) -> int:
    import os

    from tile_etl_spark.sources.files import source_fingerprint

    fp = source_fingerprint(os.path.join(sf_dir, "documents.parquet"))
    key = (id(spark), sf_dir, fp)
    if key not in _CORPUS_N:
        _CORPUS_N[key] = spark.sql(
            f"SELECT count(*) FROM {view}"
        ).collect()[0][0]
    return _CORPUS_N[key]


@query(
    "q_text_stats",
    oracle="""
    WITH tok AS (
      SELECT lang, doc_id, n_chars, len(string_split(text, ' ')) AS n_tokens
      FROM documents
    ),
    per_lang AS (
      SELECT lang,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(n_tokens) AS DOUBLE) / count(*) AS avg_tokens,
             CAST(sum(n_chars) AS DOUBLE) / count(*) AS avg_chars
      FROM tok GROUP BY lang
    ),
    terms AS (
      SELECT lang, unnest(string_split(text, ' ')) AS term FROM documents
    ),
    term_counts AS (
      SELECT lang, term, count(*) AS n FROM terms GROUP BY lang, term
    ),
    top_terms AS (
      SELECT lang, term,
             row_number() OVER (PARTITION BY lang
                                ORDER BY n DESC, term ASC) AS r
      FROM term_counts
    )
    SELECT p.lang, p.n_docs, p.avg_tokens, p.avg_chars,
           t.term AS top_term
    FROM per_lang p JOIN top_terms t ON p.lang = t.lang AND t.r = 1
    """,
)
def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language corpus stats + most frequent term (count desc, term
    asc tiebreak). Two aggregations + one broadcast join."""
    ensure_session_determinism(spark)
    d = load(spark, sf_dir, "documents")
    tok = d.select(
        "lang", "n_chars", F.size(F.split("text", " ")).alias("n_tokens")
    )
    per_lang = tok.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.sum("n_tokens").cast("double") / F.count(F.lit(1))).alias(
            "avg_tokens"
        ),
        (F.sum("n_chars").cast("double") / F.count(F.lit(1))).alias(
            "avg_chars"
        ),
    )
    terms = d.select("lang", F.explode(F.split("text", " ")).alias("term"))
    counts = terms.groupBy("lang", "term").agg(F.count(F.lit(1)).alias("n"))
    # Argmax per lang as a min_by aggregate on (-n, term) — reproduces
    # the (n DESC, term ASC) ranking with a map-side partial reduce
    # instead of a per-lang window sort of the whole vocabulary.
    top = counts.groupBy("lang").agg(
        F.expr("min_by(term, struct(-n, term))").alias("top_term")
    )
    return per_lang.join(top, "lang")


@query(
    "q_text_tfidf",
    oracle="""
    WITH tf AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
    ),
    tfc AS (SELECT doc_id, term, count(*) AS tf FROM tf GROUP BY 1, 2),
    df AS (SELECT term, count(DISTINCT doc_id) AS df FROM tf GROUP BY term),
    n AS (SELECT count(*) AS n_docs FROM documents),
    scored AS (
      SELECT tfc.doc_id, tfc.term,
             tfc.tf * ln(CAST(n.n_docs AS DOUBLE) / df.df) AS tfidf
      FROM tfc JOIN df USING (term) CROSS JOIN n
    ),
    ranked AS (
      SELECT doc_id, term, tfidf,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY tfidf DESC, term ASC) AS r
      FROM scored
    )
    SELECT doc_id, term AS top_term, round(tfidf, 6) AS tfidf
    FROM ranked WHERE r = 1
    """,
)
def q_text_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top tf-idf term per doc: tfidf = tf · idf, idf = ln(N/df),
    argmaxed per doc on (tfidf desc, term asc).

    Shape (the 100 TB inverted-index decomposition):
    - ``tfc`` (doc, term, tf) is the persisted term-frequency pair set;
      BOTH the idf build and the scoring pass consume it — without the
      persist the idf side re-runs the full corpus explode.
    - ``idf`` (term, idf) is a persisted VOCABULARY-sized table —
      rows-per-term in tfc IS the document frequency, and the ln(N/df)
      is evaluated once per term here, not once per (doc, term) pair.
      Always broadcastable (vocabulary ≪ corpus at any scale).
    - N (corpus cardinality) is a driver-collected literal, memoized
      per (session, sf_dir, source fingerprint) like every other
      bounded broadcast-build step — one count job per session instead
      of one 1-row-aggregate job per call.
    - Scoring is ONE job: cached tfc ⋈ broadcast(idf), tf·idf, then a
      per-doc argmax via min_by on (-tfidf, term) — the struct key
      reproduces the (tfidf DESC, term ASC) ranking, and the partial
      aggregate reduces map-side to ≤1 row per doc per partition (the
      row_number form fully sorted the pair set per doc partition).
    Issued as single spark.sql statements over identity-named views of
    the persisted frames (one parse+analyze each; the chained
    DataFrame form paid ~90 ms of eager analysis per call).

    Per-term idf is bit-identical to the oracle's per-pair
    ln(N/df): N and df are the same doubles either way and ln is
    deterministic, so factoring it out of the pair loop cannot change
    a single output bit."""
    ensure_session_determinism(spark)
    scope(f"q_text_tfidf:{sf_dir}")
    t = table_view(spark, sf_dir, "documents")
    from tile_etl_spark.sources.files import source_fingerprint

    fpr = source_fingerprint(os.path.join(sf_dir, "documents.parquet"))

    def build():
        tfc = persist_scoped(
            spark.sql(
                f"SELECT doc_id, term, count(*) AS tf FROM (SELECT doc_id,"
                f" explode(split(text, ' ')) AS term FROM {t})"
                f" GROUP BY doc_id, term"
            )
        )
        v = f"__tfidf_tfc_{tfc.semanticHash() & 0xFFFFFFFF:x}"
        tfc.createOrReplaceTempView(v)
        n_docs = _corpus_count(spark, sf_dir, t)
        idf = persist_scoped(
            spark.sql(
                f"SELECT term, ln(CAST({n_docs} AS DOUBLE) / count(*)) AS"
                f" idf FROM {v} GROUP BY term"
            )
        )
        vi = f"__tfidf_idf_{idf.semanticHash() & 0xFFFFFFFF:x}"
        idf.createOrReplaceTempView(vi)
        final = spark.sql(
            f"""
            SELECT doc_id, s.term AS top_term,
                   round(s.tfidf, 6) AS tfidf
            FROM (
              SELECT doc_id,
                     min_by(struct(term, tfidf), struct(-tfidf, term)) AS s
              FROM (
                SELECT /*+ BROADCAST(i) */ p.doc_id, p.term,
                       p.tf * i.idf AS tfidf
                FROM {v} p JOIN {vi} i ON p.term = i.term
              ) GROUP BY doc_id
            )
            """
        )
        return (tfc, idf, final)

    def replay(payload):
        tfc, idf, _ = payload
        persist_scoped(tfc)
        persist_scoped(idf)

    from tile_etl_spark.io import source_memo

    return source_memo(_TFIDF_MEMO, spark, sf_dir, fpr, build, replay)[-1]


# Deterministic lang-ID scoring rule shared with the oracle: score each
# language by its marker-term hit counts; predict the argmax (marker
# lists pinned). The synthetic fixture's text is vocabulary soup, so
# this exercises the *operator shape* (N scores + argmax over marker
# dictionaries — exactly how a real n-gram lang-ID kernel runs); with
# real corpora the marker lists become n-gram profiles.
_MARKERS = {
    "en": ("the", "value", "fast"),
    "de": ("der", "und", "table"),
    "es": ("el", "los", "row"),
    "fr": ("le", "les", "line"),
    "zh": ("zh", "hash", "scan"),
}


def _hits_sql(terms: tuple[str, ...]) -> str:
    return " + ".join(
        f"len(list_filter(string_split(text, ' '), t -> t = '{t}'))"
        for t in terms
    )


def langid_scored(d: DataFrame) -> DataFrame:
    """(doc_id, lang, score_*, predicted) — the shared language-ID
    projection (marker-hit counts + pinned-order argmax) consumed by
    q_text_langid and the q_text_lang_confusion audit.

    ONE ``aggregate`` pass over the token array folds every language's
    hit count simultaneously (acc = one counter per language), and the
    struct-building lambda computes scores AND the argmax from lambda-
    variable reads — the previous per-(lang, marker) ``filter`` form
    walked the token array 15×, and the optimized plan here carries
    exactly one ``aggregate`` (verified: no projection-collapse
    re-inlining; measured 1.8× at sf0.1, value-identical)."""
    langs = list(_MARKERS)

    def step(i: int, terms: tuple[str, ...]) -> str:
        inlist = ", ".join(f"'{t}'" for t in terms)
        return f"acc[{i}] + (CASE WHEN t IN ({inlist}) THEN 1 ELSE 0 END)"

    accs = ", ".join(step(i, _MARKERS[l]) for i, l in enumerate(langs))
    zeros = ", ".join(["0"] * len(langs))
    fields = ", ".join(
        f"CAST(s[{i}] AS INT) AS score_{l}" for i, l in enumerate(langs)
    )
    gre = ", ".join(f"s[{i}]" for i in range(len(langs)))
    whens = " ".join(
        f"WHEN s[{i}] >= greatest({gre}) THEN '{l}'"
        for i, l in enumerate(langs)
    )
    scored = F.expr(
        f"element_at(transform(array(aggregate(split(text, ' '), "
        f"array({zeros}), (acc, t) -> array({accs}))), "
        f"s -> struct({fields}, CASE {whens} END AS predicted)), 1)"
    )
    return d.select("doc_id", "lang", scored.alias("s")).select(
        "doc_id", "lang", "s.*"
    )


@query(
    "q_text_langid",
    oracle=f"""
    WITH scored AS (
      SELECT doc_id, lang,
             {", ".join(f"CAST({_hits_sql(ts)} AS INT) AS score_{lang}" for lang, ts in _MARKERS.items())}
      FROM documents
    )
    SELECT doc_id, lang,
           {", ".join(f"score_{lang}" for lang in _MARKERS)},
           CASE {" ".join(f"WHEN score_{lang} >= greatest({', '.join('score_' + o for o in _MARKERS)}) THEN '{lang}'" for lang in _MARKERS)}
           END AS predicted
    FROM scored
    """,
)
def q_text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID scoring: per-language marker-hit counts + argmax
    (first language in pinned order wins ties — the CASE encodes the
    same total order both sides)."""
    ensure_session_determinism(spark)
    return langid_scored(load(spark, sf_dir, "documents"))


@query(
    "q_text_quality",
    oracle="""
    WITH t AS (
      SELECT doc_id, text,
             len(string_split(text, ' ')) AS n_tokens,
             length(text) AS n_chars_m,
             length(regexp_replace(text, '[a-z ]', '', 'g')) AS n_nonalpha,
             len(list_filter(string_split(text, ' '),
                 t -> t IN ('the', 'a', 'of', 'and', 'data', 'value'))) AS n_stop
      FROM documents
    )
    SELECT doc_id,
           CAST(n_tokens AS INT) AS n_tokens,
           round(CAST(n_nonalpha AS DOUBLE) / n_chars_m, 6) AS punct_ratio,
           round(CAST(n_stop AS DOUBLE) / n_tokens, 6) AS stopword_ratio,
           round(CAST(n_chars_m AS DOUBLE) / n_tokens, 6) AS avg_token_len,
           (n_tokens >= 5 AND CAST(n_stop AS DOUBLE) / n_tokens > 0.0) AS passes
    FROM t
    """,
)
def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring: token count, punctuation ratio, stopword ratio,
    mean token length, and a pass/fail gate — the standard pre-training
    filter feature set, all in one projection pass."""
    ensure_session_determinism(spark)
    d = load(spark, sf_dir, "documents")
    words = F.split("text", " ")
    stop = F.size(
        F.filter(
            words,
            lambda t: t.isin("the", "a", "of", "and", "data", "value"),
        )
    )
    n_tokens = F.size(words)
    n_chars = F.length("text")
    n_nonalpha = F.length(F.regexp_replace("text", "[a-z ]", ""))
    return d.select(
        "doc_id",
        n_tokens.cast("int").alias("n_tokens"),
        F.round(n_nonalpha.cast("double") / n_chars, 6).alias("punct_ratio"),
        F.round(stop.cast("double") / n_tokens, 6).alias("stopword_ratio"),
        F.round(n_chars.cast("double") / n_tokens, 6).alias("avg_token_len"),
        ((n_tokens >= 5) & (stop.cast("double") / n_tokens > 0.0)).alias(
            "passes"
        ),
    )


@query(
    "q_text_tokens",
    oracle="""
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS INT) AS ws_tokens,
           CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS INT)
             AS bpe_ish_tokens,
           CAST(length(text) AS INT) AS n_bytes
    FROM documents
    """,
)
def q_text_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting two ways: whitespace split and a BPE-ish regex
    (letter runs / digit runs / single symbols) — the cheap proxy used
    to budget LLM token counts at corpus scale."""
    ensure_session_determinism(spark)
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.size(F.split("text", " ")).cast("int").alias("ws_tokens"),
        F.size(
            F.expr(r"regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]', 0)")
        ).cast("int").alias("bpe_ish_tokens"),
        F.length("text").cast("int").alias("n_bytes"),
    )


# Rolling-hash fingerprinting: word value wv = ascii(first)·10000 +
# ascii(last)·100 + length; window-4 polynomial hash base 31. Both
# dialects compute identical BIGINTs.
@query(
    "q_text_fingerprint",
    oracle="""
    WITH words AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    wv AS (
      SELECT doc_id,
             list_transform(w, t -> CAST(ascii(substring(t, 1, 1)) * 10000
                            + ascii(substring(t, -1, 1)) * 100
                            + length(t) AS BIGINT)) AS v
      FROM words
    ),
    fp AS (
      SELECT doc_id,
             list_transform(
               generate_series(1, greatest(len(v) - 3, 0)),
               i -> ((v[i] * 31 + v[i+1]) * 31 + v[i+2]) * 31 + v[i+3]) AS fps
      FROM wv
    )
    SELECT doc_id,
           CAST(len(list_distinct(fps)) AS INT) AS n_distinct_fp,
           list_aggregate(fps, 'min') AS min_fp,
           list_aggregate(fps, 'max') AS max_fp
    FROM fp
    """,
)
def q_text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: rolling polynomial hash over 4-word
    windows; emits distinct-fingerprint count and min/max (the winnowing
    primitives). Pure per-row array expressions — ZERO shuffles; at
    100 TB this pipelines straight out of the scan, vs the previous
    posexplode + window + groupBy shape that shuffled every token row.
    Logic in ``fingerprint_stats`` (shared with the scale-stress
    harness)."""
    ensure_session_determinism(spark)
    return fingerprint_stats(load(spark, sf_dir, "documents"))


def fingerprint_stats(d: DataFrame) -> DataFrame:
    """(doc_id, n_distinct_fp, min_fp, max_fp) rolling-hash fingerprint
    stats as one narrow per-row expression.

    The token-value array and the rolling-hash array are each let-bound
    via the singleton-array transform trick (`transform(array(<expr>),
    v -> ...)`) so Catalyst's projection collapse cannot re-inline the
    shared subexpression — the naive nested form re-evaluated the token
    array 4x per window position (~400x slower at sf0.1). A <4-word doc
    yields an empty fps array -> (0, NULL, NULL), matching the oracle's
    empty-list semantics."""
    v_expr = (
        "transform(split(text, ' '), w -> CAST(ascii(substring(w, 1, 1)) * 10000"
        " + ascii(substring(w, -1, 1)) * 100 + length(w) AS BIGINT))"
    )
    fps_expr = (
        "IF(size(v) >= 4, transform(sequence(1, size(v) - 3), i ->"
        " ((element_at(v, i) * 31 + element_at(v, i + 1)) * 31"
        " + element_at(v, i + 2)) * 31 + element_at(v, i + 3)),"
        " CAST(array() AS ARRAY<BIGINT>))"
    )
    stats = (
        f"element_at(transform(array({v_expr}), v -> "
        f"element_at(transform(array({fps_expr}), f -> "
        "struct(CAST(size(array_distinct(f)) AS INT) AS n_distinct_fp, "
        "array_min(f) AS min_fp, array_max(f) AS max_fp)), 1)), 1)"
    )
    return d.select("doc_id", F.expr(stats).alias("s")).select("doc_id", "s.*")


@query(
    "q_text_normalize",
    oracle="""
    WITH norm AS (
      SELECT doc_id, text,
             trim(regexp_replace(
               regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
               ' +', ' ', 'g')) AS normalized
      FROM documents
    )
    SELECT doc_id,
           CAST(length(text) AS INT) AS n_chars_raw,
           CAST(length(normalized) AS INT) AS n_chars_norm,
           CAST(CASE WHEN normalized <> text THEN 1 ELSE 0 END AS INT)
             AS changed,
           md5(normalized) AS norm_hash
    FROM norm
    """,
)
def q_text_normalize(spark, sf_dir: str):
    """Text NORMALIZATION — the canonicalization pass every dedup tier
    assumes: lowercase, strip non-alphanumerics, collapse runs of
    spaces, trim. Emits before/after lengths, a changed flag, and the
    md5 of the canonical form (the key exact dedup groups on — pairing
    with q_dedup_exact makes dedup robust to case/punctuation noise).
    The fixture corpus is already canonical (changed = 0 — the
    H-check exercises the expressions as near-identities); punctuated
    synthetic rows are driven in unit tests, same policy as
    q_pii_scrub's patterns.

    Pure single-pass narrow expressions: no shuffle, no UDF — at
    100 TB this pipelines into the scan like q_pii_scrub."""
    ensure_session_determinism(spark)
    d = load(spark, sf_dir, "documents")
    normalized = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9 ]", ""),
            " +",
            " ",
        )
    )
    return d.select(
        "doc_id",
        F.length("text").cast("int").alias("n_chars_raw"),
        F.length(normalized).cast("int").alias("n_chars_norm"),
        (normalized != F.col("text")).cast("int").alias("changed"),
        F.md5(normalized.cast("binary")).alias("norm_hash"),
    )


@query(
    "q_text_inverted_index",
    oracle="""
    WITH toks AS (
      SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS term
      FROM documents
    ),
    post AS (
      SELECT term,
             CAST(count(*) AS BIGINT) AS df,
             array_to_string(list(doc_id ORDER BY doc_id), ',') AS postings
      FROM toks GROUP BY term
    )
    SELECT term, df, postings FROM post
    WHERE df BETWEEN 3 AND 50 AND length(term) >= 3
    """,
)
def q_text_inverted_index(spark, sf_dir: str):
    """INVERTED INDEX construction — term -> (document frequency,
    sorted posting list), the core build step of any corpus search /
    decontamination index. Postings are emitted as a comma-joined
    STRING (array_sort + array_join) so the output stays
    driver-hashable (the q_agg_collect/q_array_funcs lesson: no
    ARRAY columns in H-checked output).

    Shape: explode -> distinct (map-side combined) -> one groupBy(term)
    with collect_set. Per-term state is bounded by the df cap; at
    100 TB the df BETWEEN filter is exactly why real indexes drop
    stop-words — unbounded posting lists (df > cap) never materialize
    past the aggregate because HAVING prunes them before the sink, and
    hot terms would instead go to a postings-sharding tier (documented,
    not needed at fixture scale)."""
    ensure_session_determinism(spark)
    d = load(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.explode(F.split("text", " ")).alias("term")
    ).distinct()
    return (
        toks.groupBy("term")
        .agg(
            F.count(F.lit(1)).alias("df"),
            F.array_join(
                F.array_sort(F.collect_set("doc_id")), ","
            ).alias("postings"),
        )
        .where(
            (F.col("df").between(3, 50)) & (F.length("term") >= 3)
        )
        .select("term", "df", "postings")
    )


# Vocabulary prune for co-occurrence: only terms appearing in >= DF_MIN
# docs pair up. This is the scale lever — pair count is quadratic in
# per-doc vocabulary, and df-pruning (like LSH's shingle pruning)
# bounds it before the self-join.
_CO_DF_MIN = 10
_CO_PAIR_MIN = 5


@query(
    "q_text_cooccur",
    oracle=f"""
    WITH toks AS (
      SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS term
      FROM documents
      WHERE length(text) > 0
    ),
    vocab AS (
      SELECT term, count(*) AS df FROM toks
      WHERE length(term) >= 3
      GROUP BY term HAVING count(*) >= {_CO_DF_MIN}
    ),
    vt AS (
      SELECT t.doc_id, t.term, v.df FROM toks t JOIN vocab v USING (term)
    ),
    pairs AS (
      SELECT a.term AS term_a, b.term AS term_b,
             CAST(count(*) AS BIGINT) AS n_ab,
             any_value(a.df) AS df_a, any_value(b.df) AS df_b
      FROM vt a JOIN vt b
        ON a.doc_id = b.doc_id AND a.term < b.term
      GROUP BY a.term, b.term
    ),
    n AS (SELECT count(*) AS n_docs FROM documents)
    SELECT term_a, term_b, n_ab,
           round(CAST(n_ab AS DOUBLE) * n_docs / (df_a * df_b), 6)
             AS lift
    FROM pairs, n WHERE n_ab >= {_CO_PAIR_MIN}
    """,
)
def q_text_cooccur(spark, sf_dir: str):
    """Term CO-OCCURRENCE with lift scoring — the association-mining
    primitive behind phrase detection and topic features: for term
    pairs sharing a document, lift = P(a,b) / (P(a)P(b)) =
    n_ab * N / (df_a * df_b). Lift (a single double division of exact
    integers) is used instead of PMI because log() is libm-dependent
    and could differ in the last ulp between engines; the division of
    identical int64s is bit-identical.

    Shape: explode -> distinct, df-filtered vocabulary (broadcast-sized
    after the _CO_DF_MIN prune), vocabulary-pruned self-join keyed on
    doc_id, one pair aggregate. The df prune bounds the quadratic
    blowup exactly like the LSH shingle prune in llm/dedup.py — at
    100 TB the vocabulary table is the small side of a broadcast join
    and the pair aggregate is the only wide shuffle."""
    ensure_session_determinism(spark)
    scope(f"q_text_cooccur:{sf_dir}")
    d = load(spark, sf_dir, "documents")
    # three consumers (vocab, both self-join sides) — persist instead
    # of re-running the explode+distinct per plan branch
    toks = persist_scoped(
        d.where(F.length("text") > 0)
        .select("doc_id", F.explode(F.split("text", " ")).alias("term"))
        .distinct()
    )
    vocab = (
        toks.where(F.length("term") >= 3)
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
        .where(F.col("df") >= _CO_DF_MIN)
    )
    vt = toks.join(F.broadcast(vocab), "term")
    a = vt.select(
        "doc_id", F.col("term").alias("term_a"), F.col("df").alias("df_a")
    )
    b = vt.select(
        "doc_id", F.col("term").alias("term_b"), F.col("df").alias("df_b")
    )
    pairs = (
        a.join(b, "doc_id")
        .where(F.col("term_a") < F.col("term_b"))
        .groupBy("term_a", "term_b")
        .agg(
            F.count(F.lit(1)).alias("n_ab"),
            F.any_value("df_a").alias("df_a"),
            F.any_value("df_b").alias("df_b"),
        )
        .where(F.col("n_ab") >= _CO_PAIR_MIN)
    )
    n_docs = d.agg(F.count(F.lit(1)).alias("n_docs"))
    return pairs.crossJoin(F.broadcast(n_docs)).select(
        "term_a",
        "term_b",
        "n_ab",
        F.round(
            F.col("n_ab").cast("double")
            * F.col("n_docs")
            / (F.col("df_a") * F.col("df_b")),
            6,
        ).alias("lift"),
    )


@query(
    "q_text_bigram_lm",
    oracle="""
    WITH words AS (
      SELECT doc_id, string_split(text, ' ') AS w FROM documents
      WHERE length(text) > 0
    ),
    bigrams AS (
      SELECT w[i] AS w1, w[i+1] AS w2
      FROM words, unnest(generate_series(1, len(w) - 1)) AS t(i)
    ),
    pair_counts AS (
      SELECT w1, w2, count(*) AS n FROM bigrams GROUP BY w1, w2
    ),
    ctx AS (
      SELECT w1, sum(n) AS ctx_n, count(*) AS fanout
      FROM pair_counts GROUP BY w1
    )
    SELECT p.w1, p.w2, CAST(p.n AS BIGINT) AS n,
           round(CAST(p.n AS DOUBLE) / c.ctx_n, 6) AS p_mle,
           round(CAST(p.n + 1 AS DOUBLE) / (c.ctx_n + c.fanout), 6)
             AS p_smooth
    FROM pair_counts p JOIN ctx c USING (w1)
    WHERE p.n >= 5
    """,
)
def q_text_bigram_lm(spark, sf_dir: str):
    """BIGRAM LANGUAGE-MODEL TABLE — the count-based LM behind
    perplexity-style quality filters: P(w2|w1) as maximum-likelihood
    and add-one-smoothed estimates (smoothing over the OBSERVED
    fan-out, the standard practical variant) from exact corpus counts.
    All probabilities are single divisions of exact int64 counts —
    hash-stable; no log, so no libm drift (downstream perplexity
    sums logs locally where cross-engine equality is not needed).

    Shape: in-doc adjacent-pair explode (posexplode + self-align, no
    join), one pair aggregate, one context aggregate broadcast back.
    The n >= 5 floor caps the table the way real LM tables prune
    hapax bigrams; at 100 TB the pair aggregate is the one wide
    shuffle, map-side combined."""
    ensure_session_determinism(spark)
    d = load(spark, sf_dir, "documents").where(F.length("text") > 0)
    words = d.select(F.split("text", " ").alias("w"))
    bigrams = words.select(
        F.posexplode(F.slice("w", 1, F.size("w") - 1)).alias("i", "w1"),
        "w",
    ).select("w1", F.expr("w[i + 1]").alias("w2"))
    pair_counts = bigrams.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).alias("n")
    )
    ctx = pair_counts.groupBy("w1").agg(
        F.sum("n").alias("ctx_n"), F.count(F.lit(1)).alias("fanout")
    )
    return (
        pair_counts.join(F.broadcast(ctx), "w1")
        .where(F.col("n") >= 5)
        .select(
            "w1",
            "w2",
            "n",
            F.round(F.col("n").cast("double") / F.col("ctx_n"), 6).alias(
                "p_mle"
            ),
            F.round(
                (F.col("n") + 1).cast("double")
                / (F.col("ctx_n") + F.col("fanout")),
                6,
            ).alias("p_smooth"),
        )
    )


# Portable hex→int: both engines spell nibble(c) = ascii digit/letter
# math, so feature buckets agree without any engine-native hash.
_FH_BUCKETS = 256


def _nibble_sql(c: str) -> str:
    return (
        f"(CASE WHEN ascii({c}) BETWEEN 48 AND 57 THEN ascii({c}) - 48"
        f" ELSE ascii({c}) - 87 END)"
    )


def _fh_oracle() -> str:
    n1 = _nibble_sql("substring(h, 1, 1)")
    n2 = _nibble_sql("substring(h, 2, 1)")
    n3 = _nibble_sql("substring(h, 3, 1)")
    return f"""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents
    ),
    hashed AS (
      SELECT doc_id, md5(t) AS h FROM tok WHERE t <> ''
    ),
    feat AS (
      SELECT doc_id,
             CAST(({n1} * 256 + {n2} * 16 + {n3}) % {_FH_BUCKETS} AS INT)
               AS feature_idx,
             CASE WHEN {_nibble_sql("substring(h, 4, 1)")} < 8
                  THEN 1 ELSE -1 END AS sgn
      FROM hashed
    )
    SELECT doc_id, feature_idx,
           CAST(sum(sgn) AS BIGINT) AS val
    FROM feat GROUP BY doc_id, feature_idx
    """


@query("q_feature_hash", oracle=_fh_oracle())
def q_feature_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HASHING-TRICK FEATURIZATION (Weinberger et al. '09 — the
    vocabulary-free sparse featurizer behind Vowpal Wabbit / sklearn's
    HashingVectorizer): every token hashes straight to one of
    {_FH_BUCKETS} feature buckets, with a second hash bit supplying the
    ±1 sign that keeps collision noise zero-mean. No vocabulary build,
    no dictionary broadcast, no OOV problem — the property that matters
    at 100 TB, where a vocab pass is a full extra corpus scan and the
    vocab itself may not fit a broadcast.

    Output is the sparse COO triple (doc_id, feature_idx, signed
    count). Buckets come from md5 — available in BOTH engines — parsed
    as 3 leading nibbles (Spark: conv(hex,16,10); oracle: explicit
    ascii nibble math), so the H-check pins the exact feature layout.
    Shape: split → explode → one (doc, bucket) hash aggregate; one
    shuffle, map-side combined, no HOFs."""
    ensure_session_determinism(spark)
    d = load(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id", F.explode(F.split("text", " ")).alias("t")
    ).where(F.col("t") != "")
    h = F.md5(F.col("t").cast("binary"))
    feature_idx = (
        F.conv(F.substring(h, 1, 3), 16, 10).cast("int") % _FH_BUCKETS
    )
    sgn = F.when(
        F.conv(F.substring(h, 4, 1), 16, 10).cast("int") < 8, 1
    ).otherwise(-1)
    return (
        tok.select("doc_id", feature_idx.alias("feature_idx"), sgn.alias("sgn"))
        .groupBy("doc_id", "feature_idx")
        .agg(F.sum("sgn").cast("bigint").alias("val"))
    )


_BP_DF = 3  # a sentence appearing in >= 3 docs is boilerplate


@query(
    "q_text_boilerplate",
    oracle=f"""
    WITH sent AS (
      SELECT DISTINCT doc_id, unnest(string_split(text, '. ')) AS s
      FROM documents
    ),
    clean AS (SELECT doc_id, s FROM sent WHERE s <> ''),
    sdf AS (
      SELECT s, count(DISTINCT doc_id) AS df FROM clean GROUP BY s
    )
    SELECT c.doc_id,
           CAST(count(*) AS BIGINT) AS n_sentences,
           CAST(sum(CASE WHEN sdf.df >= {_BP_DF} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_boilerplate,
           round(CAST(sum(CASE WHEN sdf.df >= {_BP_DF} THEN 1 ELSE 0 END)
                      AS DOUBLE) / count(*), 6) AS boilerplate_ratio
    FROM clean c JOIN sdf ON c.s = sdf.s
    GROUP BY c.doc_id
    """,
)
def q_text_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BOILERPLATE DETECTION by corpus sentence frequency — the C4 /
    RefinedWeb curation step that strips nav bars, cookie banners and
    license footers: a sentence occurring in ≥ {_BP_DF} distinct
    documents is boilerplate, and each document reports its sentence
    count, boilerplate count and ratio (the gate a quality filter
    thresholds on).

    Shape: sentence-split → DISTINCT (doc, sentence) → sentence
    document-frequency aggregate → join back → per-doc aggregate —
    exactly tf-idf's two-level shape, one shuffle per level, all
    map-side combined. At 100 TB the df table is the only wide state
    and it shrinks with deduplication; the join back is a
    hash-partitioned equi-join on the sentence key."""
    ensure_session_determinism(spark)
    scope(f"q_text_boilerplate:{sf_dir}")
    d = load(spark, sf_dir, "documents")
    sent = (
        d.select(
            "doc_id", F.explode(F.split("text", "\\. ")).alias("s")
        )
        .where(F.col("s") != "")
        .distinct()
    )
    sent = persist_scoped(sent)  # two consumers: df build + join back
    sdf = sent.groupBy("s").agg(F.countDistinct("doc_id").alias("df"))
    bp = F.when(F.col("df") >= _BP_DF, 1).otherwise(0)
    return (
        sent.join(sdf, "s")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_sentences"),
            F.sum(bp).cast("bigint").alias("n_boilerplate"),
            F.round(
                F.sum(bp).cast("double") / F.count(F.lit(1)), 6
            ).alias("boilerplate_ratio"),
        )
    )


# BM25 constants — Robertson/Sparck-Jones defaults; 3-term query over
# the corpus vocabulary.
_BM25_K1 = 1.2
_BM25_B = 0.75
_BM25_TERMS = ("hash", "join", "vector")
_BM25_TOPK = 20


def _bm25_oracle() -> str:
    terms = ", ".join(f"'{t}'" for t in _BM25_TERMS)
    return f"""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents
    ),
    lens AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id),
    stats AS (
      SELECT count(*) AS n, CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl
      FROM lens
    ),
    tf AS (
      SELECT doc_id, t, count(*) AS tf FROM tok
      WHERE t IN ({terms}) GROUP BY doc_id, t
    ),
    df AS (SELECT t, count(DISTINCT doc_id) AS df FROM tf GROUP BY t),
    scored AS (
      SELECT tf.doc_id,
             sum(ln(1 + (stats.n - df.df + 0.5) / (df.df + 0.5))
                 * tf.tf * ({_BM25_K1} + 1)
                 / (tf.tf + {_BM25_K1} * (1 - {_BM25_B}
                    + {_BM25_B} * lens.dl / stats.avgdl))) AS score_raw
      FROM tf
      JOIN df ON tf.t = df.t
      JOIN lens ON tf.doc_id = lens.doc_id
      CROSS JOIN stats
      GROUP BY tf.doc_id
    ),
    ranked AS (
      SELECT doc_id, score_raw,
             row_number() OVER (ORDER BY score_raw DESC, doc_id ASC)
               AS rank
      FROM scored
    )
    SELECT doc_id, round(score_raw, 6) AS score,
           CAST(rank AS BIGINT) AS rank
    FROM ranked WHERE rank <= {_BM25_TOPK}
    """


@query("q_bm25", oracle=_bm25_oracle())
def q_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 RANKED RETRIEVAL — the canonical lexical scorer (Robertson
    et al., TREC-3): idf · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl))
    summed over the query terms, top-20 by (score, doc_id). tf-idf
    (q_text_tfidf) weights terms; BM25 adds tf saturation (k1) and
    document-length normalization (b) — the form search engines
    actually ship, and the lexical half of hybrid (BM25 + embedding)
    retrieval next to q_sim_cosine_topk.

    Shape: NO token explode — the query is a fixed literal term list,
    so per-doc length and per-term tf are per-row array expressions
    (`size(tk)` / `size(filter(tk, t = term))`, token array let-bound
    once via the singleton-array transform trick). The only shuffle is
    the 1-row (N, avgdl, df...) corpus-stats aggregate, broadcast back;
    scoring is per-row arithmetic and the top-20 executes as
    TakeOrderedAndProject (per-partition top-k, driver merge — the
    100 TB path; the previous explode shape shuffled every token row
    twice). Ranking compares RAW doubles (identical int/double inputs
    ⇒ identical engine arithmetic) with doc_id tiebreak; only the
    emitted score is rounded. A doc lacking term i contributes +0.0 for
    it (IEEE-identical to the oracle's absent-row sum)."""
    ensure_session_determinism(spark)
    d = load(spark, sf_dir, "documents")
    tfs = ", ".join(
        f"CAST(size(filter(tk, t -> t = '{t}')) AS BIGINT) AS tf{i}"
        for i, t in enumerate(_BM25_TERMS)
    )
    row_expr = (
        "element_at(transform(array(split(text, ' ')), tk -> struct("
        f"CAST(size(tk) AS BIGINT) AS dl, {tfs})), 1)"
    )
    rows = d.selectExpr("doc_id", f"{row_expr} AS s").selectExpr(
        "doc_id", "s.*"
    )
    stats = rows.groupBy().agg(
        F.expr("COUNT(1)").alias("n"),
        F.expr("CAST(SUM(dl) AS DOUBLE) / COUNT(1)").alias("avgdl"),
        *[
            F.expr(f"SUM(CAST(tf{i} > 0 AS INT))").alias(f"df{i}")
            for i in range(len(_BM25_TERMS))
        ],
    )
    norm = f"{_BM25_K1} * (1 - {_BM25_B} + {_BM25_B} * dl / avgdl)"
    score = " + ".join(
        f"IF(tf{i} > 0, ln(1 + (n - df{i} + 0.5) / (df{i} + 0.5))"
        f" * tf{i} * ({_BM25_K1} + 1) / (tf{i} + {norm}), 0.0D)"
        for i in range(len(_BM25_TERMS))
    )
    matched = rows.where(
        " OR ".join(f"tf{i} > 0" for i in range(len(_BM25_TERMS)))
    )
    scored = matched.crossJoin(F.broadcast(stats)).selectExpr(
        "doc_id", f"{score} AS score_raw"
    )
    top = scored.orderBy(
        F.col("score_raw").desc(), F.col("doc_id").asc()
    ).limit(_BM25_TOPK)
    w = Window.partitionBy(bounded_window_key("doc_id")).orderBy(
        F.col("score_raw").desc(), F.col("doc_id").asc()
    )
    return (
        top.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .selectExpr("doc_id", "round(score_raw, 6) AS score", "rank")
    )


@query(
    "q_lm_doc_score",
    oracle="""
    WITH words AS (
      SELECT doc_id, string_split(text, ' ') AS w FROM documents
      WHERE length(text) > 0
    ),
    bigrams AS (
      SELECT doc_id, w[i] AS w1, w[i+1] AS w2
      FROM words, unnest(generate_series(1, len(w) - 1)) AS t(i)
    ),
    pair_counts AS (
      SELECT w1, w2, count(*) AS n FROM bigrams GROUP BY w1, w2
    ),
    ctx AS (
      SELECT w1, sum(n) AS ctx_n, count(*) AS fanout
      FROM pair_counts GROUP BY w1
    ),
    lm AS (
      SELECT p.w1, p.w2,
             CAST(p.n + 1 AS DOUBLE) / (c.ctx_n + c.fanout) AS p
      FROM pair_counts p JOIN ctx c USING (w1)
    )
    SELECT b.doc_id,
           CAST(count(*) AS BIGINT) AS n_bigrams,
           round(sum(-log2(lm.p)) / count(*), 6) AS bits_per_bigram
    FROM bigrams b JOIN lm ON b.w1 = lm.w1 AND b.w2 = lm.w2
    GROUP BY b.doc_id
    """,
)
def q_lm_doc_score(spark, sf_dir: str):
    """LM PERPLEXITY SCORING — the CCNet / KenLM quality-filter step:
    every document is scored by its average surprisal (bits per bigram)
    under the CORPUS bigram LM with add-one smoothing; fluent,
    in-distribution text scores low, vocabulary soup and boilerplate
    outliers score high, and a curation gate thresholds the score.
    Self-scoring against the corpus LM means no OOV path is needed
    (every bigram is in the table); a held-out LM drops in by swapping
    the pair_counts source.

    Determinism: each probability is ONE division of exact int64
    counts — bit-identical across engines BEFORE the log; the per-doc
    mean of ≤ doc-length logs tolerates addition-order ulp drift well
    inside the 6-dp round. Shape: the LM build is q_text_bigram_lm's
    two aggregates; scoring is one hash join of doc-bigrams against
    the LM on (w1, w2) — co-partitioned with the pair aggregate at
    100 TB — and one per-doc aggregate."""
    ensure_session_determinism(spark)
    scope(f"q_lm_doc_score:{sf_dir}")
    d = load(spark, sf_dir, "documents").where(F.length("text") > 0)
    words = d.select("doc_id", F.split("text", " ").alias("w"))
    bigrams = persist_scoped(
        words.select(
            "doc_id",
            F.posexplode(F.slice("w", 1, F.size("w") - 1)).alias("i", "w1"),
            "w",
        ).select("doc_id", "w1", F.expr("w[i + 1]").alias("w2"))
    )  # two consumers: LM build + scoring join
    pair_counts = bigrams.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).alias("n")
    )
    ctx = pair_counts.groupBy("w1").agg(
        F.sum("n").alias("ctx_n"), F.count(F.lit(1)).alias("fanout")
    )
    lm = pair_counts.join(F.broadcast(ctx), "w1").select(
        "w1",
        "w2",
        (
            (F.col("n") + 1).cast("double")
            / (F.col("ctx_n") + F.col("fanout"))
        ).alias("p"),
    )
    return (
        bigrams.join(lm, ["w1", "w2"])
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
            F.round(
                F.sum(-F.log2("p")) / F.count(F.lit(1)), 6
            ).alias("bits_per_bigram"),
        )
    )


@query(
    "q_text_vocab_growth",
    oracle="""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS term
      FROM documents
    ),
    firsts AS (
      SELECT term, min(doc_id) AS first_doc FROM tok
      WHERE term <> '' GROUP BY term
    ),
    newt AS (
      SELECT first_doc AS doc_id, count(*) AS new_terms
      FROM firsts GROUP BY first_doc
    )
    SELECT d.doc_id,
           CAST(coalesce(n.new_terms, 0) AS BIGINT) AS new_terms,
           CAST(sum(coalesce(n.new_terms, 0)) OVER (
                  ORDER BY d.doc_id ROWS UNBOUNDED PRECEDING)
                AS BIGINT) AS vocab_size
    FROM documents d LEFT JOIN newt n ON d.doc_id = n.doc_id
    """,
)
def q_text_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VOCABULARY GROWTH CURVE (Heaps' law): cumulative distinct-token
    count as the corpus is consumed in doc_id order — the curve that
    sizes tokenizer vocabularies and detects corpus saturation (when
    new_terms/doc flattens, more data adds no lexical coverage).

    Cumulative-distinct rewrites to cumulative-sum-of-first-
    appearances (each term charged to its min(doc_id) — one aggregate,
    no expanding re-dedup), the same linearization as
    q_cumulative_uniques. But the running sum here is over DOC grain
    (billions of rows at corpus scale), so an unpartitioned window
    would serialize: instead the prefix sum is two-pass — range-
    partition by doc_id, local running sums per partition, then a
    broadcast of per-partition totals turns local sums into global
    ones (the q_win_ntile offsets pattern applied to SUM instead of
    COUNT). No stage sees unpartitioned data.

    The range-partitioned block is cached so the totals pass and the
    local-prefix pass agree on partition boundaries."""
    ensure_session_determinism(spark)
    scope(f"q_text_vocab_growth:{sf_dir}")
    d = load(spark, sf_dir, "documents")
    terms = d.select(
        "doc_id", F.explode(F.split("text", " ")).alias("term")
    ).where(F.col("term") != "")
    firsts = terms.groupBy("term").agg(F.min("doc_id").alias("first_doc"))
    newt = firsts.groupBy(F.col("first_doc").alias("doc_id")).agg(
        F.count(F.lit(1)).alias("new_terms")
    )
    per_doc = (
        d.select("doc_id")
        .join(newt, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("new_terms", F.lit(0)).cast("bigint").alias(
                "new_terms"
            ),
        )
    )
    n_parts = spark.sparkContext.defaultParallelism
    part = persist_scoped(
        per_doc.repartitionByRange(n_parts, F.col("doc_id").asc())
        .withColumn("pid", F.spark_partition_id())
    )
    totals = part.groupBy("pid").agg(F.sum("new_terms").alias("psum"))
    w_off = pid_hist_window().rowsBetween(
        Window.unboundedPreceding, Window.currentRow - 1
    )
    offsets = totals.select(
        "pid", F.coalesce(F.sum("psum").over(w_off), F.lit(0)).alias("off")
    )
    w_local = Window.partitionBy("pid").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        part.withColumn("lsum", F.sum("new_terms").over(w_local))
        .join(F.broadcast(offsets), "pid")
        .select(
            "doc_id",
            "new_terms",
            (F.col("off") + F.col("lsum")).cast("bigint").alias("vocab_size"),
        )
    )


@query("q_text_compress_ratio")
def q_text_compress_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COMPRESSION-RATIO quality signal (R-checked): zlib-compressed
    size / raw size per document — the classic cheap redundancy
    detector (C4/RefinedWeb/Gopher all gate on it): boilerplate, keyword
    stuffing and template spam compress far below prose, gibberish
    barely compresses at all. Zlib is not expressible in SQL, so this
    is an honest Arrow pandas_udf (vectorized batches, fixed level 6 —
    deterministic for a given zlib build); the unit test recomputes
    every ratio in-process and asserts bit-equality, and the aggregate
    per (lang, verdict) keeps the driver row set tiny.

    Scale: pure map + one small aggregate — the UDF cost is ~30 MB/s/
    core of zlib, which at 100 TB argues for sampling long docs (first
    64 KB compresses indistinguishably from the whole for gating
    purposes — documented knob, not implemented here)."""
    ensure_session_determinism(spark)
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def zratio(texts: pd.Series) -> pd.Series:
        import zlib

        return texts.map(
            lambda t: round(
                len(zlib.compress(t.encode("utf-8"), 6))
                / max(len(t.encode("utf-8")), 1),
                6,
            )
        )

    d = load(spark, sf_dir, "documents")
    scored = d.select(
        "doc_id", "lang", "n_chars", zratio("text").alias("zlib_ratio")
    )
    verdict = (
        F.when(F.col("zlib_ratio") < 0.3, "template")
        .when(F.col("zlib_ratio") > 0.9, "gibberish")
        .otherwise("prose")
    )
    return scored.select(
        "doc_id", "lang", "zlib_ratio", verdict.alias("verdict")
    )


@query(
    "q_text_lang_confusion",
    oracle=f"""
    WITH scored AS (
      SELECT doc_id, lang,
             {", ".join(f"CAST({_hits_sql(ts)} AS INT) AS score_{lang}"
                        for lang, ts in _MARKERS.items())}
      FROM documents
    ),
    pred AS (
      SELECT doc_id, lang,
             CASE {" ".join(
                 f"WHEN score_{lang} >= greatest("
                 + ", ".join("score_" + o for o in _MARKERS)
                 + f") THEN '{lang}'"
                 for lang in _MARKERS)}
             END AS predicted
      FROM scored
    ),
    cm AS (
      SELECT lang, predicted, count(*) AS n
      FROM pred GROUP BY lang, predicted
    ),
    tot AS (SELECT lang, sum(n) AS lang_n FROM cm GROUP BY lang)
    SELECT cm.lang, cm.predicted, CAST(cm.n AS BIGINT) AS n,
           CAST(CASE WHEN cm.lang = cm.predicted THEN 1 ELSE 0 END
                AS INT) AS agree,
           round(CAST(cm.n AS DOUBLE) / t.lang_n, 6) AS frac_of_lang
    FROM cm JOIN tot t ON cm.lang = t.lang
    """,
)
def q_text_lang_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LABEL-NOISE AUDIT — the confusion matrix between the corpus'
    DECLARED language labels and the classifier's predictions
    (langid_scored): one row per (declared, predicted) cell with its
    count and share of the declared language. This is the dataset-QA
    step a curation pipeline runs before trusting either signal —
    off-diagonal mass localizes to the languages whose labels (or
    classifier) are unreliable, and the per-lang agreement share is
    the label-quality metric that decides re-labeling vs re-training.

    Scale shape: the per-doc scoring projection (codegen'd marker
    counts) collapses via ONE hash-aggregate to ≤ |langs|² cells
    regardless of corpus size, then a |langs|-row broadcast join for
    the shares — audit output is constant-size however big the input.
    """
    ensure_session_determinism(spark)
    pred = langid_scored(load(spark, sf_dir, "documents"))
    cm = pred.groupBy("lang", "predicted").agg(
        F.count(F.lit(1)).alias("n")
    )
    tot = cm.groupBy("lang").agg(F.sum("n").alias("lang_n"))
    return cm.join(F.broadcast(tot), "lang").select(
        "lang",
        "predicted",
        F.col("n").cast("bigint").alias("n"),
        (F.col("lang") == F.col("predicted")).cast("int").alias("agree"),
        F.round(F.col("n").cast("double") / F.col("lang_n"), 6).alias(
            "frac_of_lang"
        ),
    )


@query(
    "q_text_hapax",
    oracle="""
    WITH tok AS (
      SELECT source, unnest(string_split(text, ' ')) AS t FROM documents
    ),
    tc AS (SELECT t, count(*) AS n FROM tok GROUP BY t)
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(count(DISTINCT tok.t) AS BIGINT) AS n_terms,
           CAST(count(*) FILTER (tc.n = 1) AS BIGINT) AS n_hapax_tokens,
           round(CAST(count(*) FILTER (tc.n = 1) AS DOUBLE) / count(*), 6)
             AS hapax_rate
    FROM tok JOIN tc ON tok.t = tc.t
    GROUP BY source
    """,
)
def q_text_hapax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HAPAX RATE — per source, the share of its tokens that are
    corpus-level hapax legomena (terms occurring exactly once in the
    whole corpus). High hapax rate signals genuinely diverse text (or
    noise/OCR garbage — paired with q_text_quality it separates the
    two); near-zero signals templated/repetitive feeds. The classic
    lexical-richness complement to the Heaps-law curve
    (q_text_vocab_growth).

    Shape: one token explode, one corpus term-count aggregate
    (map-side combined), one join back on term, one source rollup —
    the same explode+agg skeleton as tf-idf, nothing quadratic."""
    ensure_session_determinism(spark)
    scope(f"q_text_hapax:{sf_dir}")
    d = load(spark, sf_dir, "documents")
    tok = persist_scoped(
        d.select("source", F.explode(F.split("text", " ")).alias("t"))
    )  # consumers: counts + join side
    tc = tok.groupBy("t").agg(F.count(F.lit(1)).alias("n"))
    hapax = (F.col("n") == 1).cast("int")
    return (
        tok.join(tc, "t")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
            F.countDistinct("t").cast("bigint").alias("n_terms"),
            F.sum(hapax).cast("bigint").alias("n_hapax_tokens"),
            F.round(
                F.sum(hapax).cast("double") / F.count(F.lit(1)), 6
            ).alias("hapax_rate"),
        )
    )
