"""Tile-pyramid grid generation + path codecs (reference ops A1–A8).

The reference walks a Web-Mercator tile pyramid restricted to a padded
extent window (P:71-96 = src/Program.cs:71-96) and converts each cell to
a hex source path (P:99-100) and a decimal object key (P:113). Here the
same universe is a *generated* DataFrame — a pure compute source with no
storage scan. The extent→range derivation (P:74-81) runs driver-side
(plain math over 7 levels) and is baked into ``sequence()`` endpoints:
the moral equivalent of static partition pruning — e.g. level 11 scans
25,584 candidates instead of the global 4.2 M (BASELINE.md).

Scale posture: the per-level bounds rows are tiny; the fan-out happens
inside two ``explode(sequence(...))`` steps with a repartition between
them, so a deep pyramid (billions of cells at level 20+) spreads across
the cluster instead of materializing inside one task.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tile_etl_spark.registry import query
from tile_etl_spark.session import ensure_session_determinism

# Constants from the reference (P:24-33). One fixed Web-Mercator delta —
# SURVEY §1.1 notes the two reference programs disagree in the 6th
# decimal; we standardize on the GCS variant's value (P:32).
WEB_MERCATOR_DELTA = 20037508.34278
LEVELS = (5, 11)  # P:24-25, inclusive
EXTENT = (-14078565.0, 3604577.0, -11137983.0, 6384021.0)  # P:26-29
PADDING = (6, 6)  # P:30-31 (x, y)
MAP_NAME = "Lite"  # P:16


def level_bounds(
    level: int,
    extent: tuple[float, float, float, float] = EXTENT,
    delta: float = WEB_MERCATOR_DELTA,
    padding: tuple[int, int] = PADDING,
) -> tuple[int, int, int, int]:
    """Inclusive (start_row, end_row, start_col, end_col) for one level.

    Mirrors P:74-81 exactly: truncating division of the extent into tile
    indices, ±padding, and ``+1`` on the upper bounds (ranges inclusive).
    """
    minx, miny, maxx, maxy = extent
    pad_x, pad_y = padding
    tile_size = delta * math.pow(2, 1 - level)
    start_row = int(math.trunc((delta - maxy) / tile_size)) - pad_y
    end_row = int(math.trunc((delta - miny) / tile_size)) + 1 + pad_y
    start_col = int(math.trunc((minx + delta) / tile_size)) - pad_x
    end_col = int(math.trunc((maxx + delta) / tile_size)) + 1 + pad_x
    return start_row, end_row, start_col, end_col


def grid5_bounds_values_sql() -> str:
    """DuckDB VALUES clause of the level-5 bounds DERIVED from
    level_bounds() — oracles that hardcoded (4, 20, -2, 14) would keep
    agreeing with a stale tile set if the grid definition changed,
    masking exactly the drift the artifact recipe markers catch."""
    r0, r1, c0, c1 = level_bounds(5)
    return f"(VALUES (5, {r0}, {r1}, {c0}, {c1}))"


def grid_counts() -> dict[int, int]:
    """Per-level candidate-cell counts (golden values in BASELINE.md)."""
    out = {}
    for lvl in range(LEVELS[0], LEVELS[1] + 1):
        r0, r1, c0, c1 = level_bounds(lvl)
        out[lvl] = (r1 - r0 + 1) * (c1 - c0 + 1)
    return out


def _bounds_df(
    spark: SparkSession,
    levels: tuple[int, int] = LEVELS,
    extent: tuple[float, float, float, float] = EXTENT,
    delta: float = WEB_MERCATOR_DELTA,
    padding: tuple[int, int] = PADDING,
) -> DataFrame:
    rows = [
        (lvl, *level_bounds(lvl, extent=extent, delta=delta, padding=padding))
        for lvl in range(levels[0], levels[1] + 1)
    ]
    return spark.createDataFrame(
        rows, "level INT, r0 INT, r1 INT, c0 INT, c1 INT"
    )


def tile_grid(
    spark: SparkSession,
    levels: tuple[int, int] = LEVELS,
    extent: tuple[float, float, float, float] = EXTENT,
    delta: float = WEB_MERCATOR_DELTA,
    padding: tuple[int, int] = PADDING,
    cells_per_task: int = 50_000,
) -> DataFrame:
    """A1–A4: every candidate (level, row, col) for the reference extent.

    Two explodes = a lazy per-level cross product (P:93-96). The
    repartition between them distributes the column fan-out: for deep
    pyramids each (level, row) stripe generates its columns in its own
    task, so no single task ever holds a full level.

    Defaults are the GCS program's constants (P:24-32); pass the S3
    variant's (S:23-34) — or any deployment's — to retarget.

    The generated frame is memoized per (session, parameters) — it is a
    pure function of its arguments, and every tile qid builds on it, so
    rebuilding the bounds frame + two explodes (~60 ms of eager
    analysis) per call is pure waste (same trick as io.load's memo).
    """
    from tile_etl_spark import cache
    from tile_etl_spark.io import _memo_for

    # Only the DEFAULT-parameter grid (the reference extent, 37,819
    # rows) is persisted — it is the inventory every tile qid builds
    # on, and it is bounded. Parameterized variants (deep stress
    # pyramids, S3 retargets) stay lazy: they can be arbitrarily large.
    default = (
        levels == LEVELS
        and extent == EXTENT
        and delta == WEB_MERCATOR_DELTA
        and padding == PADDING
        and cells_per_task == 50_000
    )
    memo = _memo_for(spark)
    key = ("__tile_grid__", levels, extent, delta, padding, cells_per_task)
    hit = memo.get(key)
    if hit is not None:
        if default:
            return cache.persist_scoped(
                hit, tag="tiles_manifest", key="tile_grid_default"
            )
        return hit
    bounds = _bounds_df(spark, levels, extent, delta, padding)
    rows = bounds.select(
        "level",
        F.explode(F.sequence("r0", "r1")).alias("row"),
        "c0",
        "c1",
    )
    # Fan out the row stripes across the cluster before the second,
    # much wider explode — with an EXPLICIT partition count. A bare
    # repartition(cols) lets AQE coalesce on the tiny pre-explode
    # shuffle size (row stripes are bytes; the amplification happens
    # AFTER, in the column explode) — measured: a levels-5..15 grid
    # (11M cells) collapsed to one task. Numbered repartitions are
    # exempt from AQE coalescing.
    #
    # Width is sized from the POST-explode cell count, which is pure
    # driver-side math over the same bounds (the generator's version of
    # plan-time statistics): ~50k cells per task, capped at 2× cores.
    # The reference extent (37,819 cells) gets 1-2 tasks instead of 64
    # — measured 0.5 s → 0.15 s on the grid alone, with the deep-
    # pyramid case still fanning out to the full width.
    cells = sum(
        (r1 - r0 + 1) * (c1 - c0 + 1)
        for r0, r1, c0, c1 in (
            level_bounds(lvl, extent=extent, delta=delta, padding=padding)
            for lvl in range(levels[0], levels[1] + 1)
        )
    )
    # cells_per_task defaults to generation cost (~50k explode rows per
    # task); callers whose downstream per-cell work is heavier (e.g.
    # tile_manifest's hex-format + md5 + distinct-agg pipeline) pass a
    # smaller target so the SAME repartition fans the pipeline wider —
    # no extra shuffle, just more output splits of the existing one.
    width = max(1, min(
        spark.sparkContext.defaultParallelism * 2,
        cells // cells_per_task + 1,
    ))
    rows = rows.repartition(width, "level", "row")
    grid = rows.select(
        "level", "row", F.explode(F.sequence("c0", "c1")).alias("col")
    )
    if default:
        grid = cache.persist_scoped(
            grid, tag="tiles_manifest", key="tile_grid_default"
        )
    memo[key] = grid
    return grid


def _grid_oracle_cte() -> str:
    """DuckDB twin: the same bounds as literal VALUES + generate_series."""
    values = ", ".join(
        "({}, {}, {}, {}, {})".format(lvl, *level_bounds(lvl))
        for lvl in range(LEVELS[0], LEVELS[1] + 1)
    )
    return f"""
    WITH bounds(level, r0, r1, c0, c1) AS (VALUES {values}),
    rows_ AS (
      SELECT level, unnest(generate_series(r0, r1)) AS "row", c0, c1
      FROM bounds
    ),
    grid AS (
      SELECT CAST(level AS INT) AS level,
             CAST("row" AS INT) AS "row",
             CAST(unnest(generate_series(c0, c1)) AS INT) AS col
      FROM rows_
    )
    """


# The S3 program variant's workload (S:18-34 = reference/EtlToS3.cs):
# Massachusetts extent, deep zooms 17-18, PNG tiles, its own (slightly
# different) Web-Mercator delta — SURVEY §1.1 notes the 6th-decimal
# disagreement between the two programs; per-variant deltas reproduce
# each program's exact ranges.
S3_LEVELS = (17, 18)  # S:23-24
S3_EXTENT = (-8143974.0, 5195979.0, -8125992.0, 5212260.0)  # S:26-29
S3_DELTA = 20037508.342787  # S:34
S3_MAP_NAME = "MBIAddressing/Basemap"  # S:20


# --- hex/decimal codecs (A5 + A8) -------------------------------------

def hex8(col_name: str) -> F.Column:
    """8-digit lowercase two's-complement hex, as C# ``{0:x8}`` renders a
    32-bit int (P:99-100). Spark's ``hex`` of a negative LONG yields 16
    digits; the low 8 are exactly the 32-bit two's complement."""
    return F.substring(F.lpad(F.lower(F.hex(F.col(col_name))), 16, "0"), -8, 8)


_HEX8_DUCK = """right(printf('%016x', CAST({c} AS BIGINT)), 8)"""


def src_path_col(ext: str = "jpg") -> F.Column:
    """A5: ArcGIS exploded-cache relative path ``L{lvl:02d}/R{row:x8}/C{col:x8}.{ext}``
    (P:99-100; '/' separators — the Windows root prefix is deployment
    config, not semantics; ext follows the content type: jpg for the
    GCS program P:117, png for the S3 variant S:21,81)."""
    return F.format_string(
        f"L%02d/R%s/C%s.{ext}", F.col("level"), hex8("row"), hex8("col")
    )


def object_key_col(map_name: str = MAP_NAME) -> F.Column:
    """A8: decimal slash-separated object key ``{map}/{z}/{r}/{c}`` (P:113)."""
    return F.concat_ws(
        "/", F.lit(map_name), F.col("level"), F.col("row"), F.col("col")
    )


def parse_src_path(path_col: F.Column) -> tuple[F.Column, F.Column, F.Column]:
    """Inverse of A5: parse (level, row, col) back out of a source path.

    Hex digits → unsigned value via ``conv``; values ≥ 2^31 fold back to
    negative 32-bit ints (two's complement round trip).
    """
    level = F.regexp_extract(path_col, r"L(\d{2})/", 1).cast("int")

    def signed32(hexs: F.Column) -> F.Column:
        v = F.conv(hexs, 16, 10).cast("bigint")
        return F.when(v >= 2**31, v - 2**32).otherwise(v).cast("int")

    row = signed32(F.regexp_extract(path_col, r"R([0-9a-f]{8})/", 1))
    col = signed32(F.regexp_extract(path_col, r"C([0-9a-f]{8})\.", 1))
    return level, row, col


# --- registered queries ------------------------------------------------

@query(
    "q_tile_grid",
    oracle=_grid_oracle_cte()
    + 'SELECT level, "row", col FROM grid',
)
def q_tile_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1–A4 end-to-end: the full candidate grid, 37,819 rows (§6)."""
    ensure_session_determinism(spark)
    return tile_grid(spark)


@query(
    "q_tile_path",
    oracle=_grid_oracle_cte()
    + f"""
    SELECT level, "row", col,
           printf('L%02d/R%s/C%s.jpg', level,
                  {_HEX8_DUCK.format(c='"row"')},
                  {_HEX8_DUCK.format(c='col')}) AS src_path,
           concat_ws('/', 'Lite', level, "row", col) AS object_key,
           level AS parsed_level, "row" AS parsed_row, col AS parsed_col
    FROM grid
    """,
)
def q_tile_path(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5 + A8 codecs, plus the round-trip parse (oracle asserts identity)."""
    ensure_session_determinism(spark)
    g = tile_grid(spark).withColumn("src_path", src_path_col())
    lvl, row, col = parse_src_path(F.col("src_path"))
    return g.select(
        "level",
        "row",
        "col",
        "src_path",
        object_key_col().alias("object_key"),
        lvl.alias("parsed_level"),
        row.alias("parsed_row"),
        col.alias("parsed_col"),
    )


def _s3_oracle_cte() -> str:
    values = ", ".join(
        "({}, {}, {}, {}, {})".format(
            lvl,
            *level_bounds(lvl, extent=S3_EXTENT, delta=S3_DELTA),
        )
        for lvl in range(S3_LEVELS[0], S3_LEVELS[1] + 1)
    )
    return f"""
    WITH bounds(level, r0, r1, c0, c1) AS (VALUES {values}),
    rows_ AS (
      SELECT level, unnest(generate_series(r0, r1)) AS "row", c0, c1
      FROM bounds
    ),
    grid AS (
      SELECT CAST(level AS INT) AS level,
             CAST("row" AS INT) AS "row",
             CAST(unnest(generate_series(c0, c1)) AS INT) AS col
      FROM rows_
    )
    """


@query(
    "q_tile_s3_variant",
    oracle=_s3_oracle_cte()
    + f"""
    SELECT level, "row", col,
           printf('L%02d/R%s/C%s.png', level,
                  {_HEX8_DUCK.format(c='"row"')},
                  {_HEX8_DUCK.format(c='col')}) AS src_path,
           concat_ws('/', '{S3_MAP_NAME}', level, "row", col) AS object_key
    FROM grid
    """,
)
def q_tile_s3_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's SECOND program (reference/EtlToS3.cs) as data:
    Massachusetts extent, levels 17-18, PNG paths, the S3 variant's own
    Web-Mercator delta (S:34 differs from P:32 in the 6th decimal —
    reproduced per-variant, not papered over), and its slash-namespaced
    map name. Same builders, different constants — the parameterization
    IS the feature."""
    ensure_session_determinism(spark)
    g = tile_grid(
        spark, levels=S3_LEVELS, extent=S3_EXTENT, delta=S3_DELTA
    )
    return g.select(
        "level",
        "row",
        "col",
        src_path_col(ext="png").alias("src_path"),
        object_key_col(map_name=S3_MAP_NAME).alias("object_key"),
    )


# Deterministic pseudo-content, shared between engines: presence and a
# synthetic byte length are pure functions of md5(src_path) — both
# engines agree on md5 of the same UTF-8 string. ~81% of cells present
# (md5 first hex digit not in 0..2), mirroring the existence filter's
# purpose (P:102-106): most cells exist, some don't.
_PRESENT_SQL = "substring(md5(src_path), 1, 1) NOT IN ('0','1','2')"
_TILE_LEN_SQL = (
    "((ascii(substring(md5(src_path), 2, 1)) * 256"
    " + ascii(substring(md5(src_path), 3, 1))) % 1801) + 200"
)


def tile_manifest(spark: SparkSession) -> DataFrame:
    """The 'present tiles' manifest — models the directory listing the
    reference probes per-tile with File.Exists (P:102-106). At 100 TB the
    real thing is a distributed listing (binaryFile source) or an
    inventory table; either way it lands as a DataFrame like this one.
    Memoized per session like tile_grid (pure function of constants)."""
    from tile_etl_spark import cache
    from tile_etl_spark.io import _memo_for

    memo = _memo_for(spark)
    key = ("__tile_manifest__",)
    hit = memo.get(key)
    if hit is not None:
        # Re-pin the persist on every call: an intervening scope switch
        # (another qid's builder) may have evicted it — persist_scoped
        # re-registers the same handle and the data lazily
        # rematerializes, exactly like an inventory table re-cached on
        # first touch.
        return cache.persist_scoped(
            hit, tag="tiles_manifest", key="tile_manifest"
        )
    # Denser fan-out than the bare generator: every manifest consumer
    # (stats, semi-join, sink) pays per-cell hex/md5/agg work, so ~5k
    # cells per task keeps the pipeline parallel (37.8k cells → 8 tasks
    # instead of 1) at zero extra shuffle cost.
    g = tile_grid(spark, cells_per_task=5_000).withColumn(
        "src_path", src_path_col()
    )
    m = g.where(F.expr(_PRESENT_SQL)).withColumn(
        "tile_len", F.expr(_TILE_LEN_SQL).cast("int")
    )
    # Persisted (bounded: one row per PRESENT tile of the reference
    # extent) — the manifest is this workload's inventory table: every
    # consumer (stats, semi-join, sink, e2e) re-reads it, and a real
    # deployment materializes the listing once rather than re-deriving
    # it per query.
    m = cache.persist_scoped(m, tag="tiles_manifest", key="tile_manifest")
    memo[key] = m
    return m


@query(
    "q_tile_manifest_semi",
    oracle=_grid_oracle_cte()
    + f"""
    , paths AS (
      SELECT level, "row", col,
             printf('L%02d/R%s/C%s.jpg', level,
                    {_HEX8_DUCK.format(c='"row"')},
                    {_HEX8_DUCK.format(c='col')}) AS src_path
      FROM grid
    )
    SELECT level, "row", col FROM paths WHERE {_PRESENT_SQL}
    """,
)
def q_tile_manifest_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6 existence filter as a *semi join* of grid against the manifest
    — the scan-less equivalent of `File.Exists` (P:102-106). Catalyst
    broadcasts the smaller side; at scale both sides hash-partition on
    src_path and the join stays shuffle-balanced."""
    ensure_session_determinism(spark)
    g = tile_grid(spark).withColumn("src_path", src_path_col())
    manifest = tile_manifest(spark).select("src_path")
    return g.join(manifest, "src_path", "left_semi").select(
        "level", "row", "col"
    )


@query(
    "q_tile_stats",
    oracle=_grid_oracle_cte()
    + f"""
    , paths AS (
      SELECT level,
             printf('L%02d/R%s/C%s.jpg', level,
                    {_HEX8_DUCK.format(c='"row"')},
                    {_HEX8_DUCK.format(c='col')}) AS src_path
      FROM grid
    ),
    manifest AS (
      SELECT level, src_path, {_TILE_LEN_SQL} AS tile_len
      FROM paths WHERE {_PRESENT_SQL}
    )
    SELECT level,
           CAST(count(*) AS BIGINT) AS tile_count,
           CAST(sum(tile_len) AS BIGINT) AS total_bytes,
           CAST(count(DISTINCT md5(src_path)) AS BIGINT) AS distinct_hashes
    FROM manifest GROUP BY level
    """,
)
def q_tile_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7 + A9 rollup: per-level tile count, byte volume, distinct
    content hashes over the present-tile manifest. Partial aggregation
    (map-side combine) happens automatically in the hash aggregate."""
    ensure_session_determinism(spark)
    m = tile_manifest(spark)
    return m.groupBy("level").agg(
        F.count(F.lit(1)).alias("tile_count"),
        F.sum("tile_len").alias("total_bytes"),
        F.countDistinct(F.md5(F.col("src_path").cast("binary"))).alias(
            "distinct_hashes"
        ),
    )


def _point_cols():
    """Deterministic synthetic Web-Mercator points from order keys —
    Knuth multiplicative hashing into [0,1) with EXACT integer
    arithmetic (no engine-specific hash function), then scaled into
    the reference extent. Identical expression text in both dialects
    => identical doubles => identical trunc results."""
    minx, miny, maxx, maxy = EXTENT
    u1 = "CAST(o_orderkey * 2654435761 % 1000003 AS DOUBLE) / 1000003"
    u2 = "CAST(o_orderkey * 2246822519 % 999983 AS DOUBLE) / 999983"
    x = f"({minx} + ({u1}) * ({maxx} - ({minx})))"
    y = f"({miny} + ({u2}) * ({maxy} - ({miny})))"
    return x, y


@query(
    "q_tile_point_lookup",
    oracle=(
        lambda x, y: f"""
    WITH pts AS (
      SELECT o_orderkey, {x} AS x, {y} AS y FROM orders
    ),
    lv AS (SELECT unnest(generate_series({LEVELS[0]}, {LEVELS[1]})) AS level),
    looked AS (
      SELECT o_orderkey, level,
             CAST(trunc(({WEB_MERCATOR_DELTA} - y)
                  / ({WEB_MERCATOR_DELTA} * power(2, 1 - level))) AS INT)
               AS "row",
             CAST(trunc((x + {WEB_MERCATOR_DELTA})
                  / ({WEB_MERCATOR_DELTA} * power(2, 1 - level))) AS INT)
               AS col
      FROM pts, lv
    )
    SELECT CAST(level AS INT) AS level, "row", col,
           CAST(count(*) AS BIGINT) AS n_points
    FROM looked GROUP BY 1, 2, 3
    """
    )(*_point_cols()),
)
def q_tile_point_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """POINT -> TILE-KEY lookup — the inverse of the grid walk and the
    operation every map client / spatial-partitioning step performs:
    for each point, the containing tile (level, row, col) at every
    pyramid level, aggregated to per-tile point counts (the density
    surface a tile-render scheduler prioritizes by).

    Same trunc math as the reference's extent derivation (P:74-81),
    per point instead of per extent corner. Pure narrow expressions +
    one aggregate: at 100 TB this is scan -> explode(7 levels) ->
    map-side-combined count keyed (level,row,col) — the natural
    spatial-bucketing shuffle, skew-bounded because hot tiles cap at
    one key each."""
    ensure_session_determinism(spark)
    from tile_etl_spark.io import load

    x, y = _point_cols()
    o = load(spark, sf_dir, "orders")
    pts = o.select(
        "o_orderkey", F.expr(x).alias("x"), F.expr(y).alias("y")
    )
    lv = F.explode(
        F.sequence(F.lit(LEVELS[0]), F.lit(LEVELS[1]))
    ).alias("level")
    ts = F.lit(WEB_MERCATOR_DELTA) * F.pow(2.0, 1 - F.col("level"))
    return (
        pts.select("o_orderkey", "x", "y", lv)
        .select(
            "level",
            ((F.lit(WEB_MERCATOR_DELTA) - F.col("y")) / ts)
            .cast("int")
            .alias("row"),
            ((F.col("x") + F.lit(WEB_MERCATOR_DELTA)) / ts)
            .cast("int")
            .alias("col"),
        )
        .groupBy("level", "row", "col")
        .agg(F.count(F.lit(1)).alias("n_points"))
    )


@query(
    "q_tile_pyramid",
    oracle=_grid_oracle_cte()
    + """
    SELECT CAST(level - 1 AS INT) AS level,
           CAST("row" // 2 AS INT) AS row,
           CAST(col // 2 AS INT) AS col,
           CAST(count(*) AS BIGINT) AS n_children
    FROM grid WHERE level > 5
    GROUP BY 1, 2, 3
    """,
)
def q_tile_pyramid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PYRAMID ROLLUP — one quadtree step: every tile at level L > 5
    aggregates to its parent (L-1, row÷2, col÷2), counting children.
    This is the primitive that builds overview zoom levels (density
    maps, heatmap downsampling, raster overviews): apply it per level
    from the deepest up and any per-tile statistic rolls to every zoom.
    Because the extent window is padded per level (P:30-31, ±6 tiles at
    EVERY level rather than inherited), edge parents legitimately hold
    fewer than 4 children — the count exposes exactly that coverage
    structure, which the oracle recomputes from the same bounds.

    Shape: pure integer projection (div 2) + one map-side-combined hash
    aggregate keyed (level, row÷2, col÷2) — child tiles of one parent
    are CONTIGUOUS in the grid generator's output, so partial
    aggregation collapses nearly all rows before the shuffle. At 100 TB
    (a deep pyramid with per-tile stats) the rollup is one shuffle per
    zoom step over already-parent-grouped partials."""
    ensure_session_determinism(spark)
    g = tile_grid(spark)
    return (
        g.where(F.col("level") > 5)
        .select(
            (F.col("level") - 1).cast("int").alias("level"),
            # floor division, matching DuckDB's `//` on (potentially)
            # negative padded indices — a plain cast truncates toward 0
            F.floor(F.col("row") / 2).cast("int").alias("row"),
            F.floor(F.col("col") / 2).cast("int").alias("col"),
        )
        .groupBy("level", "row", "col")
        .agg(F.count(F.lit(1)).alias("n_children"))
    )


def _morton_sql(row: str, col: str, bits: int = 12) -> str:
    """SQL for the Morton (Z-order) interleave of two non-negative
    integer columns — identical expression text in both engines:
    bit i of row → bit 2i, bit i of col → bit 2i+1."""
    terms = []
    for i in range(bits):
        terms.append(
            f"(((CAST({row} AS BIGINT) >> {i}) & 1) << {2 * i})"
        )
        terms.append(
            f"(((CAST({col} AS BIGINT) >> {i}) & 1) << {2 * i + 1})"
        )
    return " + ".join(terms)


@query(
    "q_tile_zorder",
    oracle=_grid_oracle_cte()
    + f"""
    SELECT level, "row", col,
           CAST({_morton_sql('("row" + 16)', '(col + 16)')} AS BIGINT)
             AS morton,
           CAST(row_number() OVER (PARTITION BY level
                ORDER BY {_morton_sql('("row" + 16)', '(col + 16)')} ASC,
                         "row", col)
                AS BIGINT) AS zrank
    FROM grid WHERE level <= 8
    """,
)
def q_tile_zorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-ORDER (Morton) CLUSTERING KEY per tile — the multi-dimensional
    locality layout behind Delta/Iceberg Z-ORDER and every spatial
    lake: interleaving row/col bits makes 1-D key ranges map to 2-D
    rectangles, so a bounding-box query touches O(few) contiguous key
    runs (= parquet row groups) instead of one file per grid row.
    Writing tiles sorted by (level, morton) — sortWithinPartitions on
    this key — is precisely what turns the reference's 37k-PUT object
    listing into range-scannable storage at a 100 TB pyramid.

    The interleave is a fixed chain of shift/mask/add terms (levels ≤ 8
    keep indices < 2^12, so 12 bit-pairs cover the domain), spelled
    with the SAME expression text in both engines — pure int64, zero
    float risk; zrank pins the within-level Z traversal order with a
    (row, col) tiebreak (unique pairs make it total)."""
    ensure_session_determinism(spark)
    g = tile_grid(spark).where(F.col("level") <= 8)
    # +16 keeps every padded index non-negative (level 5 pads to
    # col -2) so the bit interleave is over true unsigned coordinates
    morton = F.expr(_morton_sql("(row + 16)", "(col + 16)")).cast("bigint")
    w = Window.partitionBy("level").orderBy(
        F.col("morton").asc(), F.col("row").asc(), F.col("col").asc()
    )
    return (
        g.select("level", "row", "col", morton.alias("morton"))
        .withColumn("zrank", F.row_number().over(w).cast("bigint"))
    )


@query(
    "q_tile_neighbors",
    oracle=_grid_oracle_cte()
    + f"""
    , paths AS (
      SELECT level, "row", col,
             printf('L%02d/R%s/C%s.jpg', level,
                    {_HEX8_DUCK.format(c='"row"')},
                    {_HEX8_DUCK.format(c='col')}) AS src_path
      FROM grid WHERE level <= 7
    ),
    present AS (
      SELECT level, "row", col FROM paths WHERE {_PRESENT_SQL}
    ),
    offsets(dr, dc) AS (VALUES (-1,-1), (-1,0), (-1,1), (0,-1),
                               (0,1), (1,-1), (1,0), (1,1)),
    probes AS (
      SELECT p.level, p."row", p.col,
             p."row" + o.dr AS nr, p.col + o.dc AS nc
      FROM present p CROSS JOIN offsets o
    )
    SELECT pr.level, pr."row" AS row, pr.col,
           CAST(count(n."row") AS INT) AS n_neighbors,
           CAST(CASE WHEN count(n."row") = 8 THEN 1 ELSE 0 END AS INT)
             AS interior
    FROM probes pr
    LEFT JOIN present n
      ON pr.level = n.level AND pr.nr = n."row" AND pr.nc = n.col
    GROUP BY pr.level, pr."row", pr.col
    """,
)
def q_tile_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPATIAL NEIGHBORHOOD JOIN: for every present tile, how many of
    its 8 grid neighbors are also present — the morphology primitive
    (erosion/interior detection, coverage-hole finding, edge-of-data
    masking) that raster pipelines run before smoothing or mosaic
    blending. ``interior`` = fully surrounded; the complement is the
    coverage boundary the reference's extent padding exists to protect.

    Shape: each present tile fans out to its 8 neighbor keys (a literal
    8-row offsets dimension — generated, broadcast), then ONE
    hash-partitioned equi-join back against the same present set on the
    composite (level, row, col) key, then a per-tile count. This is the
    canonical grid-adjacency rewrite: geometry becomes key arithmetic,
    the join is exact equi (no theta/band residual), and at a 100 TB
    pyramid both sides hash on the same key so the join co-partitions.
    Levels ≤ 7 keep the qid's cell count driver-friendly; the shape is
    level-count-invariant."""
    ensure_session_determinism(spark)
    present = (
        tile_grid(spark)
        .where(F.col("level") <= 7)
        .withColumn("src_path", src_path_col())
        .where(F.expr(_PRESENT_SQL))
        .select("level", "row", "col")
    )
    offsets = present.sparkSession.createDataFrame(
        [(dr, dc) for dr in (-1, 0, 1) for dc in (-1, 0, 1)
         if (dr, dc) != (0, 0)],
        "dr INT, dc INT",
    )
    probes = present.crossJoin(F.broadcast(offsets)).select(
        "level",
        "row",
        "col",
        (F.col("row") + F.col("dr")).alias("nr"),
        (F.col("col") + F.col("dc")).alias("nc"),
    )
    n = present.select(
        F.col("level").alias("nl"),
        F.col("row").alias("nrow"),
        F.col("col").alias("ncol"),
    )
    joined = probes.join(
        n,
        (F.col("level") == F.col("nl"))
        & (F.col("nr") == F.col("nrow"))
        & (F.col("nc") == F.col("ncol")),
        "left",
    )
    return (
        joined.groupBy("level", "row", "col")
        .agg(F.count("nrow").cast("int").alias("n_neighbors"))
        .withColumn(
            "interior",
            (F.col("n_neighbors") == 8).cast("int"),
        )
    )


# Haversine query constants: level-10 grid bounds precomputed by the
# SAME level_bounds() that drives the tile generator, inlined into both
# dialects so the grids agree by construction.
_HAV_LEVEL = 10
_HAV_R0, _HAV_R1, _HAV_C0, _HAV_C1 = level_bounds(_HAV_LEVEL)
_EARTH_R = 6378137.0  # WGS84 / Web-Mercator sphere radius, meters
_HAV_LAT0, _HAV_LON0 = 40.7608, -111.8910  # reference point (SLC)


@query(
    "q_tile_haversine",
    oracle=f"""
    WITH cells AS (
      SELECT r.r AS row, c.c AS col
      FROM (SELECT unnest(generate_series({_HAV_R0}, {_HAV_R1})) AS r) r,
           (SELECT unnest(generate_series({_HAV_C0}, {_HAV_C1})) AS c) c
    ),
    geo AS (
      SELECT row, col,
             ((-{WEB_MERCATOR_DELTA}) + (col + 0.5)
               * ({WEB_MERCATOR_DELTA} * power(2, 1 - {_HAV_LEVEL})))
               / {_EARTH_R} AS lon_rad,
             2 * atan(exp((({WEB_MERCATOR_DELTA} - (row + 0.5)
               * ({WEB_MERCATOR_DELTA} * power(2, 1 - {_HAV_LEVEL})))
               / {_EARTH_R}))) - pi() / 2 AS lat_rad
      FROM cells
    )
    SELECT row, col,
           round(2 * {_EARTH_R} * asin(sqrt(
             pow(sin((lat_rad - radians({_HAV_LAT0})) / 2), 2)
             + cos(radians({_HAV_LAT0})) * cos(lat_rad)
               * pow(sin((lon_rad - radians({_HAV_LON0})) / 2), 2)
           )), 3) AS dist_m,
           CAST(floor(round(2 * {_EARTH_R} * asin(sqrt(
             pow(sin((lat_rad - radians({_HAV_LAT0})) / 2), 2)
             + cos(radians({_HAV_LAT0})) * cos(lat_rad)
               * pow(sin((lon_rad - radians({_HAV_LON0})) / 2), 2)
           )), 3) / 10000) AS INT) AS ring_10km
    FROM geo
    """,
)
def q_tile_haversine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GEO RADIUS / DISTANCE query over the tile grid: great-circle
    distance from every level-10 tile CENTER to a reference point,
    plus a 10 km ring index — the proximity primitive behind 'tiles
    within N km', nearest-facility and cache-warmup-by-distance jobs.
    Tile centers invert from Web-Mercator meters to lat/lon
    (lon = x/R, lat = 2·atan(exp(y/R)) − π/2, the spherical inverse of
    P:74-81's forward grid math), then the haversine formula — the
    identical double expression tree in both engines, rounded to mm.

    Shape: the grid is GENERATED (same two-explode generator as
    q_tile_grid — no stored table), the reference point is a literal,
    and everything after the explode is per-row math in whole-stage
    codegen: embarrassingly parallel at any pyramid depth, no shuffle
    at all."""
    ensure_session_determinism(spark)
    tile_size = F.lit(WEB_MERCATOR_DELTA * math.pow(2, 1 - _HAV_LEVEL))
    cells = (
        spark.range(_HAV_R0, _HAV_R1 + 1)
        .select(F.col("id").cast("int").alias("row"))
        .select(
            "row",
            F.explode(
                F.sequence(F.lit(_HAV_C0), F.lit(_HAV_C1))
            ).alias("col"),
        )
    )
    x = F.lit(-WEB_MERCATOR_DELTA) + (F.col("col") + 0.5) * tile_size
    y = F.lit(WEB_MERCATOR_DELTA) - (F.col("row") + 0.5) * tile_size
    lon_rad = x / _EARTH_R
    lat_rad = 2 * F.atan(F.exp(y / _EARTH_R)) - math.pi / 2
    lat0 = F.radians(F.lit(_HAV_LAT0))
    lon0 = F.radians(F.lit(_HAV_LON0))
    dist = F.round(
        2
        * _EARTH_R
        * F.asin(
            F.sqrt(
                F.pow(F.sin((lat_rad - lat0) / 2), 2)
                + F.cos(lat0)
                * F.cos(lat_rad)
                * F.pow(F.sin((lon_rad - lon0) / 2), 2)
            )
        ),
        3,
    )
    return cells.select(
        "row",
        "col",
        dist.alias("dist_m"),
        F.floor(dist / 10000).cast("int").alias("ring_10km"),
    )


# --- quadkey codec (Bing-scheme tile addressing) -----------------------

_QK_MAX_LEVEL = 11  # LEVELS[1]; one CASE term per possible digit


def _quadkey_sql(row: str, col: str) -> str:
    """SQL for the Bing quadkey of a canonical tile — identical
    expression text in both engines (``>>``/``&`` are shared syntax).
    Digit k (most significant first) = 2·rowbit + colbit at bit
    position (level − k); the string has exactly ``level`` digits."""
    terms = []
    for k in range(1, _QK_MAX_LEVEL + 1):
        d = (
            f"(2 * ((CAST({row} AS BIGINT) >> (level - {k})) & 1)"
            f" + ((CAST({col} AS BIGINT) >> (level - {k})) & 1))"
        )
        terms.append(
            f"CASE WHEN level >= {k} THEN CAST({d} AS STRING) "
            f"ELSE '' END"
        )
    return "concat(" + ", ".join(terms) + ")"


def _quaddec_sql(which: str) -> str:
    """SQL recovering row (``which='row'``) or col from the quadkey
    STRING itself — digit ≥ 2 carries the row bit, digit mod 2 the col
    bit; pow(2, level−k) is exact in double for level ≤ 11 so the
    integer cast agrees in both engines (truncation == rounding on
    exact powers)."""
    terms = []
    for k in range(1, _QK_MAX_LEVEL + 1):
        digit = f"CAST(substr(quadkey, {k}, 1) AS INT)"
        bit = (
            f"(CASE WHEN {digit} >= 2 THEN 1 ELSE 0 END)"
            if which == "row"
            else f"({digit} % 2)"
        )
        terms.append(
            f"CASE WHEN {k} <= length(quadkey) "
            f"THEN {bit} * CAST(pow(2, level - {k}) AS INT) ELSE 0 END"
        )
    return "CAST(" + " + ".join(terms) + " AS INT)"


@query(
    "q_tile_quadkey",
    oracle=_grid_oracle_cte()
    + f"""
    , qk AS (
      SELECT level, "row", col,
             {_quadkey_sql('"row"', "col")} AS quadkey
      FROM grid
      WHERE "row" >= 0 AND col >= 0
    )
    SELECT level, "row", col, quadkey,
           substr(quadkey, 1, length(quadkey) - 1) AS parent_quadkey,
           {_quaddec_sql("row")} AS parsed_row,
           {_quaddec_sql("col")} AS parsed_col
    FROM qk
    """,
)
def q_tile_quadkey(spark: SparkSession, sf_dir: str) -> DataFrame:
    """QUADKEY CODEC — the Bing-maps single-string tile address that
    interleaves (level, row, col) into one base-4 string: digit k is
    2·rowbit+colbit at depth k, so a tile's key is its parent's key
    plus one digit. The reference addresses tiles as L%02d/R%08x/C%08x
    paths (src/Program.cs:97-99); quadkeys are the equivalent codec
    used when tiles key an object store or a sorted table, because the
    PREFIX relation encodes ancestry: parent_quadkey is literally the
    string parent, and a prefix range scan fetches a subtree — the
    lake-layout dual of q_tile_zorder's Morton key (same bit
    interleave, serialized as a radix-4 string). Emits encode, the
    string-parent, and a decode round-trip (parsed_row/col re-derived
    from the string alone) proving the codec is lossless.

    Scale shape: pure per-row expression work — no shuffle, no join;
    whole-stage codegen end to end. Canonical tiles only (the level-5
    extent pad reaches col −2, outside quadkey's domain)."""
    ensure_session_determinism(spark)
    g = (
        tile_grid(spark)
        .where((F.col("row") >= 0) & (F.col("col") >= 0))
        .withColumn("quadkey", F.expr(_quadkey_sql("row", "col")))
    )
    return g.select(
        "level",
        "row",
        "col",
        "quadkey",
        F.expr("substr(quadkey, 1, length(quadkey) - 1)").alias(
            "parent_quadkey"
        ),
        F.expr(_quaddec_sql("row")).alias("parsed_row"),
        F.expr(_quaddec_sql("col")).alias("parsed_col"),
    )


@query(
    "q_tile_knn",
    oracle=_grid_oracle_cte()
    + f"""
    , paths AS (
      SELECT level, "row", col,
             printf('L%02d/R%s/C%s.jpg', level,
                    {_HEX8_DUCK.format(c='"row"')},
                    {_HEX8_DUCK.format(c='col')}) AS src_path
      FROM grid WHERE level = 7
    ),
    present AS (
      SELECT level, "row", col FROM paths WHERE {_PRESENT_SQL}
    ),
    offsets(dr, dc) AS (
      SELECT r.r, c.c
      FROM (SELECT unnest(generate_series(-2, 2)) AS r) r
      CROSS JOIN (SELECT unnest(generate_series(-2, 2)) AS c) c
      WHERE NOT (r.r = 0 AND c.c = 0)
    ),
    cand AS (
      SELECT p."row" AS row, p.col,
             n."row" AS n_row, n.col AS n_col,
             sqrt(CAST(o.dr * o.dr + o.dc * o.dc AS DOUBLE)) AS dist,
             row_number() OVER (
               PARTITION BY p."row", p.col
               ORDER BY o.dr * o.dr + o.dc * o.dc,
                        n."row", n.col) AS rn
      FROM present p
      JOIN offsets o ON TRUE
      JOIN present n
        ON n."row" = p."row" + o.dr AND n.col = p.col + o.dc
    )
    SELECT row, col, n_row, n_col,
           round(dist, 6) AS dist, CAST(rn AS INT) AS rn
    FROM cand WHERE rn <= 3
    """,
)
def q_tile_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPATIAL k-NEAREST-NEIGHBORS over the present-tile set (level 7,
    k=3, candidates from the Chebyshev-2 ring): for every present
    tile, its 3 nearest present tiles by grid Euclidean distance with
    a deterministic (dist², row, col) tiebreak. This is the
    grid-partitioned kNN rewrite every spatial engine uses: candidates
    come from a BOUNDED neighbor-cell ring (24 offset keys — a literal
    broadcast dimension), turning geometry into exact equi-join key
    arithmetic — never a cross join of the point set against itself.

    Deliberately NOT @plan_memo: the builder persists the grid via
    tile_grid (cache.persist_scoped under the tiles_manifest tag), and
    a memo hit would skip the hit-path re-pin that restores the
    persist after a foreign scope evicts it — plan_memo's contract
    excludes builders with scoped-persist side effects.
    Boundary tiles with fewer than k in-ring neighbors emit what
    exists (coverage edges are visible as short result groups, the
    same signal q_tile_neighbors' ``interior`` flag exposes).

    Scale shape: fan-out ×24, ONE hash equi-join on the neighbor key
    (both sides partition on the same composite key), then a bounded
    per-tile window (≤ 24 rows per partition key — WindowGroupLimit
    prunes to k before the shuffle). Ranking on the INTEGER dist²
    avoids float order risk; the reported dist is sqrt (correctly
    rounded IEEE, identical cross-engine)."""
    ensure_session_determinism(spark)
    present = (
        tile_grid(spark)
        .where(F.col("level") == 7)
        .withColumn("src_path", src_path_col())
        .where(F.expr(_PRESENT_SQL))
        .select("level", "row", "col")
    )
    offsets = present.sparkSession.createDataFrame(
        [
            (dr, dc)
            for dr in range(-2, 3)
            for dc in range(-2, 3)
            if not (dr == 0 and dc == 0)
        ],
        "dr int, dc int",
    )
    p = present.alias("p")
    n = present.alias("n")
    cand = (
        p.join(F.broadcast(offsets))
        .join(
            n,
            (F.col("n.row") == F.col("p.row") + F.col("dr"))
            & (F.col("n.col") == F.col("p.col") + F.col("dc")),
        )
        .select(
            F.col("p.row").alias("row"),
            F.col("p.col").alias("col"),
            F.col("n.row").alias("n_row"),
            F.col("n.col").alias("n_col"),
            (F.col("dr") * F.col("dr") + F.col("dc") * F.col("dc")).alias(
                "d2"
            ),
        )
    )
    w = Window.partitionBy("row", "col").orderBy("d2", "n_row", "n_col")
    return (
        cand.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select(
            "row",
            "col",
            "n_row",
            "n_col",
            F.round(F.sqrt(F.col("d2").cast("double")), 6).alias("dist"),
            F.col("rn").cast("int").alias("rn"),
        )
    )


# Target object-store part size for the storage planner. Fixture tiles
# average ~1.1 KB, so 256 KiB parts give multi-file levels at the test
# SFs; a production run would set this to 128 MiB — the arithmetic is
# identical.
PLAN_TARGET_BYTES = 262144


def _storage_plan_oracle() -> str:
    from tile_etl_spark.registry import ORACLES

    return f"""
    WITH s AS ({ORACLES["q_tile_stats"]})
    SELECT level, tile_count, total_bytes,
           CAST(ceil(CAST(total_bytes AS DOUBLE) / {PLAN_TARGET_BYTES})
                AS BIGINT) AS n_parts,
           CAST(ceil(CAST(tile_count AS DOUBLE)
                     / ceil(CAST(total_bytes AS DOUBLE)
                            / {PLAN_TARGET_BYTES}))
                AS BIGINT) AS tiles_per_part,
           round(CAST(total_bytes AS DOUBLE)
                 / ceil(CAST(total_bytes AS DOUBLE) / {PLAN_TARGET_BYTES})
                 / {PLAN_TARGET_BYTES}, 6) AS part_fill
    FROM s
    """


@query("q_tile_storage_plan", oracle=_storage_plan_oracle())
def q_tile_storage_plan(spark, sf_dir: str):
    """STORAGE-LAYOUT PLANNER — turn the per-level manifest stats into
    a concrete write plan: how many object-store parts each pyramid
    level needs at the target part size, the tiles-per-part quota a
    writer should enforce (repartition width / maxRecordsPerFile), and
    the resulting part fill factor. This is the sizing pass a 100 TB
    tile job runs BEFORE the sink write: parts near the target size
    keep both the PUT count and the per-object listing overhead
    bounded, and the plan is pure integer arithmetic over per-level
    aggregates the stats pass already computes — the planner itself
    touches no tile rows."""
    from tile_etl_spark.registry import QUERIES
    from pyspark.sql import functions as F

    s = QUERIES["q_tile_stats"](spark, sf_dir)
    n_parts = F.ceil(
        F.col("total_bytes").cast("double") / PLAN_TARGET_BYTES
    ).cast("bigint")
    return s.select(
        "level",
        "tile_count",
        "total_bytes",
        n_parts.alias("n_parts"),
        F.ceil(F.col("tile_count").cast("double") / n_parts)
        .cast("bigint")
        .alias("tiles_per_part"),
        F.round(
            F.col("total_bytes").cast("double")
            / n_parts
            / PLAN_TARGET_BYTES,
            6,
        ).alias("part_fill"),
    )
