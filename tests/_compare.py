"""Cross-engine result comparison replicating the DRIVER's t2 check.

The driver canonicalizes both sides through pandas: Spark via
``DataFrame.toPandas()``, DuckDB via ``cursor.df()`` — then sorts
columns by name, ``sort_values`` over all columns, and hashes cell
values. Round 2 proved the local harness MUST mirror that pipeline
exactly, not a friendlier one:

- DuckDB's pandas conversion turns DECIMAL into float64 while Spark
  emits ``decimal.Decimal`` objects — a harness that normalizes
  Decimal→number hides a driver hash mismatch (r2: q_cond_funcs).
- Spark DOUBLE ``1.0`` vs DuckDB TINYINT ``1`` hash differently — a
  harness that collapses int-valued floats to ints hides it
  (r2: q_math_funcs).
- pandas ``sort_values`` raises ``TypeError: unhashable type: 'list'``
  on ARRAY/MAP cells — a harness that hand-canonicalizes lists hides
  the crash (r2: q_array_funcs, q_map_funcs; r1: q_agg_collect).

So: NO Decimal normalization, NO int/float collapse, and the same
``sort_values`` call the driver makes (list cells must crash here too).
On mismatch it reports the first differing rows so dialect drift is
debuggable (stricter than the driver's opaque hash).
"""

from __future__ import annotations

import datetime as dt
import math
from decimal import Decimal

import numpy as np
import pandas as pd


def canon_cell(v) -> str:
    """Type-sensitive canonical form of one pandas cell.

    Deliberately distinguishes Decimal vs float vs int — if the two
    engines deliver different pandas representations, the driver's hash
    differs, so ours must too. numpy scalars fold into their Python
    family (both engines emit numpy for non-null numeric columns, so
    that fold is representation-neutral)."""
    if v is None:
        return "\0NULL"
    if isinstance(v, (bool, np.bool_)):
        return f"bool:{bool(v)}"
    if isinstance(v, Decimal):
        return f"dec:{v}"
    if isinstance(v, (float, np.floating)):
        f = float(v)
        return "float:nan" if math.isnan(f) else f"float:{f!r}"
    if isinstance(v, (int, np.integer)):
        return f"int:{int(v)}"
    if isinstance(v, pd.Timestamp):
        if v is pd.NaT:
            return "\0NULL"
        t = v.tz_localize(None) if v.tzinfo else v
        # DuckDB's .df() renders DATE as a midnight Timestamp while
        # Spark's toPandas keeps datetime.date objects; the driver
        # treats those as EQUAL (q_date_funcs was driver-green in r2
        # with three DATE columns), so midnight collapses to date:.
        if (t.hour, t.minute, t.second, t.microsecond, t.nanosecond) == (
            0, 0, 0, 0, 0,
        ):
            return "date:" + t.date().isoformat()
        return "ts:" + t.isoformat()
    if isinstance(v, dt.datetime):
        t = v.replace(tzinfo=None)
        if (t.hour, t.minute, t.second, t.microsecond) == (0, 0, 0, 0):
            return "date:" + t.date().isoformat()
        return "ts:" + t.isoformat()
    if isinstance(v, dt.date):
        return "date:" + v.isoformat()
    if isinstance(v, (bytes, bytearray, memoryview)):
        return "bin:" + bytes(v).hex()
    if isinstance(v, str):
        return f"str:{v}"
    # Anything else (list, dict, ndarray, ...) is NOT driver-hashable;
    # sort_values should already have crashed, but be explicit.
    raise TypeError(
        f"non-driver-hashable cell type {type(v).__name__}: {v!r}"
    )


def _is_missing(v) -> bool:
    """NaN counts as missing: DuckDB's .df() renders NULL as NaN even
    inside object columns (null BOOLEAN) where Spark delivers None —
    and q_filter_null_bool was driver-green in r1, so the driver's
    canonicalizer equates them (pd.isna semantics)."""
    if v is None or v is pd.NaT:
        return True
    if isinstance(v, (float, np.floating)) and math.isnan(float(v)):
        return True
    try:
        return v is pd.NA
    except Exception:
        return False


def canon_frame(pdf: pd.DataFrame) -> list[tuple[str, ...]]:
    """The driver's canonical form: columns sorted by name, rows sorted
    by ``sort_values`` over all columns (raises on unhashable cells,
    exactly like the driver), then strict per-cell canon."""
    cols = sorted(pdf.columns)
    pdf = pdf[cols]
    # Driver step — must raise TypeError on list/map cells.
    pdf = pdf.sort_values(by=cols, kind="mergesort").reset_index(drop=True)
    out = []
    for row in pdf.itertuples(index=False, name=None):
        out.append(
            tuple(
                "\0NULL" if _is_missing(v) else canon_cell(v) for v in row
            )
        )
    # sort_values gives engine-dependent NaN placement / tie order for
    # equal keys of mixed types; a final canonical-string sort makes the
    # comparison order-insensitive, as the driver's hash is.
    return sorted(out)


def run_spark_pdf(fn, spark, sf_dir) -> pd.DataFrame:
    return fn(spark, sf_dir).toPandas()


def run_duck_pdf(con, sql) -> pd.DataFrame:
    return con.execute(sql).df()


def _tz_aware_cols(pdf: pd.DataFrame) -> set[str]:
    """Columns with tz-aware datetime dtype. Spark's toPandas always
    delivers naive timestamps; DuckDB functions returning TIMESTAMPTZ
    (``to_timestamp``, ``now``, tz arithmetic) deliver
    ``datetime64[..., UTC]`` — the driver's schema check flags that as
    a mismatch (r3: q_ts_resample/q_ts_interpolate), so ours must too.
    Oracle SQL should use ``make_timestamp(µs)`` or cast to naive."""
    return {
        c
        for c in pdf.columns
        if getattr(pdf[c].dtype, "tz", None) is not None
    }


def assert_query_matches_oracle(fn, sql, spark, duck, sf_dir, qid=""):
    s_pdf = run_spark_pdf(fn, spark, sf_dir)
    d_pdf = run_duck_pdf(duck, sql)
    assert sorted(s_pdf.columns) == sorted(d_pdf.columns), (
        f"{qid}: column mismatch spark={sorted(s_pdf.columns)} "
        f"duck={sorted(d_pdf.columns)}"
    )
    s_tz, d_tz = _tz_aware_cols(s_pdf), _tz_aware_cols(d_pdf)
    assert s_tz == d_tz, (
        f"{qid}: tz-awareness schema mismatch spark={sorted(s_tz)} "
        f"duck={sorted(d_tz)} — driver schema check fails on this"
    )
    assert len(s_pdf) == len(d_pdf), (
        f"{qid}: row count spark={len(s_pdf)} duck={len(d_pdf)}"
    )
    sc = canon_frame(s_pdf)
    dc = canon_frame(d_pdf)
    if sc != dc:
        diffs = [
            (i, a, b) for i, (a, b) in enumerate(zip(sc, dc)) if a != b
        ][:3]
        raise AssertionError(
            f"{qid}: value mismatch ({len(diffs)}+ rows); cols(sorted)="
            f"{sorted(s_pdf.columns)}; first diffs (spark vs duck):\n"
            + "\n".join(f"  row {i}:\n   S={a}\n   D={b}" for i, a, b in diffs)
        )
