"""Cross-engine result comparison mirroring the driver's t2 check:
row-count + schema (column-name set) + order-insensitive value
comparison. Stricter than a hash — on mismatch it reports the first
differing row so dialect drift is debuggable."""

from __future__ import annotations

import datetime as dt
import math
from decimal import Decimal


def canon_cell(v) -> str:
    if v is None:
        return "\0NULL"
    if isinstance(v, bool):
        return f"bool:{v}"
    if isinstance(v, Decimal):
        return f"num:{v.normalize():f}"
    if isinstance(v, float):
        if math.isnan(v):
            return "num:nan"
        if v == int(v) and abs(v) < 2**53:
            return f"num:{int(v)}"
        return f"num:{v!r}"
    if isinstance(v, int):
        return f"num:{v}"
    if isinstance(v, dt.datetime):
        return "ts:" + v.replace(tzinfo=None).isoformat(timespec="microseconds")
    if isinstance(v, dt.date):
        return "date:" + v.isoformat()
    if isinstance(v, (bytes, bytearray, memoryview)):
        return "bin:" + bytes(v).hex()
    if isinstance(v, list):
        return "list:[" + ",".join(canon_cell(x) for x in v) + "]"
    if isinstance(v, dict):
        items = sorted((str(k), canon_cell(x)) for k, x in v.items())
        return "map:{" + ",".join(f"{k}={x}" for k, x in items) + "}"
    return f"str:{v}"


def canon_rows(cols: list[str], rows: list[tuple]) -> list[tuple[str, ...]]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(canon_cell(r[i]) for i in order) for r in rows)


def run_spark(fn, spark, sf_dir):
    df = fn(spark, sf_dir)
    return df.columns, [tuple(r) for r in df.collect()]


def run_duck(con, sql):
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    return cols, cur.fetchall()


def assert_query_matches_oracle(fn, sql, spark, duck, sf_dir, qid=""):
    s_cols, s_rows = run_spark(fn, spark, sf_dir)
    d_cols, d_rows = run_duck(duck, sql)
    assert sorted(s_cols) == sorted(d_cols), (
        f"{qid}: column mismatch spark={sorted(s_cols)} duck={sorted(d_cols)}"
    )
    assert len(s_rows) == len(d_rows), (
        f"{qid}: row count spark={len(s_rows)} duck={len(d_rows)}"
    )
    sc = canon_rows(s_cols, s_rows)
    dc = canon_rows(d_cols, d_rows)
    if sc != dc:
        diffs = [
            (i, a, b) for i, (a, b) in enumerate(zip(sc, dc)) if a != b
        ][:3]
        raise AssertionError(
            f"{qid}: value mismatch ({len(diffs)}+ rows); cols(sorted)="
            f"{sorted(s_cols)}; first diffs (spark vs duck):\n"
            + "\n".join(f"  row {i}:\n   S={a}\n   D={b}" for i, a, b in diffs)
        )
