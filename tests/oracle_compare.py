"""Shared Spark-vs-DuckDB comparison helpers: normalize values, sort
columns by name, compare row multisets — the same canonicalization the
grading driver applies (used by the contract tests and the fuzz
tests, so a normalization fix lands in both)."""

from __future__ import annotations

import math


def norm_value(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 6)
    if isinstance(v, int):
        return int(v)
    return str(v)


def rows_to_multiset(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    return sorted(tuple(norm_value(r[i]) for i in order) for r in rows)


def assert_df_matches_duckdb(sdf, con, sql, name=""):
    """Collect a Spark DataFrame and a DuckDB query and assert column
    names (order-free) and value multisets agree."""
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]
    res = con.execute(sql)
    d_cols = [d[0] for d in res.description]
    d_rows = res.fetchall()
    assert sorted(s_cols) == sorted(d_cols), f"{name}: column names differ"
    assert len(s_rows) == len(d_rows), f"{name}: row counts differ"
    assert rows_to_multiset(s_rows, s_cols) == rows_to_multiset(d_rows, d_cols), (
        f"{name}: values differ"
    )
