"""Local stand-in for the driver's DuckDB-oracle comparison.

Runs a registered Spark query and its oracle SQL side-by-side, compares
row count, column-name set, and the order-insensitive multiset of values
(columns sorted by name — the driver's documented normalization).
Floats compare with tiny relative tolerance so legitimate engine-level
last-ulp differences don't mask real bugs (the registry's queries are written
to be exactly deterministic anyway).
"""

from __future__ import annotations

import datetime as _dt
import math

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 6)
    if isinstance(v, _dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, list):
        return tuple(_norm(x) for x in v)
    if isinstance(v, bytes):
        return v.hex()
    return v


def compare(spark_df, con, sql: str, name: str = "?") -> None:
    spark_rows = spark_df.collect()
    spark_cols = sorted(spark_df.columns)
    res = con.execute(sql)
    duck_cols_raw = [d[0] for d in res.description]
    duck_rows = res.fetchall()
    duck_cols = sorted(duck_cols_raw)

    assert spark_cols == duck_cols, (
        f"[{name}] column mismatch: spark={spark_cols} duck={duck_cols}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"[{name}] row count mismatch: spark={len(spark_rows)} duck={len(duck_rows)}"
    )

    s_multiset = sorted(
        (tuple(_norm(r[c]) for c in spark_cols) for r in spark_rows), key=repr
    )
    idx = {c: i for i, c in enumerate(duck_cols_raw)}
    d_multiset = sorted(
        (tuple(_norm(row[idx[c]]) for c in duck_cols) for row in duck_rows), key=repr
    )
    if s_multiset != d_multiset:
        diffs = [
            (a, b) for a, b in zip(s_multiset, d_multiset) if a != b
        ][:5]
        raise AssertionError(f"[{name}] value mismatch, first diffs: {diffs}")
