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
from pyspark.sql.types import ArrayType, DecimalType, MapType, StructType

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
        r = round(v, 6)
        # The driver hashes raw float BYTES, so -0.0 != +0.0 there even
        # though Python == (and sorted()) treats them equal — exactly how
        # text_script_mix passed four local 307/307 sweeps and went red at
        # the driver in round 7 (DuckDB ROUND of a tiny negative residue
        # emits -0.0; Spark's HALF_UP emits +0.0). Tag the signed zero so
        # this class can never again pass locally and fail at the driver.
        if r == 0.0 and math.copysign(1.0, r) < 0.0:
            return "-0.0"
        return r
    if isinstance(v, _dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, list):
        return tuple(_norm(x) for x in v)
    if isinstance(v, bytes):
        return v.hex()
    return v


def assert_driver_safe_schema(schema, name: str = "?") -> None:
    """Driver-output-schema convention (round-5 verdict #3).

    The driver's value hasher canonicalizes wide DECIMAL columns
    differently per engine even when values are identical (burned a window
    slot in rounds 3, 4 AND 5: r3 ``agg_listagg_ordered`` arrays, r4
    ``agg_salted_skew``, r5 the cdc_fingerprint/merge_verified/join_view/
    merkle quartet), and cannot hash list/array columns at all. So every
    oracle-backed query must emit:

    - NO DecimalType anywhere (cast checksums to BIGINT, money to DOUBLE —
      exact at ≤ 2 decimal digits / integer-cents < 2^53);
    - NO Array/Map/Struct top-level column (emit as ``to_json`` /
      ``array_join`` text, or one scalar column per element).
    """
    for f in schema.fields:
        t = f.dataType
        if isinstance(t, (ArrayType, MapType, StructType)):
            raise AssertionError(
                f"[{name}] output column {f.name!r} is {t.simpleString()}: "
                "the driver hasher cannot canonicalize nested values — emit "
                "JSON text or scalar columns instead"
            )
        if isinstance(t, DecimalType):
            raise AssertionError(
                f"[{name}] output column {f.name!r} is {t.simpleString()}: "
                "raw decimals hash engine-dependently — cast checksums to "
                "BIGINT and money to DOUBLE on both sides"
            )


#: DuckDB result types the driver's byte-hasher cannot canonicalize to a
#: Spark column even when every value is identical.  This class has cost a
#: driver-window slot in FIVE rounds — r2 ``pipeline_training_data_prep``
#: (SUM→HUGEINT), r4 ``agg_salted_skew`` (DECIMAL), r5–r6 the cdc DECIMAL
#: quartet + siblings, r7 ``text_script_mix`` (signed zero, fenced in
#: ``_norm``), r8 ``sample_weighted_median`` (SUM→HUGEINT again) — because
#: every guard until round 9 policed only the SPARK side of the pair.
#: ``assert_driver_safe_oracle_types`` is the DuckDB-side mirror.
_UNHASHABLE_DUCK_TYPES = ("HUGEINT", "UHUGEINT", "DECIMAL", "STRUCT", "MAP", "UNION")


def assert_driver_safe_oracle_types(con, sql: str, name: str = "?") -> None:
    """Oracle-side mirror of ``assert_driver_safe_schema`` (round-8 verdict
    What's-wrong #2).

    Plans the oracle SQL in DuckDB (no execution — ``.types`` comes from
    the binder) and rejects any result column whose DuckDB type the
    driver's byte-hasher cannot match to a Spark type: HUGEINT/UHUGEINT
    (DuckDB's default ``SUM(BIGINT)`` output — int128 bytes never equal
    int64 bytes), DECIMAL (engine-dependent canonicalization), and
    LIST/STRUCT/MAP/UNION (not hashable at all).  Fix at the source: cast
    sums to BIGINT / money to DOUBLE in the oracle SQL itself.
    """
    rel = con.sql(sql)
    for col, t in zip(rel.columns, rel.types):
        ts = str(t).upper()
        if ts.endswith("[]") or any(ts.startswith(b) for b in _UNHASHABLE_DUCK_TYPES):
            raise AssertionError(
                f"[{name}] oracle column {col!r} has DuckDB type {ts}: the "
                "driver byte-hasher cannot canonicalize it against Spark "
                "output even when values are identical — CAST it in the "
                "oracle SQL (sums → BIGINT, money → DOUBLE, nested → JSON "
                "text)"
            )


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
