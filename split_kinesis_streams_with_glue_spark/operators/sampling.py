"""Deterministic sampling / dataset-split operators for training-data
pipelines (SURVEY.md §2.6 X5 posture: stateless, keyless, no driver-side
randomness).

Splits are keyed on a CONTENT hash (``md5`` of the text), not on row ids or
``rand()``: the assignment survives re-ingestion, re-partitioning, and id
renumbering, and identical documents always land in the same split — the
property that prevents train/test leakage through duplicates. md5 emits
lowercase fixed-width hex in every engine, so threshold comparison works
lexicographically and the same rule is expressible in ANSI SQL for the
oracle (no engine-specific hash needed).

All operators are narrow (filter/project only): no shuffle, fully
pushdown-friendly, linear at any scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _hex_bucket(col: Column) -> Column:
    """First 4 hex chars of md5 → lexicographic position in [0, 65536)."""
    return F.substring(F.md5(col), 1, 4)


def _hex_threshold(frac: float) -> str:
    """The threshold string h such that P(bucket < h) == round(frac*65536)/65536.

    Boundary care: ``frac >= 1.0`` must admit EVERY bucket, but
    ``format(65536, "04x")`` is the 5-char "10000", which compares lexically
    BELOW any bucket not starting with '0' — silently dropping ~94% of rows.
    "g" sorts after every hex digit, so ``bucket < "g"`` is a tautology (and
    is equally expressible in the ANSI-SQL oracle)."""
    n = max(0, min(65536, round(frac * 65536)))
    return "g" if n >= 65536 else format(n, "04x")


def hash_split(
    df: DataFrame,
    text_col: str = "text",
    train: float = 0.8,
    val: float = 0.1,
    split_col: str = "split",
) -> DataFrame:
    """Assign train/val/test by content hash: ``train`` fraction, then
    ``val``, remainder test. Pure projection — no shuffle, deterministic,
    duplicate-safe (equal text ⇒ equal split)."""
    b = _hex_bucket(F.col(text_col))
    t1, t2 = _hex_threshold(train), _hex_threshold(train + val)
    return df.withColumn(
        split_col,
        F.when(b < F.lit(t1), "train").when(b < F.lit(t2), "val").otherwise("test"),
    )


def stratified_sample(
    df: DataFrame,
    rates: dict[str, float],
    label_col: str = "lang",
    text_col: str = "text",
) -> DataFrame:
    """Deterministic per-class downsampling: keep a class-specific fraction
    of rows, chosen by the same content-hash bucket (so the kept set is
    stable across runs and engines). Classes absent from ``rates`` are
    dropped — the rebalancing shape used to cap over-represented languages
    or sources in a training mix. Pure filter: pushes down, no shuffle."""
    b = _hex_bucket(F.col(text_col))
    cond = None
    for label, rate in sorted(rates.items()):
        this = (F.col(label_col) == label) & (b < F.lit(_hex_threshold(rate)))
        cond = this if cond is None else cond | this
    return df.filter(cond)
