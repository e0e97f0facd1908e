"""Vector math over ``array<float>`` embedding columns as Catalyst
higher-order functions (SURVEY.md X2).

Everything here compiles to JVM expressions (``zip_with`` + ``aggregate``) —
no Python in the hot path, so a 100 TB embedding scan stays inside
whole-stage codegen. Elements are cast to double before accumulating so
results match engines that accumulate in double (e.g. the DuckDB oracle).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column | str, b: Column | str) -> Column:
    """Dot product of two float arrays, accumulated left-to-right in double."""
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def sq_norm(a: Column | str) -> Column:
    return dot(a, a)


def l2_norm(a: Column | str) -> Column:
    return F.sqrt(sq_norm(a))


def cosine(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity. For pre-normalized embeddings prefer ``dot`` —
    same value, one aggregate instead of three."""
    return dot(a, b) / (l2_norm(a) * l2_norm(b))
