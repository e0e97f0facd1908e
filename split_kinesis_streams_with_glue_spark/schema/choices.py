"""Glue ``choice`` (union) type resolution — SURVEY.md §4.3, the one
genuinely custom semantic in the engine.

Glue represents a field observed with incompatible types as ``choice``
(reference image/image2.png: ``ticket_price: choice{double,int}``) and
resolves it with ``resolveChoice`` specs. Spark has no union type; its JSON
inference already auto-widens int+double → double and falls back to string
for incompatible kinds. The engine makes the residual policy explicit:

- ``widen``   — numeric strings / integers → the widest observed numeric
  (what ``toDF()`` did implicitly in the reference, README.md:279).
- ``cast:<type>`` per column — Glue ``resolveChoice(specs=[(col, "cast:double")])``.
- ``as_string`` — keep raw text, parse later.

All policies compile to plain ``withColumn``/``cast`` — Catalyst expressions,
no Python in the hot path, fully codegen'd.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_NUMERIC_WIDTH = [
    T.ByteType, T.ShortType, T.IntegerType, T.LongType, T.FloatType, T.DoubleType,
]


def widest(a: T.DataType, b: T.DataType) -> T.DataType:
    """Widest of two numeric types (int+double → double etc.)."""
    order = {cls().simpleString(): i for i, cls in enumerate(_NUMERIC_WIDTH)}
    sa, sb = a.simpleString(), b.simpleString()
    if sa in order and sb in order:
        return a if order[sa] >= order[sb] else b
    return T.StringType()


def resolve_choices(
    df: DataFrame, specs: dict[str, str] | str = "widen"
) -> DataFrame:
    """Apply choice-resolution casts.

    ``specs`` maps column → target type name (``{"o_totalprice": "double"}``)
    or is the string ``"widen"`` (no-op beyond what JSON inference already
    widened — present so call sites document the policy in force).
    """
    if specs == "widen" or not specs:
        return df
    out = df
    for col, typ in specs.items():
        if typ == "as_string":
            typ = "string"
        out = out.withColumn(col, F.col(col).cast(typ))
    return out


def conflicting_fields(
    schemas: dict[str, T.StructType]
) -> dict[str, list[tuple[str, str]]]:
    """Report fields observed with different types across per-table schemas —
    the engine's 'choice detected' signal (crawler console analog).

    Returns {field_name: [(table, type), ...]} for fields whose observed
    types disagree.
    """
    seen: dict[str, list[tuple[str, str]]] = {}
    for table, schema in schemas.items():
        for f in schema.fields:
            seen.setdefault(f.name, []).append((table, f.dataType.simpleString()))
    return {
        name: obs
        for name, obs in seen.items()
        if len({t for _, t in obs}) > 1
    }
