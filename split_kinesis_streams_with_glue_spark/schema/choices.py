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
- ``make_struct`` — the LOSSLESS policy: the conflicted field becomes
  ``struct<int:bigint, double:double>`` with exactly one non-null branch
  per record, decided by the record's own serialized form (an integer
  literal fills ``int``, any other numeric fills ``double``). This is what
  a real migration wants when downstream code must distinguish "1" from
  "1.0". Apply it to the field read as STRING so the raw form is intact.
- ``project:<type>`` — keep only the records whose serialized form matches
  the chosen branch; the others become NULL (Glue's ``project`` drop
  semantics).

All policies compile to plain ``withColumn``/``cast``/``rlike`` — Catalyst
expressions, no Python in the hot path, fully codegen'd.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
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


_INT_LITERAL = r"^-?[0-9]+$"


def make_struct(col: Column) -> Column:
    """Glue ``make_struct``: ``struct<int:bigint, double:double>`` with
    exactly one non-null branch, decided by the record's serialized form.
    Feed it the field read as STRING — a pre-widened double has already
    collapsed "1" and "1.0" and the distinction is unrecoverable."""
    s = col.cast("string")
    is_int = s.rlike(_INT_LITERAL)
    # try_cast, not cast: under ANSI mode (Spark 4 default) a malformed
    # record would fail the job; choice resolution must null it instead
    return F.struct(
        F.when(is_int, s.try_cast("long")).alias("int"),
        F.when(~is_int, s.try_cast("double")).alias("double"),
    )


def project_choice(col: Column, target: str) -> Column:
    """Glue ``project:<type>``: keep only records whose serialized form is
    the chosen branch; the rest become NULL (drop semantics)."""
    s = col.cast("string")
    is_int = s.rlike(_INT_LITERAL)
    if target in ("int", "long", "bigint"):
        return F.when(is_int, s.try_cast("long"))
    return F.when(~is_int, s.try_cast(target))


def resolve_choices(
    df: DataFrame, specs: dict[str, str] | str = "widen"
) -> DataFrame:
    """Apply choice-resolution policies.

    ``specs`` maps column → ``"<type>"`` (plain cast), ``"as_string"``,
    ``"make_struct"``, or ``"project:<type>"`` — mirroring Glue
    ``resolveChoice`` spec strings — or is the string ``"widen"`` (no-op
    beyond what JSON inference already widened — present so call sites
    document the policy in force).
    """
    if specs == "widen" or not specs:
        return df
    out = df
    for col, typ in specs.items():
        if typ == "make_struct":
            out = out.withColumn(col, make_struct(F.col(col)))
        elif typ.startswith("project:"):
            out = out.withColumn(col, project_choice(F.col(col), typ.split(":", 1)[1]))
        else:
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
