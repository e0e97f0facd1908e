"""Schema-compatibility classification (schema/compat.py) — the registry
verdict that gates whether CDC drift auto-applies or fails the batch."""

from __future__ import annotations

from pyspark.sql import types as T

from split_kinesis_streams_with_glue_spark.schema.compat import (
    compatibility,
    diff_schemas,
)


def _s(*fields):
    return T.StructType([T.StructField(n, t, nullable=nl) for n, t, nl in fields])


BASE = _s(("id", T.LongType(), False), ("v", T.IntegerType(), True))


def test_identical_schemas_are_fully_compatible():
    assert compatibility(BASE, BASE) == "full"
    assert diff_schemas(BASE, BASE) == []


def test_added_nullable_field_is_full():
    new = _s(("id", T.LongType(), False), ("v", T.IntegerType(), True),
             ("extra", T.StringType(), True))
    assert compatibility(BASE, new) == "full"


def test_added_required_field_breaks_backward():
    new = _s(("id", T.LongType(), False), ("v", T.IntegerType(), True),
             ("extra", T.StringType(), False))
    # old data has no value for a required field
    assert compatibility(BASE, new) == "forward"


def test_dropped_nullable_field_is_full():
    new = _s(("id", T.LongType(), False))
    assert compatibility(BASE, new) == "full"


def test_dropped_required_field_breaks_forward():
    old = _s(("id", T.LongType(), False), ("req", T.StringType(), False))
    new = _s(("id", T.LongType(), False))
    assert compatibility(old, new) == "backward"


def test_numeric_widening_is_backward_only():
    new = _s(("id", T.LongType(), False), ("v", T.DoubleType(), True))
    assert compatibility(BASE, new) == "backward"
    [c] = diff_schemas(BASE, new)
    assert (c.change, c.backward, c.forward) == ("widened", True, False)


def test_numeric_narrowing_is_forward_only():
    old = _s(("v", T.DoubleType(), True))
    new = _s(("v", T.IntegerType(), True))
    assert compatibility(old, new) == "forward"


def test_incompatible_retype_is_none():
    new = _s(("id", T.LongType(), False), ("v", T.StringType(), True))
    assert compatibility(BASE, new) == "none"


def test_nullability_tightening_breaks_backward():
    new = _s(("id", T.LongType(), False), ("v", T.IntegerType(), False))
    assert compatibility(BASE, new) == "forward"
    [c] = diff_schemas(BASE, new)
    assert c.change == "nullability" and not c.backward and c.forward


def test_nested_struct_recurses():
    old = T.StructType([
        T.StructField("meta", _s(("op", T.StringType(), True)), True)
    ])
    new = T.StructType([
        T.StructField("meta", _s(("op", T.StringType(), True),
                                 ("seq", T.LongType(), True)), True)
    ])
    [c] = diff_schemas(old, new)
    assert c.field == "meta.seq" and c.change == "added"
    assert compatibility(old, new) == "full"


def test_mixed_changes_combine_to_none():
    old = _s(("a", T.IntegerType(), True), ("b", T.DoubleType(), True))
    new = _s(("a", T.DoubleType(), True), ("b", T.IntegerType(), True))
    # widening (backward-only) + narrowing (forward-only) -> neither holds
    assert compatibility(old, new) == "none"
