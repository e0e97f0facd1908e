"""Schema-compatibility classification — the gate before applying drift.

The CDC merge path tolerates schema drift mechanically (``mergeSchema`` +
``allowMissingColumns`` null-fill, streaming/cdc_merge.py), but "tolerates"
is not "should": a production pipeline wants to CLASSIFY an incoming
schema change before letting it through — the contract check a schema
registry performs. This module implements the standard compatibility
lattice over Spark ``StructType``s:

- **backward**: new readers handle old data — satisfied by ADDING nullable
  fields or WIDENING numerics (every old record still parses).
- **forward**: old readers handle new data — satisfied by DROPPING
  nullable fields (old readers ignore what they never select) or widening
  in reverse never (a narrow reader cannot hold wide data).
- **full**: both; **none**: a type change with no lossless direction, a
  dropped required field, or a nullability tightening.

Everything is driver-side metadata over the two StructTypes — no jobs, no
data reads; nested structs classify recursively. The verdict feeds the
policy decision: ``full``/``backward`` auto-apply, anything else pages a
human (or fails the batch, the cdc_merge default for incompatible drift).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import types as T

from split_kinesis_streams_with_glue_spark.schema.choices import _NUMERIC_WIDTH

_WIDTH = {cls().simpleString(): i for i, cls in enumerate(_NUMERIC_WIDTH)}


@dataclass
class FieldChange:
    field: str
    change: str  # added | dropped | widened | narrowed | retyped | nullability
    detail: str
    backward: bool  # new schema can read data written with the old one
    forward: bool  # old schema can read data written with the new one


def _is_widening(old: T.DataType, new: T.DataType) -> bool:
    so, sn = old.simpleString(), new.simpleString()
    return so in _WIDTH and sn in _WIDTH and _WIDTH[sn] > _WIDTH[so]


def diff_schemas(
    old: T.StructType, new: T.StructType, prefix: str = ""
) -> list[FieldChange]:
    """Every field-level change between two schemas, each tagged with its
    backward/forward compatibility contribution. Nested structs recurse;
    unchanged fields produce no entry."""
    changes: list[FieldChange] = []
    old_fields = {f.name: f for f in old.fields}
    new_fields = {f.name: f for f in new.fields}
    for name, nf in new_fields.items():
        path = f"{prefix}{name}"
        if name not in old_fields:
            changes.append(
                FieldChange(
                    path,
                    "added",
                    nf.dataType.simpleString(),
                    backward=nf.nullable,  # old data null-fills IF nullable
                    forward=True,  # old readers ignore unknown fields
                )
            )
            continue
        of = old_fields[name]
        ot, nt = of.dataType, nf.dataType
        if isinstance(ot, T.StructType) and isinstance(nt, T.StructType):
            changes.extend(diff_schemas(ot, nt, prefix=f"{path}."))
        elif ot.simpleString() != nt.simpleString():
            if _is_widening(ot, nt):
                changes.append(
                    FieldChange(
                        path,
                        "widened",
                        f"{ot.simpleString()} -> {nt.simpleString()}",
                        backward=True,  # every old value fits the wide type
                        forward=False,  # wide values overflow the old type
                    )
                )
            elif _is_widening(nt, ot):
                changes.append(
                    FieldChange(
                        path,
                        "narrowed",
                        f"{ot.simpleString()} -> {nt.simpleString()}",
                        backward=False,
                        forward=True,
                    )
                )
            else:
                changes.append(
                    FieldChange(
                        path,
                        "retyped",
                        f"{ot.simpleString()} -> {nt.simpleString()}",
                        backward=False,
                        forward=False,
                    )
                )
        if of.nullable and not nf.nullable:
            changes.append(
                FieldChange(
                    path,
                    "nullability",
                    "nullable -> required",
                    backward=False,  # old data may hold nulls the new contract bans
                    forward=True,
                )
            )
        elif nf.nullable and not of.nullable:
            changes.append(
                FieldChange(
                    path,
                    "nullability",
                    "required -> nullable",
                    backward=True,  # old data is all non-null; new readers fine
                    forward=False,  # old readers hold a non-null contract yet
                    # may now receive nulls
                )
            )
    for name, of in old_fields.items():
        if name not in new_fields:
            changes.append(
                FieldChange(
                    f"{prefix}{name}",
                    "dropped",
                    of.dataType.simpleString(),
                    backward=True,  # new readers simply don't select it
                    forward=of.nullable,  # old readers need it nullable
                )
            )
    return changes


def compatibility(old: T.StructType, new: T.StructType) -> str:
    """'full' | 'backward' | 'forward' | 'none' — the registry-style
    verdict: AND over every change's direction flags."""
    changes = diff_schemas(old, new)
    backward = all(c.backward for c in changes)
    forward = all(c.forward for c in changes)
    if backward and forward:
        return "full"
    if backward:
        return "backward"
    if forward:
        return "forward"
    return "none"
