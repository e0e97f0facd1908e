"""Property test (SURVEY.md §5.2 #3): split(envelope(T)) == T for adversarial
payloads — unicode, JSON metacharacters, NULLs, empty strings, extreme
numerics — through the REAL wire path (to_json → from_json → split).
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

# Full-gate-only for the same budget reason as test_properties.py.
pytestmark = pytest.mark.slow

from split_kinesis_streams_with_glue_spark.envelope import wrap
from split_kinesis_streams_with_glue_spark.operators.split import split_one
from split_kinesis_streams_with_glue_spark.sources.memory import json_roundtrip

# strings that historically break JSON pipelines: quotes, backslashes,
# newlines, unicode (CJK, emoji, RTL), control-ish whitespace
_text = st.one_of(
    st.none(),
    st.text(
        alphabet=st.characters(
            codec="utf-8", exclude_categories=("Cs",), include_characters='"\\\n\t{}[],:'
        ),
        max_size=40,
    ),
)
_num = st.one_of(
    st.none(),
    st.integers(min_value=-(2**62), max_value=2**62),
)
_flt = st.one_of(
    st.none(),
    st.floats(allow_nan=False, allow_infinity=False, width=64),
)

_rows = st.lists(
    st.tuples(st.integers(min_value=0, max_value=2**31), _text, _num, _flt),
    min_size=1,
    max_size=25,
    unique_by=lambda r: r[0],
)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=_rows)
def test_wire_roundtrip_preserves_rows(spark, rows):
    df = spark.createDataFrame(rows, "pk long, s string, i long, d double")
    # prune=False: column pruning (schema emergence) is deliberately lossy
    # for never-observed columns; the wire-fidelity property needs the raw
    # parse. (Hypothesis found this with an all-NULL single-row example.)
    back = split_one(
        json_roundtrip(wrap(df, "prop_table")),
        "prop_table",
        keep_timestamp=False,
        prune=False,
    )
    got = sorted(map(tuple, back.collect()))
    want = sorted(map(tuple, df.collect()))
    assert got == want
