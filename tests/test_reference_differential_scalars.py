"""Hypothesis differential for the scalar normalization functions vs the
reference's OWN utils (pure Python, zero external deps — imported
directly from /root/reference/src): every M1–M9 scalar we claim
behavioral parity for is property-checked against the real
implementation over adversarial unicode, not just the hand-ported parity
matrix."""

from __future__ import annotations

import sys
from pathlib import Path

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

REF_SRC = Path("/root/reference/src")

pytestmark = pytest.mark.skipif(
    not REF_SRC.exists(), reason="reference checkout unavailable"
)


@pytest.fixture(scope="module")
def ref():
    import types

    sys.path.insert(0, str(REF_SRC))
    try:
        from paper2table.page_range import parse_page_range
        from utils.coerce import coerce_str
        from utils.column_names import normalize_column_name
        from utils.column_values import normalize_column_value
        from utils.str import normalize_str
        from utils.tokenize_schema import tokenize_schema
    finally:
        sys.path.remove(str(REF_SRC))
    return types.SimpleNamespace(
        normalize_str=normalize_str,
        normalize_column_name=normalize_column_name,
        normalize_column_value=normalize_column_value,
        coerce_str=coerce_str,
        tokenize_schema=tokenize_schema,
        parse_page_range=parse_page_range,
    )


# adversarial text: full unicode incl. control chars, cid escapes, the
# seven dash variants, no-data phrases, mixed whitespace
TEXT = st.one_of(
    st.text(max_size=60),
    st.text(
        alphabet=st.sampled_from(
            list("aA1 _-\t\n\r\x00\x7f\x85\xa0–—−‐‑‒―…“”é×ñüßÆ日本�")
        ),
        max_size=40,
    ),
    st.builds(lambda a, b: f"{a}(cid:{b}){a}", st.text(max_size=8), st.integers(0, 400)),
    st.sampled_from(["No Data", " none ", "NOT identified", "Table 1."]),
)


@settings(max_examples=400, deadline=None)
@given(TEXT)
def test_normalize_str_differential(ref, value):
    from paper2table_ray.functions.text import normalize_str

    assert normalize_str(value) == ref.normalize_str(value)


@settings(max_examples=400, deadline=None)
@given(TEXT)
def test_normalize_column_name_differential(ref, value):
    from paper2table_ray.functions.text import normalize_column_name

    assert normalize_column_name(value) == ref.normalize_column_name(value)


def test_normalize_column_name_none(ref):
    from paper2table_ray.functions.text import normalize_column_name

    assert normalize_column_name(None) == ref.normalize_column_name(None)


@settings(max_examples=400, deadline=None)
@given(TEXT)
def test_normalize_column_value_differential(ref, value):
    from paper2table_ray.functions.text import normalize_column_value

    assert normalize_column_value(value) == ref.normalize_column_value(value)


@settings(max_examples=300, deadline=None)
@given(
    st.one_of(
        TEXT,
        st.sampled_from(
            ["3.0", "3.9", "-0", "1e3", "TRUE", "off", "Yes", "nan", "inf", "0x10", " 2 "]
        ),
    ),
    st.sampled_from([str, int, float, bool]),
)
def test_coerce_str_differential(ref, value, target):
    """Outcome parity including exceptions: both sides raise
    OverflowError on e.g. ('inf', int) — the reference's except clause
    catches only ValueError/TypeError, and so does ours."""
    from paper2table_ray.functions.text import coerce_str

    def outcome(fn):
        try:
            return ("ok", fn(value, target))
        except Exception as e:
            return ("raise", type(e).__name__)

    assert outcome(coerce_str) == outcome(ref.coerce_str)


@settings(max_examples=300, deadline=None)
@given(
    st.text(
        alphabet=st.sampled_from(list("ab c,#\n\t_12:")),
        max_size=50,
    )
)
def test_tokenize_schema_differential(ref, value):
    from paper2table_ray.functions.text import tokenize_schema

    assert tokenize_schema(value) == ref.tokenize_schema(value)


@settings(max_examples=300, deadline=None)
@given(
    st.one_of(
        st.text(alphabet=st.sampled_from(list("ab/.:123")), max_size=30),
        st.builds(
            lambda p, a, b: f"{p}:{a}:{b}",
            st.text(alphabet=st.sampled_from(list("ab/.")), min_size=1, max_size=10),
            st.integers(0, 99),
            st.integers(0, 99),
        ),
    )
)
def test_parse_page_range_differential(ref, value):
    from paper2table_ray.functions.text import parse_page_range

    assert parse_page_range(value) == ref.parse_page_range(value)


@settings(max_examples=200, deadline=None)
@given(st.one_of(TEXT, st.sampled_from(["1", "2.5", "-3", "1e2", "nan", "col", ""])))
def test_is_semantic_column_differential(value):
    """Row.is_semantic_column (schema.py:44-49): float-parse rejection."""
    sys.path.insert(0, str(REF_SRC))
    try:
        from tablevalidate.schema import Row as RefRow
    finally:
        sys.path.remove(str(REF_SRC))
    from paper2table_ray.functions.text import is_semantic_column

    assert is_semantic_column(value) == RefRow.is_semantic_column(value)
