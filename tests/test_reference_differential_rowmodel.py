"""Hypothesis differential for the ROW MODEL and the merge-row kernel vs
the reference's own code: random rows/fragments (adversarial unicode
values, vote lists, metadata fields) are run through BOTH the reference
pydantic implementation (tablevalidate.schema.Row, tablemerge's
fragments_builder / agreement / fragment_transformer) and our plain-dict
engine, asserting identical outputs. This machine-checks the parity the
hand-ported suites assert by example."""

from __future__ import annotations

import sys
import types
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
    from paper2table_ray.functions.text import ascii_fold

    if "unidecode" not in sys.modules:
        uni = types.ModuleType("unidecode")
        uni.unidecode = ascii_fold
        sys.modules["unidecode"] = uni
    if "spacy" not in sys.modules:
        spacy = types.ModuleType("spacy")
        lang_mod = types.ModuleType("spacy.language")

        class Language:
            pass

        lang_mod.Language = Language
        spacy.language = lang_mod
        spacy.load = lambda *a, **k: None
        sys.modules["spacy"] = spacy
        sys.modules["spacy.language"] = lang_mod

    sys.path.insert(0, str(REF_SRC))
    try:
        import tablemerge.agreement as agreement
        import tablemerge.analyzers as analyzers
        import tablemerge.fragment_transformer as ft
        import tablemerge.fragments_builder as fb
        import tablemerge.tablesfile_merger as tm
        from tablevalidate.schema import Row, TableFragment
    finally:
        sys.path.remove(str(REF_SRC))
    return types.SimpleNamespace(
        Row=Row,
        TableFragment=TableFragment,
        fb=fb,
        tm=tm,
        ft=ft,
        agreement=agreement,
        analyzers=analyzers,
    )


# --- strategies --------------------------------------------------------------

VALUE_TEXT = st.one_of(
    st.text(max_size=20),
    st.sampled_from(
        [
            "No Data",
            " none ",
            "NOT identified",
            "Table 1. Foo",
            "1. Apiaceae",
            "2. Rosaceae",
            "  UPPER  case ",
            "café–bar",
            "“quoted”",
            "",
            "x…",
        ]
    ),
)
COL_NAME = st.sampled_from(["family", "status", "0", "1", "notes", "scientific_name"])
VWA = st.builds(
    lambda v, a: {"value": v, "agreement_level": a},
    VALUE_TEXT,
    st.integers(1, 4),
)
CELL = st.one_of(st.none(), VALUE_TEXT, st.lists(VWA, max_size=3))
CELLS = st.dictionaries(COL_NAME, CELL, max_size=5)
ROW = st.builds(
    lambda cells, agreement, sources, row_idx: {
        "cells": cells,
        "agreement_level": agreement,
        "sources": sources,
        "row_idx": row_idx,
    },
    CELLS,
    st.one_of(st.none(), st.integers(1, 5)),
    st.one_of(st.none(), st.lists(st.sampled_from(["u1", "u2", "u3"]), max_size=3)),
    st.one_of(st.none(), st.integers(0, 9)),
)
FRAGMENT = st.builds(
    lambda rows, page: {"rows": rows, "page": page},
    st.lists(ROW, max_size=6),
    st.integers(1, 4),
)


def _to_ref_row(ref, row):
    return ref.Row(
        agreement_level_=row["agreement_level"],
        sources_=row["sources"],
        row_=row["row_idx"],
        **row["cells"],
    )


def _from_ref_row(ref_row) -> dict:
    cells = {}
    for col, val in ref_row.get_columns().items():
        if isinstance(val, list):
            cells[col] = [
                {"value": v.value, "agreement_level": v.agreement_level} for v in val
            ]
        else:
            cells[col] = val
    return {
        "cells": cells,
        "agreement_level": ref_row.agreement_level_,
        "sources": ref_row.sources_,
        "row_idx": ref_row.row_,
    }


def _to_ref_fragment(ref, frag):
    return ref.TableFragment(
        rows=[_to_ref_row(ref, r) for r in frag["rows"]], page=frag["page"]
    )


def _from_ref_fragment(ref_frag) -> dict:
    return {
        "rows": [_from_ref_row(r) for r in ref_frag.rows],
        "page": ref_frag.page,
    }


# --- row model ----------------------------------------------------------------


@settings(max_examples=300, deadline=None)
@given(ROW, st.booleans())
def test_normalize_row_differential(ref, row, row_agreement):
    from paper2table_ray import rowmodel as rm

    theirs = _from_ref_row(_to_ref_row(ref, row).normalize(row_agreement))
    assert rm.normalize_row(row, row_agreement) == theirs


@settings(max_examples=300, deadline=None)
@given(ROW)
def test_row_is_empty_differential(ref, row):
    from paper2table_ray import rowmodel as rm

    assert rm.row_is_empty(row) == _to_ref_row(ref, row).is_empty()


@settings(max_examples=200, deadline=None)
@given(st.lists(ROW, max_size=5))
def test_column_names_differential(ref, rows):
    from paper2table_ray import rowmodel as rm

    theirs = ref.Row.column_names([_to_ref_row(ref, r) for r in rows])
    assert rm.column_names(rows) == theirs


@settings(max_examples=300, deadline=None)
@given(ROW, ROW)
def test_same_row_differential(ref, left, right):
    from paper2table_ray import rowmodel as rm

    theirs = ref.tm.same_row(_to_ref_row(ref, left), _to_ref_row(ref, right))
    assert rm.same_row(left, right) == theirs


# --- agreement + merge_rows ---------------------------------------------------


@settings(max_examples=300, deadline=None)
@given(ROW, ROW)
def test_distinct_readers_agreement_differential(ref, left, right):
    from paper2table_ray.stages.merge import DistinctReadersAgreement

    readers = {"u1": "pdfplumber", "u2": "agent", "u3": "pymupdf"}
    theirs = ref.agreement.DistinctReadersAgreement(readers).calculate_level(
        _to_ref_row(ref, left), _to_ref_row(ref, right)
    )
    assert DistinctReadersAgreement(readers).calculate_level(left, right) == theirs


@settings(max_examples=300, deadline=None)
@given(ROW, ROW, st.booleans(), st.booleans())
def test_merge_rows_differential(ref, left, right, column_agreement, distinct):
    from paper2table_ray.stages.merge import (
        DistinctReadersAgreement,
        SimpleCountAgreement,
        merge_rows,
    )

    readers = {"u1": "pdfplumber", "u2": "agent"}
    if distinct:
        ours_agr = DistinctReadersAgreement(readers)
        ref_agr = ref.agreement.DistinctReadersAgreement(readers)
    else:
        ours_agr = SimpleCountAgreement()
        ref_agr = ref.agreement.SimpleCountAgreement()
    theirs = _from_ref_row(
        ref.fb.merge_rows(
            _to_ref_row(ref, left),
            _to_ref_row(ref, right),
            agreement=ref_agr,
            column_agreement=column_agreement,
        )
    )
    ours = merge_rows(
        left, right, agreement=ours_agr, column_agreement=column_agreement
    )
    assert ours == theirs


# --- fragment transformers ------------------------------------------------------


_TRANSFORMERS = [
    "FilterTitleRowsTransformer",
    "LeadingRowNumberTransformer",
    "NormalizePunctuationTransformer",
    "FilterEmptyRowsTransformer",
]


@settings(max_examples=200, deadline=None)
@given(FRAGMENT, st.sampled_from(_TRANSFORMERS))
def test_fragment_transformer_differential(ref, frag, name):
    import paper2table_ray.stages.transformers as T

    theirs = _from_ref_fragment(
        getattr(ref.ft, name)().transform_fragment(_to_ref_fragment(ref, frag))
    )
    ours = getattr(T, name)().transform_fragment(frag)
    assert ours == theirs


@settings(max_examples=200, deadline=None)
@given(FRAGMENT, st.lists(st.sampled_from(["family", "status"]), max_size=2))
def test_filter_header_rows_differential(ref, frag, hints):
    import paper2table_ray.stages.transformers as T

    theirs = _from_ref_fragment(
        ref.ft.FilterHeaderRowsTransformer(hints).transform_fragment(
            _to_ref_fragment(ref, frag)
        )
    )
    ours = T.FilterHeaderRowsTransformer(hints).transform_fragment(frag)
    assert ours == theirs


# --- jaccard merge-time analyzer -------------------------------------------------


@settings(max_examples=200, deadline=None)
@given(
    st.lists(ROW, max_size=5),
    st.lists(ROW, max_size=5),
)
def test_jaccard_analyzer_differential(ref, left_rows, right_rows):
    from paper2table_ray.stages.aligners import JaccardMergeTimeAnalyzer
    from paper2table_ray import rowmodel as rm

    left_cols = rm.column_names(left_rows)
    right_cols = rm.column_names(right_rows)
    theirs = ref.analyzers.JaccardMergeTimeAnalyzer(0.5).build_mapping(
        left_cols,
        right_cols,
        [_to_ref_row(ref, r) for r in left_rows],
        [_to_ref_row(ref, r) for r in right_rows],
    )
    ours = JaccardMergeTimeAnalyzer(0.5).build_mapping(
        left_cols, right_cols, left_rows, right_rows
    )
    assert ours == theirs


# --- load-time aligner chain (normalizer + hints + alias accumulate/rechain) --


HINT_WORDS = st.lists(
    st.sampled_from(["family", "status", "scientific_name", "notes"]),
    max_size=3,
    unique=True,
)
ALIASES = st.dictionaries(
    st.sampled_from(["0", "1", "notes", "Family Name"]),
    st.sampled_from(["family", "status", "<remove>"]),
    max_size=3,
)
MESSY_COL = st.sampled_from(
    ["family", "Family Name", "0", "1", "STATUS!!", "scientific_name", "notes"]
)
MESSY_CELLS = st.dictionaries(MESSY_COL, CELL, max_size=5)
MESSY_ROW = st.builds(
    lambda cells: {"cells": cells, "agreement_level": None, "sources": None, "row_idx": None},
    MESSY_CELLS,
)
MESSY_FRAGMENT = st.builds(
    lambda rows, page: {"rows": rows, "page": page},
    st.lists(MESSY_ROW, max_size=6),
    st.integers(1, 3),
)


@settings(max_examples=200, deadline=None)
@given(MESSY_FRAGMENT, HINT_WORDS, ALIASES, st.booleans())
def test_load_time_aligner_chain_differential(ref, frag, hints, aliases, safe):
    """The full load-time analyzer chain — always-on column-name
    normalizer, hints (safe/unsafe), alias (incl. <remove>) — with the
    accumulate/re-chain mapping fold and collision-concat rename
    (columns_aligner.py:23-95)."""
    import paper2table_ray.stages.aligners as A

    sys.path.insert(0, str(REF_SRC))
    try:
        import tablemerge.analyzers as ref_an
        import tablemerge.columns_aligner as ref_ca
    finally:
        sys.path.remove(str(REF_SRC))

    ref_chain = [ref_an.ColumnNamesNormalizerLoadTimeAnalyzer()]
    our_chain = [A.ColumnNamesNormalizerLoadTimeAnalyzer()]
    if hints:
        ref_chain.append(ref_an.HintsLoadTimeAnalyzer(hints, safe=safe))
        our_chain.append(A.HintsLoadTimeAnalyzer(hints, safe=safe))
    if aliases:
        ref_chain.append(ref_an.AliasLoadTimeAnalyzer(aliases))
        our_chain.append(A.AliasLoadTimeAnalyzer(aliases))

    ref_aligner = ref_ca.LoadTimeColumnAligner(
        _to_ref_fragment(ref, frag), ref_chain
    )
    our_aligner = A.LoadTimeColumnAligner(frag, our_chain)
    assert our_aligner.mapping == ref_aligner.mapping
    for row in frag["rows"]:
        theirs = _from_ref_row(ref_aligner.rename_row(_to_ref_row(ref, row)))
        assert our_aligner.rename_row(row) == theirs
