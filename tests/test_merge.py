"""Merge-engine parity tests, translated from the reference's
tests/test_merge.py key cases (cited per test)."""

import pytest

from paper2table_ray import rowmodel as rm
from paper2table_ray.stages.aligners import JaccardMergeTimeAnalyzer
from paper2table_ray.stages.merge import (
    DistinctReadersAgreement,
    MergeError,
    SimpleCountAgreement,
    merge_rows,
    merge_tablesfiles,
)


def R(_agreement=None, _sources=None, _row=None, **cells):
    return rm.make_row(cells, agreement_level=_agreement, sources=_sources, row_idx=_row)


def wrap(rows, page=1, citation="", uuid=None):
    return {
        "tables": [{"fragments": [{"rows": rows, "page": page}]}],
        "citation": citation,
        "uuid": uuid,
    }


def rows_of(result, table=0, fragment=0):
    return result["tables"][table]["fragments"][fragment]["rows"]


def test_empty_tables_list():  # ref test_merge.py:51
    with pytest.raises(MergeError):
        merge_tablesfiles([])


def test_single_table_returns_normalized():  # ref :56
    result = merge_tablesfiles(
        [wrap([R(family=" Apiaceae ", scientific_name="Ammi majus L.")])]
    )
    assert rows_of(result) == [
        R(family="apiaceae", scientific_name="ammi majus l.", _agreement=1, _row=0)
    ]


def test_two_identical_tables():  # ref :86
    table = [R(family="Apiaceae", scientific_name="Ammi majus L.")]
    result = merge_tablesfiles([wrap(table), wrap(table)])
    assert rows_of(result) == [
        R(family="apiaceae", scientific_name="ammi majus l.", _agreement=2, _row=0)
    ]


def test_jaccard_alignment_merges_numeric_columns():  # ref :133
    table_1 = [R(family=" Apiaceae ", scientific_name=" Ammi majus L. ")]
    table_2 = [R(**{"0": "apiaceae", "1": "ammi majus l."})]
    result = merge_tablesfiles(
        [wrap(table_1), wrap(table_2)], analyzers=[JaccardMergeTimeAnalyzer()]
    )
    assert rows_of(result) == [
        R(family="apiaceae", scientific_name="ammi majus l.", _agreement=2, _row=0)
    ]


def test_no_alignment_keeps_both():  # ref :150
    table_1 = [R(family=" Apiaceae ", scientific_name=" Ammi majus L. ")]
    table_2 = [R(**{"0": "apiaceae", "1": "ammi majus l."})]
    result = merge_tablesfiles([wrap(table_1), wrap(table_2)])
    assert rows_of(result) == [
        R(family="apiaceae", scientific_name="ammi majus l.", _agreement=1, _row=0),
        R(_agreement=1, _row=0, **{"0": "apiaceae", "1": "ammi majus l."}),
    ]


def test_different_pages_make_fragments():  # ref :196
    result = merge_tablesfiles(
        [
            wrap([R(family="Apiaceae", scientific_name="Ammi majus L.")], page=1),
            wrap([R(family="Rosaceae", scientific_name="Rosa canina L.")], page=2),
        ]
    )
    frags = result["tables"][0]["fragments"]
    assert [f["page"] for f in frags] == [1, 2]
    assert frags[0]["rows"] == [
        R(family="apiaceae", scientific_name="ammi majus l.", _agreement=1, _row=0)
    ]
    assert frags[1]["rows"] == [
        R(family="rosaceae", scientific_name="rosa canina l.", _agreement=1, _row=0)
    ]


def test_fragments_ordered_by_page():  # ref :226
    result = merge_tablesfiles(
        [
            wrap([R(family="Apiaceae")], page=5),
            wrap([R(family="Rosaceae")], page=3),
        ]
    )
    frags = result["tables"][0]["fragments"]
    assert [f["page"] for f in frags] == [3, 5]


def test_two_fragments_on_same_page_stay_separate():  # ref :296
    paper_a = {
        "tables": [
            {
                "fragments": [
                    {"rows": [R(family="Apiaceae", scientific_name="Ammi majus L.")], "page": 1},
                    {"rows": [R(family="Rosaceae", scientific_name="Rosa canina L.")], "page": 1},
                ]
            }
        ],
        "citation": "",
        "uuid": None,
    }
    paper_b = wrap([R(family="Apiaceae", scientific_name="Ammi majus L.")], page=1)
    result = merge_tablesfiles([paper_a, paper_b])
    frags = result["tables"][0]["fragments"]
    assert len(frags) == 2
    assert frags[0]["rows"] == [
        R(family="apiaceae", scientific_name="ammi majus l.", _agreement=2, _row=0)
    ]
    assert frags[1]["rows"] == [
        R(family="rosaceae", scientific_name="rosa canina l.", _agreement=1, _row=0)
    ]


def test_mixed_values_cursor_merge():  # ref :338
    table_1 = [R(family="Apiaceae", scientific_name="Ammi majus L.")]
    table_2 = [
        R(family="Apiaceae", scientific_name="Ammi majus L."),
        R(family="Rosaceae", scientific_name="Rosa canina L."),
    ]
    result = merge_tablesfiles([wrap(table_1), wrap(table_2)])
    assert rows_of(result) == [
        R(family="apiaceae", scientific_name="ammi majus l.", _agreement=2, _row=0),
        R(family="rosaceae", scientific_name="rosa canina l.", _agreement=1, _row=1),
    ]


def test_three_tables_overlapped():  # ref :390
    t1 = [R(family="Apiaceae", scientific_name="Ammi majus L.")]
    t2 = [
        R(family="Apiaceae", scientific_name="Ammi majus L."),
        R(family="Rosaceae", scientific_name="Rosa canina L."),
    ]
    t3 = [
        R(family="Rosaceae", scientific_name="Rosa canina L."),
        R(family="Lamiaceae", scientific_name="Mentha spicata L."),
    ]
    result = merge_tablesfiles([wrap(t1), wrap(t2), wrap(t3)])
    assert rows_of(result) == [
        R(family="apiaceae", scientific_name="ammi majus l.", _agreement=2, _row=0),
        R(family="rosaceae", scientific_name="rosa canina l.", _agreement=1, _row=0),
        R(family="rosaceae", scientific_name="rosa canina l.", _agreement=1, _row=1),
        R(family="lamiaceae", scientific_name="mentha spicata l.", _agreement=1, _row=1),
    ]


def test_three_tables_conflicting():  # ref :432
    t1 = [R(family="Apiaceae", scientific_name="Ammi majus L.")]
    t2 = [
        R(family="Apiaceae", scientific_name="Ammi majus L."),
        R(family="Rosaceae", scientific_name="Rosa canina L."),
    ]
    t3 = [
        R(family="Apiaceae", scientific_name="Ammi"),
        R(family="Rosaceae", scientific_name="Rosa canina L."),
        R(family="Lamiaceae", scientific_name="Mentha spicata L."),
    ]
    result = merge_tablesfiles([wrap(t1), wrap(t2), wrap(t3)])
    assert rows_of(result) == [
        R(family="apiaceae", scientific_name="ammi majus l.", _agreement=2, _row=0),
        R(family="apiaceae", scientific_name="ammi", _agreement=1, _row=0),
        R(family="rosaceae", scientific_name="rosa canina l.", _agreement=2, _row=1),
        R(family="lamiaceae", scientific_name="mentha spicata l.", _agreement=1, _row=2),
    ]


def test_unicode_variant_values_merge():  # ref :763
    result = merge_tablesfiles(
        [wrap([R(name="Ångström")]), wrap([R(name="angstrom")])]
    )
    # transliterated comparison matches; left value wins
    assert rows_of(result)[0]["agreement_level"] == 2


def test_sources_stamping():  # ref :701-786
    result = merge_tablesfiles([wrap([R(a="x")], uuid="u1")])
    assert rows_of(result)[0]["sources"] == ["u1"]

    result = merge_tablesfiles(
        [wrap([R(a="x")], uuid="u1"), wrap([R(a="x")], uuid="u2")]
    )
    assert rows_of(result)[0]["sources"] == ["u1", "u2"]

    result = merge_tablesfiles(
        [wrap([R(a="x")], uuid="u1"), wrap([R(a="y")], uuid="u2")]
    )
    assert rows_of(result)[0]["sources"] == ["u1"]
    assert rows_of(result)[1]["sources"] == ["u2"]

    result = merge_tablesfiles([wrap([R(a="x")]), wrap([R(a="x")])])
    assert rows_of(result)[0]["sources"] is None


def test_column_agreement_same_rows():  # ref :660
    result = merge_tablesfiles(
        [wrap([R(a="X")]), wrap([R(a="x")])], column_agreement=True
    )
    assert rows_of(result)[0]["cells"]["a"] == [rm.vwa("x", 2)]


def test_column_agreement_different_rows():  # ref :680
    # different rows don't merge, so values stay plain strings
    result = merge_tablesfiles(
        [wrap([R(a="x")]), wrap([R(a="y")])], column_agreement=True
    )
    assert rows_of(result)[0]["cells"]["a"] == "x"
    assert rows_of(result)[1]["cells"]["a"] == "y"


def test_merge_filters_empty_rows():  # ref :842-880
    result = merge_tablesfiles(
        [wrap([R(a=""), R(a="x"), R(a="  "), R(a="no data")])]
    )
    assert rows_of(result) == [R(a="x", _agreement=1, _row=1)]


def test_merge_rows_column_union():
    merged = merge_rows(R(a="x", b="1"), R(a="x", c="2"))
    assert merged["cells"] == {"a": "x", "c": "2", "b": "1"}
    assert merged["agreement_level"] == 2


def test_distinct_readers_agreement():  # ref :998-1021
    ag = DistinctReadersAgreement({"u1": "pdfplumber", "u2": "camelot"})
    left = R(a="x", _sources=["u1"])
    right = R(a="x", _sources=["u2"])
    assert ag.calculate_level(left, right) == 2

    ag_same = DistinctReadersAgreement({"u1": "pdfplumber", "u2": "pdfplumber"})
    assert ag_same.calculate_level(left, right) == 1

    ag_agents = DistinctReadersAgreement({"u1": "agent", "u2": "agent-x"})
    assert ag_agents.calculate_level(left, right) == 2

    ag_hybrid = DistinctReadersAgreement({"u1": "hybrid-pdfplumber", "u2": "hybrid-pdfplumber"})
    assert ag_hybrid.calculate_level(left, right) == 1


def test_page_offsets_align_fragments():
    # paper B's pages are shifted by +1 relative to paper A
    result = merge_tablesfiles(
        [
            wrap([R(a="x")], page=2),
            wrap([R(a="x")], page=1),
        ],
        page_offsets=[0, 1],
    )
    frags = result["tables"][0]["fragments"]
    assert len(frags) == 1
    assert frags[0]["rows"][0]["agreement_level"] == 2


def test_simple_count_accumulates():  # ref :580 shape
    t = [R(a="x")]
    result = merge_tablesfiles([wrap(t), wrap(t), wrap(t)])
    assert rows_of(result)[0]["agreement_level"] == 3
    assert isinstance(SimpleCountAgreement().calculate_level(R(a="x"), R(a="x")), int)
