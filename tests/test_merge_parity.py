"""Behavioral-parity port of the reference's merge test corpus.

Every test here is a translation of a case in
/root/reference/tests/test_merge.py (cited per test block) onto our
plain-dict row model (rowmodel.py) and merge engine (stages/merge.py).
The reference's pydantic ``Row(family=..., agreement_level_=, sources_=,
row_=)`` becomes ``R(family=..., _level=, _sources=, _row=)``; assertion
granularity (full row-list equality) is preserved.
"""

from __future__ import annotations

import pytest

from paper2table_ray import rowmodel as rm
from paper2table_ray.stages.aligners import JaccardMergeTimeAnalyzer
from paper2table_ray.stages.merge import (
    DistinctReadersAgreement,
    MergeError,
    SimpleCountAgreement,
    merge_rows,
    merge_tablesfiles,
    to_values_with_agreement,
)


def R(_level=None, _sources=None, _row=None, **cells):
    """Reference ``Row(**cells, agreement_level_=, sources_=, row_=)``."""
    return rm.make_row(
        dict(cells), agreement_level=_level, sources=_sources, row_idx=_row
    )


def V(value, level):
    """Reference ``ValueWithAgreement``."""
    return rm.vwa(value, level)


def wrap(rows, page=1, citation="", uuid=None):
    """tests/test_merge.py:42-49."""
    return {
        "tables": [{"fragments": [{"rows": rows, "page": page}]}],
        "citation": citation,
        "uuid": uuid,
    }


def tf(fragments, citation="", uuid=None):
    """Multi-fragment TablesFile."""
    return {
        "tables": [{"fragments": fragments}],
        "citation": citation,
        "uuid": uuid,
    }


def frags(result, t=0):
    return result["tables"][t]["fragments"]


def rows(result, t=0, f=0):
    return frags(result, t)[f]["rows"]


# --- core merge (test_merge.py:51-659) --------------------------------------


def test_empty_tables_list():
    with pytest.raises(MergeError):
        merge_tablesfiles([])


def test_single_table_returns_normalized():
    table = [R(family=" Apiaceae ", scientific_name="Ammi majus L.")]
    result = merge_tablesfiles([wrap(table)])
    assert len(result["tables"]) == 1
    assert rows(result) == [
        R(family="apiaceae", scientific_name="ammi majus l.", _level=1, _row=0)
    ]


def test_single_table_with_row_agreement():
    table = [R(family=" Apiaceae ", scientific_name="Ammi majus L.")]
    result = merge_tablesfiles([wrap(table)], agreement=SimpleCountAgreement())
    assert rows(result) == [
        R(family="apiaceae", scientific_name="ammi majus l.", _level=1, _row=0)
    ]


def test_two_identical_tables():
    table = [R(family="Apiaceae", scientific_name="Ammi majus L.")]
    result = merge_tablesfiles([wrap(table), wrap(table)])
    assert rows(result) == [
        R(family="apiaceae", scientific_name="ammi majus l.", _level=2, _row=0)
    ]


def test_two_identical_tables_with_row_agreement():
    table = [R(family="Apiaceae", scientific_name="Ammi majus L.")]
    result = merge_tablesfiles(
        [wrap(table), wrap(table)], agreement=SimpleCountAgreement()
    )
    assert rows(result) == [
        R(family="apiaceae", scientific_name="ammi majus l.", _level=2, _row=0)
    ]


def test_two_tables_with_non_normalized_columns():
    t1 = [R(family=" Apiaceae ", scientific_name=" Ammi majus L. ")]
    t2 = [R(family="apiaceae", scientific_name="ammi majus l.")]
    result = merge_tablesfiles([wrap(t1), wrap(t2)])
    assert rows(result) == [
        R(family="apiaceae", scientific_name="ammi majus l.", _level=2, _row=0)
    ]


def test_two_tables_with_different_column_names_and_alignment():
    t1 = [R(family=" Apiaceae ", scientific_name=" Ammi majus L. ")]
    t2 = [R(**{"0": "apiaceae", "1": "ammi majus l."})]
    result = merge_tablesfiles(
        [wrap(t1), wrap(t2)], analyzers=[JaccardMergeTimeAnalyzer()]
    )
    assert rows(result) == [
        R(family="apiaceae", scientific_name="ammi majus l.", _level=2, _row=0)
    ]


def test_two_tables_with_different_column_names_and_no_alignment():
    t1 = [R(family=" Apiaceae ", scientific_name=" Ammi majus L. ")]
    t2 = [R(**{"0": "apiaceae", "1": "ammi majus l."})]
    result = merge_tablesfiles([wrap(t1), wrap(t2)], agreement=SimpleCountAgreement())
    assert rows(result) == [
        R(family="apiaceae", scientific_name="ammi majus l.", _level=1, _row=0),
        R(_level=1, _sources=None, _row=0, **{"0": "apiaceae", "1": "ammi majus l."}),
    ]


def test_two_tables_with_different_values():
    t1 = [R(family="Apiaceae", scientific_name="Ammi majus L.")]
    t2 = [R(family="Rosaceae", scientific_name="Rosa canina L.")]
    result = merge_tablesfiles([wrap(t1), wrap(t2)])
    assert rows(result) == [
        R(family="apiaceae", scientific_name="ammi majus l.", _level=1, _row=0),
        R(family="rosaceae", scientific_name="rosa canina l.", _level=1, _row=0),
    ]


def test_two_tablesfiles_with_different_pages():
    t1 = [R(family="Apiaceae", scientific_name="Ammi majus L.")]
    t2 = [R(family="Rosaceae", scientific_name="Rosa canina L.")]
    result = merge_tablesfiles([wrap(t1, page=1), wrap(t2, page=2)])
    assert len(result["tables"]) == 1
    assert frags(result)[0]["page"] == 1
    assert rows(result, f=0) == [
        R(family="apiaceae", scientific_name="ammi majus l.", _level=1, _row=0)
    ]
    assert frags(result)[1]["page"] == 2
    assert rows(result, f=1) == [
        R(family="rosaceae", scientific_name="rosa canina l.", _level=1, _row=0)
    ]


def test_fragments_are_ordered_by_page_when_tablesfiles_cover_different_pages():
    on5 = [R(family="Apiaceae", scientific_name="Ammi majus L.")]
    on3 = [R(family="Rosaceae", scientific_name="Rosa canina L.")]
    result = merge_tablesfiles([wrap(on5, page=5), wrap(on3, page=3)])
    assert frags(result)[0]["page"] == 3
    assert rows(result, f=0) == [
        R(family="rosaceae", scientific_name="rosa canina l.", _level=1, _row=0)
    ]
    assert frags(result)[1]["page"] == 5
    assert rows(result, f=1) == [
        R(family="apiaceae", scientific_name="ammi majus l.", _level=1, _row=0)
    ]


def test_fragment_with_no_counterpart_page_stays_solo():
    paper_a = tf(
        [
            {"rows": [R(family="Apiaceae", scientific_name="Ammi majus L.")], "page": 1},
            {"rows": [R(family="Rosaceae", scientific_name="Rosa canina L.")], "page": 2},
        ]
    )
    paper_b = wrap([R(family="Apiaceae", scientific_name="Ammi majus L.")], page=1)
    result = merge_tablesfiles([paper_a, paper_b])
    assert frags(result)[0]["page"] == 1
    assert rows(result, f=0) == [
        R(family="apiaceae", scientific_name="ammi majus l.", _level=2, _row=0)
    ]
    assert frags(result)[1]["page"] == 2
    assert rows(result, f=1) == [
        R(family="rosaceae", scientific_name="rosa canina l.", _level=1, _row=0)
    ]


def test_two_fragments_on_same_page_stay_separate():
    paper_a = tf(
        [
            {"rows": [R(family="Apiaceae", scientific_name="Ammi majus L.")], "page": 1},
            {"rows": [R(family="Rosaceae", scientific_name="Rosa canina L.")], "page": 1},
        ]
    )
    paper_b = wrap([R(family="Apiaceae", scientific_name="Ammi majus L.")], page=1)
    result = merge_tablesfiles([paper_a, paper_b])
    assert frags(result)[0]["page"] == 1
    assert rows(result, f=0) == [
        R(family="apiaceae", scientific_name="ammi majus l.", _level=2, _row=0)
    ]
    assert frags(result)[1]["page"] == 1
    assert rows(result, f=1) == [
        R(family="rosaceae", scientific_name="rosa canina l.", _level=1, _row=0)
    ]


def test_two_tables_with_mixed_values():
    t1 = [R(family="Apiaceae", scientific_name="Ammi majus L.")]
    t2 = [
        R(family="Apiaceae", scientific_name="Ammi majus L."),
        R(family="Rosaceae", scientific_name="Rosa canina L."),
    ]
    result = merge_tablesfiles([wrap(t1), wrap(t2)])
    assert rows(result) == [
        R(family="apiaceae", scientific_name="ammi majus l.", _level=2, _row=0),
        R(family="rosaceae", scientific_name="rosa canina l.", _level=1, _row=1),
    ]


def test_three_tables_with_different_values():
    t1 = [R(family="Apiaceae", scientific_name="Ammi majus L.")]
    t2 = [R(family="Rosaceae", scientific_name="Rosa canina L.")]
    t3 = [R(family="Lamiaceae", scientific_name="Mentha spicata L.")]
    result = merge_tablesfiles([wrap(t1), wrap(t2), wrap(t3)])
    assert rows(result) == [
        R(family="apiaceae", scientific_name="ammi majus l.", _level=1, _row=0),
        R(family="rosaceae", scientific_name="rosa canina l.", _level=1, _row=0),
        R(family="lamiaceae", scientific_name="mentha spicata l.", _level=1, _row=0),
    ]


def test_three_tables_with_overlapped_mixed_values():
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
    assert rows(result) == [
        R(family="apiaceae", scientific_name="ammi majus l.", _level=2, _row=0),
        R(family="rosaceae", scientific_name="rosa canina l.", _level=1, _row=0),
        R(family="rosaceae", scientific_name="rosa canina l.", _level=1, _row=1),
        R(family="lamiaceae", scientific_name="mentha spicata l.", _level=1, _row=1),
    ]


def test_three_tables_with_conflicting_values_without_row_agreement_level():
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
    assert rows(result) == [
        R(family="apiaceae", scientific_name="ammi majus l.", _level=2, _row=0),
        R(family="apiaceae", scientific_name="ammi", _level=1, _row=0),
        R(family="rosaceae", scientific_name="rosa canina l.", _level=2, _row=1),
        R(family="lamiaceae", scientific_name="mentha spicata l.", _level=1, _row=2),
    ]


def test_two_tables_with_conflicting_values_and_wrong_first_without_row_agreement_level():
    t1 = [
        R(family="Apiaceae", scientific_name="Ammi"),
        R(family="Rosaceae", scientific_name="Rosa canina L."),
        R(family="Lamiaceae", scientific_name="Mentha spicata L."),
    ]
    t2 = [R(family="Apiaceae", scientific_name="Ammi majus L.")]
    result = merge_tablesfiles([wrap(t1), wrap(t2)])
    assert rows(result) == [
        R(family="apiaceae", scientific_name="ammi", _level=1, _row=0),
        R(family="apiaceae", scientific_name="ammi majus l.", _level=1, _row=0),
        R(family="rosaceae", scientific_name="rosa canina l.", _level=1, _row=1),
        R(family="lamiaceae", scientific_name="mentha spicata l.", _level=1, _row=2),
    ]


def test_three_tables_with_conflicting_values_and_wrong_first_without_row_agreement_level():
    t1 = [
        R(family="Apiaceae", scientific_name="Ammi"),
        R(family="Rosaceae", scientific_name="Rosa canina L."),
        R(family="Lamiaceae", scientific_name="Mentha spicata L."),
    ]
    t2 = [R(family="Apiaceae", scientific_name="Ammi majus L.")]
    t3 = [
        R(family="Apiaceae", scientific_name="Ammi majus L."),
        R(family="Rosaceae", scientific_name="Rosa canina L."),
    ]
    result = merge_tablesfiles([wrap(t1), wrap(t2), wrap(t3)])
    assert rows(result) == [
        R(family="apiaceae", scientific_name="ammi", _level=1, _row=0),
        R(family="apiaceae", scientific_name="ammi majus l.", _level=2, _row=0),
        R(family="rosaceae", scientific_name="rosa canina l.", _level=2, _row=1),
        R(family="lamiaceae", scientific_name="mentha spicata l.", _level=1, _row=2),
    ]


def test_three_tables_with_conflicting_values_and_wrong_in_the_middle_without_row_agreement_level():
    t1 = [R(family="Apiaceae", scientific_name="Ammi majus L.")]
    t2 = [
        R(family="Apiaceae", scientific_name="Ammi"),
        R(family="Rosaceae", scientific_name="Rosa canina L."),
        R(family="Lamiaceae", scientific_name="Mentha spicata L."),
    ]
    t3 = [
        R(family="Apiaceae", scientific_name="Ammi majus L."),
        R(family="Rosaceae", scientific_name="Rosa canina L."),
    ]
    result = merge_tablesfiles([wrap(t1), wrap(t2), wrap(t3)])
    assert rows(result) == [
        R(family="apiaceae", scientific_name="ammi majus l.", _level=2, _row=0),
        R(family="apiaceae", scientific_name="ammi", _level=1, _row=0),
        R(family="rosaceae", scientific_name="rosa canina l.", _level=2, _row=1),
        R(family="lamiaceae", scientific_name="mentha spicata l.", _level=1, _row=2),
    ]


def test_three_tables_with_conflicting_values_with_row_agreement_level():
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
    result = merge_tablesfiles(
        [wrap(t1), wrap(t2), wrap(t3)], agreement=SimpleCountAgreement()
    )
    assert rows(result) == [
        R(family="apiaceae", scientific_name="ammi majus l.", _level=2, _row=0),
        R(family="apiaceae", scientific_name="ammi", _level=1, _row=0),
        R(family="rosaceae", scientific_name="rosa canina l.", _level=2, _row=1),
        R(family="lamiaceae", scientific_name="mentha spicata l.", _level=1, _row=2),
    ]


def test_merge_same_rows_with_column_agreement():
    assert merge_rows(
        R(family="rosaceae", scientific_name="rosa canina"),
        R(family="rosaceae", scientific_name="rosa canina"),
        column_agreement=True,
    ) == R(
        family=[V("rosaceae", 2)],
        scientific_name=[V("rosa canina", 2)],
        _level=2,
    )


def test_merge_different_rows_with_column_agreement():
    assert merge_rows(
        R(family="rosaceae", scientific_name="rosa canina l."),
        R(family="rosaceae", scientific_name="rosa canina"),
        column_agreement=True,
    ) == R(
        family=[V("rosaceae", 2)],
        scientific_name=[V("rosa canina l.", 1), V("rosa canina", 1)],
        _level=2,
    )


def test_merge_different_rows_that_already_have_agreement_with_column_agreement():
    assert merge_rows(
        R(
            family=[V("rosaceae", 2)],
            scientific_name=[V("rosa canina l.", 1), V("rosa canina", 1)],
        ),
        R(family="rosaceae", scientific_name="rosa canina"),
        column_agreement=True,
    ) == R(
        family=[V("rosaceae", 3)],
        scientific_name=[V("rosa canina l.", 1), V("rosa canina", 2)],
        _level=2,
    )


# --- sources (test_merge.py:701-810) ----------------------------------------


def test_sources_stamped_on_single_tablesfile():
    table = [R(family="Apiaceae", scientific_name="Ammi majus L.")]
    result = merge_tablesfiles([wrap(table, uuid="uuid-a")])
    assert rows(result)[0]["sources"] == ["uuid-a"]


def test_sources_merged_on_matched_rows():
    table = [R(family="Apiaceae", scientific_name="Ammi majus L.")]
    result = merge_tablesfiles([wrap(table, uuid="uuid-a"), wrap(table, uuid="uuid-b")])
    assert rows(result)[0]["sources"] == ["uuid-a", "uuid-b"]


def test_sources_only_left_uuid_on_unmatched_left_row():
    t1 = [R(family="Apiaceae", scientific_name="Ammi majus L.")]
    t2 = [R(family="Rosaceae", scientific_name="Rosa canina L.")]
    result = merge_tablesfiles([wrap(t1, uuid="uuid-a"), wrap(t2, uuid="uuid-b")])
    assert rows(result)[0]["sources"] == ["uuid-a"]
    assert rows(result)[1]["sources"] == ["uuid-b"]


def test_sources_right_uuid_on_skipped_row():
    t1 = [R(family="Apiaceae", scientific_name="Ammi majus L.")]
    t2 = [
        R(family="Rosaceae", scientific_name="Rosa canina L."),
        R(family="Apiaceae", scientific_name="Ammi majus L."),
    ]
    result = merge_tablesfiles([wrap(t1, uuid="uuid-a"), wrap(t2, uuid="uuid-b")])
    assert rows(result) == [
        R(
            family="apiaceae",
            scientific_name="ammi majus l.",
            _level=1,
            _sources=["uuid-a"],
            _row=0,
        ),
        R(
            family="rosaceae",
            scientific_name="rosa canina l.",
            _level=1,
            _sources=["uuid-b"],
            _row=0,
        ),
        R(
            family="apiaceae",
            scientific_name="ammi majus l.",
            _level=1,
            _sources=["uuid-b"],
            _row=1,
        ),
    ]


def test_two_tables_with_unicode_variant_values():
    # look the same but are different ñ (composed vs decomposed)
    t1 = [R(common_name="pezuña de vaca")]
    t2 = [R(common_name="pezuña de vaca")]
    result = merge_tablesfiles([wrap(t1), wrap(t2)])
    assert rows(result) == [R(common_name="pezuña de vaca", _level=2, _row=0)]


def test_sources_deduped_when_same_uuid_appears_twice():
    table = [R(family="Apiaceae", scientific_name="Ammi majus L.")]
    result = merge_tablesfiles([wrap(table, uuid="uuid-a"), wrap(table, uuid="uuid-a")])
    assert rows(result)[0]["sources"] == ["uuid-a"]


def test_sources_none_when_no_uuid_on_tablesfiles():
    table = [R(family="Apiaceae", scientific_name="Ammi majus L.")]
    result = merge_tablesfiles([wrap(table), wrap(table)])
    assert rows(result)[0]["sources"] is None


# --- is_empty_row (test_merge.py:812-880) ------------------------------------


def test_is_empty_row_all_empty_strings():
    assert rm.row_is_empty(R(family="", scientific_name=""))


def test_is_empty_row_whitespace_only():
    assert rm.row_is_empty(R(family="  ", scientific_name="\t"))


def test_is_empty_row_none_values():
    assert rm.row_is_empty(R(family=None, scientific_name=None))


def test_is_empty_row_metadata_fields_ignored():
    assert rm.row_is_empty(R(family="", _level=2, _sources=["abc"]))


def test_is_empty_row_not_empty_when_has_data():
    assert not rm.row_is_empty(R(family="Apiaceae", scientific_name=""))


def test_is_empty_row_value_with_agreement_all_empty():
    assert rm.row_is_empty(R(family=[V("", 1)]))


def test_is_empty_row_value_with_agreement_has_data():
    assert not rm.row_is_empty(R(family=[V("Apiaceae", 1)]))


def test_merge_filters_empty_rows_from_single_table():
    table = [R(family="Apiaceae", scientific_name=""), R(family="", scientific_name="")]
    got = rows(merge_tablesfiles([wrap(table)]))
    assert len(got) == 1
    assert got[0]["cells"]["family"] == "apiaceae"


def test_merge_filters_whitespace_only_rows():
    table = [
        R(family="  ", scientific_name="\n"),
        R(family="Rosaceae", scientific_name="Rosa"),
    ]
    got = rows(merge_tablesfiles([wrap(table)]))
    assert len(got) == 1
    assert got[0]["cells"]["family"] == "rosaceae"


def test_merge_filters_empty_rows_from_two_tables():
    t1 = [R(family="Apiaceae"), R(family="")]
    t2 = [R(family="Apiaceae"), R(family="")]
    got = rows(merge_tablesfiles([wrap(t1), wrap(t2)]))
    assert len(got) == 1
    assert got[0]["cells"]["family"] == "apiaceae"


def test_merge_keeps_rows_with_partial_data():
    table = [R(family="Apiaceae", scientific_name=""), R(family="", scientific_name="")]
    assert len(rows(merge_tablesfiles([wrap(table)]))) == 1


# --- semantic / empty columns (test_merge.py:883-945) ------------------------


def test_is_semantic_column():
    from paper2table_ray.functions.text import is_semantic_column

    assert not is_semantic_column("1")
    assert not is_semantic_column("2023")
    assert not is_semantic_column("3.14")
    assert not is_semantic_column("-5")
    assert is_semantic_column("family")
    assert is_semantic_column("1a")
    assert is_semantic_column("")


def test_filter_semantic_columns_removes_numeric():
    from paper2table_ray.stages.transformers import filter_semantic_columns

    table = [R(**{"family": "Apiaceae", "1": "yes", "2023": "data"})]
    filtered = filter_semantic_columns(merge_tablesfiles([wrap(table)]))
    got = rows(filtered)
    assert len(got) == 1
    assert got[0]["cells"] == {"family": "apiaceae"}


def test_filter_semantic_columns_keeps_all_if_no_numeric():
    from paper2table_ray.stages.transformers import filter_semantic_columns

    table = [R(family="Apiaceae", scientific_name="Ammi majus")]
    filtered = filter_semantic_columns(merge_tablesfiles([wrap(table)]))
    got = rows(filtered)
    assert len(got) == 1
    assert set(got[0]["cells"]) == {"family", "scientific_name"}


def test_drop_empty_columns_removes_all_null_column():
    from paper2table_ray.stages.transformers import drop_empty_columns

    table = [
        R(**{"family": "Apiaceae", "0": None, "1": "value"}),
        R(**{"family": "Rosaceae", "0": None, "1": "other"}),
    ]
    dropped = drop_empty_columns(merge_tablesfiles([wrap(table)]))
    assert rows(dropped) == [
        R(family="apiaceae", **{"1": "value"}, _level=1, _row=0),
        R(family="rosaceae", **{"1": "other"}, _level=1, _row=1),
    ]


def test_drop_empty_columns_keeps_column_with_any_value():
    from paper2table_ray.stages.transformers import drop_empty_columns

    table = [
        R(**{"family": "Apiaceae", "0": None}),
        R(**{"family": "Rosaceae", "0": "has_value"}),
    ]
    dropped = drop_empty_columns(merge_tablesfiles([wrap(table)]))
    assert rows(dropped) == [
        R(family="apiaceae", **{"0": None}, _level=1, _row=0),
        R(family="rosaceae", **{"0": "has_value"}, _level=1, _row=1),
    ]


def test_drop_empty_columns_drops_empty_semantic_columns():
    from paper2table_ray.stages.transformers import drop_empty_columns

    table = [R(family=None, scientific_name="Ammi majus")]
    dropped = drop_empty_columns(merge_tablesfiles([wrap(table)]))
    assert rows(dropped) == [R(scientific_name="ammi majus", _level=1, _row=0)]


# --- is_title_row (test_merge.py:947-996) ------------------------------------


def _title(row):
    from paper2table_ray.stages.transformers import FilterTitleRowsTransformer

    return FilterTitleRowsTransformer().is_title_row(row)


def test_is_title_row_detects_figure_prefix():
    assert _title(R(**{"0": "Figure 1. Species table"}))


def test_is_title_row_detects_fig_dot_prefix():
    assert _title(R(**{"0": "Fig.3 caption"}))


def test_is_title_row_detects_fig_dot_with_space():
    assert _title(R(**{"0": "fig. 2"}))


def test_is_title_row_detects_table_prefix():
    assert _title(R(**{"0": "TABLE 3"}))


def test_is_title_row_detects_figura_prefix():
    assert _title(R(**{"0": "Figura 2. Tabla de especies"}))


def test_is_title_row_detects_tabla_prefix():
    assert _title(R(**{"0": "tabla 5"}))


def test_is_title_row_false_when_multiple_non_empty_columns_dont_form_title():
    assert not _title(R(**{"family": "Apiaceae", "scientific_name": "Rosa canina"}))


def test_is_title_row_detects_split_title_across_columns():
    assert _title(
        R(
            **{
                "family": "Table 1: List of med",
                "scientific_name": "icinal s",
                "common_name": "pecies and us",
                "notes": "es with their",
            }
        )
    )


def test_is_title_row_false_when_value_does_not_match():
    assert not _title(R(**{"0": "Apiaceae"}))


# --- DistinctReadersAgreement (test_merge.py:998-1097) -----------------------


def test_distinct_readers_agreement_two_different_non_agent_readers():
    agreement = DistinctReadersAgreement({"uuid-1": "pdfplumber", "uuid-2": "camelot"})
    assert (
        agreement.calculate_level(
            R(family="apiaceae", _sources=["uuid-1"]),
            R(family="apiaceae", _sources=["uuid-2"]),
        )
        == 2
    )


def test_distinct_readers_agreement_same_non_agent_reader():
    agreement = DistinctReadersAgreement(
        {"uuid-1": "pdfplumber", "uuid-2": "pdfplumber"}
    )
    assert (
        agreement.calculate_level(
            R(family="apiaceae", _sources=["uuid-1"]),
            R(family="apiaceae", _sources=["uuid-2"]),
        )
        == 1
    )


def test_distinct_readers_agreement_two_agent_readers():
    agreement = DistinctReadersAgreement({"uuid-1": "gemini", "uuid-2": "openai"})
    assert (
        agreement.calculate_level(
            R(family="apiaceae", _sources=["uuid-1"]),
            R(family="apiaceae", _sources=["uuid-2"]),
        )
        == 2
    )


def test_distinct_readers_agreement_agent_and_non_agent():
    agreement = DistinctReadersAgreement({"uuid-1": "pdfplumber", "uuid-2": "gemini"})
    assert (
        agreement.calculate_level(
            R(family="apiaceae", _sources=["uuid-1"]),
            R(family="apiaceae", _sources=["uuid-2"]),
        )
        == 2
    )


def test_distinct_readers_agreement_no_sources():
    agreement = DistinctReadersAgreement({})
    assert (
        agreement.calculate_level(R(family="apiaceae"), R(family="apiaceae")) == 1
    )


def test_distinct_readers_agreement_unknown_uuid_counts_as_agent():
    agreement = DistinctReadersAgreement({})
    assert (
        agreement.calculate_level(
            R(family="apiaceae", _sources=["unknown-uuid"]), R(family="apiaceae")
        )
        == 1
    )


def test_merge_two_tables_distinct_non_agent_readers():
    table = [R(family="Apiaceae", scientific_name="Ammi majus L.")]
    agreement = DistinctReadersAgreement({"uuid-1": "pdfplumber", "uuid-2": "camelot"})
    result = merge_tablesfiles(
        [wrap(table, uuid="uuid-1"), wrap(table, uuid="uuid-2")], agreement=agreement
    )
    assert rows(result) == [
        R(
            family="apiaceae",
            scientific_name="ammi majus l.",
            _level=2,
            _sources=["uuid-1", "uuid-2"],
            _row=0,
        )
    ]


def test_merge_two_tables_same_non_agent_reader():
    table = [R(family="Apiaceae", scientific_name="Ammi majus L.")]
    agreement = DistinctReadersAgreement(
        {"uuid-1": "pdfplumber", "uuid-2": "pdfplumber"}
    )
    result = merge_tablesfiles(
        [wrap(table, uuid="uuid-1"), wrap(table, uuid="uuid-2")], agreement=agreement
    )
    assert rows(result) == [
        R(
            family="apiaceae",
            scientific_name="ammi majus l.",
            _level=1,
            _sources=["uuid-1", "uuid-2"],
            _row=0,
        )
    ]


def test_merge_two_tables_agent_and_non_agent_reader():
    table = [R(family="Apiaceae", scientific_name="Ammi majus L.")]
    agreement = DistinctReadersAgreement({"uuid-1": "pdfplumber", "uuid-2": "gemini"})
    result = merge_tablesfiles(
        [wrap(table, uuid="uuid-1"), wrap(table, uuid="uuid-2")], agreement=agreement
    )
    assert rows(result) == [
        R(
            family="apiaceae",
            scientific_name="ammi majus l.",
            _level=2,
            _sources=["uuid-1", "uuid-2"],
            _row=0,
        )
    ]


# --- merge-time alignment multi-row (test_merge.py:1098-1257) ----------------


def test_merge_aligns_right_numeric_columns_multiple_rows():
    t1 = [
        R(family="Apiaceae", scientific_name="Ammi majus L."),
        R(family="Rosaceae", scientific_name="Rosa canina L."),
        R(family="Lamiaceae", scientific_name="Mentha spicata L."),
    ]
    t2 = [
        R(**{"0": "Apiaceae", "1": "Ammi majus L."}),
        R(**{"0": "Rosaceae", "1": "Rosa canina L."}),
        R(**{"0": "Betulaceae", "1": "Betula pendula L."}),
    ]
    result = merge_tablesfiles(
        [wrap(t1), wrap(t2)], analyzers=[JaccardMergeTimeAnalyzer()]
    )
    assert rows(result) == [
        R(family="apiaceae", scientific_name="ammi majus l.", _level=2, _row=0),
        R(family="rosaceae", scientific_name="rosa canina l.", _level=2, _row=1),
        R(family="lamiaceae", scientific_name="mentha spicata l.", _level=1, _row=2),
        R(family="betulaceae", scientific_name="betula pendula l.", _level=1, _row=2),
    ]


def test_merge_aligns_right_numeric_columns_with_agreement_multiple_rows():
    t1 = [
        R(family="Apiaceae", scientific_name="Ammi majus L."),
        R(family="Rosaceae", scientific_name="Rosa canina L."),
        R(family="Lamiaceae", scientific_name="Mentha spicata L."),
    ]
    t2 = [
        R(**{"0": "Apiaceae", "1": "Ammi majus L."}),
        R(**{"0": "Rosaceae", "1": "Rosa canina L."}),
        R(**{"0": "Betulaceae", "1": "Betula pendula L."}),
    ]
    result = merge_tablesfiles(
        [wrap(t1), wrap(t2)],
        agreement=SimpleCountAgreement(),
        analyzers=[JaccardMergeTimeAnalyzer()],
    )
    assert rows(result) == [
        R(family="apiaceae", scientific_name="ammi majus l.", _level=2, _row=0),
        R(family="rosaceae", scientific_name="rosa canina l.", _level=2, _row=1),
        R(family="lamiaceae", scientific_name="mentha spicata l.", _level=1, _row=2),
        R(family="betulaceae", scientific_name="betula pendula l.", _level=1, _row=2),
    ]


def test_merge_aligns_left_numeric_columns_multiple_rows():
    t1 = [
        R(**{"0": "Apiaceae", "1": "Ammi majus L."}),
        R(**{"0": "Rosaceae", "1": "Rosa canina L."}),
        R(**{"0": "Betulaceae", "1": "Betula pendula L."}),
    ]
    t2 = [
        R(family="Apiaceae", scientific_name="Ammi majus L."),
        R(family="Rosaceae", scientific_name="Rosa canina L."),
        R(family="Lamiaceae", scientific_name="Mentha spicata L."),
    ]
    result = merge_tablesfiles(
        [wrap(t1), wrap(t2)], analyzers=[JaccardMergeTimeAnalyzer()]
    )
    assert rows(result) == [
        R(family="apiaceae", scientific_name="ammi majus l.", _level=2, _row=0),
        R(family="rosaceae", scientific_name="rosa canina l.", _level=2, _row=1),
        R(family="betulaceae", scientific_name="betula pendula l.", _level=1, _row=2),
        R(family="lamiaceae", scientific_name="mentha spicata l.", _level=1, _row=2),
    ]


def test_merge_no_alignment_both_semantic_multiple_rows():
    t1 = [
        R(family="Apiaceae", scientific_name="Ammi majus L."),
        R(family="Rosaceae", scientific_name="Rosa canina L."),
    ]
    t2 = [
        R(family="Apiaceae", scientific_name="Ammi majus L."),
        R(family="Lamiaceae", scientific_name="Mentha spicata L."),
    ]
    result = merge_tablesfiles([wrap(t1), wrap(t2)])
    assert rows(result) == [
        R(family="apiaceae", scientific_name="ammi majus l.", _level=2, _row=0),
        R(family="rosaceae", scientific_name="rosa canina l.", _level=1, _row=1),
        R(family="lamiaceae", scientific_name="mentha spicata l.", _level=1, _row=1),
    ]


# --- is_header_row / filter_header_rows (test_merge.py:1258-1386) ------------


def _hdr(row, hints=[]):
    from paper2table_ray.stages.transformers import is_header_row

    return is_header_row(row, hints)


def test_is_header_row_all_values_match_columns():
    assert _hdr(R(family="family", scientific_name="scientific_name"))


def test_is_header_row_case_insensitive():
    assert _hdr(R(family="Family", scientific_name="Scientific_Name"))


def test_is_header_row_with_extra_whitespace():
    assert _hdr(R(family="  family  ", scientific_name=" scientific_name "))


def test_is_header_row_true_when_one_value_matches():
    assert _hdr(R(family="Apiaceae", scientific_name="scientific_name"))


def test_is_header_row_false_when_no_value_matches():
    assert not _hdr(R(family="Apiaceae", scientific_name="Ammi majus L."))


def test_is_header_row_false_when_only_numeric_column_matches():
    assert not _hdr(R(**{"0": "0", "1": "1"}))


def test_is_header_row_true_when_semantic_column_matches_alongside_numeric():
    assert _hdr(R(**{"0": "0", "family": "family"}))


def test_is_header_row_false_when_all_empty():
    assert not _hdr(R(family="", scientific_name=""))


def test_is_header_row_with_empty_cells_ignores_them():
    assert _hdr(R(family="family", scientific_name=""))


def test_is_header_row_value_with_agreement_matches():
    assert _hdr(R(family=[V("family", 1)]))


def test_is_header_row_value_with_agreement_does_not_match():
    assert not _hdr(R(family=[V("Apiaceae", 1)]))


def test_is_header_row_value_with_agreement_all_empty():
    assert not _hdr(R(family=[V("", 1)]))


def _filter_headers(result, hints=[]):
    from paper2table_ray.stages.transformers import filter_header_rows_tablesfile

    return filter_header_rows_tablesfile(result, hints)


def test_filter_header_rows_removes_header_row():
    table = [
        R(family="family", scientific_name="scientific_name"),
        R(family="Apiaceae", scientific_name="Ammi majus L."),
    ]
    filtered = _filter_headers(merge_tablesfiles([wrap(table)]))
    assert rows(filtered) == [
        R(family="apiaceae", scientific_name="ammi majus l.", _level=1, _row=1)
    ]


def test_filter_header_rows_keeps_data_rows():
    table = [R(family="Apiaceae", scientific_name="Ammi majus L.")]
    filtered = _filter_headers(merge_tablesfiles([wrap(table)]))
    assert rows(filtered) == [
        R(family="apiaceae", scientific_name="ammi majus l.", _level=1, _row=0)
    ]


def test_filter_header_rows_with_partial_empty_cells():
    table = [
        R(family="family", scientific_name=""),
        R(family="Apiaceae", scientific_name="Ammi majus L."),
    ]
    filtered = _filter_headers(merge_tablesfiles([wrap(table)]))
    assert rows(filtered) == [
        R(family="apiaceae", scientific_name="ammi majus l.", _level=1, _row=1)
    ]


def test_filter_header_rows_removes_row_when_semantic_column_matches_alongside_non_matching_numeric():
    table = [
        R(**{"family": "family", "scientific_name": "Ammi majus", "0": "some_value"}),
        R(**{"family": "Apiaceae", "scientific_name": "Ammi majus L.", "0": "123"}),
    ]
    filtered = _filter_headers(merge_tablesfiles([wrap(table)]))
    assert rows(filtered) == [
        R(
            **{"family": "apiaceae", "scientific_name": "ammi majus l.", "0": "123"},
            _level=1,
            _row=1,
        )
    ]


def test_filter_header_rows_preserves_citation_and_metadata():
    result = merge_tablesfiles([wrap([R(family="Apiaceae")], citation="some citation")])
    assert _filter_headers(result)["citation"] == "some citation"


# --- normalize_citation (test_merge.py:1388-1434) ----------------------------


def _norm_cit(c):
    from paper2table_ray.stages.merge import _normalize_citation

    return _normalize_citation(c)


def test_normalize_citation_none():
    assert _norm_cit(None) is None


def test_normalize_citation_str_collapses_whitespace():
    assert _norm_cit("Perez  et  al.  2020") == "Perez et al. 2020"


def test_normalize_citation_str_strips_edges():
    assert _norm_cit("  Perez 2020  ") == "Perez 2020"


def test_normalize_citation_str_en_dash():
    assert _norm_cit("Perez–Vílchez, 2020") == "Perez-Vílchez, 2020"


def test_normalize_citation_str_em_dash():
    assert _norm_cit("Perez—Vílchez, 2020") == "Perez-Vílchez, 2020"


def test_normalize_citation_str_preserves_case():
    assert _norm_cit("Perez Et Al. 2020") == "Perez Et Al. 2020"


def test_normalize_citation_list():
    citation = [V("Perez  2020", 2), V("Vílchez–Lopez 2021", 1)]
    assert _norm_cit(citation) == [
        V("Perez 2020", 2),
        V("Vílchez-Lopez 2021", 1),
    ]


def test_merge_tablesfiles_normalizes_citation_whitespace():
    result = merge_tablesfiles(
        [wrap([R(family="Apiaceae")], citation="Perez  et  al.  2020")]
    )
    assert result["citation"] == "Perez et al. 2020"


def test_merge_tablesfiles_normalizes_citation_dashes():
    result = merge_tablesfiles(
        [wrap([R(family="Apiaceae")], citation="Perez–Vílchez, 2020")]
    )
    assert result["citation"] == "Perez-Vílchez, 2020"


# --- loader align + aliases (test_merge.py:1435-1548) ------------------------


def align_tablesfile(tablesfile, analyzers=[]):
    """Reference TablesFileLoader.align_tablesfile (tablesfile_loader.py:
    14-25, 70-90): normalizer always first, then the given load-time
    analyzers, applied per fragment."""
    from paper2table_ray.stages.aligners import (
        ColumnNamesNormalizerLoadTimeAnalyzer,
        LoadTimeColumnAligner,
    )

    chain = [ColumnNamesNormalizerLoadTimeAnalyzer()] + list(analyzers)
    tables = []
    for table in tablesfile["tables"]:
        fragments = []
        for frag in table["fragments"]:
            aligner = LoadTimeColumnAligner(frag, chain)
            if aligner.mapping:
                frag = {
                    "rows": [aligner.rename_row(r) for r in frag["rows"]],
                    "page": frag["page"],
                }
            fragments.append(frag)
        tables.append({"fragments": fragments})
    return {**tablesfile, "tables": tables}


def test_loader_normalizes_column_names():
    tablesfile = align_tablesfile(
        wrap([R(**{"Nombre vernáculo toba (Nombre criollo)": "menta"})])
    )
    result = merge_tablesfiles([tablesfile])
    assert rows(result) == [
        R(nombre_vernaculo_toba_nombre_criollo="menta", _level=1, _row=0)
    ]


def test_alias_applies_with_single_tablesfile():
    from paper2table_ray.stages.aligners import AliasLoadTimeAnalyzer

    tablesfile = align_tablesfile(
        wrap([R(familia="Apiaceae", scientific_name="Ammi majus L.")]),
        analyzers=[AliasLoadTimeAnalyzer({"familia": "family"})],
    )
    result = merge_tablesfiles([tablesfile])
    assert rows(result) == [
        R(family="apiaceae", scientific_name="ammi majus l.", _level=1, _row=0)
    ]


def test_alias_applies_to_left_only_page_in_multi_file_merge():
    from paper2table_ray.stages.aligners import AliasLoadTimeAnalyzer

    analyzers = [AliasLoadTimeAnalyzer({"familia": "family"})]
    table_a = align_tablesfile(
        wrap([R(familia="Apiaceae", scientific_name="Ammi majus L.")], page=1),
        analyzers=analyzers,
    )
    table_b = align_tablesfile(
        wrap([R(family="Rosaceae", scientific_name="Rosa canina L.")], page=2),
        analyzers=analyzers,
    )
    result = merge_tablesfiles([table_a, table_b])
    assert rows(result, f=0) == [
        R(family="apiaceae", scientific_name="ammi majus l.", _level=1, _row=0)
    ]


def test_alias_matches_by_normalized_column_name():
    from paper2table_ray.stages.aligners import AliasLoadTimeAnalyzer

    tablesfile = align_tablesfile(
        wrap(
            [
                R(
                    **{
                        "Nombre local": "Menta",
                        "PART USED": "leaves",
                        "scientific_name": "Mentha x piperita",
                    }
                )
            ]
        ),
        analyzers=[
            AliasLoadTimeAnalyzer(
                {"nombre_local": "nombre_vulgar", "part_used": "parte_usada"}
            )
        ],
    )
    result = merge_tablesfiles([tablesfile])
    assert rows(result) == [
        R(
            nombre_vulgar="menta",
            parte_usada="leaves",
            scientific_name="mentha x piperita",
            _level=1,
            _row=0,
        )
    ]


def test_sources_correct_when_middle_tablesfile_is_on_different_page():
    row = [R(family="Apiaceae", scientific_name="Ammi majus L.")]
    other = [R(family="Rosaceae", scientific_name="Rosa canina L.")]
    result = merge_tablesfiles(
        [
            wrap(row, page=1, uuid="uuid-a"),
            wrap(other, page=2, uuid="uuid-b"),
            wrap(row, page=1, uuid="uuid-c"),
        ]
    )
    assert rows(result, f=0) == [
        R(
            family="apiaceae",
            scientific_name="ammi majus l.",
            _level=2,
            _sources=["uuid-a", "uuid-c"],
            _row=0,
        )
    ]
    assert rows(result, f=1) == [
        R(
            family="rosaceae",
            scientific_name="rosa canina l.",
            _level=1,
            _sources=["uuid-b"],
            _row=0,
        )
    ]


# --- group_tablesfiles / paper aliases (test_merge.py:1550-1681) -------------


def test_group_tablesfiles_no_aliases(tmp_path):
    from paper2table_ray.sources.tablesfile_json import group_tablesfiles

    dir_a = tmp_path / "a"
    dir_a.mkdir()
    (dir_a / "paper.tables.json").write_text("{}")
    (dir_a / "other.tables.json").write_text("{}")
    assert group_tablesfiles([str(dir_a)], {}) == {
        "paper.tables.json": [(str(dir_a), "paper.tables.json", 0)],
        "other.tables.json": [(str(dir_a), "other.tables.json", 0)],
    }


def test_group_tablesfiles_alias_maps_to_canonical(tmp_path):
    from paper2table_ray.sources.tablesfile_json import group_tablesfiles

    dir_a = tmp_path / "a"
    dir_a.mkdir()
    (dir_a / "paper_v1.tables.json").write_text("{}")
    assert group_tablesfiles([str(dir_a)], {"paper_v1": ("paper", 0)}) == {
        "paper.tables.json": [(str(dir_a), "paper_v1.tables.json", 0)],
    }


def test_group_tablesfiles_merges_alias_and_canonical_across_dirs(tmp_path):
    from paper2table_ray.sources.tablesfile_json import group_tablesfiles

    dir_a, dir_b = tmp_path / "a", tmp_path / "b"
    dir_a.mkdir()
    dir_b.mkdir()
    (dir_a / "paper_v1.tables.json").write_text("{}")
    (dir_b / "paper.tables.json").write_text("{}")
    assert group_tablesfiles(
        [str(dir_a), str(dir_b)], {"paper_v1": ("paper", 0)}
    ) == {
        "paper.tables.json": [
            (str(dir_a), "paper_v1.tables.json", 0),
            (str(dir_b), "paper.tables.json", 0),
        ],
    }


def test_group_tablesfiles_mixed_aliased_and_plain(tmp_path):
    from paper2table_ray.sources.tablesfile_json import group_tablesfiles

    dir_a, dir_b = tmp_path / "a", tmp_path / "b"
    dir_a.mkdir()
    dir_b.mkdir()
    (dir_a / "paper_v1.tables.json").write_text("{}")
    (dir_b / "paper.tables.json").write_text("{}")
    (dir_b / "report.tables.json").write_text("{}")
    assert group_tablesfiles(
        [str(dir_a), str(dir_b)], {"paper_v1": ("paper", 0)}
    ) == {
        "paper.tables.json": [
            (str(dir_a), "paper_v1.tables.json", 0),
            (str(dir_b), "paper.tables.json", 0),
        ],
        "report.tables.json": [(str(dir_b), "report.tables.json", 0)],
    }


def test_group_tablesfiles_ignores_non_tablesfile(tmp_path):
    from paper2table_ray.sources.tablesfile_json import group_tablesfiles

    dir_a = tmp_path / "a"
    dir_a.mkdir()
    (dir_a / "paper.tables.json").write_text("{}")
    (dir_a / "tables.metadata.json").write_text("{}")
    (dir_a / "notes.txt").write_text("ignored")
    assert group_tablesfiles([str(dir_a)], {}) == {
        "paper.tables.json": [(str(dir_a), "paper.tables.json", 0)],
    }


def test_parse_paper_aliases_without_offset():
    from paper2table_ray.stages.aligners import parse_paper_aliases

    assert parse_paper_aliases("paper_v1:paper") == {"paper_v1": ("paper", 0)}


def test_parse_paper_aliases_with_offset():
    from paper2table_ray.stages.aligners import parse_paper_aliases

    assert parse_paper_aliases("x:y:3") == {"x": ("y", 3)}


def test_parse_paper_aliases_multiple_with_mixed_offsets():
    from paper2table_ray.stages.aligners import parse_paper_aliases

    assert parse_paper_aliases("x:y:3 a:b") == {"x": ("y", 3), "a": ("b", 0)}


def test_group_tablesfiles_alias_with_offset(tmp_path):
    from paper2table_ray.sources.tablesfile_json import group_tablesfiles

    dir_a, dir_b = tmp_path / "a", tmp_path / "b"
    dir_a.mkdir()
    dir_b.mkdir()
    (dir_a / "paper_v1.tables.json").write_text("{}")
    (dir_b / "paper.tables.json").write_text("{}")
    assert group_tablesfiles(
        [str(dir_a), str(dir_b)], {"paper_v1": ("paper", 3)}
    ) == {
        "paper.tables.json": [
            (str(dir_a), "paper_v1.tables.json", 3),
            (str(dir_b), "paper.tables.json", 0),
        ],
    }


def test_merge_tablesfiles_with_page_offset():
    rws = [R(family="Apiaceae", scientific_name="Ammi majus L.")]
    result = merge_tablesfiles(
        [wrap(rws, page=10), wrap(rws, page=13)], page_offsets=[3, 0]
    )
    assert len(result["tables"]) == 1
    assert len(frags(result)) == 1
    assert frags(result)[0]["page"] == 10
    assert rows(result) == [
        R(family="apiaceae", scientific_name="ammi majus l.", _level=2, _row=0)
    ]


# --- filter_groups_by_paper (test_merge.py:1683-1755) ------------------------


def _fgroups(groups, pat):
    from paper2table_ray.sources.tablesfile_json import filter_groups_by_paper

    return filter_groups_by_paper(groups, pat)


def test_filter_groups_by_paper_stem():
    groups = {
        "foo.tables.json": [("dir_a", "foo.tables.json", 0)],
        "bar.tables.json": [("dir_a", "bar.tables.json", 0)],
    }
    assert _fgroups(groups, "foo") == {
        "foo.tables.json": [("dir_a", "foo.tables.json", 0)]
    }


def test_filter_groups_by_paper_full_name():
    groups = {
        "foo.tables.json": [("dir_a", "foo.tables.json", 0)],
        "bar.tables.json": [("dir_a", "bar.tables.json", 0)],
    }
    assert _fgroups(groups, "foo.tables.json") == {
        "foo.tables.json": [("dir_a", "foo.tables.json", 0)]
    }


def test_filter_groups_by_paper_no_match():
    groups = {
        "foo.tables.json": [("dir_a", "foo.tables.json", 0)],
        "bar.tables.json": [("dir_a", "bar.tables.json", 0)],
    }
    assert _fgroups(groups, "baz") == {}


def test_filter_groups_by_paper_exact_does_not_match_longer_name():
    groups = {
        "foo.tables.json": [("dir_a", "foo.tables.json", 0)],
        "foobar.tables.json": [("dir_a", "foobar.tables.json", 0)],
    }
    assert _fgroups(groups, "foo") == {
        "foo.tables.json": [("dir_a", "foo.tables.json", 0)]
    }


def test_filter_groups_by_paper_wildcard_matches_exact_and_longer_name():
    groups = {
        "foo.tables.json": [("dir_a", "foo.tables.json", 0)],
        "foobar.tables.json": [("dir_a", "foobar.tables.json", 0)],
        "bar.tables.json": [("dir_a", "bar.tables.json", 0)],
    }
    assert _fgroups(groups, "foo.*") == {
        "foo.tables.json": [("dir_a", "foo.tables.json", 0)],
        "foobar.tables.json": [("dir_a", "foobar.tables.json", 0)],
    }


def test_filter_groups_by_paper_regexp_wildcard():
    groups = {
        "foo_v1.tables.json": [("dir_a", "foo_v1.tables.json", 0)],
        "foo_v2.tables.json": [("dir_a", "foo_v2.tables.json", 0)],
        "bar.tables.json": [("dir_a", "bar.tables.json", 0)],
    }
    assert _fgroups(groups, "foo.*") == {
        "foo_v1.tables.json": [("dir_a", "foo_v1.tables.json", 0)],
        "foo_v2.tables.json": [("dir_a", "foo_v2.tables.json", 0)],
    }


def test_filter_groups_by_paper_regexp_alternation():
    groups = {
        "foo.tables.json": [("dir_a", "foo.tables.json", 0)],
        "bar.tables.json": [("dir_a", "bar.tables.json", 0)],
        "baz.tables.json": [("dir_a", "baz.tables.json", 0)],
    }
    assert _fgroups(groups, "bar|baz") == {
        "bar.tables.json": [("dir_a", "bar.tables.json", 0)],
        "baz.tables.json": [("dir_a", "baz.tables.json", 0)],
    }


# --- header-value helpers (test_merge.py:1757-1857) --------------------------


def test_has_semantic_header_value_true_when_value_matches_column():
    from paper2table_ray.stages.transformers import has_semantic_header_value

    assert has_semantic_header_value(
        R(family="family", scientific_name="Ammi majus")
    )


def test_has_semantic_header_value_matches_accented_value_against_normalized_column():
    from paper2table_ray.stages.transformers import has_semantic_header_value

    assert has_semantic_header_value(
        R(categoria_de_uso="categoría de uso", chorote_total="chorote total")
    )


def test_has_semantic_header_value_false_when_no_match():
    from paper2table_ray.stages.transformers import has_semantic_header_value

    assert not has_semantic_header_value(
        R(family="Apiaceae", scientific_name="Ammi majus")
    )


def test_has_semantic_header_value_false_for_numeric_columns():
    from paper2table_ray.stages.transformers import has_semantic_header_value

    assert not has_semantic_header_value(R(**{"0": "0", "1": "1"}))


def test_has_hints_header_value_true_when_any_value_in_hints():
    from paper2table_ray.stages.transformers import has_hints_header_value

    assert has_hints_header_value(
        R(**{"0": "species", "1": "Apiaceae"}), {"species", "family"}
    )


def test_has_hints_header_value_false_when_no_value_in_hints():
    from paper2table_ray.stages.transformers import has_hints_header_value

    assert not has_hints_header_value(
        R(**{"0": "Ammi majus", "1": "Apiaceae"}), {"species", "family"}
    )


def test_has_hints_header_value_includes_semantic_columns():
    from paper2table_ray.stages.transformers import has_hints_header_value

    assert has_hints_header_value(R(family="family"), {"family"})


def test_has_hints_header_value_with_value_with_agreement():
    from paper2table_ray.stages.transformers import has_hints_header_value

    assert has_hints_header_value(R(**{"0": [V("species", 1)]}), {"species"})


def test_is_header_row_without_hints_ignores_numeric_columns():
    assert not _hdr(R(**{"0": "0", "1": "1"}))


def test_is_header_row_with_hints_detects_numeric_header():
    assert _hdr(R(**{"0": "species", "1": "Apiaceae"}), hints=["species", "family"])


def test_is_header_row_with_hints_false_when_no_match():
    assert not _hdr(
        R(**{"0": "Ammi majus", "1": "Apiaceae"}), hints=["species", "family"]
    )


def test_filter_header_rows_with_hints_removes_numeric_header_row():
    table = [
        R(**{"0": "species", "1": "family"}),
        R(**{"0": "Ammi majus", "1": "Apiaceae"}),
    ]
    filtered = _filter_headers(
        merge_tablesfiles([wrap(table)]), hints=["species", "family"]
    )
    assert rows(filtered) == [
        R(**{"0": "ammi majus", "1": "apiaceae"}, _level=1, _row=1)
    ]


def test_filter_header_rows_without_hints_still_removes_semantic_header_rows():
    table = [
        R(family="family", scientific_name="scientific_name"),
        R(family="Apiaceae", scientific_name="Ammi majus L."),
    ]
    filtered = _filter_headers(merge_tablesfiles([wrap(table)]))
    assert rows(filtered) == [
        R(family="apiaceae", scientific_name="ammi majus l.", _level=1, _row=1)
    ]


def test_value_matches_header_returns_false_for_none():
    from paper2table_ray.stages.transformers import value_matches_header

    assert value_matches_header("family", None) is False


def test_value_matches_hints_returns_false_for_none():
    from paper2table_ray.stages.transformers import value_matches_hints

    assert value_matches_hints(None, {"family", "species"}) is False


def test_to_values_with_agreement_returns_empty_list_for_none():
    assert to_values_with_agreement(None) == []


# --- emptiness model (test_merge.py:1859-1924) -------------------------------


def test_table_fragment_is_empty_all_empty_rows():
    assert rm.fragment_is_empty(
        {"rows": [R(family="", scientific_name=None)], "page": 1}
    )


def test_table_fragment_is_empty_false_when_has_data():
    assert not rm.fragment_is_empty({"rows": [R(family="Apiaceae")], "page": 1})


def test_table_fragment_is_empty_true_when_no_rows():
    assert rm.fragment_is_empty({"rows": [], "page": 1})


def test_table_with_fragments_is_empty_all_fragments_empty():
    table = {
        "fragments": [
            {"rows": [R(family="")], "page": 1},
            {"rows": [R(family="")], "page": 2},
        ]
    }
    assert all(rm.fragment_is_empty(f) for f in table["fragments"])


def test_table_with_fragments_is_empty_false_when_any_fragment_has_data():
    table = {
        "fragments": [
            {"rows": [R(family="")], "page": 1},
            {"rows": [R(family="Apiaceae")], "page": 2},
        ]
    }
    assert not all(rm.fragment_is_empty(f) for f in table["fragments"])


def test_drop_empty_tables_removes_empty_table():
    from paper2table_ray.stages.transformers import drop_empty_tables

    non_empty = wrap([R(family="Apiaceae")])
    empty = wrap([R(family="")])
    combined = {
        "tables": non_empty["tables"] + empty["tables"],
        "citation": "",
    }
    result = drop_empty_tables(combined)
    assert result["tables"] == non_empty["tables"]


def test_drop_empty_tables_removes_empty_fragments():
    from paper2table_ray.stages.transformers import drop_empty_tables

    non_empty_fragment = {"rows": [R(family="Apiaceae")], "page": 1}
    empty_fragment = {"rows": [R(family="")], "page": 2}
    tablesfile = {
        "tables": [{"fragments": [non_empty_fragment, empty_fragment]}],
        "citation": "",
    }
    result = drop_empty_tables(tablesfile)
    assert result["tables"] == [{"fragments": [non_empty_fragment]}]


def test_drop_empty_tables_keeps_all_when_none_empty():
    from paper2table_ray.stages.transformers import drop_empty_tables

    tablesfile = wrap([R(family="Apiaceae"), R(family="Fabaceae")])
    result = drop_empty_tables(tablesfile)
    assert result["tables"] == tablesfile["tables"]


def test_drop_empty_tables_returns_empty_tables_list_when_all_empty():
    from paper2table_ray.stages.transformers import drop_empty_tables

    assert drop_empty_tables(wrap([R(family="")]))["tables"] == []


# --- cursor-merge insertion order (test_merge.py:1926-1963) ------------------


def test_unmatched_right_row_inserted_before_higher_row_number():
    t1 = [
        R(family="a", position="1"),
        R(family="b", position="1"),
        R(family="c", position="1"),
    ]
    t2 = [R(family="a", position="1")]
    t3 = [R(family="j", position="1")]
    t4 = [R(family="a", position="2")]
    t5 = [R(family="x", position="1")]
    result = merge_tablesfiles(
        [wrap(t1), wrap(t2), wrap(t3), wrap(t4), wrap(t5)]
    )
    assert rows(result) == [
        R(family="a", position="1", _level=2, _row=0),
        R(family="j", position="1", _level=1, _row=0),
        R(family="a", position="2", _level=1, _row=0),
        R(family="x", position="1", _level=1, _row=0),
        R(family="b", position="1", _level=1, _row=1),
        R(family="c", position="1", _level=1, _row=2),
    ]


# --- output curation guard (test_merge.py:1966-2027) -------------------------


def test_output_file_has_curations_false_when_file_missing(tmp_path):
    from paper2table_ray.sources.tablesfile_json import _has_curations

    assert _has_curations(str(tmp_path / "missing.tables.json")) is False


def test_output_file_has_curations_false_when_no_metadata(tmp_path):
    import json as _json

    from paper2table_ray.sources.tablesfile_json import _has_curations

    p = tmp_path / "paper.tables.json"
    p.write_text(_json.dumps({"tables": [], "citation": ""}))
    assert _has_curations(str(p)) is False


def test_output_file_has_curations_false_when_curations_empty(tmp_path):
    import json as _json

    from paper2table_ray.sources.tablesfile_json import _has_curations

    p = tmp_path / "paper.tables.json"
    p.write_text(
        _json.dumps(
            {
                "tables": [],
                "citation": "",
                "metadata": {"filename": None, "curations": []},
            }
        )
    )
    assert _has_curations(str(p)) is False


def test_output_file_has_curations_true_when_curations_present(tmp_path):
    import json as _json

    from paper2table_ray.sources.tablesfile_json import _has_curations

    p = tmp_path / "paper.tables.json"
    p.write_text(
        _json.dumps(
            {
                "tables": [],
                "citation": "",
                "metadata": {
                    "filename": None,
                    "curations": [{"curator": "alice"}],
                },
            }
        )
    )
    assert _has_curations(str(p)) is True
