"""Behavioral-parity port of /root/reference/tests/
test_tablesfile_transformer.py (17 cases): exploder + safe/unsafe
consecutive-fragments compactors over stages/transformers.py."""

from paper2table_ray import rowmodel as rm
from paper2table_ray.stages.transformers import (
    FragmentsExploder,
    SafeConsecutiveFragmentsCompactor,
    UnsafeConsecutiveFragmentsCompactor,
)


def R(**cells):
    return rm.make_row(dict(cells))


def F(rows, page):
    return {"rows": rows, "page": page}


def make_tablesfile(*fragments, citation=""):
    return {
        "tables": [{"fragments": [f]} for f in fragments],
        "citation": citation,
    }


MOUSE = R(scientific_name="Mus Musculus", common_name="Mouse")
RAT = R(scientific_name="Rattus Rattus", common_name="Rat")
WOLF = R(scientific_name="Canis Lupus", common_name="Wolf")
OTHER = R(family="Muridae", order="Rodentia")


def test_safe_compactor_merges_two_consecutive_tables_with_matching_semantic_columns():
    tf = make_tablesfile(F([MOUSE], 2), F([RAT], 3), citation="dont care")
    result = SafeConsecutiveFragmentsCompactor().transform(tf)
    assert result["tables"] == [{"fragments": [F([MOUSE], 2), F([RAT], 3)]}]


def test_safe_compactor_does_not_merge_tables_with_different_semantic_columns():
    tf = make_tablesfile(F([MOUSE], 2), F([OTHER], 3))
    result = SafeConsecutiveFragmentsCompactor().transform(tf)
    assert result["tables"] == [
        {"fragments": [F([MOUSE], 2)]},
        {"fragments": [F([OTHER], 3)]},
    ]


def test_safe_compactor_does_not_merge_tables_with_non_correlative_pages():
    tf = make_tablesfile(F([MOUSE], 2), F([RAT], 4))
    result = SafeConsecutiveFragmentsCompactor().transform(tf)
    assert result["tables"] == [
        {"fragments": [F([MOUSE], 2)]},
        {"fragments": [F([RAT], 4)]},
    ]


def test_safe_compactor_does_not_merge_tables_with_numeric_columns():
    a = R(**{"0": "Mus Musculus", "1": "Mouse"})
    b = R(**{"0": "Rattus Rattus", "1": "Rat"})
    tf = make_tablesfile(F([a], 2), F([b], 3))
    result = SafeConsecutiveFragmentsCompactor().transform(tf)
    assert result["tables"] == [
        {"fragments": [F([a], 2)]},
        {"fragments": [F([b], 3)]},
    ]


def test_unsafe_compactor_merges_tables_with_numeric_columns_of_same_count():
    a = R(**{"0": "Mus Musculus", "1": "Mouse"})
    b = R(**{"0": "Rattus Rattus", "1": "Rat"})
    tf = make_tablesfile(F([a], 2), F([b], 3))
    result = UnsafeConsecutiveFragmentsCompactor().transform(tf)
    assert result["tables"] == [{"fragments": [F([a], 2), F([b], 3)]}]


def test_unsafe_compactor_does_not_merge_tables_with_numeric_columns_of_different_count():
    a = R(**{"0": "Mus Musculus", "1": "Mouse"})
    b = R(**{"0": "Rattus Rattus", "1": "Rat", "2": "Rodentia"})
    tf = make_tablesfile(F([a], 2), F([b], 3))
    result = UnsafeConsecutiveFragmentsCompactor().transform(tf)
    assert result["tables"] == [
        {"fragments": [F([a], 2)]},
        {"fragments": [F([b], 3)]},
    ]


def test_safe_compactor_merges_three_consecutive_matching_tables_into_one():
    tf = make_tablesfile(F([MOUSE], 2), F([RAT], 3), F([WOLF], 4))
    result = SafeConsecutiveFragmentsCompactor().transform(tf)
    assert result["tables"] == [
        {"fragments": [F([MOUSE], 2), F([RAT], 3), F([WOLF], 4)]}
    ]


def test_safe_compactor_merges_matching_pair_and_keeps_non_matching_table_separate():
    tf = make_tablesfile(F([MOUSE], 2), F([RAT], 3), F([OTHER], 4))
    result = SafeConsecutiveFragmentsCompactor().transform(tf)
    assert result["tables"] == [
        {"fragments": [F([MOUSE], 2), F([RAT], 3)]},
        {"fragments": [F([OTHER], 4)]},
    ]


def test_safe_compactor_does_not_crash_on_empty_fragment_list():
    tf = {
        "tables": [
            {"fragments": []},
            {"fragments": [F([MOUSE], 2)]},
            {"fragments": [F([RAT], 3)]},
        ],
        "citation": "",
    }
    result = SafeConsecutiveFragmentsCompactor().transform(tf)
    assert result["tables"] == [
        {"fragments": []},
        {"fragments": [F([MOUSE], 2), F([RAT], 3)]},
    ]


def test_safe_compactor_merges_tables_around_empty_row_table():
    tf = make_tablesfile(F([MOUSE], 2), F([], 3), F([RAT], 4))
    result = SafeConsecutiveFragmentsCompactor().transform(tf)
    assert result["tables"] == [
        {"fragments": [F([MOUSE], 2), F([], 3), F([RAT], 4)]}
    ]


def test_safe_compactor_merges_two_tables_on_the_same_page_with_matching_columns():
    tf = make_tablesfile(F([MOUSE], 2), F([RAT], 2))
    result = SafeConsecutiveFragmentsCompactor().transform(tf)
    assert result["tables"] == [{"fragments": [F([MOUSE], 2), F([RAT], 2)]}]


def test_safe_compactor_does_not_merge_two_tables_on_the_same_page_with_different_columns():
    tf = make_tablesfile(F([MOUSE], 2), F([OTHER], 2))
    result = SafeConsecutiveFragmentsCompactor().transform(tf)
    assert result["tables"] == [
        {"fragments": [F([MOUSE], 2)]},
        {"fragments": [F([OTHER], 2)]},
    ]


def test_unsafe_compactor_merges_semantic_tables_on_non_consecutive_pages():
    tf = make_tablesfile(F([MOUSE], 2), F([RAT], 5))
    result = UnsafeConsecutiveFragmentsCompactor().transform(tf)
    assert result["tables"] == [{"fragments": [F([MOUSE], 2), F([RAT], 5)]}]


def test_safe_compactor_does_not_merge_semantic_tables_on_non_consecutive_pages():
    tf = make_tablesfile(F([MOUSE], 2), F([RAT], 5))
    result = SafeConsecutiveFragmentsCompactor().transform(tf)
    assert result["tables"] == [
        {"fragments": [F([MOUSE], 2)]},
        {"fragments": [F([RAT], 5)]},
    ]


def test_exploder_with_single_table():
    row_a = R(family="Apiaceae", scientific_name="Ammi majus L.")
    row_b = R(family="Rosaceae", scientific_name="Rosa canina L.")
    tf = {
        "tables": [{"fragments": [F([row_a], 1), F([row_b], 2)]}],
        "citation": "",
        "uuid": "uuid-1",
    }
    result = FragmentsExploder().transform(tf)
    assert len(result["tables"]) == 2
    assert all(len(t["fragments"]) == 1 for t in result["tables"])


def test_exploder_with_multiple_tables():
    row_a = R(family="Apiaceae", scientific_name="Ammi majus L.")
    row_b = R(family="Rosaceae", scientific_name="Rosa canina L.")
    tf = {
        "tables": [
            {"fragments": [F([row_a], 1)]},
            {"fragments": [F([row_b], 2)]},
        ],
        "citation": "",
        "uuid": "uuid-2",
    }
    result = FragmentsExploder().transform(tf)
    assert len(result["tables"]) == 2
    assert all(len(t["fragments"]) == 1 for t in result["tables"])
