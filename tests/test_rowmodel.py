"""Row model + Arrow cells-encoding round-trip."""

from paper2table_ray import rowmodel as rm
from paper2table_ray import schema as sch


def test_is_empty_value():
    assert rm.is_empty_value(None)
    assert rm.is_empty_value("")
    assert rm.is_empty_value("no data")
    assert rm.is_empty_value([rm.vwa("", 1), rm.vwa("NONE", 2)])
    assert not rm.is_empty_value("x")
    assert not rm.is_empty_value([rm.vwa("x", 1)])


def test_normalize_row_defaults_agreement():
    row = rm.make_row({"a": " X "}, agreement_level=None)
    assert rm.normalize_row(row)["agreement_level"] is None
    assert rm.normalize_row(row, row_agreement=True)["agreement_level"] == 1
    assert rm.normalize_row(row)["cells"]["a"] == "x"


def test_same_row_transliterated():
    left = rm.make_row({"a": "Ångström"})
    right = rm.make_row({"a": "angstrom"})
    assert rm.same_row(left, right)
    assert not rm.same_row(left, rm.make_row({"a": "other"}))
    # str vs vwa-list of same value are NOT the same (dict equality)
    assert not rm.same_row(
        rm.make_row({"a": "x"}), rm.make_row({"a": [rm.vwa("x", 1)]})
    )


def test_column_names_first_seen_order():
    rows = [rm.make_row({"b": "1"}), rm.make_row({"a": "2", "b": "3"})]
    assert rm.column_names(rows) == ["b", "a"]


def test_cell_encoding_round_trip():
    cases = [
        None,
        "",
        "plain",
        [],
        [rm.vwa("x", 1)],
        [rm.vwa("x", 1), rm.vwa("y", 3)],
    ]
    for case in cases:
        assert sch.decode_cell(sch.encode_cell(case)) == case


def test_rows_table_round_trip():
    recs = [
        {
            "doc_id": "d1",
            "source_uuid": "s1",
            "table_idx": 0,
            "fragment_idx": 0,
            "page": 1,
            "pos": 0,
            "row_idx": None,
            "agreement_level": None,
            "sources": None,
            "cells": {"name": "Rose", "0": [rm.vwa("x", 2)], "n": None},
            "citation": None,
        },
        {
            "doc_id": "d1",
            "source_uuid": "s1",
            "table_idx": 0,
            "fragment_idx": 0,
            "page": 1,
            "pos": 1,
            "row_idx": 4,
            "agreement_level": 2,
            "sources": ["u1", "u2"],
            "cells": {"name": "Sunflower"},
            "citation": "Someone (2020)",
        },
    ]
    table = sch.rows_to_table(recs)
    assert table.schema.equals(sch.CELLS_SCHEMA)
    back = sch.table_to_row_records(table)
    assert back == recs


def test_tablesfile_round_trip():
    tf = {
        "citation": "C",
        "tables": [
            {
                "fragments": [
                    {"page": 1, "rows": [rm.make_row({"a": "1"}), rm.make_row({"a": "2"})]},
                    {"page": 2, "rows": [rm.make_row({"a": "3"})]},
                ]
            },
            {"fragments": [{"page": 3, "rows": [rm.make_row({"0": "z"})]}]},
        ],
    }
    recs = sch.tablesfile_to_records("d1", "src1", tf)
    assert len(recs) == 4
    rebuilt = sch.records_to_tablesfiles(recs)
    assert set(rebuilt) == {"src1"}
    out = rebuilt["src1"]
    assert out["citation"] == "C"
    assert len(out["tables"]) == 2
    assert [f["page"] for f in out["tables"][0]["fragments"]] == [1, 2]
    assert out["tables"][0]["fragments"][0]["rows"][1]["cells"] == {"a": "2"}


class TestNonLatinFold:
    """ascii_fold transliterates Greek/Cyrillic (unidecode-style) and
    preserves unmapped scripts so distinct values never collapse to the
    same empty fold (ADVICE: same_row divergence on non-Latin cells)."""

    def test_greek_romanized(self):
        from paper2table_ray.functions.text import ascii_fold

        assert ascii_fold("Αθήνα") == "Athena"
        assert ascii_fold("αβγ") == "abg"
        assert ascii_fold("Θεσσαλονίκη") == "Thessalonike"

    def test_cyrillic_romanized(self):
        from paper2table_ray.functions.text import ascii_fold

        assert ascii_fold("Москва") == "Moskva"
        assert ascii_fold("жизнь") == "zhizn"

    def test_unmapped_script_preserved_not_deleted(self):
        from paper2table_ray.functions.text import ascii_fold

        assert ascii_fold("北京") == "北京"
        assert ascii_fold("北京") != ascii_fold("上海")

    def test_same_row_distinguishes_distinct_cjk_cells(self):
        from paper2table_ray import rowmodel as rm

        a = rm.make_row({"city": "北京"})
        b = rm.make_row({"city": "上海"})
        assert not rm.same_row(a, b)
        assert rm.same_row(a, rm.make_row({"city": "北京"}))

    def test_same_row_matches_across_greek_accent_variants(self):
        from paper2table_ray import rowmodel as rm

        a = rm.make_row({"name": "Αθήνα"})
        b = rm.make_row({"name": "Αθηνα"})  # no accent
        assert rm.same_row(a, b)
