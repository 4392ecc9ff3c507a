"""Behavioral-parity port of /root/reference/tests/test_schema.py (29)
over stages/transformers.SchemaPostProcessor + drop_empty_* and the
tablesfile dict model (clone ≡ dict copy-with-overrides; has_curations
via sources/tablesfile_json)."""

from paper2table_ray import rowmodel as rm
from paper2table_ray.functions.text import ColumnSchema
from paper2table_ray.stages.transformers import (
    SchemaPostProcessor,
    drop_empty_columns,
    drop_empty_tables,
)

V = rm.vwa


def R(_level=None, _sources=None, _row=None, **cells):
    return rm.make_row(dict(cells), agreement_level=_level, sources=_sources, row_idx=_row)


def wrap(rows, page=1, citation=""):
    return {
        "tables": [{"fragments": [{"rows": rows, "page": page}]}],
        "citation": citation,
    }


def wrap_two_tables(rows1, rows2, citation=""):
    return {
        "tables": [
            {"fragments": [{"rows": rows1, "page": 1}]},
            {"fragments": [{"rows": rows2, "page": 2}]},
        ],
        "citation": citation,
    }


def rows_of(tf, table=0, fragment=0):
    return tf["tables"][table]["fragments"][fragment]["rows"]


FILTER_SCHEMA = ColumnSchema({"name": str, "species": str})


def filter_processor():
    return SchemaPostProcessor(FILTER_SCHEMA, filter_columns=True)


def test_filter_keeps_table_with_matching_column():
    assert len(filter_processor().postprocess(wrap([R(name="foo")]))["tables"]) == 1


def test_filter_drops_table_with_no_matching_column():
    assert (
        len(filter_processor().postprocess(wrap([R(color="red", size="big")]))["tables"])
        == 0
    )


def test_filter_keeps_table_with_partial_match():
    assert (
        len(
            filter_processor()
            .postprocess(wrap([R(species="Canis lupus", habitat="forest")]))["tables"]
        )
        == 1
    )


def test_filter_mixed_tables():
    tf = wrap_two_tables([R(name="Rosa")], [R(color="red")])
    assert len(filter_processor().postprocess(tf)["tables"]) == 1


def test_filter_preserves_citation():
    result = filter_processor().postprocess(
        wrap([R(name="x")], citation="some citation")
    )
    assert result["citation"] == "some citation"


def test_filter_all_tables_dropped_returns_empty():
    tf = wrap_two_tables([R(color="red")], [R(size="big")])
    assert filter_processor().postprocess(tf)["tables"] == []


_ORDER_SCHEMA = ColumnSchema({"name": str, "species": str, "family": str})


def order_processor():
    return SchemaPostProcessor(_ORDER_SCHEMA, order_columns=True)


def test_order_schema_columns_come_first():
    result = order_processor().postprocess(
        wrap([R(habitat="forest", name="Rosa", family="Rosaceae")])
    )
    cols = list(rows_of(result)[0]["cells"])
    assert cols.index("name") < cols.index("habitat")
    assert cols.index("family") < cols.index("habitat")


def test_order_schema_order_respected():
    result = order_processor().postprocess(
        wrap([R(family="Rosaceae", species="Rosa canina", name="Dog rose")])
    )
    assert list(rows_of(result)[0]["cells"])[:3] == ["name", "species", "family"]


def test_order_missing_schema_columns_not_inserted():
    result = order_processor().postprocess(wrap([R(name="Rosa")]))
    assert list(rows_of(result)[0]["cells"]) == ["name"]


def test_order_preserves_metadata():
    result = order_processor().postprocess(
        wrap([R(name="Rosa", _level=3, _sources=["uuid1"])])
    )
    row = rows_of(result)[0]
    assert row["agreement_level"] == 3
    assert row["sources"] == ["uuid1"]


def test_order_preserves_row_number():
    result = order_processor().postprocess(wrap([R(name="Rosa", _row=7)]))
    assert rows_of(result)[0]["row_idx"] == 7


COERCE_SCHEMA = ColumnSchema({"year": int, "length": float, "active": bool, "label": str})


def coerce_processor():
    return SchemaPostProcessor(COERCE_SCHEMA, coerce_types=True)


def coerce_cols(tf):
    return rows_of(tf)[0]["cells"]


import pytest

# (column, input, expected canonical string) through the coerce postproc
_COERCE_CASES = [
    ("year", "2020.0", "2020"),        # int via float
    ("length", "3", "3.0"),            # float canonical form
    ("active", "yes", "True"),         # bool word set
    ("active", "no", "False"),
    ("label", "hello", "hello"),       # str no-op
    ("year", "N/A", "N/A"),            # unconvertible unchanged
    ("color", "red", "red"),           # non-schema column untouched
]


@pytest.mark.parametrize("col,raw,expected", _COERCE_CASES)
def test_coerce_types_matrix(col, raw, expected):
    out = coerce_processor().postprocess(wrap([R(**{col: raw})]))
    assert coerce_cols(out)[col] == expected


def test_coerce_preserves_row_number():
    result = coerce_processor().postprocess(wrap([R(year="2020", _row=3)]))
    assert rows_of(result)[0]["row_idx"] == 3


def test_coerce_types_value_with_agreement():
    tf = wrap([R(year=[V("2020.0", 2), V("bad", 1)])])
    values = coerce_cols(coerce_processor().postprocess(tf))["year"]
    assert values == [V("2020", 2), V("bad", 1)]


def test_coerce_types_preserves_metadata():
    result = coerce_processor().postprocess(
        wrap([R(year="2020", _level=2, _sources=["u1"])])
    )
    row = rows_of(result)[0]
    assert row["agreement_level"] == 2
    assert row["sources"] == ["u1"]


def test_coerce_types_none_column_value_left_unchanged():
    out = coerce_processor().postprocess(wrap([R(**{"year": None})]))
    assert coerce_cols(out)["year"] is None


def test_drop_empty_columns_postprocessor_removes_all_null_column():
    tf = wrap(
        [
            R(**{"0": None, "family": "Apiaceae"}),
            R(**{"0": None, "family": "Fabaceae"}),
        ]
    )
    result = drop_empty_columns(tf)
    assert rows_of(result) == [R(family="Apiaceae"), R(family="Fabaceae")]


def test_tablesfile_clone_overrides_tables_and_preserves_other_fields():
    # dict model: clone ≡ {**original, overrides}
    original = {
        "tables": [{"fragments": [{"rows": [R(name="Rosa")], "page": 1}]}],
        "citation": "some citation",
        "metadata": {"filename": "paper.pdf"},
        "uuid": "abc-123",
    }
    new_tables = [{"fragments": [{"rows": [R(name="Canis lupus")], "page": 2}]}]
    result = {**original, "tables": new_tables}
    assert result["tables"] == new_tables
    assert result["citation"] == "some citation"
    assert result["metadata"] == {"filename": "paper.pdf"}
    assert result["uuid"] == "abc-123"


def test_tablesfile_clone_overrides_citation_and_preserves_other_fields():
    tables = [{"fragments": [{"rows": [R(name="Rosa")], "page": 1}]}]
    original = {"tables": tables, "citation": "original citation", "uuid": "xyz-456"}
    result = {**original, "citation": "updated citation"}
    assert result["tables"] == tables
    assert result["citation"] == "updated citation"
    assert result["uuid"] == "xyz-456"


def test_has_curations_false_when_no_metadata(tmp_path):
    import json

    from paper2table_ray.sources.tablesfile_json import _has_curations

    p = tmp_path / "x.tables.json"
    p.write_text(json.dumps({"tables": [], "citation": ""}))
    assert _has_curations(str(p)) is False


def test_has_curations_true_when_curations_present(tmp_path):
    import json

    from paper2table_ray.sources.tablesfile_json import _has_curations

    p = tmp_path / "x.tables.json"
    p.write_text(
        json.dumps(
            {
                "tables": [],
                "citation": "",
                "metadata": {
                    "filename": None,
                    "curations": [
                        {"curator": "alice", "description": "reviewed"}
                    ],
                },
            }
        )
    )
    assert _has_curations(str(p)) is True


def test_drop_empty_tables_postprocessor_removes_empty_table():
    tf = wrap_two_tables([R(family="Apiaceae")], [R(family="")])
    assert len(drop_empty_tables(tf)["tables"]) == 1
