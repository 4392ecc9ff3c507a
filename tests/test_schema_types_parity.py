"""Behavioral-parity port of /root/reference/tests/test_coerce.py (11) +
test_column_schema.py (15) over functions/text.py + functions/scientific.py."""

import pytest

from paper2table_ray.functions.scientific import scientific_name
from paper2table_ray.functions.text import ColumnSchema, coerce_str

SCHEMA = ColumnSchema({"family": str, "count": int, "ratio": float, "active": bool})


# --- coerce_str (test_coerce.py) ---------------------------------------------


def test_str_is_noop():
    assert coerce_str("hello", str) == "hello"


def test_int_normalizes_float_string():
    assert coerce_str("42.0", int) == "42"


def test_int_plain():
    assert coerce_str("7", int) == "7"


def test_int_invalid_leaves_unchanged():
    assert coerce_str("N/A", int) == "N/A"


def test_float_from_int_string():
    assert coerce_str("1", float) == "1.0"


def test_float_plain():
    assert coerce_str("3.14", float) == "3.14"


def test_float_invalid_leaves_unchanged():
    assert coerce_str("abc", float) == "abc"


def test_bool_truthy_words():
    for word in ("true", "True", "TRUE", "1", "yes", "YES", "on", "ON"):
        assert coerce_str(word, bool) == "True", word


def test_bool_falsy_words():
    for word in ("false", "False", "FALSE", "0", "no", "NO", "off", "OFF"):
        assert coerce_str(word, bool) == "False", word


def test_bool_unrecognised_leaves_unchanged():
    assert coerce_str("maybe", bool) == "maybe"


def test_coerce_str_scientific_name_normalizes():
    assert (
        coerce_str("maytenus ilicifolia mart.", scientific_name)
        == "Maytenus ilicifolia"
    )


# --- ColumnSchema (test_column_schema.py) ------------------------------------


def test_column_names_returns_ordered_list():
    assert SCHEMA.column_names() == ["family", "count", "ratio", "active"]


def test_column_type_returns_correct_type():
    assert SCHEMA.column_type("family") is str
    assert SCHEMA.column_type("count") is int
    assert SCHEMA.column_type("ratio") is float
    assert SCHEMA.column_type("active") is bool


def test_definitions_returns_name_type_pairs():
    assert SCHEMA.definitions() == [
        ("family", str),
        ("count", int),
        ("ratio", float),
        ("active", bool),
    ]


def test_contains_known_column():
    assert "family" in SCHEMA


def test_does_not_contain_unknown_column():
    assert "genus" not in SCHEMA


def test_non_empty_schema_is_truthy():
    assert bool(SCHEMA)


def test_empty_schema_is_falsy():
    assert not ColumnSchema({})


def test_serialize_returns_string_type_names():
    assert SCHEMA.serialize() == {
        "family": "str",
        "count": "int",
        "ratio": "float",
        "active": "bool",
    }


def test_parse_pydantic_returns_pydantic_field_format():
    result = ColumnSchema.parse_pydantic("family:str count:int")
    assert result == {"family": (str, ...), "count": (int, ...)}


def test_column_type_raises_for_unknown_column():
    with pytest.raises(KeyError):
        SCHEMA.column_type("genus")


def test_parse_pydantic_scientific_name_includes_description():
    result = ColumnSchema.parse_pydantic("species:scientific_name")
    typ, field_info = result["species"]
    assert typ is scientific_name
    assert "binomial nomenclature" in field_info.description


def test_parse_scientific_name_type():
    schema = ColumnSchema.parse("species:scientific_name")
    assert schema.column_type("species") is scientific_name


def test_from_settings_dict_roundtrip():
    schema = ColumnSchema.from_settings_dict({"family": "str", "count": "int"})
    assert schema.serialize() == {"family": "str", "count": "int"}
    assert ColumnSchema.from_settings_dict({}) is None


def test_serialize_scientific_name_type():
    # ref test_column_schema.py:82-84
    schema = ColumnSchema({"species": scientific_name})
    assert schema.serialize() == {"species": "scientific_name"}


def test_scientific_name_is_str_subclass():
    # ref test_column_schema.py:87-88
    assert issubclass(scientific_name, str)
