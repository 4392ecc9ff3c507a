"""Parity ports of the reference's small utility suites: page_range (7),
normalize_column_name (6), parse_column_names_hints (6), gnparser (9)."""

import pytest

from paper2table_ray.functions.scientific import scientific_name
from paper2table_ray.functions.text import (
    normalize_column_name,
    parse_hints,
    parse_page_range,
)

# --- page_range (test_page_range.py) -----------------------------------------


def test_plain_path_returns_no_range():
    assert parse_page_range("some/file.pdf") == ("some/file.pdf", None)


def test_range_is_parsed():
    assert parse_page_range("some/file.pdf:2:5") == ("some/file.pdf", (2, 5))


def test_single_page_range():
    assert parse_page_range("paper.pdf:3:3") == ("paper.pdf", (3, 3))


def test_one_colon_suffix_is_not_a_range():
    assert parse_page_range("file.pdf:5") == ("file.pdf:5", None)


def test_non_integer_suffix_is_not_a_range():
    assert parse_page_range("file.pdf:foo:bar") == ("file.pdf:foo:bar", None)


def test_path_with_directory_and_range():
    assert parse_page_range("/data/papers/study.pdf:10:20") == (
        "/data/papers/study.pdf",
        (10, 20),
    )


def test_path_without_extension_and_range():
    assert parse_page_range("myfile:1:4") == ("myfile", (1, 4))


# --- normalize_column_name (test_normalize_column_name.py) -------------------


def test_normalize_column_name_spaces_become_underscores():
    assert normalize_column_name("Utilized part") == "utilized_part"


def test_normalize_column_name_uppercase():
    assert normalize_column_name("UTILIZED PART") == "utilized_part"


def test_normalize_column_name_mixed_case():
    assert normalize_column_name("Utilized Part") == "utilized_part"


def test_normalize_column_name_accent():
    assert normalize_column_name("Preparación") == "preparacion"


def test_normalize_column_name_already_normalized():
    assert normalize_column_name("utilized_part") == "utilized_part"


def test_normalize_column_name_none_returns_none():
    assert normalize_column_name(None) is None


# --- parse_column_names_hints (test_parse_column_names_hints.py) -------------


def test_simple_comma_separated():
    assert parse_hints("id, name, family") == ["id", "name", "family"]


def test_newline_and_whitespace():
    assert parse_hints("id \n name   family") == ["id", "name", "family"]


def test_extra_commas_and_spaces():
    assert parse_hints("id, ,  ,   name , family") == ["id", "name", "family"]


def test_with_diacritics():
    assert parse_hints("id, nombre_científico") == ["id", "nombre_cientifico"]


def test_uppercase_and_mixed_case():
    assert parse_hints("ID, Vernacular_Name, SCIENTIFIC_NAME") == [
        "id",
        "vernacular_name",
        "scientific_name",
    ]


def test_empty_input():
    assert parse_hints("") == []


# --- gnparser analogue (test_gnparser.py) ------------------------------------


def test_scientific_name_simple_binomen():
    assert scientific_name("homo sapiens") == "Homo sapiens"
    assert scientific_name("Homo sapiens") == "Homo sapiens"


def test_scientific_name_unparseable_returns_original():
    assert scientific_name("not a name") == "not a name"


def test_scientific_name_binomen_with_tail():
    assert (
        scientific_name("Acantholippia seriphioides (a. gray) mold.")
        == "Acantholippia seriphioides"
    )
    assert (
        scientific_name("acantholippia seriphioides (a. gray) mold.")
        == "Acantholippia seriphioides"
    )
    assert scientific_name("apium australe pet. thouars") == "Apium australe"


def test_scientific_name_binomen_with_author():
    assert (
        scientific_name("Acantholippia seriphioides (A. Gray) Mold.")
        == "Acantholippia seriphioides"
    )
    assert scientific_name("Apium australe Pet. Thouars") == "Apium australe"


def test_scientific_name_approximation():
    assert scientific_name("acaena sp.") == "Acaena"


def test_scientific_name_comma_separated():
    assert (
        scientific_name("homo sapiens, pan troglodytes")
        == "Homo sapiens, Pan troglodytes"
    )


def test_scientific_name_slash_separated():
    assert (
        scientific_name("homo sapiens / pan troglodytes")
        == "Homo sapiens, Pan troglodytes"
    )


def test_scientific_name_comma_separated_strips_authors():
    assert (
        scientific_name(
            "Acantholippia seriphioides (A. Gray) Mold., Apium australe Pet. Thouars"
        )
        == "Acantholippia seriphioides, Apium australe"
    )


def test_scientific_name_comma_separated_with_unparseable_part():
    assert scientific_name("homo sapiens, not a name") == "Homo sapiens, not a name"
