"""Behavioral-parity port of /root/reference/tests/test_rows.py (36) +
test_normalize_row.py (8) over rowmodel.py / functions/text.py."""

from paper2table_ray import rowmodel as rm
from paper2table_ray.functions.text import normalize_column_value

V = rm.vwa


def R(_level=None, _sources=None, _row=None, **cells):
    return rm.make_row(dict(cells), agreement_level=_level, sources=_sources, row_idx=_row)


# --- Row.normalize_value (test_rows.py:6-97) ---------------------------------

import pytest


@pytest.mark.parametrize(
    "raw, expected",
    [
        ("no data", ""),
        ("No Data", ""),
        ("  no  data  ", ""),
        ("None", ""),
        ("Perez et al. 2020", "perez et al. 2020"),
        ("Perez  et   al.", "perez et al."),
        ("  Perez 2020  ", "perez 2020"),
        ("Perez–Vílchez 2020", "perez-vílchez 2020"),
        ("Perez—Vílchez 2020", "perez-vílchez 2020"),
        ("Apiaceae", "apiaceae"),
        ("2–5", "2-5"),
        ("Jan—Feb", "jan-feb"),
        ("10‒20", "10-20"),
        ("A―B", "a-b"),
        ("−5", "-5"),
        ("A‐B", "a-b"),
        ("A‑B", "a-b"),
        ("hello�world", "helloworld"),
        ("hello\x00world\x1fend", "helloworldend"),
        ("Apiaceae�", "apiaceae"),
        ("(cid:237)", "í"),
        ("L(cid:243)pez", "lópez"),
        ("(cid:42)", ""),
        ("hello (cid:7) world", "hello world"),
    ],
)
def test_normalize_value(raw, expected):
    assert normalize_column_value(raw) == expected


# --- is_empty_value (test_rows.py:100-120) -----------------------------------


def test_is_empty_value_no_data_string():
    assert rm.is_empty_value("no data")


def test_is_empty_value_no_data_uppercase():
    assert rm.is_empty_value("No Data")


def test_is_empty_value_none():
    assert rm.is_empty_value(None)


def test_is_empty_value_empty_string():
    assert rm.is_empty_value("")


def test_is_empty_value_whitespace_string():
    assert rm.is_empty_value("  \t\n")


def test_is_empty_value_non_empty_string():
    assert not rm.is_empty_value("hello")


# --- is_empty row (test_rows.py:123-147) -------------------------------------


def test_is_empty_row_all_empty():
    assert rm.row_is_empty(R(family="", scientific_name=None))


def test_is_empty_row_whitespace_only():
    assert rm.row_is_empty(R(family="  ", scientific_name="\t"))


def test_is_empty_row_metadata_keys_ignored():
    assert rm.row_is_empty(R(family="", _level=2, _sources=["uuid"]))


def test_is_empty_row_has_data():
    assert not rm.row_is_empty(R(family="Apiaceae", scientific_name=""))


def test_is_empty_row_list_value_empty():
    assert rm.row_is_empty(R(family=[V("", 1)]))


def test_is_empty_row_list_value_non_empty():
    assert not rm.row_is_empty(R(family=[V("Apiaceae", 1)]))


# --- normalize_row (test_rows.py:150 + test_normalize_row.py) ----------------


def test_normalize_row_with_none_column_value():
    row = R(**{"family": None, "scientific_name": "Apiaceae"})
    assert rm.normalize_row(row) == R(
        **{"family": None, "scientific_name": "apiaceae"}
    )


def test_normalize_row_plain_strings():
    row = R(family=" Apiaceae ", name="Ammi  Majus")
    assert rm.normalize_row(row) == R(family="apiaceae", name="ammi majus")


def test_normalize_row_list_values():
    row = R(family=[V(" Apiaceae ", 2), V("ROSACEAE", 1)])
    assert rm.normalize_row(row) == R(family=[V("apiaceae", 2), V("rosaceae", 1)])


def test_normalize_row_defaults_agreement_when_row_agreement():
    row = R(family="Apiaceae")
    out = rm.normalize_row(row, row_agreement=True)
    assert out["agreement_level"] == 1


def test_normalize_row_keeps_none_agreement_without_row_agreement():
    row = R(family="Apiaceae")
    assert rm.normalize_row(row)["agreement_level"] is None


def test_normalize_row_preserves_existing_agreement():
    row = R(family="Apiaceae", _level=3)
    assert rm.normalize_row(row, row_agreement=True)["agreement_level"] == 3


def test_normalize_row_preserves_sources_and_row_idx():
    row = R(family="Apiaceae", _sources=["u1"], _row=4)
    out = rm.normalize_row(row)
    assert out["sources"] == ["u1"] and out["row_idx"] == 4


def test_normalize_row_no_data_cells_become_empty():
    row = R(family="no data", name="Real Value")
    assert rm.normalize_row(row) == R(family="", name="real value")


# --- normalize_value granular matrix (test_rows.py:6-120; the reference's
# Row.normalize_value ≡ our functions/text.normalize_column_value) ------------

import pytest as _pytest

from paper2table_ray.functions.text import normalize_column_value


@_pytest.mark.parametrize(
    "raw,expected",
    [
        ("no data", ""),                       # no-data lowercase
        ("No Data", ""),                       # no-data uppercase
        ("  no  data  ", ""),                  # no-data extra whitespace
        ("None", ""),                          # literal None string
        ("Perez et al. 2020", "perez et al. 2020"),
        ("Perez  et   al.", "perez et al."),   # whitespace collapse
        ("  Perez 2020  ", "perez 2020"),      # edge strip
        ("Perez–Vílchez 2020", "perez-vílchez 2020"),  # en dash
        ("Perez—Vílchez 2020", "perez-vílchez 2020"),  # em dash
        ("Apiaceae", "apiaceae"),
        ("2–5", "2-5"),                        # en dash numeric
        ("Jan—Feb", "jan-feb"),                # em dash
        ("10‒20", "10-20"),                    # figure dash
        ("A―B", "a-b"),                        # horizontal bar
        ("−5", "-5"),                          # minus sign
        ("A‐B", "a-b"),                        # hyphen variant U+2010
        ("A‑B", "a-b"),                        # hyphen variant U+2011
        ("hello�world", "helloworld"),         # replacement char
        ("hello\x00world\x1fend", "helloworldend"),  # control chars
        ("Apiaceae�", "apiaceae"),
        ("(cid:237)", "í"),                    # cid latin-1 accented
        ("L(cid:243)pez", "lópez"),            # cid inside a word
        ("(cid:42)", ""),                      # cid outside latin-1
        ("hello (cid:7) world", "hello world"),
    ],
)
def test_normalize_value_matrix(raw, expected):
    assert normalize_column_value(raw) == expected
