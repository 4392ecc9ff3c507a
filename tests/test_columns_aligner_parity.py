"""Behavioral-parity port of /root/reference/tests/test_columns_aligner.py
(28 cases) over stages/aligners.py — merge-time Jaccard alignment on the
full 20-species corpus (exact, with text edits, partial column match),
load-time alias chains, rename collision append semantics."""

import pytest

from paper2table_ray import rowmodel as rm
from paper2table_ray.stages.aligners import (
    AliasLoadTimeAnalyzer,
    JaccardMergeTimeAnalyzer,
    LoadTimeColumnAligner,
    MergeTimeColumnAligner,
    append_column_value,
)

V = rm.vwa


def R(**cells):
    return rm.make_row(dict(cells))


def wrap(rows):
    return {"rows": list(rows), "page": 1}


def _merge_aligner(left, right, threshold=0.5):
    return MergeTimeColumnAligner(
        left, right, analyzers=[JaccardMergeTimeAnalyzer(threshold=threshold)]
    )


def test_column_aligner_right_numeric_to_left_semantic():
    left = wrap(
        [
            R(**{"family": "Apiaceae", "scientific_name": "Ammi majus L."}),
            R(**{"family": "Rosaceae", "scientific_name": "Rosa canina L."}),
        ]
    )
    right = wrap(
        [
            R(**{"0": "Apiaceae", "1": "Ammi majus L."}),
            R(**{"0": "Rosaceae", "1": "Rosa canina L."}),
        ]
    )
    assert _merge_aligner(left, right).mapping == {
        "0": "family",
        "1": "scientific_name",
    }


def test_column_aligner_left_numeric_to_right_semantic():
    left = wrap([R(**{"0": "lunes", "1": "monday"}), R(**{"0": "martes", "1": "tuesday"})])
    right = wrap(
        [R(**{"dia": "lunes", "day": "monday"}), R(**{"dia": "martes", "day": "tuesday"})]
    )
    assert _merge_aligner(left, right).mapping == {"0": "dia", "1": "day"}


def test_column_aligner_both_semantic_returns_empty():
    assert (
        _merge_aligner(wrap([R(family="Apiaceae")]), wrap([R(family="Apiaceae")])).mapping
        == {}
    )


def test_column_aligner_both_numeric_returns_empty():
    assert (
        _merge_aligner(wrap([R(**{"0": "Apiaceae"})]), wrap([R(**{"0": "Apiaceae"})])).mapping
        == {}
    )


def test_column_aligner_no_value_overlap_returns_empty():
    left = wrap([R(family="Apiaceae"), R(family="Rosaceae")])
    right = wrap([R(**{"0": "red"}), R(**{"0": "blue"})])
    assert _merge_aligner(left, right).mapping == {}


def test_column_aligner_partial_overlap_above_threshold():
    left = wrap([R(family="Apiaceae"), R(family="Rosaceae")])
    right = wrap([R(**{"0": "Apiaceae"})])
    assert _merge_aligner(left, right).mapping == {"0": "family"}


@pytest.mark.parametrize(
    "threshold,expected",
    [(0.6, {}), (0.5, {"0": "family"}), (0.4, {"0": "family"})],
)
def test_column_aligner_threshold(threshold, expected):
    left = wrap([R(family="Apiaceae"), R(family="Rosaceae")])
    right = wrap([R(**{"0": "Apiaceae"})])
    assert _merge_aligner(left, right, threshold).mapping == expected


def test_column_aligner_empty_fragment():
    assert _merge_aligner(wrap([]), wrap([R(**{"0": "Apiaceae"})])).mapping == {}


def test_column_aligner_one_col_matches_one_does_not():
    left = wrap(
        [
            R(**{"family": "Apiaceae", "scientific_name": "Ammi majus L."}),
            R(**{"family": "Rosaceae", "scientific_name": "Rosa canina L."}),
        ]
    )
    right = wrap([R(**{"0": "Apiaceae", "1": "zzz"}), R(**{"0": "Rosaceae", "1": "www"})])
    assert _merge_aligner(left, right).mapping == {"0": "family"}


def test_column_aligner_none_right_returns_empty():
    assert _merge_aligner(wrap([R(family="Apiaceae")]), None).mapping == {}


def test_column_aligner_rename_maps_numeric_to_semantic():
    left = wrap([R(**{"family": "Apiaceae", "scientific_name": "Ammi majus L."})])
    right = wrap([R(**{"0": "Apiaceae", "1": "Ammi majus L."})])
    aligner = _merge_aligner(left, right)
    assert aligner.rename_column("0") == "family"
    assert aligner.rename_column("1") == "scientific_name"
    assert aligner.rename_column("family") == "family"


def test_column_aligner_rename_row_renames_columns():
    left = wrap([R(**{"family": "Apiaceae", "scientific_name": "Ammi majus L."})])
    right = wrap([R(**{"0": "Apiaceae", "1": "Ammi majus L."})])
    aligner = _merge_aligner(left, right)
    row = R(**{"0": "Rosaceae", "1": "Rosa canina L."})
    assert aligner.rename_row(row) == R(
        family="Rosaceae", scientific_name="Rosa canina L."
    )


def test_column_aligner_rename_row_noop_when_no_mapping():
    left = wrap([R(family="Apiaceae")])
    right = wrap([R(genus="Ammi")])
    aligner = _merge_aligner(left, right)
    row = R(family="Rosaceae")
    assert aligner.rename_row(row) is row


SPECIES = [
    ("Ammi majus L.", "45.2", "Apiaceae", "Greater ammi"),
    ("Rosa canina L.", "12.8", "Rosaceae", "Dog rose"),
    ("Mentha spicata L.", "67.3", "Lamiaceae", "Spearmint"),
    ("Betula pendula Roth", "89.1", "Betulaceae", "Silver birch"),
    ("Quercus robur L.", "23.4", "Fagaceae", "English oak"),
    ("Taraxacum officinale F.H.Wigg.", "56.7", "Asteraceae", "Dandelion"),
    ("Urtica dioica L.", "34.9", "Urticaceae", "Stinging nettle"),
    ("Sambucus nigra L.", "78.2", "Adoxaceae", "Black elder"),
    ("Hypericum perforatum L.", "41.5", "Hypericaceae", "St John's wort"),
    ("Achillea millefolium L.", "93.6", "Asteraceae", "Yarrow"),
    ("Plantago lanceolata L.", "17.3", "Plantaginaceae", "Ribwort plantain"),
    ("Matricaria chamomilla L.", "52.8", "Asteraceae", "German chamomile"),
    ("Lavandula angustifolia Mill.", "61.4", "Lamiaceae", "Lavender"),
    ("Rosmarinus officinalis L.", "38.7", "Lamiaceae", "Rosemary"),
    ("Thymus vulgaris L.", "25.1", "Lamiaceae", "Common thyme"),
    ("Origanum vulgare L.", "72.9", "Lamiaceae", "Oregano"),
    ("Salvia officinalis L.", "44.6", "Lamiaceae", "Common sage"),
    ("Foeniculum vulgare Mill.", "83.2", "Apiaceae", "Fennel"),
    ("Melissa officinalis L.", "19.5", "Lamiaceae", "Lemon balm"),
    ("Echinacea purpurea (L.) Moench", "67.8", "Asteraceae", "Purple coneflower"),
]

SPECIES_WITH_EDITS = [
    ("Ammi majus", "45.2", "Apiaceae", "Greater ammi spp."),
    ("Rosa canina, L.", "12.8", "Rosaceae", "Dog-rose"),
    ("Mentha spicata", "67.3", "Lamiaceae", "Spearmint herb"),
    ("Betula pendula Rot", "89.1", "Betulaceae", "Silver-birch"),
    ("Quercus robur", "23.4", "Fagaceae", "Eng. oak"),
    ("T. officinale F.H.Wigg.", "56.7", "Asteraceae", "Dandelyon"),
    *SPECIES[6:],
]

FOUR_COLUMNS_MAPPING = {
    "0": "scientific_name",
    "1": "area",
    "2": "family",
    "3": "vernacular_name",
}


def _sem_rows(data):
    return [
        R(scientific_name=sn, area=a, family=f, vernacular_name=vn)
        for sn, a, f, vn in data
    ]


def _num_rows(data):
    return [R(**{"0": sn, "1": a, "2": f, "3": vn}) for sn, a, f, vn in data]


@pytest.mark.parametrize("threshold", [0.3, 0.4, 0.5, 0.6])
def test_column_aligner_four_columns_exact(threshold):
    assert (
        _merge_aligner(
            wrap(_sem_rows(SPECIES)), wrap(_num_rows(SPECIES)), threshold
        ).mapping
        == FOUR_COLUMNS_MAPPING
    )


@pytest.mark.parametrize(
    "threshold,expected",
    [
        (0.3, FOUR_COLUMNS_MAPPING),
        (0.4, FOUR_COLUMNS_MAPPING),
        (0.5, FOUR_COLUMNS_MAPPING),
        (0.6, {"1": "area", "2": "family"}),
    ],
)
def test_column_aligner_four_columns_with_text_edits(threshold, expected):
    assert (
        _merge_aligner(
            wrap(_sem_rows(SPECIES)), wrap(_num_rows(SPECIES_WITH_EDITS)), threshold
        ).mapping
        == expected
    )


@pytest.mark.parametrize("threshold", [0.3, 0.4, 0.5, 0.6])
def test_column_aligner_four_columns_partial_column_match(threshold):
    right = wrap(
        [
            R(**{"0": sn, "1": a, "2": f"REF{i:04d}", "3": vn})
            for i, (sn, a, f, vn) in enumerate(SPECIES)
        ]
    )
    assert _merge_aligner(wrap(_sem_rows(SPECIES)), right, threshold).mapping == {
        "0": "scientific_name",
        "1": "area",
        "3": "vernacular_name",
    }


def test_column_aligner_with_alias_on_semantic_to_semantic():
    left = wrap([R(familia="Apiaceae"), R(familia="Rosaceae")])
    aligner = LoadTimeColumnAligner(
        left, analyzers=[AliasLoadTimeAnalyzer({"familia": "family"})]
    )
    assert aligner.mapping == {"familia": "family"}


def test_column_aligner_alias_before_jaccard():
    left = wrap([R(family="Apiaceae"), R(family="Rosaceae")])
    right = wrap([R(**{"0": "Apiaceae"}), R(**{"0": "Rosaceae"})])
    load_aligner = LoadTimeColumnAligner(
        left, analyzers=[AliasLoadTimeAnalyzer({"family": "official_family"})]
    )
    assert load_aligner.mapping == {"family": "official_family"}
    renamed_left = wrap([load_aligner.rename_row(r) for r in left["rows"]])
    assert _merge_aligner(renamed_left, right).mapping == {"0": "official_family"}


def test_column_aligner_alias_applies_without_right_fragment():
    left = wrap([R(familia="Apiaceae"), R(familia="Rosaceae")])
    aligner = LoadTimeColumnAligner(
        left, analyzers=[AliasLoadTimeAnalyzer({"familia": "family"})]
    )
    assert aligner.mapping == {"familia": "family"}


def test_column_aligner_jaccard_no_op_without_right_fragment():
    left = wrap([R(family="Apiaceae"), R(family="Rosaceae")])
    assert _merge_aligner(left, None).mapping == {}


def test_append_column_value_str_no_dot():
    assert append_column_value("hello", "world") == "hello. world"


def test_append_column_value_str_existing_ends_with_dot():
    assert append_column_value("hello.", "world") == "hello. world"


def test_append_column_value_existing_none():
    assert append_column_value(None, "world") == "world"


def test_append_column_value_new_none():
    assert append_column_value("hello", None) == "hello"


def test_append_column_value_list():
    assert append_column_value([V("a", 2)], [V("b", 1)]) == [V("a", 2), V("b", 1)]


def test_rename_row_appends_string_when_target_column_already_exists():
    left = wrap([R(**{"notes": "hello", "description": "world"})])
    aligner = LoadTimeColumnAligner(
        left, analyzers=[AliasLoadTimeAnalyzer({"notes": "description"})]
    )
    row = R(**{"notes": "extra info", "description": "main text"})
    assert aligner.rename_row(row) == R(description="main text. extra info")


def test_rename_row_appends_string_when_target_ends_with_dot():
    left = wrap([R(**{"notes": "hello", "description": "world"})])
    aligner = LoadTimeColumnAligner(
        left, analyzers=[AliasLoadTimeAnalyzer({"notes": "description"})]
    )
    row = R(**{"notes": "extra info", "description": "main text."})
    assert aligner.rename_row(row) == R(description="main text. extra info")


def test_rename_row_appends_list_when_target_column_already_exists():
    left = wrap([R(**{"notes": "hello", "description": "world"})])
    aligner = LoadTimeColumnAligner(
        left, analyzers=[AliasLoadTimeAnalyzer({"notes": "description"})]
    )
    row = R(
        **{
            "description": [V("main text", 2)],
            "notes": [V("extra info", 1)],
        }
    )
    assert aligner.rename_row(row) == R(description=[V("main text", 2), V("extra info", 1)])
