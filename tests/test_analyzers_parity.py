"""Behavioral-parity port of the reference's analyzer test corpus
(/root/reference/tests/test_analyzers.py) onto stages/aligners.py.

The six ``@pytest.mark.integration`` cases that exercise spaCy word
vectors (color/animal semantic mapping) are ported as shape-preserving
variants over the deterministic ``NgramVectorizer`` substitute — same
analyzer code paths (value-vs-name scoring, own-name guard, greedy
1-to-1, schema source/target selection), lexical stand-ins for the
word-semantic inputs. Everything else is a direct translation.
"""

from __future__ import annotations

import pytest

from paper2table_ray import rowmodel as rm
from paper2table_ray.functions.text import ColumnSchema
from paper2table_ray.stages.aligners import (
    REMOVE_COLUMN,
    AliasLoadTimeAnalyzer,
    ColumnNameSemanticLoadTimeAnalyzer,
    ColumnValueSemanticMergeTimeAnalyzer,
    HintsLoadTimeAnalyzer,
    JaccardMergeTimeAnalyzer,
    LoadTimeColumnAligner,
    MergeTimeColumnAligner,
    _greedy_assignment,
)


def R(**cells):
    return rm.make_row(dict(cells))


def V(value, level):
    return rm.vwa(value, level)


def wrap(rows):
    return {"rows": rows, "page": 1}


def cols(frag):
    return rm.fragment_column_names(frag)


# --- greedy assignment (test_analyzers.py:57-66) -----------------------------


def test_greedy_assignment_one_source_multiple_targets_highest_score_wins():
    assert _greedy_assignment([(0.9, "0", "color"), (0.7, "0", "animal")]) == {
        "0": "color"
    }


def test_greedy_assignment_multiple_sources_same_target_highest_score_wins():
    assert _greedy_assignment([(0.9, "0", "color"), (0.7, "1", "color")]) == {
        "0": "color"
    }


# --- Jaccard (test_analyzers.py:69-108) --------------------------------------


def _jaccard_map(left, right, **kw):
    return JaccardMergeTimeAnalyzer(**kw).build_mapping(
        cols(left), cols(right), left["rows"], right["rows"]
    )


def test_jaccard_numeric_to_semantic():
    left = wrap([R(**{"family": "Apiaceae"}), R(**{"family": "Rosaceae"})])
    right = wrap([R(**{"0": "Apiaceae"}), R(**{"0": "Rosaceae"})])
    assert _jaccard_map(left, right) == {"0": "family"}


def test_jaccard_both_semantic_returns_empty():
    left = wrap([R(**{"family": "Apiaceae"})])
    right = wrap([R(**{"genus": "Ammi"})])
    assert _jaccard_map(left, right) == {}


def test_jaccard_no_overlap_returns_empty():
    left = wrap([R(**{"family": "Apiaceae"})])
    right = wrap([R(**{"0": "red"})])
    assert _jaccard_map(left, right) == {}


def test_jaccard_threshold_respected():
    left = wrap([R(**{"family": "Apiaceae"}), R(**{"family": "Rosaceae"})])
    right = wrap([R(**{"0": "Apiaceae"})])
    assert _jaccard_map(left, right, threshold=0.5) == {"0": "family"}
    assert _jaccard_map(left, right, threshold=0.6) == {}


# --- alias analyzer (test_analyzers.py:110-167) ------------------------------


def test_alias_applies_known_alias():
    assert AliasLoadTimeAnalyzer({"familia": "family"}).build_mapping(
        ["familia", "family"], []
    ) == {"familia": "family"}


def test_alias_ignores_unknown_cols():
    assert (
        AliasLoadTimeAnalyzer({"familia": "family"}).build_mapping(
            ["genus", "family"], []
        )
        == {}
    )


def test_alias_maps_multiple_columns():
    assert AliasLoadTimeAnalyzer(
        {"familia": "family", "especie": "species"}
    ).build_mapping(["familia", "especie"], []) == {
        "familia": "family",
        "especie": "species",
    }


def test_alias_deduplicates_duplicate_column_names():
    assert AliasLoadTimeAnalyzer({"familia": "family"}).build_mapping(
        ["familia", "familia"], []
    ) == {"familia": "family"}


def test_alias_matches_denormalized_column_name():
    assert AliasLoadTimeAnalyzer({"utilized_part": "part_used"}).build_mapping(
        ["Utilized part"], []
    ) == {"Utilized part": "part_used"}


def test_alias_remove_column_produces_remove_sentinel():
    assert AliasLoadTimeAnalyzer({"notes": REMOVE_COLUMN}).build_mapping(
        ["family", "notes"], []
    ) == {"notes": REMOVE_COLUMN}


def test_alias_remove_column_drops_column_from_row():
    fragment = wrap([R(**{"family": "Apiaceae", "notes": "some note"})])
    aligner = LoadTimeColumnAligner(
        fragment, analyzers=[AliasLoadTimeAnalyzer({"notes": REMOVE_COLUMN})]
    )
    assert aligner.rename_row(fragment["rows"][0]) == R(family="Apiaceae")


def test_alias_remove_column_keeps_other_columns_intact():
    fragment = wrap([R(**{"family": "Apiaceae", "genus": "Ammi", "notes": "x"})])
    aligner = LoadTimeColumnAligner(
        fragment, analyzers=[AliasLoadTimeAnalyzer({"notes": REMOVE_COLUMN})]
    )
    assert aligner.rename_row(fragment["rows"][0]) == R(
        family="Apiaceae", genus="Ammi"
    )


# --- column-name semantic analyzer guards (test_analyzers.py:170-224) --------

COLOR_ANIMAL_SCHEMA = ColumnSchema({"color": str, "animal": str, "identifier": str})

SPECIES = [
    ("Ammi majus", "north", "Apiaceae", "bishop's weed"),
    ("Rosa canina", "south", "Rosaceae", "dog rose"),
    ("Mentha spicata", "east", "Lamiaceae", "spearmint"),
]


def test_semantic_returns_empty_when_both_numeric():
    left = wrap([R(**{"0": "Apiaceae"}), R(**{"0": "Rosaceae"})])
    right = wrap([R(**{"1": "Apiaceae"}), R(**{"1": "Rosaceae"})])
    result = ColumnNameSemanticLoadTimeAnalyzer().build_mapping(
        cols(left) + cols(right), left["rows"]
    )
    assert result == {}


def test_semantic_returns_empty_when_both_semantic():
    left = wrap([R(**{"family": "Apiaceae"})])
    right = wrap([R(**{"genus": "Ammi"})])
    result = ColumnNameSemanticLoadTimeAnalyzer().build_mapping(
        cols(left) + cols(right), left["rows"]
    )
    assert result == {}


def test_semantic_returns_empty_when_numeric_rows_are_empty():
    left = wrap([R(**{"family": "Apiaceae"})])
    assert (
        ColumnNameSemanticLoadTimeAnalyzer().build_mapping(cols(left), left["rows"])
        == {}
    )


def test_semantic_returns_empty_both_numeric_species_data():
    rows = [
        R(**{"0": sn, "1": area, "2": fam, "3": vn})
        for sn, area, fam, vn in SPECIES
    ]
    left = wrap(rows)
    assert (
        ColumnNameSemanticLoadTimeAnalyzer().build_mapping(cols(left), left["rows"])
        == {}
    )


def test_semantic_returns_empty_both_semantic_species_data():
    rows = [
        R(scientific_name=sn, area=area, family=fam, vernacular_name=vn)
        for sn, area, fam, vn in SPECIES
    ]
    left = wrap(rows)
    assert (
        ColumnNameSemanticLoadTimeAnalyzer().build_mapping(cols(left), left["rows"])
        == {}
    )


# --- semantic positive paths (shape-preserving n-gram variants of the
# reference's spaCy integration cases, test_analyzers.py:226-518) -------------


def test_semantic_maps_numeric_to_schema_column_ngram_variant():
    # numeric column whose values are lexically close to schema name
    # "identifier" → mapped; values far from every schema name → not
    schema = ColumnSchema({"identifier": str})
    left = wrap(
        [
            R(**{"0": "identifier A-1", "1": "zzz qqq"}),
            R(**{"0": "identifier B-2", "1": "www ppp"}),
        ]
    )
    result = ColumnNameSemanticLoadTimeAnalyzer(
        threshold=0.3, schema=schema
    ).build_mapping(cols(left), left["rows"])
    assert result == {"0": "identifier"}


def test_semantic_does_not_map_below_threshold_ngram_variant():
    schema = ColumnSchema({"identifier": str})
    left = wrap([R(**{"0": "zzz qqq"}), R(**{"0": "www ppp"})])
    result = ColumnNameSemanticLoadTimeAnalyzer(
        threshold=0.9, schema=schema
    ).build_mapping(cols(left), left["rows"])
    assert result == {}


def test_semantic_maps_semantic_not_in_schema_column_ngram_variant():
    # semantic column "identificador" (not in schema) renamed to schema
    # "identifier" when its VALUES score higher against the schema name
    # than against its own name (own-name guard, analyzers.py:208-216)
    schema = ColumnSchema({"identifier": str})
    left = wrap(
        [
            R(identificador="identifier one"),
            R(identificador="identifier two"),
        ]
    )
    result = ColumnNameSemanticLoadTimeAnalyzer(
        threshold=0.3, schema=schema
    ).build_mapping(cols(left), left["rows"])
    assert result == {"identificador": "identifier"}


def test_semantic_does_not_rename_semantic_column_when_own_name_is_closer():
    # values match the column's OWN name best → guard suppresses rename
    schema = ColumnSchema({"identifier": str})
    left = wrap(
        [R(codename="codename alpha"), R(codename="codename beta")]
    )
    result = ColumnNameSemanticLoadTimeAnalyzer(
        threshold=0.1, schema=schema
    ).build_mapping(cols(left), left["rows"])
    assert result == {}


def test_semantic_chain_does_not_disrupt_jaccard_on_species_exact():
    # Jaccard maps the numeric side exactly; the semantic analyzer in the
    # same merge-time chain must not override those assignments
    left = wrap(
        [R(family=fam, scientific_name=sn) for sn, _a, fam, _v in SPECIES]
    )
    right = wrap(
        [R(**{"0": fam, "1": sn}) for sn, _a, fam, _v in SPECIES]
    )
    aligner = MergeTimeColumnAligner(
        right,
        left,
        analyzers=[
            JaccardMergeTimeAnalyzer(),
            ColumnValueSemanticMergeTimeAnalyzer(threshold=0.3),
        ],
    )
    assert aligner.mapping == {"0": "family", "1": "scientific_name"}


# --- analyzer chains (test_analyzers.py:587-613) -----------------------------


def test_chain_alias_before_jaccard():
    left = wrap([R(**{"family": "Apiaceae"}), R(**{"family": "Rosaceae"})])
    right = wrap([R(**{"0": "Apiaceae"}), R(**{"0": "Rosaceae"})])
    load_aligner = LoadTimeColumnAligner(
        left, analyzers=[AliasLoadTimeAnalyzer({"family": "official_family"})]
    )
    assert load_aligner.mapping == {"family": "official_family"}
    renamed_left = wrap([load_aligner.rename_row(r) for r in left["rows"]])
    merge_aligner = MergeTimeColumnAligner(
        renamed_left, right, analyzers=[JaccardMergeTimeAnalyzer()]
    )
    assert merge_aligner.mapping == {"0": "official_family"}


def test_chain_hints_then_alias_renames_through_intermediate_name():
    fragment = wrap([R(**{"0": "species"})])
    aligner = LoadTimeColumnAligner(
        fragment,
        analyzers=[
            HintsLoadTimeAnalyzer(["species"]),
            AliasLoadTimeAnalyzer({"species": "scientific_name"}),
        ],
    )
    assert aligner.mapping == {
        "0": "scientific_name",
        "species": "scientific_name",
    }


# --- hints analyzer (test_analyzers.py:615-810) ------------------------------


def _hints(left, hints, safe=True):
    return HintsLoadTimeAnalyzer(hints, safe=safe).build_mapping(
        cols(left), left["rows"]
    )


def test_hints_returns_empty_when_no_non_semantic_columns():
    left = wrap([R(species="species", family="family")])
    assert _hints(left, ["species", "family"]) == {}


def test_hints_returns_empty_when_first_row_values_not_in_hints():
    left = wrap([R(**{"0": "Ammi majus", "1": "Apiaceae"})])
    assert _hints(left, ["species", "family"]) == {}


def test_hints_renames_all_columns_when_any_value_matches_hint():
    left = wrap([R(**{"0": "species", "1": "Apiaceae"})])
    assert _hints(left, ["species", "family"]) == {"0": "species", "1": "apiaceae"}


def test_hints_renames_columns_when_all_first_row_values_match():
    left = wrap(
        [
            R(**{"0": "species", "1": "family"}),
            R(**{"0": "Ammi majus", "1": "Apiaceae"}),
        ]
    )
    assert _hints(left, ["species", "family"]) == {"0": "species", "1": "family"}


def test_hints_normalizes_first_row_values_before_comparing():
    left = wrap([R(**{"0": "Scientific Name", "1": "Family"})])
    assert _hints(left, ["scientific_name", "family"]) == {
        "0": "scientific_name",
        "1": "family",
    }


def test_hints_normalizes_space_separated_value_to_underscore_hint():
    left = wrap([R(**{"1": "Scientific name"})])
    assert _hints(left, ["scientific_name"]) == {"1": "scientific_name"}


def test_hints_normalizes_accented_value_to_ascii_hint():
    left = wrap([R(**{"0": "Preparación"})])
    assert _hints(left, ["preparacion"]) == {"0": "preparacion"}


def test_hints_skips_empty_rows_before_header_row():
    left = wrap(
        [
            R(**{"0": "", "1": ""}),
            R(**{"0": "", "1": ""}),
            R(**{"0": "species", "1": "family"}),
        ]
    )
    assert _hints(left, ["species", "family"]) == {"0": "species", "1": "family"}


def test_hints_maps_only_non_empty_hint_matching_cells_in_header_row():
    left = wrap(
        [
            R(**{"0": "", "1": ""}),
            R(**{"0": "species", "1": ""}),
        ]
    )
    assert _hints(left, ["species", "family"]) == {"0": "species"}


def test_hints_renames_all_columns_including_non_hint_values():
    left = wrap(
        [
            R(**{"0": "", "1": ""}),
            R(**{"0": "species", "1": "foo"}),
        ]
    )
    assert _hints(left, ["species", "family"]) == {"0": "species", "1": "foo"}


def test_hints_renames_all_columns_when_single_hint_matches():
    left = wrap(
        [
            R(
                **{
                    "0": "family",
                    "1": "Scientific name",
                    "2": "Species",
                    "3": "Notes",
                }
            )
        ]
    )
    assert _hints(left, ["family"]) == {
        "0": "family",
        "1": "scientific_name",
        "2": "species",
        "3": "notes",
    }


def test_hints_skips_null_column_when_other_columns_trigger_mapping():
    left = wrap(
        [
            R(
                **{
                    "0": "family",
                    "1": "Scientific name",
                    "2": "species",
                    "3": None,
                }
            )
        ]
    )
    assert _hints(left, ["family"]) == {
        "0": "family",
        "1": "scientific_name",
        "2": "species",
    }


def test_hints_returns_empty_when_all_first_row_cells_are_empty():
    left = wrap([R(**{"0": "", "1": ""})])
    assert _hints(left, ["species", "family"]) == {}


def test_hints_handles_value_with_agreement_cells():
    left = wrap([R(**{"0": [V("species", 1)]})])
    assert _hints(left, ["species", "family"]) == {"0": "species"}


def test_hints_unsafe_renames_semantic_columns_when_values_match_hints():
    left = wrap([R(species="species", family="family")])
    assert _hints(left, ["species", "family"], safe=False) == {
        "species": "species",
        "family": "family",
    }


def test_hints_unsafe_renames_mix_of_semantic_and_numeric_columns():
    left = wrap([R(**{"0": "species", "family": "family"})])
    assert _hints(left, ["species", "family"], safe=False) == {
        "0": "species",
        "family": "family",
    }


def test_hints_safe_still_returns_empty_when_all_columns_are_semantic():
    left = wrap([R(species="species", family="family")])
    assert _hints(left, ["species", "family"], safe=True) == {}


def test_hints_unsafe_returns_empty_when_no_rows_match_hints():
    left = wrap([R(species="Ammi majus", family="Apiaceae")])
    assert _hints(left, ["species", "family"], safe=False) == {}


# --- value-string helpers (test_analyzers.py:813-818) ------------------------


def test_column_value_to_strings_returns_empty_for_none():
    assert rm.value_to_strings(None) == []


def test_extract_column_str_values_returns_empty_for_none():
    assert JaccardMergeTimeAnalyzer().extract_column_str_values(None) == []


# --- schema-driven Jaccard (test_analyzers.py:821-866) -----------------------


def test_jaccard_renames_semantic_not_in_schema_to_schema_column():
    schema = ColumnSchema({"family": str})
    left = wrap([R(**{"familia": "Apiaceae"}), R(**{"familia": "Rosaceae"})])
    right = wrap([R(family="Apiaceae"), R(family="Rosaceae")])
    assert _jaccard_map(left, right, schema=schema) == {"familia": "family"}


def test_jaccard_renames_semantic_not_in_schema_to_schema_column_with_partial_overlap():
    schema = ColumnSchema({"family": str})
    left = wrap(
        [
            R(**{"familia": "Apiaceae"}),
            R(**{"familia": "Rosaceae"}),
            R(**{"familia": "Lamiaceae"}),
        ]
    )
    right = wrap(
        [R(family="Apiaceae"), R(family="Rosaceae"), R(family="Asteraceae")]
    )
    assert _jaccard_map(left, right, schema=schema) == {"familia": "family"}


def test_jaccard_both_out_of_schema_with_schema_returns_empty():
    schema = ColumnSchema({"family": str})
    left = wrap([R(**{"familia": "Apiaceae"})])
    right = wrap([R(**{"especie": "Ammi"})])
    assert _jaccard_map(left, right, schema=schema) == {}


def test_jaccard_schema_column_not_renamed_even_with_schema():
    schema = ColumnSchema({"family": str})
    left = wrap([R(family="Apiaceae"), R(family="Rosaceae")])
    right = wrap([R(family="Apiaceae"), R(family="Rosaceae")])
    assert _jaccard_map(left, right, schema=schema) == {}


# --- column-value semantic merge analyzer guards (test_analyzers.py:869-895) -


def _cvs_map(left, right, **kw):
    return ColumnValueSemanticMergeTimeAnalyzer(**kw).build_mapping(
        cols(left), cols(right), left["rows"], right["rows"]
    )


def test_column_value_semantic_returns_empty_when_both_numeric():
    left = wrap([R(**{"0": "Apiaceae"}), R(**{"0": "Rosaceae"})])
    right = wrap([R(**{"1": "Apiaceae"}), R(**{"1": "Rosaceae"})])
    assert _cvs_map(left, right) == {}


def test_column_value_semantic_returns_empty_when_both_semantic():
    left = wrap([R(**{"family": "Apiaceae"})])
    right = wrap([R(**{"genus": "Ammi"})])
    assert _cvs_map(left, right) == {}


def test_column_value_semantic_returns_empty_when_left_has_mixed_columns():
    left = wrap([R(**{"0": "Apiaceae", "family": "Rosaceae"})])
    right = wrap([R(**{"1": "Ammi"})])
    assert _cvs_map(left, right) == {}


def test_column_value_semantic_maps_numeric_by_value_similarity_ngram_variant():
    # numeric columns whose values are lexically close to the opposing
    # fragment's semantic column names → mapped (value-vs-target scoring)
    left = wrap(
        [
            R(identifier="identifier one", station="station alpha"),
            R(identifier="identifier two", station="station beta"),
        ]
    )
    right = wrap(
        [
            R(**{"0": "identifier x9", "1": "station gamma"}),
            R(**{"0": "identifier y7", "1": "station delta"}),
        ]
    )
    assert _cvs_map(left, right, threshold=0.3) == {
        "0": "identifier",
        "1": "station",
    }


def test_column_value_semantic_renames_semantic_via_schema_ngram_variant():
    schema = ColumnSchema({"identifier": str, "station": str})
    left = wrap(
        [
            R(identifier="identifier one", station="station alpha"),
        ]
    )
    right = wrap(
        [
            R(**{"ident_misc": "identifier x9", "loc_misc": "station gamma"}),
        ]
    )
    assert _cvs_map(left, right, threshold=0.3, schema=schema) == {
        "ident_misc": "identifier",
        "loc_misc": "station",
    }


# --- remaining spaCy-integration ports (round 3) -----------------------------
# Spanish color/animal cases (test_analyzers.py:346-416, 418-516) as
# shape-preserving n-gram variants with accented Spanish inputs — the
# non-ASCII fold path is the part that differs from the English variants.

COLOR_ANIMAL_SCHEMA_ES = ColumnSchema(
    {"color": str, "animal": str, "identificador": str}
)


def test_semantic_maps_color_and_animal_columns_in_spanish_ngram_variant():
    # ref test_analyzers.py:346-416: numeric columns whose (Spanish,
    # accented) values are close to the ES schema names map; the code
    # column does not.
    left = wrap(
        [
            R(**{"0": "color carmesí", "1": "animal águila", "2": "REF001"}),
            R(**{"0": "color añil", "1": "animal cigüeña", "2": "REF002"}),
        ]
    )
    result = ColumnNameSemanticLoadTimeAnalyzer(
        threshold=0.3, schema=COLOR_ANIMAL_SCHEMA_ES
    ).build_mapping(cols(left), left["rows"])
    assert result == {"0": "color", "1": "animal"}


def test_semantic_does_not_map_below_threshold_in_spanish_ngram_variant():
    # ref test_analyzers.py:418-516: same ES schema, values far from
    # every schema name at a high threshold → no mapping.
    left = wrap(
        [
            R(**{"0": "zumaque pálido", "1": "ñandú veloz"}),
            R(**{"0": "berenjena fría", "1": "ornitorrinco"}),
        ]
    )
    result = ColumnNameSemanticLoadTimeAnalyzer(
        threshold=0.9, schema=COLOR_ANIMAL_SCHEMA_ES
    ).build_mapping(cols(left), left["rows"])
    assert result == {}


# Chain case (test_analyzers.py:551-585): direct port — the semantic
# comparisons here are over identical column-name tokens, which the
# n-gram vectorizer scores exactly like word vectors do.

SPECIES_SCHEMA = ColumnSchema(
    {"scientific_name": str, "area": str, "family": str, "vernacular_name": str}
)

SPECIES20 = [
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

SPECIES20_WITH_EDITS = [
    ("Ammi majus", "45.2", "Apiaceae", "Greater ammi spp."),
    ("Rosa canina, L.", "12.8", "Rosaceae", "Dog-rose"),
    ("Mentha spicata", "67.3", "Lamiaceae", "Spearmint herb"),
    ("Betula pendula Rot", "89.1", "Betulaceae", "Silver-birch"),
    ("Quercus robur", "23.4", "Fagaceae", "Eng. oak"),
    ("T. officinale F.H.Wigg.", "56.7", "Asteraceae", "Dandelyon"),
    *SPECIES20[6:],
]


def test_semantic_chain_species_edits_preserves_jaccard_mappings():
    # ref test_analyzers.py:551-585
    left = wrap(
        [
            R(scientific_name=sn, area=a, family=f, vernacular_name=vn)
            for sn, a, f, vn in SPECIES20
        ]
    )
    right = wrap(
        [
            R(**{"0": sn, "1": a, "2": f, "3": vn})
            for sn, a, f, vn in SPECIES20_WITH_EDITS
        ]
    )
    jaccard_mapping = MergeTimeColumnAligner(
        right, left, analyzers=[JaccardMergeTimeAnalyzer(threshold=0.6)]
    ).mapping
    assert jaccard_mapping == {"1": "area", "2": "family"}

    load_aligner = LoadTimeColumnAligner(
        left,
        analyzers=[
            ColumnNameSemanticLoadTimeAnalyzer(threshold=0.1, schema=SPECIES_SCHEMA)
        ],
    )
    renamed_left = wrap([load_aligner.rename_row(r) for r in left["rows"]])
    chain_mapping = MergeTimeColumnAligner(
        right, renamed_left, analyzers=[JaccardMergeTimeAnalyzer(threshold=0.6)]
    ).mapping
    assert chain_mapping["1"] == "area"
    assert chain_mapping["2"] == "family"
