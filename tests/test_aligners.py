"""Analyzer + aligner-chain parity (reference tests/test_analyzers.py and
test_columns_aligner.py behaviors)."""

from paper2table_ray import rowmodel as rm
from paper2table_ray.functions.text import ColumnSchema
from paper2table_ray.stages.aligners import (
    REMOVE_COLUMN,
    AliasLoadTimeAnalyzer,
    BaseColumnAligner,
    ColumnNamesNormalizerLoadTimeAnalyzer,
    HintsLoadTimeAnalyzer,
    JaccardMergeTimeAnalyzer,
    LoadTimeColumnAligner,
    MergeTimeColumnAligner,
    append_column_value,
    parse_column_aliases,
    parse_paper_aliases,
    renamable_source_columns,
    renamable_target_columns,
)


def R(**cells):
    return rm.make_row(cells)


def frag(rows, page=1):
    return {"rows": rows, "page": page}


class TestNormalizerAnalyzer:
    def test_maps_only_changed(self):
        a = ColumnNamesNormalizerLoadTimeAnalyzer()
        m = a.build_mapping(["Family Name", "ok"], [])
        assert m == {"Family Name": "family_name"}


class TestHintsAnalyzer:
    def test_renames_all_candidates_when_hint_hits(self):
        a = HintsLoadTimeAnalyzer(hints=["family"])
        rows = [R(**{"0": "Family", "1": "Notes col"}), R(**{"0": "Apiaceae", "1": "x"})]
        m = a.build_mapping(["0", "1"], rows)
        assert m == {"0": "family", "1": "notes_col"}

    def test_no_hint_no_mapping(self):
        a = HintsLoadTimeAnalyzer(hints=["family"])
        rows = [R(**{"0": "Rose"})]
        assert a.build_mapping(["0"], rows) == {}

    def test_safe_ignores_semantic_columns(self):
        a = HintsLoadTimeAnalyzer(hints=["family"], safe=True)
        rows = [R(name="Family")]
        assert a.build_mapping(["name"], rows) == {}

    def test_unsafe_considers_semantic(self):
        a = HintsLoadTimeAnalyzer(hints=["family"], safe=False)
        rows = [R(name="Family")]
        assert a.build_mapping(["name"], rows) == {"name": "family"}

    def test_skips_empty_rows(self):
        a = HintsLoadTimeAnalyzer(hints=["family"])
        rows = [R(**{"0": ""}), R(**{"0": "Family"})]
        assert a.build_mapping(["0"], rows) == {"0": "family"}


class TestAliasAnalyzer:
    def test_normalized_key_match(self):
        a = AliasLoadTimeAnalyzer({"Familia": "family", "notes": REMOVE_COLUMN})
        m = a.build_mapping(["familia", "notes", "other"], [])
        assert m == {"familia": "family", "notes": REMOVE_COLUMN}

    def test_parse_column_aliases(self):
        assert parse_column_aliases("familia:family notes:<remove>") == {
            "familia": "family",
            "notes": "<remove>",
        }

    def test_parse_paper_aliases(self):
        m = parse_paper_aliases("alias:canonical other:base:3")
        assert m["alias"] == ("canonical", 0)
        assert m["other"] == ("base", 3)


class TestJaccard:
    def test_numeric_to_semantic(self):
        left = [R(family="Apiaceae"), R(family="Rosaceae")]
        right = [R(**{"0": "apiaceae"}), R(**{"0": "rosaceae"})]
        a = JaccardMergeTimeAnalyzer()
        m = a.build_mapping(["family"], ["0"], left, right)
        assert m == {"0": "family"}

    def test_requires_one_numeric_one_semantic_side(self):
        left = [R(family="Apiaceae", **{"0": "x"})]
        right = [R(**{"0": "apiaceae"})]
        a = JaccardMergeTimeAnalyzer()
        assert a.build_mapping(["family", "0"], ["0"], left, right) == {}

    def test_below_threshold_no_map(self):
        left = [R(family="Apiaceae")]
        right = [R(**{"0": "zzz"})]
        assert JaccardMergeTimeAnalyzer().build_mapping(["family"], ["0"], left, right) == {}

    def test_schema_extends_targets(self):
        schema = ColumnSchema.parse("family:str")
        left = [R(weird="Apiaceae")]
        right = [R(family="apiaceae")]
        a = JaccardMergeTimeAnalyzer(schema=schema)
        m = a.build_mapping(["weird"], ["family"], left, right)
        assert m == {"weird": "family"}

    def test_renamable_helpers(self):
        schema = ColumnSchema.parse("family:str")
        assert renamable_source_columns(["family", "x", "0"], schema) == ["x", "0"]
        assert renamable_target_columns(["family", "x"], schema) == ["family"]
        assert renamable_source_columns(["a", "0"], None) == ["0"]
        assert renamable_target_columns(["a", "0"], None) == ["a"]


class TestAlignerChains:
    def test_append_column_value(self):
        assert append_column_value(None, "x") == "x"
        assert append_column_value("x", None) == "x"
        assert append_column_value("a", "b") == "a. b"
        assert append_column_value("a.", "b") == "a. b"
        assert append_column_value("", "b") == "b"
        assert append_column_value([rm.vwa("a", 1)], [rm.vwa("b", 1)]) == [
            rm.vwa("a", 1),
            rm.vwa("b", 1),
        ]

    def test_rename_row_remove_and_collision(self):
        aligner = BaseColumnAligner()
        aligner.mapping = {"x": "a", "drop": REMOVE_COLUMN}
        row = rm.make_row({"a": "first", "x": "second", "drop": "gone"})
        out = aligner.rename_row(row)
        assert out["cells"] == {"a": "first. second"}

    def test_load_time_chain_accumulates(self):
        f = frag([R(**{"Familia": "Family"}), R(**{"Familia": "Apiaceae"})])
        aligner = LoadTimeColumnAligner(
            f,
            analyzers=[
                ColumnNamesNormalizerLoadTimeAnalyzer(),
                AliasLoadTimeAnalyzer({"familia": "family"}),
            ],
        )
        # Familia → familia (normalize) → family (alias, re-chained)
        assert aligner.mapping == {"Familia": "family", "familia": "family"}
        out = aligner.rename_row(f["rows"][1])
        assert out["cells"] == {"family": "Apiaceae"}

    def test_merge_time_aligner_jaccard(self):
        left = frag([R(family="Apiaceae"), R(family="Rosaceae")])
        right = frag([R(**{"0": "apiaceae"}), R(**{"0": "rosaceae"})])
        aligner = MergeTimeColumnAligner(
            left, right, analyzers=[JaccardMergeTimeAnalyzer()]
        )
        assert aligner.mapping == {"0": "family"}

    def test_empty_fragment_no_mapping(self):
        aligner = LoadTimeColumnAligner(
            frag([]), analyzers=[ColumnNamesNormalizerLoadTimeAnalyzer()]
        )
        assert aligner.mapping == {}
