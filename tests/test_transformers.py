"""Fragment/tablesfile transformer parity (reference
tests/test_fragment_transformer.py and test_tablesfile_transformer.py
behaviors)."""

from paper2table_ray import rowmodel as rm
from paper2table_ray.functions.text import ColumnSchema
from paper2table_ray.stages.transformers import (
    FilterEmptyRowsTransformer,
    FilterHeaderRowsTransformer,
    FilterTitleRowsTransformer,
    FragmentsExploder,
    FragmentValuesReverser,
    LeadingRowNumberTransformer,
    NormalizePunctuationTransformer,
    SafeConsecutiveFragmentsCompactor,
    SchemaPostProcessor,
    SplitColumnTransformer,
    UnsafeConsecutiveFragmentsCompactor,
    drop_empty_columns,
    drop_empty_tables,
    filter_semantic_columns,
    is_header_row,
)


def R(**cells):
    return rm.make_row(cells)


def frag(rows, page=1):
    return {"rows": rows, "page": page}


class TestFilterTitleRows:
    def test_drops_table_title_in_head(self):
        f = frag([R(a="Table 1. Species list"), R(a="Rose"), R(a="Tulip")])
        out = FilterTitleRowsTransformer().transform_fragment(f)
        assert [r["cells"]["a"] for r in out["rows"]] == ["Rose", "Tulip"]

    def test_title_split_across_cells(self):  # ref test_merge.py:981
        f = frag(
            [
                R(a="Table 1: List of med", b="icinal s", c="pecies and us"),
                R(a="Rose", b="x", c="y"),
            ]
        )
        out = FilterTitleRowsTransformer().transform_fragment(f)
        assert len(out["rows"]) == 1

    def test_fig_dot_prefix(self):
        f = frag([R(a="Fig. 2 something"), R(a="data")])
        out = FilterTitleRowsTransformer().transform_fragment(f)
        assert len(out["rows"]) == 1

    def test_keeps_rows_after_third(self):
        rows = [R(a="r1"), R(a="r2"), R(a="r3"), R(a="Table 4. deep title")]
        out = FilterTitleRowsTransformer().transform_fragment(frag(rows))
        assert len(out["rows"]) == 4

    def test_non_title_multi_cell_not_dropped(self):
        f = frag([R(a="Rose", b="Tulip"), R(a="x", b="y")])
        out = FilterTitleRowsTransformer().transform_fragment(f)
        assert len(out["rows"]) == 2


class TestLeadingRowNumber:
    def test_strips_increasing_numbers(self):
        f = frag([R(a="1. Rose"), R(a="2. Tulip"), R(a="5. Oak")])
        out = LeadingRowNumberTransformer().transform_fragment(f)
        assert [r["cells"]["a"] for r in out["rows"]] == ["Rose", "Tulip", "Oak"]

    def test_not_increasing_left_alone(self):
        f = frag([R(a="2. Rose"), R(a="1. Tulip")])
        out = LeadingRowNumberTransformer().transform_fragment(f)
        assert out["rows"][0]["cells"]["a"] == "2. Rose"

    def test_single_sample_left_alone(self):
        f = frag([R(a="1. Rose")])
        out = LeadingRowNumberTransformer().transform_fragment(f)
        assert out["rows"][0]["cells"]["a"] == "1. Rose"

    def test_non_matching_sample_blocks(self):
        f = frag([R(a="1. Rose"), R(a="Tulip")])
        out = LeadingRowNumberTransformer().transform_fragment(f)
        assert out["rows"][0]["cells"]["a"] == "1. Rose"


class TestFilterEmptyRows:
    def test_drops_empty(self):
        f = frag([R(a=""), R(a="x"), R(a="no data"), R(a=None)])
        out = FilterEmptyRowsTransformer().transform_fragment(f)
        assert len(out["rows"]) == 1


class TestNormalizePunctuation:
    def test_cells_normalized(self):
        f = frag([R(a="“quoted”", b="it…")])
        out = NormalizePunctuationTransformer().transform_fragment(f)
        assert out["rows"][0]["cells"] == {"a": "'quoted'", "b": "it..."}

    def test_vwa_lists(self):
        f = frag([rm.make_row({"a": [rm.vwa("«x»", 2)]})])
        out = NormalizePunctuationTransformer().transform_fragment(f)
        assert out["rows"][0]["cells"]["a"] == [rm.vwa("x", 2)]


class TestHeaderRows:
    def test_value_matching_own_column_name(self):
        assert is_header_row(R(family="Family", name="x"))
        assert not is_header_row(R(family="Apiaceae"))

    def test_hints_header(self):
        assert is_header_row(R(**{"0": "Scientific Name"}), hints=["scientific_name"])
        assert not is_header_row(R(**{"0": "Rose"}), hints=["scientific_name"])

    def test_filter_transformer(self):
        f = frag([R(family="Family"), R(family="Apiaceae")])
        out = FilterHeaderRowsTransformer().transform_fragment(f)
        assert len(out["rows"]) == 1


class TestSplitColumn:
    def test_finds_conjunction_split(self):
        t = SplitColumnTransformer()
        assert t.find_conjunction_split("genus_and_species") == ("genus", "species")
        assert t.find_conjunction_split("and_species") is None
        assert t.find_conjunction_split("genus_and") is None
        assert t.find_conjunction_split("plain") is None

    def test_splits_cells(self):
        t = SplitColumnTransformer()
        f = frag([R(genus_and_species="Rosa canina")])
        out = t.transform_fragment(f)
        cells = out["rows"][0]["cells"]
        assert set(cells) == {"genus", "species"}
        assert " ".join(
            v for v in [cells["genus"], cells["species"]] if v
        ).replace("  ", " ").strip() in ("Rosa canina", "Rosa canina".strip())

    def test_single_token_goes_left(self):
        t = SplitColumnTransformer()
        out = t.transform_fragment(frag([R(a_and_b="solo")]))
        assert out["rows"][0]["cells"]["a"] == "solo"
        assert out["rows"][0]["cells"]["b"] == ""


class TestValuesReverser:
    def test_reverses_mojibake(self):
        # "sunflower rose" reversed per-cell
        f = frag([R(a="rewolfnus"), R(a="esor")])
        out = FragmentValuesReverser().transform_fragment(f)
        assert [r["cells"]["a"] for r in out["rows"]] == ["sunflower", "rose"]

    def test_keeps_normal_text(self):
        f = frag([R(a="sunflower"), R(a="rose")])
        out = FragmentValuesReverser().transform_fragment(f)
        assert [r["cells"]["a"] for r in out["rows"]] == ["sunflower", "rose"]


class TestTablesfileTransforms:
    def test_exploder(self):
        tf = {
            "tables": [
                {"fragments": [frag([R(a="1")]), frag([R(a="2")], page=2)]},
            ]
        }
        out = FragmentsExploder().transform(tf)
        assert len(out["tables"]) == 2

    def test_safe_compactor_merges_adjacent_pages(self):
        tf = {
            "tables": [
                {"fragments": [frag([R(name="x")], page=1)]},
                {"fragments": [frag([R(name="y")], page=2)]},
            ]
        }
        out = SafeConsecutiveFragmentsCompactor().transform(tf)
        assert len(out["tables"]) == 1
        assert len(out["tables"][0]["fragments"]) == 2

    def test_safe_compactor_rejects_distant_pages(self):
        tf = {
            "tables": [
                {"fragments": [frag([R(name="x")], page=1)]},
                {"fragments": [frag([R(name="y")], page=5)]},
            ]
        }
        out = SafeConsecutiveFragmentsCompactor().transform(tf)
        assert len(out["tables"]) == 2

    def test_safe_compactor_rejects_numeric_columns(self):
        tf = {
            "tables": [
                {"fragments": [frag([R(**{"0": "x"})], page=1)]},
                {"fragments": [frag([R(**{"0": "y"})], page=2)]},
            ]
        }
        out = SafeConsecutiveFragmentsCompactor().transform(tf)
        assert len(out["tables"]) == 2

    def test_unsafe_compactor_merges_on_column_count(self):
        tf = {
            "tables": [
                {"fragments": [frag([R(**{"0": "x", "1": "y"})], page=1)]},
                {"fragments": [frag([R(**{"0": "a", "1": "b"})], page=9)]},
            ]
        }
        out = UnsafeConsecutiveFragmentsCompactor().transform(tf)
        assert len(out["tables"]) == 1

    def test_drop_empty_columns(self):
        tf = {"tables": [{"fragments": [frag([R(a="x", b=""), R(a="y", b=None)])]}]}
        out = drop_empty_columns(tf)
        assert out["tables"][0]["fragments"][0]["rows"][0]["cells"] == {"a": "x"}

    def test_drop_empty_tables(self):
        tf = {
            "tables": [
                {"fragments": [frag([R(a="")])]},
                {"fragments": [frag([R(a="x")])]},
            ]
        }
        out = drop_empty_tables(tf)
        assert len(out["tables"]) == 1

    def test_filter_semantic_columns(self):
        tf = {"tables": [{"fragments": [frag([R(a="x", **{"0": "n"})])]}]}
        out = filter_semantic_columns(tf)
        assert out["tables"][0]["fragments"][0]["rows"][0]["cells"] == {"a": "x"}


class TestSchemaPostProcessor:
    def test_filter_order_coerce(self):
        schema = ColumnSchema.parse("name:str count:int")
        tf = {
            "tables": [
                {"fragments": [frag([R(other="z", count="3.0", name="Rose")])]},
                {"fragments": [frag([R(unrelated="q")])]},
            ]
        }
        sp = SchemaPostProcessor(
            schema, filter_columns=True, order_columns=True, coerce_types=True
        )
        out = sp.postprocess(tf)
        assert len(out["tables"]) == 1
        cells = out["tables"][0]["fragments"][0]["rows"][0]["cells"]
        assert list(cells) == ["name", "count", "other"]
        assert cells["count"] == "3"
