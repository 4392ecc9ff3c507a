"""Behavioral-parity port of /root/reference/tests/test_settings.py (22)
over state/settings.py + functions/text.ColumnSchema."""

from argparse import Namespace

from paper2table_ray.functions.text import ColumnSchema
from paper2table_ray.state.settings import MergeSettings


def _full_args(**overrides):
    base = dict(
        agreement_method="simple-count",
        drop_empty_columns=True,
        drop_empty_tables=True,
        only_semantic_columns=False,
        remove_header_rows=False,
        pretty=False,
        filter_title_rows=True,
        jaccard_column_alignment=False,
        column_alignment_threshold=0.5,
        column_name_semantic_alignment=False,
        column_value_semantic_alignment=False,
        semantic_language="en",
        hints_column_alignment=None,
        fix_reversed_column_values=False,
        strip_leading_row_numbers=False,
        normalize_punctuation=False,
        split_conjunction_columns=False,
        transform_tablesfile=None,
        filter_schema_columns=False,
        order_schema_columns=False,
        coerce_schema_column_types=False,
        column_aliases=None,
        column_aliases_path=None,
        paper_aliases=None,
        paper_aliases_path=None,
        column_names_hints=None,
        column_names_hints_path=None,
        schema=None,
        schema_path=None,
        paths=["dir1"],
        # extras not in MergeSettings
        output_directory=".",
        metadata_only=False,
        export_settings=False,
        workers=1,
        paper=None,
        settings=False,
    )
    base.update(overrides)
    return Namespace(**base)


def test_from_args_maps_fields_and_ignores_extras():
    settings = MergeSettings.from_args(
        _full_args(
            agreement_method="distinct-readers",
            drop_empty_columns=False,
            only_semantic_columns=True,
            jaccard_column_alignment=True,
            column_alignment_threshold=0.7,
            semantic_language="es",
            pretty=True,
            column_aliases="familia:family",
            schema="family:str",
            paths=["dir1", "dir2"],
            workers=4,
        )
    )
    assert settings.agreement_method == "distinct-readers"
    assert settings.drop_empty_columns is False
    assert settings.jaccard_column_alignment is True
    assert settings.column_alignment_threshold == 0.7
    assert settings.semantic_language == "es"
    assert settings.column_aliases == "familia:family"
    assert settings.schema == "family:str"
    assert settings.paper_aliases is None
    assert settings.paths == ["dir1", "dir2"]


def test_from_args_reads_schema_from_path():
    settings = MergeSettings.from_args(
        _full_args(schema_path="/root/reference/tests/data/demo_schema.txt")
    )
    assert settings.schema == "name:str\nspecies:str"


def test_from_args_paths_stored_as_list():
    settings = MergeSettings.from_args(_full_args(paths=("a", "b")))
    assert settings.paths == ["a", "b"]


def test_from_dict_includes_paths():
    assert MergeSettings.from_dict({"paths": ["dir_x", "dir_y"]}).paths == [
        "dir_x",
        "dir_y",
    ]


def test_to_dict_includes_paths():
    s = MergeSettings.from_dict({"paths": ["dir_x", "dir_y"]})
    assert s.to_dict()["paths"] == ["dir_x", "dir_y"]


def test_to_dict_paths_defaults_to_empty_list():
    assert MergeSettings.from_dict({}).to_dict()["paths"] == []


def test_merge_settings_from_dict_defaults():
    assert MergeSettings.from_dict({}) == MergeSettings(
        paths=[],
        agreement_method="simple-count",
        drop_empty_columns=True,
        drop_empty_tables=True,
        only_semantic_columns=False,
        remove_header_rows=False,
        column_names_hints=None,
        schema=None,
        paper_aliases=None,
    )


def test_from_dict_ignores_unknown_attributes():
    s = MergeSettings.from_dict(
        {"agreement_method": "distinct-readers", "unknown_field": "ignored"}
    )
    assert s.agreement_method == "distinct-readers"


def test_merge_settings_from_dict_simple_fields():
    s = MergeSettings.from_dict(
        {
            "agreement_method": "distinct-readers",
            "drop_empty_columns": False,
            "drop_empty_tables": False,
            "only_semantic_columns": True,
            "remove_header_rows": True,
        }
    )
    assert s.agreement_method == "distinct-readers"
    assert s.drop_empty_columns is False
    assert s.drop_empty_tables is False
    assert s.only_semantic_columns is True
    assert s.remove_header_rows is True


def test_to_dict_simple_fields():
    d = MergeSettings.from_dict(
        {
            "agreement_method": "distinct-readers",
            "drop_empty_columns": False,
            "only_semantic_columns": True,
            "remove_header_rows": True,
        }
    ).to_dict()
    assert d["agreement_method"] == "distinct-readers"
    assert d["drop_empty_columns"] is False
    assert d["drop_empty_tables"] is True
    assert d["only_semantic_columns"] is True
    assert d["remove_header_rows"] is True


def test_to_dict_pretransformers():
    d = MergeSettings.from_dict(
        {"filter_title_rows": True, "strip_leading_row_numbers": True}
    ).to_dict()
    assert d["filter_title_rows"] is True
    assert d["strip_leading_row_numbers"] is True
    assert d["fix_reversed_column_values"] is False
    assert d["normalize_punctuation"] is False
    assert d["split_conjunction_columns"] is False


def test_to_dict_no_title_filter_when_absent():
    assert MergeSettings.from_dict({"filter_title_rows": False}).to_dict()[
        "filter_title_rows"
    ] is False


def test_to_dict_language_from_reverser():
    d = MergeSettings.from_dict(
        {"semantic_language": "es", "fix_reversed_column_values": True}
    ).to_dict()
    assert d["fix_reversed_column_values"] is True
    assert d["semantic_language"] == "es"


def test_to_dict_tablesfile_transformer_variants():
    for mode in ("explode", "safe-compact", "unsafe-compact"):
        assert (
            MergeSettings.from_dict({"transform_tablesfile": mode}).to_dict()[
                "transform_tablesfile"
            ]
            == mode
        )


def test_to_dict_analyzers():
    d = MergeSettings.from_dict(
        {
            "jaccard_column_alignment": True,
            "column_value_semantic_alignment": True,
            "column_name_semantic_alignment": False,
            "column_alignment_threshold": 0.7,
            "semantic_language": "es",
            "hints_column_alignment": "unsafe",
        }
    ).to_dict()
    assert d["jaccard_column_alignment"] is True
    assert d["column_value_semantic_alignment"] is True
    assert d["column_name_semantic_alignment"] is False
    assert d["column_alignment_threshold"] == 0.7
    assert d["semantic_language"] == "es"
    assert d["hints_column_alignment"] == "unsafe"


def test_to_dict_hints_safe_mode():
    assert (
        MergeSettings.from_dict({"hints_column_alignment": "safe"}).to_dict()[
            "hints_column_alignment"
        ]
        == "safe"
    )


def test_to_dict_postprocessors():
    d = MergeSettings.from_dict(
        {
            "filter_schema_columns": True,
            "order_schema_columns": False,
            "coerce_schema_column_types": True,
        }
    ).to_dict()
    assert d["filter_schema_columns"] is True
    assert d["order_schema_columns"] is False
    assert d["coerce_schema_column_types"] is True


def test_column_schema_from_settings_dict_empty():
    assert ColumnSchema.from_settings_dict({}) is None


def test_column_schema_from_settings_dict_round_trip():
    original = ColumnSchema.parse("family:str,count:int,name:scientific_name")
    serialized = original.serialize()
    reconstructed = ColumnSchema.from_settings_dict(serialized)
    assert reconstructed is not None
    assert reconstructed.serialize() == serialized


def test_column_schema_from_settings_dict_single_field():
    schema = ColumnSchema.from_settings_dict({"family": "str"})
    assert schema is not None
    assert schema.serialize() == {"family": "str"}
