"""Behavioral-parity port of /root/reference/tests/test_tablesfile_loader.py
(5) through our load phase (pipelines/merge._load_tablesfile, driven by
MergeConfig exactly as run_tablemerge drives it), plus the
transform_tablesfile wiring (settings → compactor/exploder in-phase)."""

import json

from paper2table_ray import rowmodel as rm
from paper2table_ray.pipelines.merge import MergeConfig, _load_tablesfile
from paper2table_ray.sources.tablesfile_json import parse_tablesfile


def R(**cells):
    return rm.make_row(dict(cells))


def _load(obj, **config_kwargs):
    # loader tests isolate specific transformers: default everything off
    base = dict(
        filter_title_rows=False,
        drop_empty_columns=False,
        drop_empty_tables=False,
        jaccard_alignment=False,
    )
    base.update(config_kwargs)
    cfg = MergeConfig(**base)
    return _load_tablesfile(parse_tablesfile(json.dumps(obj)), cfg)


def test_load_returns_tablesfile():
    result = _load(
        {
            "tables": [
                {"table_fragments": [{"rows": [{"species": "Ammi majus"}], "page": 1}]}
            ],
            "citation": None,
        }
    )
    assert isinstance(result, dict) and "tables" in result


def test_load_applies_filter_title_rows():
    result = _load(
        {
            "tables": [
                {
                    "table_fragments": [
                        {
                            "rows": [
                                {"0": "Figure 1. Species list"},
                                {"0": "Ammi majus", "1": "Apiaceae"},
                            ],
                            "page": 1,
                        }
                    ]
                }
            ],
            "citation": None,
        },
        filter_title_rows=True,
    )
    assert result["tables"][0]["fragments"][0]["rows"] == [
        R(**{"0": "Ammi majus", "1": "Apiaceae"})
    ]


def test_load_applies_compactor():
    result = _load(
        {
            "tables": [
                {"table_fragments": [{"rows": [{"species": "Ammi majus"}], "page": 1}]},
                {"table_fragments": [{"rows": [{"species": "Rosa canina"}], "page": 2}]},
            ],
            "citation": None,
        },
        transform_tablesfile="safe-compact",
    )
    assert result["tables"] == [
        {
            "fragments": [
                {"rows": [R(species="Ammi majus")], "page": 1},
                {"rows": [R(species="Rosa canina")], "page": 2},
            ]
        }
    ]


def test_load_applies_filter_empty_rows():
    # the empty-row filter is ALWAYS-ON at the end of the load phase
    # (tablesfile_loader appends it; our _load_tablesfile matches)
    result = _load(
        {
            "tables": [
                {
                    "table_fragments": [
                        {
                            "rows": [
                                {"0": ""},
                                {"0": "Ammi majus", "1": "Apiaceae"},
                                {"0": "", "1": ""},
                            ],
                            "page": 1,
                        }
                    ]
                }
            ],
            "citation": None,
        }
    )
    assert result["tables"][0]["fragments"][0]["rows"] == [
        R(**{"0": "Ammi majus", "1": "Apiaceae"})
    ]


def test_load_preserves_rows_without_title():
    result = _load(
        {
            "tables": [
                {
                    "table_fragments": [
                        {
                            "rows": [
                                {"0": "Ammi majus", "1": "Apiaceae"},
                                {"0": "Rosa canina", "1": "Rosaceae"},
                            ],
                            "page": 1,
                        }
                    ]
                }
            ],
            "citation": None,
        },
        filter_title_rows=True,
    )
    assert result["tables"][0]["fragments"][0]["rows"] == [
        R(**{"0": "Ammi majus", "1": "Apiaceae"}),
        R(**{"0": "Rosa canina", "1": "Rosaceae"}),
    ]


def test_unknown_transform_tablesfile_raises():
    import pytest

    with pytest.raises(ValueError, match="transform_tablesfile"):
        _load(
            {"tables": [], "citation": None},
            transform_tablesfile="bogus",
        )
