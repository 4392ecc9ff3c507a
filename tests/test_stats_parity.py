"""Behavioral-parity port of the reference's stats test corpus
(/root/reference/tests/test_stats.py, 40 cases) over stages/stats.py.
``make_paper`` feeds the reference's JSON table shapes through our own
loader (sources/tablesfile_json.parse_tablesfile), so the row_/
agreement_level_ metadata keys and both Table shapes are exercised."""

import json

import pytest

from paper2table_ray.sources.tablesfile_json import parse_tablesfile
from paper2table_ray.stages.stats import (
    _count_shared_values,
    _row_value_strings,
    accumulate_global,
    compute_paper_stats,
    format_stats,
    infer_type,
)


def make_paper(tables):
    return parse_tablesfile({"citation": None, "tables": tables})


# --- compute_paper_stats (test_stats.py:19-107) ------------------------------


def test_empty_paper():
    stats = compute_paper_stats(make_paper([]))
    assert stats["tables"] == 0
    assert stats["fragments"] == 0
    assert stats["rows"] == 0
    assert stats["columns"] == 0
    assert stats["rows_with_agreement"] == 0
    assert stats["agreement_percentage"] is None


def test_paper_with_one_table_one_row():
    stats = compute_paper_stats(
        make_paper([{"rows": [{"family": "Apiaceae"}], "page": 1}])
    )
    assert stats["tables"] == 1
    assert stats["fragments"] == 1
    assert stats["rows"] == 1
    assert stats["columns"] == 1
    assert stats["rows_with_agreement"] == 0
    assert stats["agreement_percentage"] == 0.0


def test_paper_with_agreement_levels():
    stats = compute_paper_stats(
        make_paper(
            [
                {
                    "page": 1,
                    "rows": [
                        {"family": "Apiaceae", "agreement_level_": 0},
                        {"family": "Rosaceae", "agreement_level_": 2},
                        {"family": "Lamiaceae", "agreement_level_": 3},
                    ],
                }
            ]
        )
    )
    assert stats["rows"] == 3
    assert stats["rows_with_agreement"] == 2
    assert pytest.approx(stats["agreement_percentage"], rel=1e-3) == (2 / 3) * 100


def test_multiple_tables():
    stats = compute_paper_stats(
        make_paper(
            [
                {"page": 1, "rows": [{"family": "Apiaceae"}, {"family": "Rosaceae"}]},
                {"page": 2, "rows": [{"family": "Lamiaceae", "agreement_level_": 2}]},
            ]
        )
    )
    assert stats["tables"] == 2
    assert stats["fragments"] == 2
    assert stats["rows"] == 3
    assert stats["columns"] == 1
    assert stats["rows_with_agreement"] == 1
    assert stats["agreement_percentage"] == pytest.approx((1 / 3) * 100)


def test_table_with_multiple_fragments_counts_each():
    stats = compute_paper_stats(
        make_paper(
            [
                {
                    "table_fragments": [
                        {"page": 1, "rows": [{"family": "Apiaceae"}]},
                        {"page": 2, "rows": [{"family": "Rosaceae"}]},
                    ]
                }
            ]
        )
    )
    assert stats["tables"] == 1
    assert stats["fragments"] == 2
    assert stats["rows"] == 2


def test_columns_counts_unique_across_fragments():
    stats = compute_paper_stats(
        make_paper(
            [
                {"page": 1, "rows": [{"family": "Apiaceae", "genus": "Ammi"}]},
                {"page": 2, "rows": [{"family": "Rosaceae", "color": "red"}]},
            ]
        )
    )
    assert stats["columns"] == 3


# --- infer_type (test_stats.py:110-127) --------------------------------------


def test_infer_type_int():
    assert infer_type("42") == "int"


def test_infer_type_float():
    assert infer_type("3.14") == "float"


def test_infer_type_bool():
    assert infer_type("true") == "bool"
    assert infer_type("False") == "bool"


def test_infer_type_str():
    assert infer_type("Apiaceae") == "str"


def test_infer_type_with_agreement_list():
    assert infer_type([{"value": "99", "agreement_level": 2}]) == "int"


# --- format_stats / global accumulation (test_stats.py:130-250) --------------

_EMPTY_GLOBAL = dict(
    papers=1,
    tables=1,
    fragments=2,
    rows=2,
    unique_rows=0,
    rows_with_agreement=0,
    rows_in_shared_groups=0,
    rows_with_shared_values=0,
    global_agreement_percentage=None,
    global_shared_values_percentage=None,
)


def test_format_stats_with_columns():
    output = format_stats(
        dict(_EMPTY_GLOBAL), columns={"species": "str", "count": "int"}
    )
    assert "Unique Columns:" in output
    assert "species:str" in output
    assert "count:int" in output


def test_format_stats_without_columns():
    assert "Unique Columns:" not in format_stats(dict(_EMPTY_GLOBAL))


def test_global_agreement_percentage_no_rows():
    assert accumulate_global([])["global_agreement_percentage"] is None


def test_global_agreement_percentage_accumulates_across_papers():
    paper_a = make_paper(
        [
            {
                "page": 1,
                "rows": [
                    {"family": "Apiaceae", "agreement_level_": 2},
                    {"family": "Rosaceae", "agreement_level_": 0},
                ],
            }
        ]
    )
    paper_b = make_paper(
        [
            {
                "page": 1,
                "rows": [
                    {"family": "Lamiaceae", "agreement_level_": 3},
                    {"family": "Asteraceae", "agreement_level_": 1},
                ],
            }
        ]
    )
    out = accumulate_global(
        [compute_paper_stats(paper_a), compute_paper_stats(paper_b)]
    )
    assert out["rows"] == 4
    assert out["rows_with_agreement"] == 2
    assert out["global_agreement_percentage"] == pytest.approx(50.0)


def test_format_stats_shows_global_agreement_percentage():
    s = dict(_EMPTY_GLOBAL, rows=4, rows_with_agreement=2,
             global_agreement_percentage=50.0)
    assert "Global agreement percentage: 50.00%" in format_stats(s)


def test_format_stats_omits_global_agreement_percentage_when_none():
    assert "Global agreement percentage" not in format_stats(dict(_EMPTY_GLOBAL))


# --- unique rows (test_stats.py:252-332) -------------------------------------


def test_unique_rows_no_row_attribute():
    stats = compute_paper_stats(
        make_paper(
            [{"page": 1, "rows": [{"family": "Apiaceae"}, {"family": "Rosaceae"}]}]
        )
    )
    assert stats["unique_rows"] == 0


def test_unique_rows_single_table():
    stats = compute_paper_stats(
        make_paper(
            [
                {
                    "page": 1,
                    "rows": [
                        {"family": "Apiaceae", "row_": 1},
                        {"family": "Rosaceae", "row_": 1},
                        {"family": "Lamiaceae", "row_": 2},
                        {"family": "Asteraceae", "row_": 2},
                        {"family": "Fabaceae", "row_": 2},
                    ],
                }
            ]
        )
    )
    assert stats["unique_rows"] == 2


def test_unique_rows_multiple_tables():
    stats = compute_paper_stats(
        make_paper(
            [
                {
                    "page": 1,
                    "rows": [
                        {"family": "Apiaceae", "row_": 1},
                        {"family": "Rosaceae", "row_": 1},
                        {"family": "Lamiaceae", "row_": 2},
                        {"family": "Asteraceae", "row_": 2},
                        {"family": "Fabaceae", "row_": 2},
                    ],
                },
                {
                    "page": 2,
                    "rows": [
                        {"family": "Poaceae", "row_": 1},
                        {"family": "Cyperaceae", "row_": 2},
                        {"family": "Orchidaceae", "row_": 3},
                        {"family": "Bromeliaceae", "row_": 4},
                    ],
                },
            ]
        )
    )
    assert stats["unique_rows"] == 6


def test_unique_rows_across_fragments():
    stats = compute_paper_stats(
        make_paper(
            [
                {
                    "table_fragments": [
                        {
                            "page": 1,
                            "rows": [
                                {"family": "Apiaceae", "row_": 1},
                                {"family": "Rosaceae", "row_": 2},
                            ],
                        },
                        {
                            "page": 2,
                            "rows": [
                                {"family": "Lamiaceae", "row_": 2},
                                {"family": "Asteraceae", "row_": 3},
                            ],
                        },
                    ]
                }
            ]
        )
    )
    assert stats["unique_rows"] == 3


# --- collect_unique_columns (test_stats.py:335-361) --------------------------


@pytest.mark.usefixtures("ray_session")
class TestCollectUniqueColumns:
    def test_collect_unique_columns(self, tmp_path):
        from paper2table_ray.sources.tablesfile_json import read_resultsets
        from paper2table_ray.stages.stats import collect_unique_columns

        data = {
            "citation": None,
            "tables": [
                {
                    "page": 1,
                    "rows": [{"species": "Apiaceae", "count": "42", "1": "ignored"}],
                }
            ],
        }
        (tmp_path / "paper.tables.json").write_text(json.dumps(data))
        columns = collect_unique_columns(read_resultsets([str(tmp_path)]))
        assert columns == {"species": "str", "count": "int"}
        assert "1" not in columns

    def test_collect_unique_columns_deduplicates(self, tmp_path):
        from paper2table_ray.sources.tablesfile_json import read_resultsets
        from paper2table_ray.stages.stats import collect_unique_columns

        data_a = {
            "citation": None,
            "tables": [{"page": 1, "rows": [{"species": "Apiaceae", "count": "42"}]}],
        }
        data_b = {
            "citation": None,
            "tables": [{"page": 1, "rows": [{"species": "Rosaceae", "count": "100"}]}],
        }
        (tmp_path / "a.tables.json").write_text(json.dumps(data_a))
        (tmp_path / "b.tables.json").write_text(json.dumps(data_b))
        columns = collect_unique_columns(read_resultsets([str(tmp_path)]))
        assert set(columns) == {"species", "count"}


# --- row_value_strings / count_shared_values (test_stats.py:364-520) ---------


def _first_row(paper):
    return paper["tables"][0]["fragments"][0]["rows"][0]


def test_row_value_strings_plain_strings():
    paper = make_paper(
        [{"page": 1, "rows": [{"family": "Apiaceae", "genus": "Ammi", "row_": 1}]}]
    )
    assert _row_value_strings(_first_row(paper)) == frozenset(
        {("family", "Apiaceae"), ("genus", "Ammi")}
    )


def test_row_value_strings_agreement_list():
    paper = make_paper(
        [
            {
                "page": 1,
                "rows": [
                    {"family": [{"value": "Apiaceae", "agreement_level": 2}], "row_": 1}
                ],
            }
        ]
    )
    assert _row_value_strings(_first_row(paper)) == frozenset(
        {("family", "Apiaceae")}
    )


def test_row_value_strings_skips_empty():
    paper = make_paper(
        [{"page": 1, "rows": [{"family": "", "genus": "Ammi", "row_": 1}]}]
    )
    assert _row_value_strings(_first_row(paper)) == frozenset({("genus", "Ammi")})


def test_row_value_strings_skips_none():
    paper = make_paper(
        [{"page": 1, "rows": [{"family": None, "genus": "Ammi", "row_": 1}]}]
    )
    assert _row_value_strings(_first_row(paper)) == frozenset({("genus", "Ammi")})


def test_count_shared_values_example_from_spec():
    paper = make_paper(
        [
            {
                "page": 1,
                "rows": [
                    {"family": "v 1", "row_": 1},
                    {"family": "v 2", "row_": 1},
                    {"family": "v 3", "row_": 2},
                    {"family": "v 3", "row_": 2},
                ],
            }
        ]
    )
    assert _count_shared_values(paper["tables"]) == (4, 2)


def test_count_shared_values_all_shared():
    paper = make_paper(
        [
            {
                "page": 1,
                "rows": [
                    {"family": "Apiaceae", "row_": 1},
                    {"family": "Apiaceae", "row_": 1},
                    {"family": "Rosaceae", "row_": 2},
                    {"family": "Rosaceae", "row_": 2},
                ],
            }
        ]
    )
    assert _count_shared_values(paper["tables"]) == (4, 4)


def test_count_shared_values_none_shared():
    paper = make_paper(
        [
            {
                "page": 1,
                "rows": [
                    {"family": "Apiaceae", "row_": 1},
                    {"family": "Rosaceae", "row_": 1},
                    {"family": "Lamiaceae", "row_": 2},
                    {"family": "Asteraceae", "row_": 2},
                ],
            }
        ]
    )
    assert _count_shared_values(paper["tables"]) == (4, 0)


def test_count_shared_values_ignores_singletons():
    paper = make_paper(
        [
            {
                "page": 1,
                "rows": [
                    {"family": "Apiaceae", "row_": 1},
                    {"family": "Rosaceae", "row_": 2},
                    {"family": "Lamiaceae", "row_": 3},
                ],
            }
        ]
    )
    assert _count_shared_values(paper["tables"]) == (0, 0)


def test_count_shared_values_ignores_rows_without_row_():
    paper = make_paper(
        [{"page": 1, "rows": [{"family": "Apiaceae"}, {"family": "Apiaceae"}]}]
    )
    assert _count_shared_values(paper["tables"]) == (0, 0)


def test_count_shared_values_across_fragments():
    paper = make_paper(
        [
            {
                "table_fragments": [
                    {"page": 1, "rows": [{"family": "Apiaceae", "row_": 1}]},
                    {"page": 2, "rows": [{"family": "Apiaceae", "row_": 1}]},
                ]
            }
        ]
    )
    assert _count_shared_values(paper["tables"]) == (2, 2)


def test_count_shared_values_independent_per_table():
    # ref test_stats.py:522-543
    paper = make_paper(
        [
            {
                "page": 1,
                "rows": [
                    {"family": "Apiaceae", "row_": 1},
                    {"family": "Apiaceae", "row_": 1},
                ],
            },
            {
                "page": 2,
                "rows": [
                    {"family": "Rosaceae", "row_": 1},
                    {"family": "Asteraceae", "row_": 1},
                ],
            },
        ]
    )
    assert _count_shared_values(paper["tables"]) == (4, 2)


# --- shared-values percentage (test_stats.py:546-676) ------------------------


def test_shared_values_percentage_in_paper_stats():
    # ref test_stats.py:546-565
    stats = compute_paper_stats(
        make_paper(
            [
                {
                    "page": 1,
                    "rows": [
                        {"family": "v 1", "row_": 1},
                        {"family": "v 2", "row_": 1},
                        {"family": "v 3", "row_": 2},
                        {"family": "v 3", "row_": 2},
                    ],
                }
            ]
        )
    )
    assert stats["rows_in_shared_groups"] == 4
    assert stats["rows_with_shared_values"] == 2
    assert stats["shared_values_percentage"] == pytest.approx(50.0)


def test_shared_values_percentage_none_when_no_shared_groups():
    # ref test_stats.py:567-582
    stats = compute_paper_stats(
        make_paper(
            [
                {
                    "page": 1,
                    "rows": [
                        {"family": "Apiaceae", "row_": 1},
                        {"family": "Rosaceae", "row_": 2},
                    ],
                }
            ]
        )
    )
    assert stats["rows_in_shared_groups"] == 0
    assert stats["shared_values_percentage"] is None


def test_global_shared_values_percentage_accumulates():
    # ref test_stats.py:585-623
    paper_a = make_paper(
        [
            {
                "page": 1,
                "rows": [
                    {"family": "v 1", "row_": 1},
                    {"family": "v 2", "row_": 1},
                ],
            }
        ]
    )
    paper_b = make_paper(
        [
            {
                "page": 1,
                "rows": [
                    {"family": "v 3", "row_": 1},
                    {"family": "v 3", "row_": 1},
                ],
            }
        ]
    )
    out = accumulate_global(
        [compute_paper_stats(paper_a), compute_paper_stats(paper_b)]
    )
    assert out["rows_in_shared_groups"] == 4
    assert out["rows_with_shared_values"] == 2
    assert out["global_shared_values_percentage"] == pytest.approx(50.0)


def test_global_shared_values_percentage_none_when_no_groups():
    # ref test_stats.py:626-640
    paper = make_paper(
        [{"page": 1, "rows": [{"family": "Apiaceae", "row_": 1}]}]
    )
    out = accumulate_global([compute_paper_stats(paper)])
    assert out["global_shared_values_percentage"] is None


def test_format_stats_shows_global_shared_values_percentage():
    # ref test_stats.py:643-656
    s = dict(_EMPTY_GLOBAL, rows=4, rows_in_shared_groups=4,
             rows_with_shared_values=2, global_shared_values_percentage=50.0)
    assert "Global shared values percentage: 50.00%" in format_stats(s)


def test_format_stats_omits_global_shared_values_percentage_when_none():
    # ref test_stats.py:659-676
    assert "Global shared values percentage" not in format_stats(
        dict(_EMPTY_GLOBAL)
    )
