"""Behavioral-parity port of /root/reference/tests/test_table2html.py
(47 cases) over pipelines/viewer.py. Shell-level assertions adapt to our
viewer chrome (details/summary sources, single-string page) where the
reference asserts its exact tags; all rendering semantics (column
ordering, rowspans, css classes, list joins, empty-row legend) are
asserted identically."""

from paper2table_ray import rowmodel as rm
from paper2table_ray.pipelines.viewer import (
    _CSS,
    agreement_css_class,
    build_fragment_html,
    build_metadata_html,
    build_paper_sources_html,
    build_viewer_html,
    compute_rowspans,
    render_citation,
)

V = rm.vwa


def R(_level=None, _sources=None, _row=None, **cells):
    return rm.make_row(dict(cells), agreement_level=_level, sources=_sources, row_idx=_row)


def F(rows, page=1):
    return {"rows": rows, "page": page}


def joined(parts):
    return "\n".join(parts)


def test_fragment_no_rows():
    out = joined(build_fragment_html(1, F([], page=3)))
    assert "Table 1, page 3" in out
    assert "No rows" in out
    assert "<table" not in out


def test_fragment_renders_header_and_row():
    out = joined(build_fragment_html(1, F([R(species="Rosa", family="Rosaceae")])))
    assert "<th>species</th>" in out
    assert "<th>family</th>" in out
    assert "<td>Rosa</td>" in out
    assert "<td>Rosaceae</td>" in out


def test_fragment_readers_before_sources():
    out = joined(build_fragment_html(1, F([R(species="Rosa", _sources=["s1"])])))
    headers = [h.strip() for h in out.split("<th>")[1:]]
    assert headers[0].startswith("species")
    assert headers[-2].startswith("readers_")
    assert headers[-1].startswith("sources_")


def test_fragment_agreement_level_column_shown_first():
    out = joined(build_fragment_html(1, F([R(species="Rosa", _level=2)])))
    headers = [h.split("</th>")[0] for h in out.split("<th>")[1:]]
    assert headers[0] == "agreement_level_"
    assert "2</td>" in out and "class='medium'" in out


def test_fragment_no_agreement_level_column_when_absent():
    out = joined(build_fragment_html(1, F([R(species="Rosa")])))
    assert "agreement_level_" not in out


def test_fragment_non_common_column_appears_in_header():
    frag = F([R(species="Rosa", family="Rosaceae"), R(species="Mentha", note="fragrant")])
    out = joined(build_fragment_html(1, frag))
    for h in ("species", "family", "note"):
        assert f"<th>{h}</th>" in out


def test_fragment_non_common_column_ordering():
    frag = F([R(species="Rosa", family="Rosaceae"), R(species="Mentha", note="fragrant")])
    out = joined(build_fragment_html(1, frag))
    headers = [h.split("</th>")[0] for h in out.split("<th>")[1:]]
    assert headers[0] == "species"
    assert headers.index("species") < headers.index("family")
    assert headers.index("species") < headers.index("note")


def test_fragment_non_common_column_empty_for_missing_rows():
    frag = F([R(species="Rosa", family="Rosaceae"), R(species="Mentha", note="fragrant")])
    out = joined(build_fragment_html(1, frag))
    assert "<td>Rosa</td>" in out
    assert "<td>Mentha</td>" in out


def test_fragment_readers_column_shows_readers():
    frag = F([R(species="Rosa", _sources=["s1", "s2"])])
    out = joined(build_fragment_html(1, frag, {"s1": "pdfplumber", "s2": "camelot"}))
    assert "pdfplumber" in out and "camelot" in out


def test_fragment_readers_column_deduplicates():
    frag = F([R(species="Rosa", _sources=["s1", "s2"])])
    out = joined(build_fragment_html(1, frag, {"s1": "pdfplumber", "s2": "pdfplumber"}))
    assert "<td>pdfplumber</td>" in out


def test_fragment_list_value_joined():
    frag = F([R(tags=[V("a", 1), V("b", 1), V("c", 1)])])
    out = joined(build_fragment_html(1, frag))
    assert "<td>a, b, c</td>" in out


def test_fragment_agreement_css_levels():
    for level, cls in ((1, "low"), (2, "medium"), (3, "high")):
        out = joined(build_fragment_html(1, F([R(x="v", _level=level)])))
        assert f"class='{cls}'" in out


def test_metadata_scalar_fields_rendered():
    out = joined(build_metadata_html({"tool": "paper2table", "version": "1.0"}))
    assert "<th>tool</th>" in out
    assert "<td>paper2table</td>" in out


def test_metadata_sources_table_rendered():
    # our viewer renders sources in a collapsible details block
    out = joined(
        build_paper_sources_html(
            [{"uuid": "abc", "reader": "pdfplumber", "path": "/tmp/a.pdf"}]
        )
    )
    assert "Sources (1)" in out
    assert "abc" in out
    assert "/tmp/a.pdf" in out


def test_metadata_sources_preferred_column_order():
    out = joined(
        build_paper_sources_html(
            [{"uuid": "u1", "reader": "camelot", "path": "/p", "extra": "e"}]
        )
    )
    headers = [h.split("</th>")[0] for h in out.split("<th>")[1:]]
    assert headers[:3] == ["uuid", "reader", "path"]


def test_metadata_no_sources_key():
    out = joined(build_metadata_html({"tool": "x"}))
    assert "Sources" not in out


def test_build_html_structure():
    out = build_viewer_html([], title="Paper2Table Viewer")
    assert "<!doctype html>" in out
    assert "<title>Paper2Table Viewer</title>" in out
    assert "</html>" in out


def test_build_html_no_metadata_section_when_empty():
    assert "<h2>Metadata</h2>" not in build_viewer_html([], title="t")


def test_build_html_includes_paper():
    papers = [("mypaper.tables.json", {"tables": [], "citation": "Smith 2020"})]
    out = build_viewer_html(papers, title="t")
    assert "mypaper.tables.json" in out
    assert "Smith 2020" in out


def test_fragment_skips_empty_rows_and_shows_legend():
    frag = F(
        [
            R(species="Rosa", family="Rosaceae"),
            R(species="", family=""),
            R(species="", family=""),
        ]
    )
    out = joined(build_fragment_html(1, frag))
    assert "Rosa" in out
    assert "(2 empty rows not shown)" in out


def test_fragment_all_empty_rows_no_table():
    out = joined(build_fragment_html(1, F([R(species=""), R(species="")])))
    assert "<table" not in out
    assert "(2 empty rows not shown)" in out


def test_agreement_css_class_values():
    assert agreement_css_class(0) == "low"
    assert agreement_css_class(1) == "low"
    assert agreement_css_class(2) == "medium"
    assert agreement_css_class(3) == "high"


def test_build_css_contains_body_rule():
    assert "font-family: Arial" in _CSS


def test_build_css_contains_agreement_classes():
    assert ".low { background-color: #fdd; }" in _CSS
    assert ".medium { background-color: #ffd; }" in _CSS
    assert ".high { background-color: #dfd; }" in _CSS


def test_render_citation_none():
    assert render_citation(None) == ""


def test_render_citation_string():
    assert render_citation("Smith 2020") == "Smith 2020"


def test_render_citation_list():
    assert (
        render_citation([V("Smith 2020", 2), V("Smith et al.", 1)])
        == "Smith 2020, Smith et al."
    )


import pytest

# (case, rows, columns, expected spans)
_ROWSPAN_CASES = [
    ("no_row_numbers",
     [dict(family="Apiaceae"), dict(family="Apiaceae")], None,
     ["family"], [{"family": 1}, {"family": 1}]),
    ("different_row_numbers",
     [dict(family="Apiaceae"), dict(family="Apiaceae")], [0, 1],
     ["family"], [{"family": 1}, {"family": 1}]),
    ("same_row_same_value",
     [dict(family="Apiaceae"), dict(family="Apiaceae")], [0, 0],
     ["family"], [{"family": 2}, {"family": 0}]),
    ("same_row_per_column",
     [dict(family="Apiaceae", species="Ammi majus"),
      dict(family="Apiaceae", species="Carum carvi")], [0, 0],
     ["family", "species"],
     [{"family": 2, "species": 1}, {"family": 0, "species": 1}]),
    ("three_rows_same_number",
     [dict(family="Apiaceae")] * 3, [0, 0, 0],
     ["family"], [{"family": 3}, {"family": 0}, {"family": 0}]),
]


@pytest.mark.parametrize("case", _ROWSPAN_CASES, ids=[c[0] for c in _ROWSPAN_CASES])
def test_compute_rowspans_matrix(case):
    _name, cell_dicts, row_nums, columns, expected = case
    rows = [
        R(_row=(row_nums[i] if row_nums else None), **cells)
        for i, cells in enumerate(cell_dicts)
    ]
    assert compute_rowspans(rows, columns) == expected


def test_build_fragment_html_merges_shared_column_value():
    frag = F(
        [
            R(family="Apiaceae", species="Ammi majus", _row=0),
            R(family="Apiaceae", species="Carum carvi", _row=0),
        ]
    )
    out = joined(build_fragment_html(1, frag))
    assert "rowspan='2'" in out
    assert "<td>Apiaceae</td>" not in out
    assert "rowspan='2'>Apiaceae</td>" in out
    assert "<td>Ammi majus</td>" in out
    assert "<td>Carum carvi</td>" in out


def test_compute_rowspans_never_merges_agreement_level_column():
    rows = [
        R(family="Apiaceae", _level=2, _row=0),
        R(family="Apiaceae", _level=2, _row=0),
    ]
    assert compute_rowspans(rows, ["agreement_level_", "family"]) == [
        {"agreement_level_": 1, "family": 2},
        {"agreement_level_": 1, "family": 0},
    ]


def test_build_fragment_html_no_merge_without_row_numbers():
    frag = F(
        [
            R(family="Apiaceae", species="Ammi majus"),
            R(family="Apiaceae", species="Carum carvi"),
        ]
    )
    out = joined(build_fragment_html(1, frag))
    assert "rowspan" not in out
