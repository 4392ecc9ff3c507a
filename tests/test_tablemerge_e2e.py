"""End-to-end tablemerge over the reference's own demo resultsets:
dirs → merged resultset dir with settings capture, resumable semantics."""

import glob
import json
import os

import pytest

from paper2table_ray.pipelines.tablemerge import (
    merged_uuid_for,
    run_tablemerge,
    settings_to_config,
)
from paper2table_ray.sources.tablesfile_json import read_resultsets
from paper2table_ray.state.settings import MergeSettings

REF_RESULTSETS = sorted(glob.glob("/root/reference/tests/data/demo_resultsets/*/"))


def test_settings_mapping():
    s = MergeSettings(
        agreement_method="distinct-readers",
        jaccard_column_alignment=True,
        column_names_hints="family, species",
        column_aliases="old_name:new_name",
    )
    cfg = settings_to_config(s, {"u1": "pdfplumber"})
    assert cfg.distinct_readers and cfg.jaccard_alignment
    assert cfg.hints == ["family", "species"]
    assert cfg.aliases == {"old_name": "new_name"}
    assert cfg.uuid_to_reader == {"u1": "pdfplumber"}


def test_merged_uuid_deterministic():
    assert merged_uuid_for(["/a/u1", "/b/u2"]) == merged_uuid_for(["/b/u2", "/a/u1/"])


@pytest.mark.usefixtures("ray_session")
class TestEndToEnd:
    def test_merge_reference_demo_resultsets(self, tmp_path):
        settings = MergeSettings(jaccard_column_alignment=True)
        summary = run_tablemerge(REF_RESULTSETS, str(tmp_path), settings)
        written = summary[summary["status"] == "written"]
        assert len(written) >= 2  # the demo papers

        out_dirs = os.listdir(tmp_path)
        assert len(out_dirs) == 1
        out = tmp_path / out_dirs[0]
        assert (out / "tables.metadata.json").exists()
        assert (out / "settings.tablemerge.json").exists()
        meta = json.load(open(out / "tables.metadata.json"))
        assert meta["reader"] == "tablemerge"
        assert len(meta["sources"]) == len(REF_RESULTSETS)

        # merged output is readable back as a resultset; rows carry
        # agreement from multiple runs
        back = read_resultsets([str(out)]).to_pandas()
        assert len(back) > 0
        assert (back["agreement_level"].fillna(1) > 1).any()

    def test_rerun_idempotent(self, tmp_path):
        run_tablemerge(REF_RESULTSETS, str(tmp_path))
        out = tmp_path / os.listdir(tmp_path)[0]
        files1 = {p: (out / p).read_text() for p in os.listdir(out)}
        run_tablemerge(REF_RESULTSETS, str(tmp_path), force_update=True)
        files2 = {p: (out / p).read_text() for p in os.listdir(out)}
        assert files1 == files2


@pytest.mark.usefixtures("ray_session")
class TestPaperFilterAndColumns:
    def test_paper_regex_filter(self, tmp_path):
        summary = run_tablemerge(
            REF_RESULTSETS, str(tmp_path), paper="large_.*"
        )
        assert set(summary[summary["status"] == "written"]["doc_id"]) == {
            "large_dataset"
        }

    def test_collect_unique_columns(self):
        from paper2table_ray.stages.stats import collect_unique_columns

        cells = read_resultsets(REF_RESULTSETS)
        cols = collect_unique_columns(cells)
        assert "scientific_name" in cols
        assert cols["scientific_name"] == "str"
        # estimated_population appears as "1,200" (str) or bare int rows
        assert cols.get("estimated_population") in ("str", "int")

    def test_infer_type(self):
        from paper2table_ray.stages.stats import infer_type

        assert infer_type("True") == "bool"
        assert infer_type(" 42 ") == "int"
        assert infer_type("3.5") == "float"
        assert infer_type("1,200") == "str"
        assert infer_type([{"value": "7", "agreement_level": 1}]) == "int"
        assert infer_type([]) == "str"
