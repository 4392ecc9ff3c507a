"""CLI surface smoke tests (in-process main(), reference demo fixtures)."""

import glob
import json
import os

import pytest

from paper2table_ray.cli import main

REF = sorted(glob.glob("/root/reference/tests/data/demo_resultsets/*/"))


def test_usage():
    assert main([]) == 2
    assert main(["--help"]) == 0


@pytest.mark.usefixtures("ray_session")
class TestCliFlows:
    def test_merge_stats_csv_html_validate(self, tmp_path, capsys):
        merged = tmp_path / "merged"
        assert main(["tablemerge", *REF, "-o", str(merged)]) == 0
        out_dir = str(next(merged.iterdir()))

        stats_file = tmp_path / "stats.json"
        assert main(["tablestats", out_dir, "-o", str(stats_file)]) == 0
        stats = json.loads(stats_file.read_text())
        assert stats["papers"] == 3 and stats["rows"] > 0

        csv_dir = tmp_path / "csvs"
        assert main(["table2csv", out_dir, "-o", str(csv_dir)]) == 0
        assert any(p.endswith(".csv") for p in os.listdir(csv_dir))

        html_file = tmp_path / "out.html"
        assert main(["table2html", out_dir, "-o", str(html_file)]) == 0
        assert "<table>" in html_file.read_text()

        assert main(["tablevalidate", f"{out_dir}/*.tables.json", "--all"]) == 0
        assert main(["tablevalidate", f"{out_dir}/tables.metadata.json"]) == 0

    def test_extract_resume_roundtrip(self, tmp_path):
        import ray.data

        from paper2table_ray.pipelines.extract import synth_docs_dataset

        docs_dir = tmp_path / "docs"
        synth_docs_dataset("/root/testdata/sf0.001").write_parquet(str(docs_dir))
        out = tmp_path / "spans"
        assert main(["extract", str(docs_dir), "-o", str(out),
                     "--resume", "--partitions", "4"]) == 0
        assert len(list((out / "_lineage").glob("*.json"))) == 4
        n1 = ray.data.read_parquet(str(out), file_extensions=["parquet"]).count()
        assert n1 > 0
        # second run skips everything, output unchanged
        assert main(["extract", str(docs_dir), "-o", str(out),
                     "--resume", "--partitions", "4"]) == 0
        n2 = ray.data.read_parquet(str(out), file_extensions=["parquet"]).count()
        assert n2 == n1

    def test_filenorm_plan_and_apply(self, tmp_path):
        d = tmp_path / "files"
        d.mkdir()
        (d / "My Paper.TXT").write_text("same")
        (d / "my_paper_copy.txt").write_text("same")
        (d / "Other One.txt").write_text("other")
        assert main(["filenorm", str(d)]) == 0  # plan only
        assert sorted(os.listdir(d)) == [
            "My Paper.TXT", "Other One.txt", "my_paper_copy.txt",
        ]
        assert main(["filenorm", str(d), "--apply"]) == 0
        assert sorted(os.listdir(d)) == ["my_paper.txt", "other_one.txt"]
