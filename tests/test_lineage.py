"""Checkpointed partitioned output + resume (state/lineage.py)."""

import json
import os
import shutil

import pandas as pd
import pytest

import ray.data

from paper2table_ray.state.lineage import (
    LineageSink,
    partition_of,
    read_extracted,
    resumable_extract,
)

SF = "/root/testdata/sf0.001"
OUT = "/tmp/p2t_lineage_test"


def test_partition_of_deterministic():
    assert partition_of("doc_000001", 32) == partition_of("doc_000001", 32)
    assert 0 <= partition_of("anything", 7) < 7


@pytest.mark.usefixtures("ray_session")
class TestResume:
    def setup_method(self):
        shutil.rmtree(OUT, ignore_errors=True)

    def test_write_then_resume_skips_everything(self):
        summary1 = resumable_extract(SF, OUT, num_partitions=8)
        assert len(summary1) == 8
        assert (summary1["status"] == "ok").all()
        total_rows = summary1["row_count"].sum()

        # full output readable and matches span count
        ds = read_extracted(OUT)
        assert ds.count() == total_rows

        # second run: all partitions complete → nothing written
        summary2 = resumable_extract(SF, OUT, num_partitions=8)
        assert len(summary2) == 0

    def test_partial_resume(self):
        resumable_extract(SF, OUT, num_partitions=8)
        before = read_extracted(OUT).count()
        # sabotage two partitions: drop their lineage + files
        sink = LineageSink(OUT, num_partitions=8)
        for pid in (1, 5):
            os.remove(os.path.join(OUT, "_lineage", f"{pid:05d}.json"))
            os.remove(os.path.join(OUT, f"part-{pid:05d}.parquet"))
        assert sink.completed_partitions() == {0, 2, 3, 4, 6, 7}

        summary = resumable_extract(SF, OUT, num_partitions=8)
        assert sorted(summary["partition_id"]) == [1, 5]
        assert read_extracted(OUT).count() == before

    def test_lineage_records_shape(self):
        resumable_extract(SF, OUT, num_partitions=4)
        recs = LineageSink(OUT, num_partitions=4).lineage_records()
        assert len(recs) == 4
        for rec in recs:
            assert rec["stage"] == "extract"
            assert rec["doc_count"] > 0
            assert rec["wall_ms"] >= 0
            assert rec["status"] == "ok"


@pytest.mark.usefixtures("ray_session")
class TestMapPartitions:
    """Shuffle-free per-group processing over the bucketed store: the
    lineage write's placement (blake2(doc_id) % P) is reused by
    map_partitions, so a per-doc stage (here: the full merge) runs with
    ZERO additional shuffle and matches the shuffled merge_pipeline
    bit-for-bit."""

    def test_bucketed_merge_equals_shuffled_merge(self, tmp_path):
        from paper2table_ray.pipelines.merge import (
            MergeConfig,
            merge_doc_records,
            merge_pipeline,
        )
        from paper2table_ray.schema import (
            CELLS_SCHEMA,
            rows_to_table,
            table_to_row_records,
        )
        from paper2table_ray.sources.resultsets import synth_resultsets_dataset
        from paper2table_ray.state.lineage import LineageSink, map_partitions

        cells = synth_resultsets_dataset("/root/testdata/sf0.001", runs=2)
        sink = LineageSink(str(tmp_path), num_partitions=8, stage="cells")
        sink.write(sink.add_partition_column(cells))

        cfg = MergeConfig()

        def merge_group(group):
            records = table_to_row_records(group)
            out = merge_doc_records(records, cfg)
            if not out:
                return CELLS_SCHEMA.empty_table()
            return rows_to_table(out)

        bucketed = map_partitions(str(tmp_path), merge_group).to_pandas()
        shuffled = merge_pipeline(
            synth_resultsets_dataset("/root/testdata/sf0.001", runs=2), cfg
        ).to_pandas()

        def norm(df):
            df = df.copy()
            df["cells"] = df["cells"].astype(str)
            df["sources"] = df["sources"].astype(str)
            return (
                df.sort_values(
                    ["doc_id", "table_idx", "fragment_idx", "pos"]
                )
                .reset_index(drop=True)
            )

        pd.testing.assert_frame_equal(norm(bucketed), norm(shuffled))


class TestScratchContract:
    """state/scratch.py: every spill/cache path resolves through ONE
    config point so a real cluster can redirect it to shared storage."""

    def test_env_var_redirects_scratch(self, tmp_path, monkeypatch):
        from paper2table_ray.state import scratch

        monkeypatch.setenv(scratch.ENV_VAR, str(tmp_path / "shared"))
        root = scratch.scratch_root()
        assert root == str(tmp_path / "shared")
        assert os.path.isdir(root)
        d = scratch.scratch_dir("unit_")
        assert d.startswith(root)

    def test_explicit_beats_env(self, tmp_path, monkeypatch):
        from paper2table_ray.state import scratch

        monkeypatch.setenv(scratch.ENV_VAR, str(tmp_path / "env"))
        assert scratch.scratch_root(str(tmp_path / "arg")) == str(tmp_path / "arg")

    def test_no_hardcoded_tmp_on_scale_paths(self):
        # the spill sites must route through state/scratch.py, not "/tmp"
        import glob

        import paper2table_ray

        pkg = os.path.dirname(paper2table_ray.__file__)
        offenders = []
        for path in glob.glob(os.path.join(pkg, "**", "*.py"), recursive=True):
            src = open(path, encoding="utf-8").read()
            for i, line in enumerate(src.splitlines(), 1):
                if '"/tmp' in line or "'/tmp" in line:
                    offenders.append(f"{path}:{i}")
        assert offenders == []


@pytest.mark.usefixtures("ray_session")
class TestResumableMerge:
    """state/lineage.resumable_merge: shuffle-free merge over the
    bucketed cells store, resuming only pending partitions (verdict r2
    item 8)."""

    def _build_store(self, tmp_path, n_docs=30, num_partitions=6):
        import pyarrow.parquet as pq

        from paper2table_ray.sources.resultsets import synth_resultsets_batch

        src = pq.read_table(
            "/root/testdata/sf0.001/documents.parquet", columns=["doc_id"]
        ).slice(0, n_docs)
        cells = synth_resultsets_batch(src)
        store = str(tmp_path / "store")
        sink = LineageSink(store, num_partitions=num_partitions, stage="cells")
        ds = sink.add_partition_column(ray.data.from_arrow(cells))
        sink.write(ds)
        return store, cells

    def test_full_merge_matches_shuffled_pipeline(self, tmp_path):
        from paper2table_ray.pipelines.merge import MergeConfig, merge_pipeline
        from paper2table_ray.schema import table_to_row_records
        from paper2table_ray.state.lineage import read_extracted, resumable_merge

        store, cells = self._build_store(tmp_path)
        cfg = MergeConfig()
        out = str(tmp_path / "merged")
        summary = resumable_merge(store, out, cfg)
        assert (summary["status"] == "ok").all()

        def comparable(records):
            rows = [
                (
                    r["doc_id"], r["table_idx"], r["fragment_idx"], r["pos"],
                    r["row_idx"], r["agreement_level"],
                    tuple(r["sources"] or ()), repr(sorted(r["cells"].items())),
                )
                for r in records
            ]
            return sorted(rows)

        got = []
        for batch in read_extracted(out).iter_batches(batch_format="pyarrow"):
            got.extend(table_to_row_records(batch))
        exp = []
        for batch in merge_pipeline(
            ray.data.from_arrow(cells).repartition(4), cfg
        ).iter_batches(batch_format="pyarrow"):
            exp.extend(table_to_row_records(batch))
        assert comparable(got) == comparable(exp)

    def test_killed_merge_reruns_only_pending(self, tmp_path):
        from paper2table_ray.pipelines.merge import MergeConfig
        from paper2table_ray.state.lineage import resumable_merge

        store, _ = self._build_store(tmp_path)
        out = str(tmp_path / "merged")
        first = resumable_merge(store, out, MergeConfig())
        pids = sorted(first["partition_id"])

        # simulate a crash that lost partitions 0 and 1: remove their
        # lineage rows + output files
        for pid in pids[:2]:
            os.remove(os.path.join(out, "_lineage", f"{pid:05d}.json"))
            os.remove(os.path.join(out, f"part-{pid:05d}.parquet"))
        # sentinel-stamp a completed partition to prove it is not rewritten
        sentinel = os.path.join(out, f"part-{pids[2]:05d}.parquet")
        before = os.stat(sentinel).st_mtime_ns
        open(sentinel + ".marker", "w").write("x")

        second = resumable_merge(store, out, MergeConfig())
        by_pid = dict(zip(second["partition_id"], second["status"]))
        assert by_pid[pids[0]] == "ok" and by_pid[pids[1]] == "ok"
        assert all(by_pid[p] == "skipped" for p in pids[2:])
        assert os.stat(sentinel).st_mtime_ns == before
        # the re-merged partitions exist again
        for pid in pids[:2]:
            assert os.path.exists(os.path.join(out, f"part-{pid:05d}.parquet"))


@pytest.mark.usefixtures("ray_session")
class TestCuratePipeline:
    """pipelines/curate.py: the composed curation funnel + resumable
    job (its per-component semantics are oracled via curate_docs)."""

    SF = "/root/testdata/sf0.001/documents.parquet"

    def test_curate_to_dir_and_resume(self, tmp_path):
        from paper2table_ray.pipelines.curate import curate_to_dir
        from paper2table_ray.state.lineage import read_extracted

        out = str(tmp_path / "curated")
        first = curate_to_dir(self.SF, out, langs=["en", "es"],
                              min_quality=0.2, num_partitions=8)
        assert (first["status"] == "ok").all()
        curated = read_extracted(out).to_pandas()
        assert len(curated) > 0
        assert set(curated["lang_pred"]) <= {"en", "es"}
        assert (curated["quality_score"] >= 0.2).all()

        # resume: drop two partitions' lineage + files, re-run, only they
        # are re-processed (others filtered out pre-pipeline)
        pids = sorted(first["partition_id"])[:2]
        for pid in pids:
            os.remove(os.path.join(out, "_lineage", f"{pid:05d}.json"))
            os.remove(os.path.join(out, f"part-{pid:05d}.parquet"))
        second = curate_to_dir(self.SF, out, langs=["en", "es"],
                               min_quality=0.2, num_partitions=8)
        assert sorted(second["partition_id"]) == pids
        # full output restored, identical row count
        assert len(read_extracted(out).to_pandas()) == len(curated)

    def test_dedup_semi_join_drops_duplicates(self):
        import pyarrow as pa
        import ray.data

        from paper2table_ray.pipelines.curate import curate_pipeline

        docs = ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([1, 2, 3], pa.int64()),
                    "text": pa.array(
                        ["the same text here", "the same text here",
                         "the other text is here"],
                        pa.string(),
                    ),
                }
            )
        )
        out = curate_pipeline(docs, dedup=True).to_pandas()
        assert sorted(out["doc_id"]) == [1, 3]

    def test_redact_attaches_columns(self):
        import pyarrow as pa
        import ray.data

        from paper2table_ray.pipelines.curate import curate_pipeline

        docs = ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([1], pa.int64()),
                    "text": pa.array(
                        ["write to me me@example.com or 12345678"], pa.string()
                    ),
                }
            )
        )
        out = curate_pipeline(docs, dedup=False, redact=True).to_pandas()
        assert out["n_redactions"].iloc[0] == 2
        assert "<EMAIL>" in out["redacted"].iloc[0]
        assert "<NUM>" in out["redacted"].iloc[0]
