"""pipelines/oracle_dumps.py: the oracle-side input dumps must be pure
functions of (sf_dir, seed) — bit-identical across regenerations, built
without Ray, and consistent with the Ray-side synthesis they stand in
for."""

import os
import shutil

import pyarrow.parquet as pq
import pytest

from paper2table_ray.pipelines import oracle_dumps as od

SF = "/root/testdata/sf0.001"


def _fresh_paths():
    # force regeneration by clearing this sf's dump dir
    path = od._dump_path(SF, "expected_spans")
    shutil.rmtree(os.path.dirname(path), ignore_errors=True)


def test_dumps_regenerate_bit_identical():
    _fresh_paths()
    p1 = od.ensure_oracle_dumps(SF)
    blobs1 = {k: open(v, "rb").read() for k, v in p1.items()}
    _fresh_paths()
    p2 = od.ensure_oracle_dumps(SF)
    blobs2 = {k: open(v, "rb").read() for k, v in p2.items()}
    assert blobs1.keys() == blobs2.keys() == {"expected_spans", "expected_mapped_spans", "simhash64", "merged_cells_flat", "resume_lineage", "cells_flat"}
    for k in blobs1:
        assert blobs1[k] == blobs2[k], k


def test_expected_spans_dump_matches_plan():
    from paper2table_ray.sources.synth import synth_corpus_tables

    path = od.ensure_expected_spans_dump(SF)
    got = pq.read_table(path)
    _, expected = synth_corpus_tables(f"{SF}/documents.parquet")
    assert got.equals(expected)


def test_cells_flat_dump_consistent_with_ray_synthesis():
    # the flattened dump must enumerate exactly the cells the Ray-side
    # synth produces (same batch function), with the same stamping
    from paper2table_ray.schema import table_to_row_records
    from paper2table_ray.sources.resultsets import synth_resultsets_batch

    path = od.ensure_cells_flat_dump(SF)
    flat = pq.read_table(path)
    docs = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id"])
    recs = [
        od.stamp_stats_metadata(r)
        for r in table_to_row_records(synth_resultsets_batch(docs))
    ]
    n_cells = sum(max(1, len(r["cells"])) for r in recs)
    # plain-string cells → exactly one flat row per cell
    assert flat.num_rows == n_cells
    # stamping invariants
    row_idx = flat.column("row_idx").to_pylist()
    pos = flat.column("pos").to_pylist()
    assert all(ri == p % 3 for ri, p in zip(row_idx, pos))
    lvls = set(flat.column("agreement_level").to_pylist())
    assert lvls <= {1, 2, 3} and len(lvls) > 1


def test_stamp_is_pure():
    rec = {
        "doc_id": "d",
        "source_uuid": "u",
        "table_idx": 0,
        "fragment_idx": 1,
        "pos": 4,
        "row_idx": None,
        "agreement_level": None,
        "cells": {"a": "x"},
    }
    a = od.stamp_stats_metadata(rec)
    b = od.stamp_stats_metadata(dict(rec))
    assert a == b
    assert a["row_idx"] == 1  # pos % 3
    assert rec["row_idx"] is None  # input not mutated


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
