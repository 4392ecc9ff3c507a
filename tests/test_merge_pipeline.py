"""Distributed merge == doc-local merge: the groupby(doc_id) wiring must
produce exactly what the unit-tested doc-local engine produces per doc,
after the Arrow cells encode/decode round-trip."""

import pandas as pd
import pyarrow as pa
import pytest

import ray.data

from paper2table_ray.pipelines.merge import (
    MERGED_UUID,
    MergeConfig,
    merge_doc_records,
    merge_pipeline,
)
from paper2table_ray.schema import table_to_row_records
from paper2table_ray.sources.resultsets import (
    RUN_READERS,
    synth_resultsets_batch,
    synth_resultsets_dataset,
)
from paper2table_ray.stages.stats import (
    compute_paper_stats,
    global_stats,
    paper_stats_dataset,
)

SF = "/root/testdata/sf0.001"


def _local_merge_all(cells_table: pa.Table, cfg: MergeConfig) -> pd.DataFrame:
    records = table_to_row_records(cells_table)
    by_doc = {}
    for rec in records:
        by_doc.setdefault(rec["doc_id"], []).append(rec)
    out = []
    for doc_id in sorted(by_doc):
        out.extend(merge_doc_records(by_doc[doc_id], cfg))
    return out


def _records_to_comparable(records) -> pd.DataFrame:
    rows = []
    for r in records:
        rows.append(
            {
                "doc_id": r["doc_id"],
                "source_uuid": r["source_uuid"],
                "table_idx": r["table_idx"],
                "fragment_idx": r["fragment_idx"],
                "page": r["page"],
                "pos": r["pos"],
                "row_idx": r["row_idx"],
                "agreement_level": r["agreement_level"],
                "sources": tuple(r["sources"] or ()),
                "cells": repr(sorted(r["cells"].items())),
            }
        )
    df = pd.DataFrame(rows)
    return df.sort_values(
        ["doc_id", "table_idx", "fragment_idx", "pos"]
    ).reset_index(drop=True)


@pytest.mark.usefixtures("ray_session")
class TestMergePipeline:
    def test_distributed_equals_local(self):
        import pyarrow.parquet as pq

        src = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id"]).slice(0, 40)
        cells_table = synth_resultsets_batch(src)
        cfg = MergeConfig(
            jaccard_alignment=True,
            distinct_readers=True,
            uuid_to_reader=dict(RUN_READERS),
        )

        expected = _records_to_comparable(_local_merge_all(cells_table, cfg))

        ds = ray.data.from_arrow(cells_table).repartition(8)
        merged = merge_pipeline(ds, cfg)
        got_records = []
        for batch in merged.iter_batches(batch_format="pyarrow"):
            got_records.extend(table_to_row_records(batch))
        got = _records_to_comparable(got_records)

        pd.testing.assert_frame_equal(got, expected)
        assert (got["source_uuid"] == MERGED_UUID).all()
        # agreement actually accumulated somewhere
        assert (got["agreement_level"] > 1).any()

    def test_merge_pipeline_empty_input(self):
        from paper2table_ray.schema import CELLS_SCHEMA

        merged = merge_pipeline(
            ray.data.from_arrow(CELLS_SCHEMA.empty_table()), MergeConfig()
        )
        assert merged.count() == 0

    def test_merge_cells_table_kernel_equals_per_doc(self):
        # the whole-shard kernel must reproduce the per-doc reduce exactly
        import pyarrow.parquet as pq

        from paper2table_ray.pipelines.merge import merge_cells_table

        src = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id"]).slice(
            0, 30
        )
        cells_table = synth_resultsets_batch(src)
        cfg = MergeConfig(column_agreement=True)
        got = _records_to_comparable(
            table_to_row_records(merge_cells_table(cells_table, cfg))
        )
        expected = _records_to_comparable(_local_merge_all(cells_table, cfg))
        pd.testing.assert_frame_equal(got, expected)

    def test_merge_pipeline_from_sf(self):
        cells = synth_resultsets_dataset(SF)
        merged = merge_pipeline(cells, MergeConfig())
        stats = paper_stats_dataset(merged)
        g = global_stats(stats)
        assert g["papers"] == 500
        assert g["rows"] > 0
        assert 0 < g["global_agreement_percentage"] <= 100


class TestStats:
    def test_paper_stats_fields(self):
        from paper2table_ray import rowmodel as rm

        tf = {
            "tables": [
                {
                    "fragments": [
                        {
                            "page": 1,
                            "rows": [
                                rm.make_row({"a": "x"}, agreement_level=2, row_idx=0),
                                rm.make_row({"a": "x"}, agreement_level=1, row_idx=0),
                                rm.make_row({"a": ""}, row_idx=1),
                            ],
                        }
                    ]
                }
            ]
        }
        s = compute_paper_stats(tf)
        assert s["tables"] == 1
        assert s["rows"] == 3
        assert s["unique_rows"] == 2
        assert s["rows_with_agreement"] == 1
        assert s["empty_rows"] == 1
        assert s["rows_in_shared_groups"] == 2
        assert s["rows_with_shared_values"] == 2
