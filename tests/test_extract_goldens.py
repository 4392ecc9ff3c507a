"""Byte-for-byte extraction goldens (reference test_integration.py:26-253
asserts entire output JSONs; these pin full span sequences per variant).

The fixtures in tests/goldens/ were generated from the verified sf0.001
output (span-equality + oracle-adjacent tests green at generation time)
and freeze the complete (doc_id, span_idx, kind, text, media_ref) rows
for the 12 lowest doc_ids — any behavioral drift in normalization,
boilerplate stripping, table shaping, transformer chains or the mapped
planner changes these rows and fails the diff."""

import json
import os

import pandas as pd
import pytest

import ray.data

from paper2table_ray.pipelines.extract import (
    extract_spans,
    extract_spans_mapped,
    extract_spans_windowed,
    plan_mappings_ds,
    synth_docs_dataset,
)

SF = "/root/testdata/sf0.001"
GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")


def _golden(name):
    return pd.DataFrame(
        json.load(open(os.path.join(GOLDEN_DIR, name), encoding="utf-8"))
    )


def _small_docs():
    docs = synth_docs_dataset(SF).materialize()
    ids = sorted(r["doc_id"] for r in docs.select_columns(["doc_id"]).take_all())[:12]
    keep = set(ids)
    return docs.filter(lambda r: r["doc_id"] in keep).materialize()


def _df(ds):
    return (
        ds.to_pandas()
        .sort_values(["doc_id", "span_idx"])
        .reset_index(drop=True)
    )


@pytest.mark.usefixtures("ray_session")
class TestExtractionGoldens:
    def test_plain_matches_golden(self):
        got = _df(extract_spans(_small_docs()))
        expect = _golden("extract_plain.json")
        pd.testing.assert_frame_equal(got, expect.astype(got.dtypes.to_dict()))

    def test_windowed_matches_same_golden(self):
        got = _df(extract_spans_windowed(_small_docs(), window_spans=16))
        expect = _golden("extract_plain.json")
        pd.testing.assert_frame_equal(got, expect.astype(got.dtypes.to_dict()))

    def test_mapped_matches_golden(self):
        docs = _small_docs()
        got = _df(extract_spans_mapped(docs, plan_mappings_ds(docs)))
        expect = _golden("extract_mapped.json")
        pd.testing.assert_frame_equal(got, expect.astype(got.dtypes.to_dict()))
