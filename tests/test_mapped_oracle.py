"""The two round-5 oracle dumps vs the live pipelines (small corpus).

The driver proves these at sf0.01; this keeps the witness inside the
pytest suite so a regression is caught before a driver run.
"""

import numpy as np
import pyarrow as pa
import pytest

SF = "/root/testdata/sf0.001"


def _docs_table(n=40):
    import pyarrow.parquet as pq

    return pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"]).slice(
        0, n
    )


def test_expected_mapped_spans_matches_pipeline(ray_session):
    import ray.data

    from paper2table_ray.pipelines.extract import (
        extract_spans_mapped,
        plan_mappings_ds,
    )
    from paper2table_ray.sources.synth import (
        expected_mapped_spans_batch,
        synth_docs_batch,
    )

    raw = _docs_table()
    expected = (
        expected_mapped_spans_batch(raw)
        .to_pandas()
        .sort_values(["doc_id", "span_idx"])
        .reset_index(drop=True)
    )
    docs_tbl = synth_docs_batch(raw)
    got = (
        extract_spans_mapped(
            ray.data.from_arrow(docs_tbl),
            plan_mappings_ds(ray.data.from_arrow(docs_tbl)),
        )
        .to_pandas()
        .sort_values(["doc_id", "span_idx"])
        .reset_index(drop=True)
    )
    assert got.equals(expected)


def test_simhash_dump_matches_pair_pipeline(ray_session):
    import ray.data

    from paper2table_ray.stages.dedup import (
        _batch_token_hashes,
        _simhash_from_token_hashes,
        popcount64,
        simhash_pairs,
    )

    raw = _docs_table(60)
    tok = _batch_token_hashes(raw.column("text").to_pylist())
    sims = np.array(
        [_simhash_from_token_hashes(h) for h in tok], dtype=np.uint64
    )
    ids = raw.column("doc_id").to_numpy()
    ai, bj = np.triu_indices(len(ids), 1)
    d = popcount64(sims[ai] ^ sims[bj])
    keep = d <= 6
    lo = np.minimum(ids[ai][keep], ids[bj][keep])
    hi = np.maximum(ids[ai][keep], ids[bj][keep])
    brute = sorted(zip(lo.tolist(), hi.tolist(), d[keep].tolist()))

    got = simhash_pairs(ray.data.from_arrow(raw), max_hamming=6).to_pandas()
    got_pairs = sorted(
        zip(got["doc_a"].tolist(), got["doc_b"].tolist(), got["hamming"].tolist())
    )
    assert got_pairs == brute
