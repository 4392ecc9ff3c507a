"""The flagship extraction pipeline (Ray Data wiring).

read docs → (optional size-bucket repartition) → SpanExtractor actor pool →
ordered span table → partitioned parquet sink (resumable).

Scale notes (SURVEY.md §4): the extractor is CPU-bound per doc with skewed
doc sizes, so (a) batches are small (docs-per-batch, not rows), (b) the
actor pool sizes with the cluster via ``concurrency=(min, max)`` autoscaling
rather than a hard-coded pool, (c) there is **no shuffle** in this pipeline
— span order is preserved because extraction is per-doc and the output
carries ``(doc_id, span_idx)``. Any consumer that does shuffle can restore
the invariant with a sort on those keys.
"""

from __future__ import annotations

import math
from typing import Optional

import pyarrow.compute as pc

import ray.data

from ..sources.synth import DEFAULT_SEED, synth_docs_batch
from ..stages.extract import ExtractConfig, SpanExtractor


def synth_docs_dataset(
    sf_dir: str,
    seed: int = DEFAULT_SEED,
    parallelism: Optional[int] = None,
) -> ray.data.Dataset:
    """documents.parquet → interleaved-doc Dataset (synthesis runs inside
    map_batches, so corpus generation itself is distributed/streaming)."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "text"],  # prune at the read
        **({"override_num_blocks": parallelism} if parallelism else {}),
    )
    return ds.map_batches(
        lambda b: synth_docs_batch(b, seed),
        batch_format="pyarrow",
        batch_size=64,
    )


def add_size_buckets(ds: ray.data.Dataset) -> ray.data.Dataset:
    """Stamp ``size_bucket = floor(log2(doc_bytes))`` for skew-aware
    scheduling (north_rule). Cheap vectorized pass; callers can
    ``repartition``/sort on it when a downstream stage needs balanced
    blocks."""

    def bucket(batch):
        sizes = [
            sum(len(s["text"]) + len(s["media_ref"]) for s in spans) if spans else 0
            for spans in batch.column("spans").to_pylist()
        ]
        import pyarrow as pa

        return batch.append_column(
            "size_bucket",
            pa.array(
                [int(math.log2(max(1, s))) for s in sizes], type=pa.int32()
            ),
        )

    return ds.map_batches(bucket, batch_format="pyarrow")


def extract_spans(
    docs: ray.data.Dataset,
    config: Optional[ExtractConfig] = None,
    batch_size: int = 32,
    concurrency=None,
) -> ray.data.Dataset:
    """docs (DOC_SCHEMA) → spans (SPANS_OUT_SCHEMA).

    The extractor is a callable class → Ray hosts it as an actor pool;
    per-actor init (regex compile, hint set, stripper) happens once
    (SURVEY.md §2.3). Small batch_size bounds the damage of one giant doc
    in a batch (skew).
    """
    if concurrency is None:
        # actor pool sized to the cluster, autoscaling from 1 so small
        # inputs don't pay full pool startup
        import ray

        cpus = int(ray.cluster_resources().get("CPU", 4)) if ray.is_initialized() else 4
        concurrency = (1, max(2, cpus))
    kwargs = {"concurrency": concurrency}
    return docs.map_batches(
        SpanExtractor,
        fn_constructor_kwargs={"config": config or ExtractConfig()},
        batch_format="pyarrow",
        batch_size=batch_size,
        zero_copy_batch=True,
        **kwargs,
    )


def extract_pipeline(
    sf_dir: str,
    config: Optional[ExtractConfig] = None,
    seed: int = DEFAULT_SEED,
    output_path: Optional[str] = None,
) -> ray.data.Dataset:
    """End-to-end: synthesize interleaved docs from the sf dir, extract
    ordered spans; optionally write partitioned parquet."""
    docs = synth_docs_dataset(sf_dir, seed=seed)
    spans = extract_spans(docs, config=config)
    if output_path:
        spans.write_parquet(output_path)
    return spans


def spans_kind_stats(spans: ray.data.Dataset) -> ray.data.Dataset:
    """Tiny sanity aggregate: span counts by kind (pre-aggregated inside
    map_batches before the small groupby — the partial-agg pattern)."""

    def partial(batch):
        import pyarrow as pa

        counts = pc.value_counts(batch.column("kind"))
        return pa.table(
            {
                "kind": counts.field("values"),
                "partial_count": pc.cast(counts.field("counts"), pa.int64()),
            }
        )

    from ray.data.aggregate import Sum

    return (
        spans.map_batches(partial, batch_format="pyarrow")
        .groupby("kind")
        .aggregate(Sum("partial_count", alias_name="n"))
    )
