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
    repeat: int = 1,
) -> ray.data.Dataset:
    """documents.parquet → interleaved-doc Dataset (synthesis runs inside
    map_batches, so corpus generation itself is distributed/streaming).

    ``repeat`` replicates the corpus with distinct doc ids (seed varied
    per replica) — the scaling audit uses it to grow the workload past
    fixed overheads without external data. ``parallelism`` defaults to
    4× cluster CPUs so a single small parquet file doesn't collapse the
    whole downstream pipeline into one block."""
    import ray as _ray

    if parallelism is None and _ray.is_initialized():
        parallelism = 4 * int(_ray.cluster_resources().get("CPU", 4))
    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "text"],  # prune at the read
    )
    if parallelism:
        # the sf parquet files are single-row-group → ONE block → every
        # downstream map stage would run in one task; split first
        ds = ds.repartition(parallelism)

    def synth(batch):
        # replication happens INSIDE one operator — a union of R branches
        # serializes the map stage (observed: 2 busy workers at repeat=16)
        import pyarrow as pa
        import pyarrow.compute as pc

        tables = []
        for rep in range(max(1, repeat)):
            out = synth_docs_batch(batch, seed + rep * 1_000_003)
            if rep:
                out = out.set_column(
                    out.schema.get_field_index("doc_id"),
                    "doc_id",
                    pc.binary_join_element_wise(
                        out.column("doc_id"), pa.scalar(f"r{rep}"), "~"
                    ),
                )
            tables.append(out)
        return pa.concat_tables(tables)

    return ds.map_batches(synth, batch_format="pyarrow", batch_size=64)


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


_WORKER_EXTRACTOR: dict = {}


def _extract_batch_cached(batch, config: ExtractConfig, mappings=None):
    """Task UDF with worker-local extractor cache: Ray reuses worker
    processes across tasks, so construction (regex compile, hint set,
    stripper) still happens once per worker — the init-once guarantee of
    an actor pool WITHOUT its slow scale-up (actor process spawn+imports
    measured ~10s for a 32-pool on this box, dominating short runs).
    Reserve true actor pools (use_actors=True) for genuinely expensive
    state (models, external processes)."""
    key = (id(type(config)), repr(config), mappings is not None)
    ex = _WORKER_EXTRACTOR.get(key)
    if ex is None:
        ex = SpanExtractor(config, mappings=mappings)
        _WORKER_EXTRACTOR.clear()
        _WORKER_EXTRACTOR[key] = ex
    return ex(batch)


def extract_spans(
    docs: ray.data.Dataset,
    config: Optional[ExtractConfig] = None,
    batch_size: int = 32,
    concurrency=None,
    use_actors: bool = False,
) -> ray.data.Dataset:
    """docs (DOC_SCHEMA) → spans (SPANS_OUT_SCHEMA).

    Default: task pool + worker-local extractor cache (see
    ``_extract_batch_cached``). ``use_actors=True`` hosts ``SpanExtractor``
    as an autoscaling actor pool instead (the shape for expensive state).
    Small batch_size bounds the damage of one giant doc in a batch (skew).
    """
    cfg = config or ExtractConfig()
    if use_actors:
        if concurrency is None:
            import ray

            cpus = (
                int(ray.cluster_resources().get("CPU", 4))
                if ray.is_initialized()
                else 4
            )
            concurrency = (1, max(2, cpus))
        return docs.map_batches(
            SpanExtractor,
            fn_constructor_kwargs={"config": cfg},
            batch_format="pyarrow",
            batch_size=batch_size,
            zero_copy_batch=True,
            concurrency=concurrency,
        )
    return docs.map_batches(
        lambda b: _extract_batch_cached(b, cfg),
        batch_format="pyarrow",
        batch_size=batch_size,
        zero_copy_batch=True,
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


class SynthExtract:
    """Fused synth→extract actor stage: documents.parquet rows → interleaved
    docs (in-memory, never serialized) → output spans.

    Why fused: the interleaved doc blocks are ~5-10× larger than both their
    parquet source and the span output; shipping them through the object
    store between a synth task stage and the extract actor stage makes the
    pipeline plasma-bound (object-store writes serialize under memory
    pressure — measured ANTI-scaling 8→32 cpus). One stage keeps the fat
    intermediate on the actor's heap. On a deployment reading real
    interleaved Lance input there is no synth stage and the extractor reads
    the source directly — same shape."""

    def __init__(self, seed: int = DEFAULT_SEED, repeat: int = 1, config=None):
        self.seed = seed
        self.repeat = max(1, repeat)
        self.extractor = SpanExtractor(config)

    def __call__(self, batch):
        import pyarrow as pa
        import pyarrow.compute as pc

        outs = []
        for rep in range(self.repeat):
            docs = synth_docs_batch(batch, self.seed + rep * 1_000_003)
            if rep:
                docs = docs.set_column(
                    docs.schema.get_field_index("doc_id"),
                    "doc_id",
                    pc.binary_join_element_wise(
                        docs.column("doc_id"), pa.scalar(f"r{rep}"), "~"
                    ),
                )
            outs.append(self.extractor(docs))
        return pa.concat_tables(outs)


def extract_pipeline_fused(
    sf_dir: str,
    config: Optional[ExtractConfig] = None,
    seed: int = DEFAULT_SEED,
    repeat: int = 1,
    batch_size: int = 16,
    concurrency=None,
) -> ray.data.Dataset:
    """Flagship with synth+extract fused in one actor pool (see
    SynthExtract). The benchmark headline uses this path."""
    import ray as _ray

    parallelism = None
    if _ray.is_initialized():
        parallelism = 4 * int(_ray.cluster_resources().get("CPU", 4))
    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "text"],
    )
    if parallelism:
        ds = ds.repartition(parallelism)  # single-row-group source → split
    cache: dict = {}

    def fused(batch):
        se = cache.get("se")
        if se is None:
            se = cache["se"] = SynthExtract(seed=seed, repeat=repeat, config=config)
        return se(batch)

    # task pool + closure-local cache (the closure is deserialized once per
    # worker process) — see _extract_batch_cached for why not an actor pool
    return ds.map_batches(
        fused,
        batch_format="pyarrow",
        batch_size=batch_size,
        zero_copy_batch=True,
    )


def plan_mappings(
    docs: ray.data.Dataset,
    cache_dir: Optional[str] = None,
) -> dict:
    """Hybrid-reader analogue (SURVEY.md S6, readers/hybrid.py:68-108):
    an expensive planner produces a per-doc ``TablesMapping`` ONCE, cached
    as ``<doc_id>.mapping.json``, and deterministic extraction then uses
    it. The reference's LLM planner is stubbed with a deterministic one
    (first table's header row → ordinal→name map) so fixtures reproduce;
    the cache check / write flow is real.

    Returns ``{doc_id: mapping}`` for broadcast into ``SpanExtractor``
    (``ray.put`` once — a broadcast hash join on doc_id, J6)."""
    import json
    import os

    import pyarrow as pa

    from ..functions.text import normalize_column_name
    from ..stages.extract import CELL_SEP

    cached: dict = {}
    if cache_dir:
        os.makedirs(cache_dir, exist_ok=True)
        for name in os.listdir(cache_dir):
            if name.endswith(".mapping.json"):
                doc_id = name.removesuffix(".mapping.json")
                cached[doc_id] = json.load(open(os.path.join(cache_dir, name)))

    def plan_batch(batch: pa.Table) -> pa.Table:
        out_ids, out_maps = [], []
        for doc_id, spans in zip(
            batch.column("doc_id").to_pylist(), batch.column("spans").to_pylist()
        ):
            if doc_id in cached:
                continue  # cache hit → planner not invoked (hybrid.py:77-82)
            header = next(
                (
                    s["text"]
                    for s in sorted(spans or [], key=lambda s: s["offset"])
                    if s["kind"] == "table_row"
                ),
                None,
            )
            if header is None:
                continue
            cells = header.split(CELL_SEP)
            mapping = {
                "header_mode": "all_pages",
                "column_mappings": {
                    str(i): normalize_column_name(c) or f"col_{i}"
                    for i, c in enumerate(cells)
                },
            }
            out_ids.append(doc_id)
            out_maps.append(json.dumps(mapping))
        return pa.table(
            {
                "doc_id": pa.array(out_ids, pa.string()),
                "mapping_json": pa.array(out_maps, pa.string()),
            }
        )

    fresh = docs.map_batches(plan_batch, batch_format="pyarrow").to_pandas()
    result = dict(cached)
    for _, row in fresh.iterrows():
        mapping = json.loads(row["mapping_json"])
        result[row["doc_id"]] = mapping
        if cache_dir:
            path = os.path.join(cache_dir, f"{row['doc_id']}.mapping.json")
            tmp = path + ".tmp"
            json.dump(mapping, open(tmp, "w"))
            os.replace(tmp, path)
    return result


def extract_spans_mapped(
    docs: ray.data.Dataset,
    mappings: dict,
    config: Optional[ExtractConfig] = None,
    batch_size: int = 32,
    concurrency=None,
) -> ray.data.Dataset:
    """Mapped (hybrid) extraction: the mappings dict ships to the actor
    pool via ``ray.put`` once, resolved per actor in ``__init__``."""
    import ray

    if concurrency is None:
        cpus = int(ray.cluster_resources().get("CPU", 4)) if ray.is_initialized() else 4
        concurrency = (1, max(2, cpus))
    return docs.map_batches(
        SpanExtractor,
        fn_constructor_kwargs={
            "config": config or ExtractConfig(),
            "mappings": ray.put(mappings),
        },
        batch_format="pyarrow",
        batch_size=batch_size,
        zero_copy_batch=True,
        concurrency=concurrency,
    )


_WIN_SEP = "\x00win\x00"


def extract_spans_windowed(
    docs: ray.data.Dataset,
    config: Optional[ExtractConfig] = None,
    window_spans: int = 256,
    batch_size: int = 32,
    concurrency=None,
) -> ray.data.Dataset:
    """split_pages analogue (SURVEY.md S7, readers/split_pages.py:87-138):
    fan each doc out into span windows, extract windows independently,
    reassemble per doc in window order with span indices re-stamped.

    Windows only close OUTSIDE a ``table_row`` run, so the reassembled
    sequence is bit-identical to unwindowed extraction (the reference's
    page-batch splits can cut tables at batch boundaries; deferring the
    cut until the run closes removes that artifact). One giant doc no
    longer serializes one actor — its windows extract in parallel — which
    is the long-doc skew remedy the north rule asks for."""
    import pyarrow as pa

    def explode(batch: pa.Table) -> pa.Table:
        out_ids, out_spans = [], []
        for doc_id, spans in zip(
            batch.column("doc_id").to_pylist(), batch.column("spans").to_pylist()
        ):
            ordered = sorted(spans or [], key=lambda s: s["offset"])
            win, win_idx = [], 0
            for span in ordered:
                win.append(span)
                if len(win) >= window_spans and span["kind"] != "table_row":
                    out_ids.append(f"{doc_id}{_WIN_SEP}{win_idx:06d}")
                    out_spans.append(win)
                    win, win_idx = [], win_idx + 1
            if win or win_idx == 0:
                out_ids.append(f"{doc_id}{_WIN_SEP}{win_idx:06d}")
                out_spans.append(win)
        from ..schema import DOC_SCHEMA, SPAN_STRUCT

        return pa.table(
            {
                "doc_id": pa.array(out_ids, pa.string()),
                "spans": pa.array(out_spans, pa.list_(SPAN_STRUCT)),
            }
        )

    sub_spans = extract_spans(
        docs.map_batches(explode, batch_format="pyarrow"),
        config=config,
        batch_size=batch_size,
        concurrency=concurrency,
    )

    def restamp(group: pa.Table) -> pa.Table:
        # group = one original doc; rows arrive sorted by (sub_doc_id,
        # span_idx) from groupby_apply's sort — zero-padded window index
        # makes that the correct global order.
        sub = group.column("doc_id").to_pylist()
        doc_id = sub[0].split(_WIN_SEP, 1)[0]
        n = group.num_rows
        return pa.table(
            {
                "doc_id": pa.array([doc_id] * n, pa.string()),
                "span_idx": pa.array(range(n), pa.int32()),
                "kind": group.column("kind"),
                "text": group.column("text"),
                "media_ref": group.column("media_ref"),
            }
        )

    from ..stages.shuffle import groupby_apply

    def add_base(batch: pa.Table) -> pa.Table:
        base = [s.split(_WIN_SEP, 1)[0] for s in batch.column("doc_id").to_pylist()]
        return batch.append_column("base_doc", pa.array(base, pa.string()))

    stamped = sub_spans.map_batches(add_base, batch_format="pyarrow")

    def per_doc(group: pa.Table) -> pa.Table:
        ordered = group.sort_by([("doc_id", "ascending"), ("span_idx", "ascending")])
        return restamp(ordered.drop_columns(["base_doc"]))

    return groupby_apply(stamped, "base_doc", per_doc, batch_format="pyarrow")


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
