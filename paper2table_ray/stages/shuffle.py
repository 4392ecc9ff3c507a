"""Coarse-shard groupby: hash-partitioned per-group apply without
per-group scheduler overhead.

``ds.groupby(key).map_groups(fn)`` in Ray 2.49 pays a fixed ~1-3 ms per
GROUP (slice + fn dispatch + format conversion). For per-doc operators the
group count equals the corpus size, so a 5k-doc sf0.1 run spends ~10 s in
pure overhead and a 10^12-doc corpus is unschedulable. ``groupby_apply``
keeps the same per-group semantics but shuffles on ``hash(key) %
num_shards`` — Ray sees O(num_shards) groups; true groups are recovered
inside the shard task by a vectorized sort + run-boundary scan and ``fn``
is applied per group in-process.

Semantics guarantee: ``fn`` still receives EXACTLY one full group per
call (all rows for one key, co-located), same as ``map_groups``; only the
scheduling granularity changes. Pick ``num_shards`` ≈ 2-4× total cores at
deploy scale.
"""

from __future__ import annotations

from typing import Callable, List, Union

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

_SHARD_COL = "__gshard"


def default_num_shards() -> int:
    """Shuffle width derived from the CLUSTER, not a constant: 2 shard
    tasks per core — measured optimum for the merge pipeline at 32 cpus
    (4× cores doubled the per-shard fixed costs: 2.5s vs 1.2s on the
    sf0.1 merge; 1× loses straggler slack). Floor 16 so small dev
    sessions still exercise multi-shard paths. Callers that need a FIXED
    width across runs (the lineage store's partition count, resumability
    contract) must keep passing one."""
    import ray

    cpus = (
        int(ray.cluster_resources().get("CPU", 4))
        if ray.is_initialized()
        else 16
    )
    return max(16, 2 * cpus)


def _key_hash(batch: pa.Table, keys: List[str]) -> np.ndarray:
    acc = np.zeros(batch.num_rows, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for k in keys:
            col = batch.column(k).to_numpy(zero_copy_only=False)
            h = pd.util.hash_array(np.asarray(col))
            acc = acc * np.uint64(1099511628211) ^ h
    return acc


def apply_fn_per_group(
    tbl: pa.Table,
    key_list: List[str],
    fn: Callable,
    batch_format: str = "pyarrow",
) -> Union[pa.Table, pd.DataFrame]:
    """The in-task group-apply kernel shared by ``groupby_apply`` and the
    bucketed-store ``map_partitions`` path: vectorized sort + run-boundary
    scan over the composite key, ``fn`` applied once per full group."""
    tbl = tbl.sort_by([(k, "ascending") for k in key_list])
    n = tbl.num_rows
    if n == 0:
        return pd.DataFrame()
    marks = np.zeros(n, dtype=bool)
    for k in key_list:
        arr = tbl.column(k).to_numpy(zero_copy_only=False)
        marks[1:] |= arr[1:] != arr[:-1]
    starts = np.flatnonzero(np.concatenate(([True], marks[1:])))
    ends = np.append(starts[1:], n)
    outs = []
    for s, e in zip(starts, ends):
        group = tbl.slice(s, e - s)
        if batch_format == "pandas":
            group = group.to_pandas()
        out = fn(group)
        if out is None:
            continue
        if isinstance(out, pd.DataFrame):
            if len(out):
                outs.append(out)
        elif out.num_rows:
            outs.append(out)
    if not outs:
        return pd.DataFrame()
    if isinstance(outs[0], pd.DataFrame):
        return pd.concat(outs, ignore_index=True)
    return pa.concat_tables(outs)


def groupby_apply(
    ds: ray.data.Dataset,
    keys: Union[str, List[str]],
    fn: Callable,
    *,
    num_shards: "int | None" = None,
    batch_format: str = "pyarrow",
) -> ray.data.Dataset:
    """Apply ``fn(group)`` once per distinct key tuple; returns the
    concatenated outputs. ``fn`` gets a ``pa.Table`` (batch_format=
    "pyarrow") or ``pd.DataFrame`` and may return either type."""
    key_list = [keys] if isinstance(keys, str) else list(keys)
    return groupby_apply_table(
        ds,
        key_list,
        lambda tbl: apply_fn_per_group(tbl, key_list, fn, batch_format),
        num_shards=num_shards,
    )


def groupby_apply_table(
    ds: ray.data.Dataset,
    keys: Union[str, List[str]],
    table_fn: Callable,
    *,
    num_shards: "int | None" = None,
) -> ray.data.Dataset:
    """Coarse-shard groupby handing each shard's WHOLE table to
    ``table_fn`` (which owns per-group semantics internally, with the
    shard guaranteed to contain every row of each of its key groups).
    For kernels that amortize decode/encode across a shard's groups —
    e.g. the cells merge decodes the shard once and encodes once instead
    of per doc (pipelines/merge.py::merge_cells_table)."""
    key_list = [keys] if isinstance(keys, str) else list(keys)
    if num_shards is None:
        num_shards = default_num_shards()

    def stamp(batch: pa.Table) -> pa.Table:
        shard = (_key_hash(batch, key_list) % np.uint64(num_shards)).astype(
            np.int32
        )
        return batch.append_column(_SHARD_COL, pa.array(shard))

    def run_shard(shard_tbl: pa.Table) -> Union[pa.Table, pd.DataFrame]:
        return table_fn(shard_tbl.drop_columns([_SHARD_COL]))

    return (
        ds.map_batches(stamp, batch_format="pyarrow")
        # ensure the groupby's sort has ≥num_shards blocks to emit — with
        # one input block every shard would run serially in a single task
        .repartition(num_shards)
        .groupby(_SHARD_COL)
        .map_groups(run_shard, batch_format="pyarrow")
    )
