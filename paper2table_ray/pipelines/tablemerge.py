"""End-to-end tablemerge analogue: resultset dirs → merged resultset dir.

The full lifecycle of the reference's `tablemerge` CLI (SURVEY.md §3.2,
/root/reference/src/tablemerge/__main__.py:596-672 → merge_resultsets
244-310), driven by the same ``MergeSettings`` flag surface
(state/settings.py) end-to-end:

1. read every ``*.tables.json`` across the source resultsets into one
   cells Dataset (source_uuid-tagged) — sources/tablesfile_json.py;
2. build the analyzer/transformer/agreement configuration from settings
   (``settings_to_config`` — the analogue of build_analyzers
   __main__.py:113-143), with ``uuid_to_reader`` taken from each source's
   ``tables.metadata.json`` for the distinct-readers agreement;
3. one coarse-sharded groupby(doc_id) merge (pipelines/merge.py);
4. write the merged resultset (idempotent per-doc files + metadata +
   curation skip) and persist the settings alongside
   (``settings.tablemerge.json``), matching the reference's
   settings-capture behavior (settings.py:66-74).
"""

from __future__ import annotations

import hashlib
import os
from typing import List, Optional

import pandas as pd

from ..functions.text import parse_hints
from ..sources.tablesfile_json import load_metadata, read_resultsets, write_resultset
from ..stages.aligners import parse_column_aliases
from ..state.settings import MergeSettings
from .merge import MergeConfig, merge_pipeline


def settings_to_config(
    settings: MergeSettings, uuid_to_reader: Optional[dict] = None
) -> MergeConfig:
    """MergeSettings (CLI flag surface) → MergeConfig (engine knobs)."""
    return MergeConfig(
        column_agreement=settings.agreement_method != "none",
        distinct_readers=settings.agreement_method == "distinct-readers",
        uuid_to_reader=uuid_to_reader or {},
        jaccard_alignment=settings.jaccard_column_alignment,
        hints=parse_hints(settings.column_names_hints or ""),
        aliases=parse_column_aliases(settings.column_aliases or ""),
        filter_title_rows=settings.filter_title_rows,
        drop_empty_columns=settings.drop_empty_columns,
        drop_empty_tables=settings.drop_empty_tables,
    )


def merged_uuid_for(resultset_dirs: List[str]) -> str:
    """Content-derived resultset id (deterministic — testable, idempotent;
    the reference stamps uuid4, SURVEY.md §4 determinism row)."""
    basis = "|".join(
        os.path.basename(os.path.normpath(d)) for d in sorted(resultset_dirs)
    )
    return "merged-" + hashlib.blake2b(basis.encode(), digest_size=8).hexdigest()


def run_tablemerge(
    resultset_dirs: List[str],
    output_dir: str,
    settings: Optional[MergeSettings] = None,
    resultset_uuid: Optional[str] = None,
    force_update: bool = False,
    paper: Optional[str] = None,
) -> pd.DataFrame:
    """Merge N resultset directories into ``<output_dir>/<uuid>/``.
    Returns the per-doc write summary. ``paper``: regex — merge only docs
    whose id fullmatches it (J2, tablemerge/__main__.py:165-174), applied
    BEFORE the shuffle."""
    settings = settings or MergeSettings()
    uuid_to_reader = {}
    for d in resultset_dirs:
        meta = load_metadata(d)
        if meta and meta.get("uuid") and meta.get("reader"):
            uuid_to_reader[meta["uuid"]] = meta["reader"]
        else:
            uuid_to_reader[os.path.basename(os.path.normpath(d))] = None

    cells = read_resultsets(resultset_dirs)
    if paper:
        import re as _re

        import pyarrow as pa

        pattern = _re.compile(paper)

        def keep(batch: pa.Table) -> pa.Table:
            mask = pa.array(
                [bool(pattern.fullmatch(d)) for d in batch.column("doc_id").to_pylist()]
            )
            return batch.filter(mask)

        cells = cells.map_batches(keep, batch_format="pyarrow")
    cfg = settings_to_config(settings, uuid_to_reader)
    merged = merge_pipeline(cells, cfg)

    uuid = resultset_uuid or merged_uuid_for(resultset_dirs)
    summary = write_resultset(
        merged,
        output_dir,
        uuid,
        reader="tablemerge",
        sources=sorted(uuid_to_reader),
        force_update=force_update,
        pretty=settings.pretty,
    )
    settings.write_file(os.path.join(output_dir, uuid))
    return summary
