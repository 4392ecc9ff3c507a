"""Span extraction: interleaved docs → ordered output span sequences.

The Ray-Data-native analogue of the reference's per-paper reader pipeline
(/root/reference/src/paper2table/readers/document.py:139-206 — table shaping,
header promotion via hints (readers/utils.py:5-10), cell cleanup — plus the
default pretransformer chain, __main__.py:675-688), operating on interleaved
``(doc_id, spans)`` documents instead of PDF bytes (BASELINE.json input_hint).

Output contract (the correctness invariant is span-sequence equality on
``(kind, text, media_ref, order)`` per doc):

- ``heading`` / ``caption`` spans  → same kind, ``normalize_str`` text
- ``text`` spans                   → ``text`` kind, ``normalize_str`` text;
                                     dropped when empty after normalization
- ``html`` spans                   → boilerplate-stripped main-content
                                     blocks, one ``text`` span per block
- ``media`` spans                  → passed through (text="")
- maximal runs of ``table_row``    → one table fragment: cells split on TAB;
  spans                              header promotion when the first row
                                     matches the hints; fragment-transformer
                                     chain; then one ``table`` span (TAB-
                                     joined column names) followed by one
                                     ``row`` span per surviving row (TAB-
                                     joined values in column order)

``SpanExtractor`` is a callable class — in Ray Data it is hosted as an actor
pool via ``map_batches(SpanExtractor, fn_constructor_kwargs=...,
batch_format="pyarrow", concurrency=N)`` so the per-worker state (compiled
regexes, hint set, transformer chain, boilerplate stripper) is built once
per actor (SURVEY.md §2.3).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import pyarrow as pa

from .. import rowmodel as rm
from ..functions.text import normalize_column_name, normalize_str
from ..schema import SPANS_OUT_SCHEMA
from .boilerplate import BoilerplateStripper
from .transformers import (
    FilterEmptyRowsTransformer,
    FilterTitleRowsTransformer,
    LeadingRowNumberTransformer,
    NormalizePunctuationTransformer,
)

CELL_SEP = "\t"

import re as _re

_MULTISPACE_RE = _re.compile(r" {2,}")


@dataclass
class ExtractConfig:
    """Flagship extraction configuration.

    ``filter_title_rows`` and ``filter_empty_rows`` mirror the reference's
    default-on pretransformers (__main__.py:679-688); the other two are the
    optional transformers, enabled in the flagship pipeline so fixtures
    exercise them.
    """

    hints: Tuple[str, ...] = (
        "family",
        "scientific_name",
        "common_name",
        "species",
        "count",
        "population",
        "status",
    )
    filter_title_rows: bool = True
    leading_row_numbers: bool = True
    normalize_punctuation: bool = True
    filter_empty_rows: bool = True
    min_text_len: int = 25
    max_link_density: float = 0.35
    quarantine: bool = True  # per-doc failures → ("error", msg, "") span
    # cell-split strategy candidates, tried IN ORDER per table run until
    # one yields structure (the reference's extraction-settings sweep,
    # readers/document.py:92-119 + pdfplumber.py:52-66: iterate candidate
    # settings, first successful parse wins, fail only after all fail)
    strategies: Tuple[str, ...] = ("tab", "spaces", "pipe")
    # 1-based inclusive page window (reference 'file.pdf:first:last'
    # syntax, page_range.py:5-14 + split_pages.py page_range): only table
    # runs numbered within the window are extracted; runs outside yield
    # nothing (the reference skips those pages entirely — non-table spans
    # are kept here since this engine's output interleaves them)
    page_range: Optional[Tuple[int, int]] = None


class SpanExtractor:
    """Actor-pool batch UDF: docs batch (DOC_SCHEMA) → spans batch
    (SPANS_OUT_SCHEMA).

    ``mappings``: optional ``{doc_id: mapping}`` side dict (or a Ray
    ObjectRef to one — resolved ONCE per actor here in ``__init__``, the
    broadcast-join pattern, SURVEY.md J6/ST6). A mapping mirrors the
    reference's LLM-produced ``TablesMapping`` (mapping.py:19-43):
    ``{"column_mappings": {ordinal(str|int): name}, "header_mode":
    "all_pages" | "first_page_only" | "none"}`` — mapped extraction
    selects cells by ordinal, renames them, and drops header rows per
    header_mode (document.py:77-123 mapped path).

    ``quarantine``: per-doc failures become one ``("error", message, "")``
    span instead of failing the task — semantic failures are data
    (SURVEY.md §4 stragglers row; reference analogue: warn-continue +
    partial writes, __main__.py:428-440)."""

    def __init__(
        self,
        config: Optional[ExtractConfig] = None,
        mappings=None,
    ):
        self.config = config or ExtractConfig()
        if mappings is not None and not isinstance(mappings, dict):
            import ray as _ray

            mappings = _ray.get(mappings)
        self.mappings = mappings or {}
        self.hints_set = frozenset(self.config.hints)
        self.stripper = BoilerplateStripper(
            min_text_len=self.config.min_text_len,
            max_link_density=self.config.max_link_density,
        )
        chain = []
        if self.config.filter_title_rows:
            chain.append(FilterTitleRowsTransformer())
        if self.config.leading_row_numbers:
            chain.append(LeadingRowNumberTransformer())
        if self.config.normalize_punctuation:
            chain.append(NormalizePunctuationTransformer())
        if self.config.filter_empty_rows:
            chain.append(FilterEmptyRowsTransformer())
        self.transformers = chain

    # -- per-doc logic ------------------------------------------------------

    def extract_doc(
        self, spans: List[dict], mapping: Optional[dict] = None
    ) -> List[Tuple[str, str, str]]:
        """One doc's input spans (offset order) → ordered (kind, text,
        media_ref) output sequence. ``mapping`` accepts both the
        reference's TablesMapping JSON shape and the compact form
        (stages/llmclient.normalize_tables_mapping)."""
        from .llmclient import normalize_tables_mapping

        norm = normalize_tables_mapping(mapping) if mapping else None
        out: List[Tuple[str, str, str]] = []
        table_run: List[str] = []
        table_no = [0]  # fragment counter (for first_page_only header mode)

        page_range = self.config.page_range

        def flush_table():
            if table_run:
                tm = None
                skip = False
                run_no = table_no[0] + 1
                if page_range is not None:
                    if not (page_range[0] <= run_no <= page_range[1]):
                        skip = True
                    # reference split_pages semantics (split_pages.py):
                    # the selected pages are written to a temp PDF and
                    # RENUMBERED 1..k before the inner (possibly mapped)
                    # reader sees them — so any mapping window below is
                    # window-relative, not global
                    run_no = run_no - page_range[0] + 1
                local_idx = run_no - 1
                is_first = local_idx == 0
                if not skip and norm is not None:
                    if norm["apply_to_all"]:
                        tm = norm["tables"][0]
                    elif norm["tables"] and norm["tables"][0].get("first_page"):
                        # reference page-window semantics
                        # (document.py:77-123): only the FIRST table
                        # mapping is read (the trailing ``break`` at
                        # document.py:121), applied to the 1-based page
                        # window [first_page, last_page]; pages outside
                        # the window — including windows entirely past
                        # the document's end (the IndexError
                        # warn-and-abort, document.py:85-90) — yield no
                        # tables. Here a "page" is a table run.
                        tm = norm["tables"][0]
                        first = tm["first_page"]
                        last = tm.get("last_page") or first
                        if not (first <= run_no <= last):
                            skip = True
                        is_first = run_no == first
                    elif local_idx < len(norm["tables"]):
                        # windowless multi-table form: run i → tables[i]
                        tm = norm["tables"][local_idx]
                    else:
                        # reference mapped path reads ONLY mapped tables
                        # (document.py:80-123): unmapped runs are skipped
                        skip = True
                if not skip:
                    out.extend(self._extract_table(table_run, tm, is_first))
                table_no[0] += 1
                table_run.clear()

        for span in sorted(spans, key=lambda s: s["offset"]):
            kind = span["kind"]
            if kind == "table_row":
                table_run.append(span["text"])
                continue
            flush_table()
            if kind in ("heading", "caption"):
                out.append((kind, normalize_str(span["text"]), ""))
            elif kind == "text":
                text = normalize_str(span["text"])
                if text:
                    out.append(("text", text, ""))
            elif kind == "html":
                for block in self.stripper.extract_blocks(span["text"]):
                    out.append(("text", block, ""))
            elif kind == "media":
                out.append(("media", "", span["media_ref"]))
            # unknown kinds are dropped (quarantine-worthy upstream)
        flush_table()
        return out

    # strategy registry: raw row texts → cell grids (values looked up via
    # the dict, so no descriptor binding). "tab" is the native shape;
    # "spaces" recovers tables whose TABs were flattened to runs of
    # spaces; "pipe" recovers Markdown/ASCII-art style rows.
    _STRATEGIES = {
        "tab": lambda raw: [r.split(CELL_SEP) for r in raw],
        "spaces": lambda raw: [_MULTISPACE_RE.split(r.strip()) for r in raw],
        "pipe": lambda raw: [
            [c.strip() for c in r.strip().strip("|").split("|")] for r in raw
        ],
    }

    def _parse_grids(
        self, raw_rows: List[str], min_width: Optional[int] = None
    ) -> Optional[List[List[str]]]:
        """Candidate sweep (document.py:92-119): first strategy that
        parses AND finds ≥2 columns wins; a raising strategy is skipped;
        if every strategy parses single-column, the first parse is
        accepted (legitimate one-column table); if every strategy raises,
        the last error propagates (→ doc-level quarantine).

        ``min_width`` (mapped path): a candidate must also cover the
        highest mapped column ordinal — the reference's ordinal-select
        raises KeyError inside the same candidate loop (document.py:
        94-119 + 174-177); when NO candidate covers it the page yields
        no table (warn-and-skip) → ``None`` here, never an exception."""
        last_error: Optional[Exception] = None
        fallback: Optional[List[List[str]]] = None
        for name in self.config.strategies:
            parse = self._STRATEGIES[name]
            try:
                grids = parse(raw_rows)
            except Exception as exc:
                last_error = exc
                continue
            width = max(len(g) for g in grids)
            if min_width is not None:
                if width >= min_width:
                    return grids
                continue
            if width >= 2:
                return grids
            if fallback is None:
                fallback = grids
        if min_width is not None:
            return None
        if fallback is not None:
            return fallback
        assert last_error is not None
        raise last_error

    def _extract_table(
        self,
        raw_rows: List[str],
        mapping: Optional[dict] = None,
        is_first: bool = True,
    ) -> List[Tuple[str, str, str]]:
        if mapping:
            cm = {int(k): v for k, v in mapping.get("column_mappings", {}).items()}
            ordinals = sorted(cm)
            min_width = ordinals[-1] + 1 if ordinals else None
            grids = self._parse_grids(raw_rows, min_width=min_width)
            if grids is None:
                # no candidate covers the highest mapped ordinal → the
                # run yields no table (reference warn-and-skip)
                return []
        else:
            grids = self._parse_grids(raw_rows)
        width = max(len(g) for g in grids)
        grids = [g + [""] * (width - len(g)) for g in grids]

        if mapping:
            # mapped path (document.py:77-123): drop header per header_mode,
            # then select by ordinal + rename.
            header_mode = mapping.get("header_mode", "all_pages")
            body = grids
            if body and (
                header_mode == "all_pages"
                or (header_mode == "first_page_only" and is_first)
            ):
                body = body[1:]
            columns = [normalize_column_name(cm[o]) for o in ordinals]
            body = [
                [row[o] if o < len(row) else "" for o in ordinals] for row in body
            ]
        else:
            # header promotion (readers/utils.py:5-10 + read_table header
            # path): first row is a header iff any cell normalizes to a hint.
            columns = [str(i) for i in range(width)]
            body = grids
            if grids and any(
                normalize_column_name(cell) in self.hints_set for cell in grids[0]
            ):
                columns = [normalize_column_name(cell) for cell in grids[0]]
                body = grids[1:]

        # reference read_table strips newlines from cells and normalizes
        # column names (document.py:177-185)
        fragment: rm.Fragment = {
            "rows": [
                rm.make_row(
                    {
                        col: cell.replace("\n", " ")
                        for col, cell in zip(columns, row)
                    }
                )
                for row in body
            ],
            "page": 1,
        }
        for transformer in self.transformers:
            fragment = transformer.transform_fragment(fragment)

        out_columns = rm.fragment_column_names(fragment) or columns
        out = [("table", CELL_SEP.join(out_columns), "")]
        for row in fragment["rows"]:
            values = []
            for col in out_columns:
                val = row["cells"].get(col)
                if val is None:
                    values.append("")
                elif isinstance(val, str):
                    values.append(val)
                else:
                    values.append(val[0]["value"] if val else "")
            out.append(("row", CELL_SEP.join(values), ""))
        return out

    # -- batch UDF ----------------------------------------------------------

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids = batch.column("doc_id").to_pylist()
        spans_col = batch.column("spans").to_pylist()
        out_doc, out_idx, out_kind, out_text, out_ref = [], [], [], [], []
        for doc_id, spans in zip(doc_ids, spans_col):
            mapping = self.mappings.get(doc_id)
            try:
                extracted = self.extract_doc(spans or [], mapping)
            except Exception as exc:  # quarantine, don't fail the task
                if not self.config.quarantine:
                    raise
                extracted = [("error", f"{type(exc).__name__}: {exc}", "")]
            for idx, (kind, text, ref) in enumerate(extracted):
                out_doc.append(doc_id)
                out_idx.append(idx)
                out_kind.append(kind)
                out_text.append(text)
                out_ref.append(ref)
        return pa.Table.from_arrays(
            [
                pa.array(out_doc, type=pa.string()),
                pa.array(out_idx, type=pa.int32()),
                pa.array(out_kind, type=pa.string()),
                pa.array(out_text, type=pa.string()),
                pa.array(out_ref, type=pa.string()),
            ],
            schema=SPANS_OUT_SCHEMA,
        )
