"""Pluggable table-model client protocol (SURVEY.md S5/ST4 seam).

The reference's agent reader (src/paper2table/readers/agent.py) calls a
hosted LLM per paper; a real client cannot run in this hermetic sandbox,
so the SEAM is made first-class instead:

- :class:`TablesModelClient` — the protocol a real backend implements
  (``plan(doc_id, spans) -> mapping | None``);
- :class:`DeterministicPlannerClient` — the in-repo deterministic stub
  (first table's header row → ordinal→name map) used by every pipeline
  and fixture;
- :class:`RateLimitedClient` — the call-pacing wrapper mirroring the
  reference's ``--model-sleep`` (``time.sleep`` before EVERY model call,
  __main__.py:198/305), hosted once per worker so pacing is per-actor;
- :func:`is_model_unavailable` / :class:`ModelUnavailableError` — the
  503 classification of agent.py:68-76: an unavailable model is NOT a
  data error. Planning skips the doc (no mapping row, no cache file) so
  a later resume run retries it — exactly the reference's warn-and-skip
  + ``--append``-retry flow (__main__.py:428-440).
"""

from __future__ import annotations

import time
from typing import Callable, List, Optional, Protocol


class ModelUnavailableError(Exception):
    """readers/errors.py:4 — the model endpoint is temporarily down."""


def is_model_unavailable(exc: BaseException) -> bool:
    """agent.py:68-76 classification: provider ServerError with status
    503, or '503' + 'unavailable'/'high demand' in the message text (the
    provider import is optional — text matching is the portable path)."""
    if getattr(exc, "status_code", None) == 503:
        return True
    text = str(exc).lower()
    return "503" in text and ("unavailable" in text or "high demand" in text)


def unwrap_cause(exc: BaseException) -> BaseException:
    """__main__.py:96-101: walk ``__cause__`` to the root before
    classifying."""
    cause = exc
    while cause.__cause__ is not None:
        cause = cause.__cause__
    return cause


def normalize_tables_mapping(obj: dict) -> dict:
    """Accept BOTH mapping-file shapes and return the internal form:

    - the reference's ``TablesMapping`` JSON (mapping.py:19-52):
      ``{"tables": [{title, header_mode, first_page, last_page,
      column_mappings: [{from_column_number, to_column_name}]}],
      "citation", "metadata"}`` — a reference user's existing
      ``*.mapping.json`` cache files load unmodified;
    - this repo's compact single-table form:
      ``{"header_mode", "column_mappings": {ordinal: name}}``.

    Internal form: ``{"tables": [{"header_mode", "column_mappings":
    {ordinal(str): name}}]}`` — per-table-run mappings in order. The
    compact form becomes a single entry marked ``"apply_to_all": True``
    (current behavior: the one mapping applies to every table run); the
    reference multi-table form maps table run i → tables[i] and SKIPS
    runs beyond the list (the reference's mapped path reads ONLY mapped
    tables, document.py:80-123)."""
    if "tables" in obj and isinstance(obj["tables"], list):
        tables = []
        for t in obj["tables"]:
            cms = t.get("column_mappings") or []
            if isinstance(cms, dict):
                mappings = {str(k): v for k, v in cms.items()}
            else:
                mappings = {
                    str(cm["from_column_number"]): cm["to_column_name"]
                    for cm in cms
                }
            tables.append(
                {
                    "header_mode": t.get("header_mode", "all_pages"),
                    "column_mappings": mappings,
                    # reference TableMapping page window (mapping.py:27-35,
                    # 1-based, required there; None marks the windowless
                    # compact form). In the interleaved-span model a
                    # document "page" is a table RUN, numbered 1..n in
                    # offset order.
                    "first_page": t.get("first_page"),
                    "last_page": t.get("last_page"),
                }
            )
        return {"tables": tables, "apply_to_all": False}
    return {
        "tables": [
            {
                "header_mode": obj.get("header_mode", "all_pages"),
                "column_mappings": {
                    str(k): v
                    for k, v in (obj.get("column_mappings") or {}).items()
                },
            }
        ],
        "apply_to_all": True,
    }


class TablesModelClient(Protocol):
    """What a real LLM backend must implement to slot into the hybrid
    planner. ``spans`` are the doc's input spans (offset order not
    guaranteed); return a ``TablesMapping`` dict (mapping.py:19-43 shape)
    or ``None`` when the doc has no table."""

    def plan(self, doc_id: str, spans: List[dict]) -> Optional[dict]: ...


class DeterministicPlannerClient:
    """The deterministic stand-in: first table_row's cells become the
    ordinal→normalized-name mapping (all_pages header mode)."""

    def plan(self, doc_id: str, spans: List[dict]) -> Optional[dict]:
        from ..functions.text import normalize_column_name
        from .extract import CELL_SEP

        header = next(
            (
                s["text"]
                for s in sorted(spans or [], key=lambda s: s["offset"])
                if s["kind"] == "table_row"
            ),
            None,
        )
        if header is None:
            return None
        cells = header.split(CELL_SEP)
        return {
            "header_mode": "all_pages",
            "column_mappings": {
                str(i): normalize_column_name(c) or f"col_{i}"
                for i, c in enumerate(cells)
            },
        }


class RateLimitedClient:
    """Pace + classify wrapper around any :class:`TablesModelClient`.

    - sleeps ``model_sleep`` seconds before every call (reference
      ``--model-sleep``; per-worker state, so an actor pool of N paces N
      parallel streams independently, matching the reference's N worker
      threads each sleeping before their own call);
    - retries a call classified unavailable up to ``max_retries`` times
      with exponential backoff (``backoff_base * 2**attempt``), then
      raises :class:`ModelUnavailableError` for the caller's skip path.

    ``sleep_fn`` is injectable for tests."""

    def __init__(
        self,
        inner: TablesModelClient,
        model_sleep: float = 0.0,
        max_retries: int = 2,
        backoff_base: float = 1.0,
        sleep_fn: Callable[[float], None] = time.sleep,
    ):
        self.inner = inner
        self.model_sleep = model_sleep
        self.max_retries = max_retries
        self.backoff_base = backoff_base
        self.sleep_fn = sleep_fn

    def plan(self, doc_id: str, spans: List[dict]) -> Optional[dict]:
        attempt = 0
        while True:
            if self.model_sleep:
                self.sleep_fn(self.model_sleep)
            try:
                return self.inner.plan(doc_id, spans)
            except BaseException as exc:
                root = unwrap_cause(exc)
                if not (is_model_unavailable(root) or is_model_unavailable(exc)):
                    raise
                if attempt >= self.max_retries:
                    raise ModelUnavailableError(str(exc)) from exc
                self.sleep_fn(self.backoff_base * (2**attempt))
                attempt += 1
