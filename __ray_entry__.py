"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship extraction pipeline on sf0.001;
``queries()``/``oracle_sql()`` expose every implemented operator family
(SURVEY.md §2 + training-data ops; see COVERAGE.md): 53 queries, 40 with
DuckDB oracles. Ops whose semantics are not SQL-expressible (LSH dedup
pair sets, the cells merge model, extraction over the synthesized
interleaved corpus) are rows-only by design — their correctness gates are
the pytest span-equality / brute-force / reference-fixture tests.

Ray is initialised by the driver BEFORE this module is imported: nothing
here calls ``ray.init()`` / ``ray.shutdown()``.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline: synthesize interleaved docs from sf0.001 and
    extract ordered (kind, text, media_ref) span sequences."""
    from paper2table_ray.pipelines.extract import extract_pipeline

    return extract_pipeline("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    from paper2table_ray.pipelines.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from paper2table_ray.pipelines.queries import ORACLE_SQL

    return dict(ORACLE_SQL)
