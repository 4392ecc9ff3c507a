"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship extraction pipeline on sf0.001;
``queries()``/``oracle_sql()`` expose every implemented operator family
(SURVEY.md §2 + training-data ops; see COVERAGE.md): 50 queries, ALL 50
with DuckDB oracles. Kill-mid-run lineage recovery stays pytest-gated;
the cells merge is additionally differentially witnessed against the
reference's own merge code (tests/test_reference_differential_merge.py).
Ten oracles read deterministic pure-Python input dumps under /tmp
(pipelines/oracle_dumps.py) because their reference input exists only
as seeded synthesis, not as one of the driver's parquet views.

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
    from paper2table_ray.pipelines.queries import oracle_sql_all

    return oracle_sql_all()
