"""Storage-format seam: Lance when available, parquet otherwise.

The deployment target (BASELINE.json north_rule) stores the interleaved
corpus and extraction output as Lance tables (`ray.data.read_lance` /
`Dataset.write_lance`). The ``lance`` package is not installed in this
sandbox, so these helpers detect it at import and fall back to parquet
with the SAME schemas and partition layout — every pipeline goes through
this seam, so a Lance-backed deployment is a dependency install, not a
code change.
"""

from __future__ import annotations

from typing import List, Optional

import ray.data

try:  # pragma: no cover - availability depends on the environment
    import lance  # noqa: F401

    HAVE_LANCE = True
except ImportError:
    HAVE_LANCE = False


def read_table(path: str, columns: Optional[List[str]] = None) -> ray.data.Dataset:
    """Read a docs/spans/cells table from `path` (Lance dataset dir or
    parquet file/dir), projecting ``columns`` at the read."""
    if HAVE_LANCE and path.endswith(".lance"):
        return ray.data.read_lance(path, columns=columns)
    return ray.data.read_parquet(path, columns=columns)


def write_table(ds: ray.data.Dataset, path: str) -> None:
    """Write a Dataset to `path` — Lance commit when available and the
    path names a ``.lance`` dataset, else partitioned parquet."""
    if HAVE_LANCE and path.endswith(".lance"):
        ds.write_lance(path)
        return
    ds.write_parquet(path)
