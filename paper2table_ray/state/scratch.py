"""Shared-scratch resolution for every spill / cache / checkpoint path.

Multi-node contract: any stage that WRITES intermediate state a LATER
task may READ on a different node (MinHash signature spill, mapping
cache, lineage partitions, CSV sink staging) must place it under a
directory visible to every node — an NFS/Lustre mount, FUSE-mounted
object storage, etc. On a laptop or in this sandbox the local temp dir
is fine; on a real cluster set ``P2T_SCRATCH_DIR`` (or pass an explicit
directory) to shared storage, since each node's ``/tmp`` is private and
a task scheduled elsewhere would see an empty directory, not an error.

Resolution order: explicit argument > ``P2T_SCRATCH_DIR`` env var >
``tempfile.gettempdir()``.
"""

from __future__ import annotations

import os
import tempfile
from typing import Optional

ENV_VAR = "P2T_SCRATCH_DIR"


def scratch_root(explicit: Optional[str] = None) -> str:
    """Resolve the scratch root; creates the directory if needed."""
    root = explicit or os.environ.get(ENV_VAR) or tempfile.gettempdir()
    os.makedirs(root, exist_ok=True)
    return root


def scratch_dir(prefix: str, explicit: Optional[str] = None) -> str:
    """A fresh unique directory under the scratch root."""
    return tempfile.mkdtemp(prefix=prefix, dir=scratch_root(explicit))
