"""File dedup/normalize planning (filenorm analogue, SURVEY.md O6).

Behavioral parity with /root/reference/src/filenorm/__main__.py:29-66 over
(path, content_hash) rows instead of a local filesystem walk:

- duplicates: same md5 → keep the normalized-name match, else shortest path
  (processing order matters: the reference folds sequentially, so we do too
  per group, ordered by first-seen input position);
- renames: surviving files get normalized basenames with collision-avoidant
  ``_N`` suffixes (global sequential pass in input order).

At scale the hash computation runs distributed (``ray.data.
read_binary_files → map_batches(md5)``); the plan fold is inherently
sequential over the (tiny) survivors list, so it runs on the driver —
matching the reference's single decision pass.
"""

from __future__ import annotations

import os
from typing import Dict, List, Tuple

from ..functions.text import normalize_column_name


def plan_actions(
    files: List[Tuple[str, str]],
) -> Tuple[Dict[str, List[str]], Dict[str, str], Dict[str, str]]:
    """``files``: (path, content_md5) in input order →
    (duplicates {md5: [dropped paths]}, renames {path: new basename},
    keepers {md5: path})."""
    checksums: Dict[str, str] = {}
    duplicates: Dict[str, List[str]] = {}
    for path, md5 in files:
        if md5 not in checksums:
            checksums[md5] = path
        else:
            new, old = path, checksums[md5]
            new_base, _ = os.path.splitext(os.path.basename(new))
            old_base, _ = os.path.splitext(os.path.basename(old))
            if normalize_column_name(new_base) == old_base:
                keep = old
            elif normalize_column_name(old_base) == new_base:
                keep = new
            else:
                keep = min([old, new], key=len)
            drop = [f for f in (old, new) if f != keep]
            checksums[md5] = keep
            duplicates.setdefault(md5, []).extend(drop)

    renames: Dict[str, str] = {}
    seen = set()
    for path in checksums.values():
        base, ext = os.path.splitext(os.path.basename(path))
        new_base = normalize_column_name(base)
        candidate = new_base + ext.lower()
        idx = 1
        while candidate in seen:
            candidate = f"{new_base}_{idx}{ext.lower()}"
            idx += 1
        seen.add(candidate)
        if candidate != os.path.basename(path):
            renames[path] = candidate

    return duplicates, renames, checksums


def hash_files_dataset(paths: List[str]):
    """Distributed md5 of file contents (the expensive part at scale)."""
    import hashlib

    import pyarrow as pa

    import ray.data

    ds = ray.data.read_binary_files(paths, include_paths=True)

    def hash_batch(batch: pa.Table) -> pa.Table:
        hashes = [
            hashlib.md5(b).hexdigest() for b in batch.column("bytes").to_pylist()
        ]
        return pa.table(
            {
                "path": batch.column("path"),
                "content_md5": pa.array(hashes, type=pa.string()),
            }
        )

    return ds.map_batches(hash_batch, batch_format="pyarrow")
