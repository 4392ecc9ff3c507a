"""Merge-settings persistence (SURVEY.md §2.9 "Settings persistence").

Parity with the reference's ``MergeSettings`` dataclass ↔
``settings.tablemerge.json`` round-trip (/root/reference/src/tablemerge/
settings.py:12-84): same field set and defaults, ``from_dict`` ignores
unknown keys, files are UTF-8 JSON with indent=2.
"""

from __future__ import annotations

import dataclasses
import json
import os
from dataclasses import dataclass, field, fields
from typing import Optional

SETTINGS_BASENAME = "settings.tablemerge.json"


@dataclass
class MergeSettings:
    paths: list = field(default_factory=list)
    agreement_method: str = "simple-count"
    coerce_schema_column_types: bool = False
    column_aliases: Optional[str] = None
    column_alignment_threshold: float = 0.5
    column_name_semantic_alignment: bool = False
    column_names_hints: Optional[str] = None
    column_value_semantic_alignment: bool = False
    drop_empty_columns: bool = True
    drop_empty_tables: bool = True
    filter_schema_columns: bool = False
    filter_title_rows: bool = True
    fix_reversed_column_values: bool = False
    # "safe" | "unsafe" | None (the reference's hints analyzer mode)
    hints_column_alignment: Optional[str] = None
    jaccard_column_alignment: bool = False
    normalize_punctuation: bool = False
    only_semantic_columns: bool = False
    order_schema_columns: bool = False
    paper_aliases: Optional[str] = None
    pretty: bool = False
    remove_header_rows: bool = False
    schema: Optional[str] = None
    semantic_language: str = "en"
    split_conjunction_columns: bool = False
    strip_leading_row_numbers: bool = False
    transform_tablesfile: Optional[str] = None

    @classmethod
    def from_dict(cls, data: dict) -> "MergeSettings":
        known = {f.name for f in fields(cls)}
        return cls(**{k: v for k, v in data.items() if k in known})

    @classmethod
    def from_args(cls, args) -> "MergeSettings":
        """argparse Namespace → settings (reference settings.py from_args):
        known fields copied, extras ignored; the ``*_path`` variants of
        schema / aliases / hints read the file's text into the inline
        field."""

        def read_path(path_attr: str, inline_attr: str):
            inline = getattr(args, inline_attr, None)
            if inline is not None:
                return inline
            path = getattr(args, path_attr, None)
            if path:
                with open(path, encoding="utf-8") as f:
                    return f.read().strip()
            return None

        known = {f.name for f in fields(cls)}
        data = {
            k: v for k, v in vars(args).items() if k in known and k != "paths"
        }
        data["schema"] = read_path("schema_path", "schema")
        data["column_aliases"] = read_path("column_aliases_path", "column_aliases")
        data["paper_aliases"] = read_path("paper_aliases_path", "paper_aliases")
        data["column_names_hints"] = read_path(
            "column_names_hints_path", "column_names_hints"
        )
        data["paths"] = list(getattr(args, "paths", []) or [])
        return cls(**data)

    def to_dict(self) -> dict:
        return dataclasses.asdict(self)

    def write_file(self, output_dir: str) -> str:
        path = os.path.join(output_dir, SETTINGS_BASENAME)
        with open(path, "w", encoding="utf8") as f:
            f.write(json.dumps(self.to_dict(), ensure_ascii=False, indent=2))
        return path

    @classmethod
    def read_file(cls, output_dir: str) -> "MergeSettings":
        path = os.path.join(output_dir, SETTINGS_BASENAME)
        with open(path, encoding="utf8") as f:
            return cls.from_dict(json.loads(f.read()))
