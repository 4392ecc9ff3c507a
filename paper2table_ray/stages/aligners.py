"""Column alignment analyzers + aligner chains (schema reconciliation).

Behavioral parity with /root/reference/src/tablemerge/analyzers.py and
columns_aligner.py over the plain-dict row model. The spaCy-backed semantic
analyzers use the deterministic NgramVectorizer (stages/semantic.py) behind
the same scoring protocol.

These run doc-locally: load-time analyzers inside per-doc map_batches UDFs,
merge-time analyzers inside the ``groupby("doc_id").map_groups`` merge.
"""

from __future__ import annotations

import re
from typing import Dict, List, Optional, Set, Tuple

from .. import rowmodel as rm
from ..functions.text import (
    ColumnSchema,
    ascii_fold,
    is_semantic_column,
    normalize_column_name,
)
from .semantic import NgramVectorizer

Row = rm.Row
Fragment = rm.Fragment

REMOVE_COLUMN = "<remove>"

_WS_RE = re.compile(r"\s+")


def renamable_source_columns(
    columns: List[str], schema: Optional[ColumnSchema]
) -> List[str]:
    """analyzers.py:23-30: with schema → not-in-schema; else numeric only."""
    if schema:
        return [c for c in columns if c not in schema]
    return [c for c in columns if not is_semantic_column(c)]


def renamable_target_columns(
    columns: List[str], schema: Optional[ColumnSchema]
) -> List[str]:
    """analyzers.py:33-40."""
    if schema:
        return [c for c in columns if c in schema]
    return [c for c in columns if is_semantic_column(c)]


def _greedy_assignment(scores: List[Tuple[float, str, str]]) -> Dict[str, str]:
    """Resolve (score, source, target) into a 1-to-1 mapping, best first
    (analyzers.py:210-225)."""
    mapping: Dict[str, str] = {}
    used: Set[str] = set()
    for _, source, target in sorted(scores, key=lambda x: -x[0]):
        if source not in mapping and target not in used:
            mapping[source] = target
            used.add(target)
    return mapping


# --- load-time analyzers ----------------------------------------------------


class ColumnNamesNormalizerLoadTimeAnalyzer:
    """Always-on first analyzer: every column name → normalized form
    (analyzers.py:105-121)."""

    def build_mapping(self, column_names: List[str], rows: List[Row]) -> Dict[str, str]:
        return {
            col: normalize_column_name(col)
            for col in column_names
            if normalize_column_name(col) != col
        }


class HintsLoadTimeAnalyzer:
    """If the first non-empty row has ≥1 candidate value in the hints set,
    rename ALL candidate columns to normalized first-row values
    (analyzers.py:56-102). safe=True → non-semantic candidates only."""

    def __init__(self, hints: List[str], safe: bool = True):
        self.hints = hints
        self.safe = safe

    def build_mapping(self, column_names: List[str], rows: List[Row]) -> Dict[str, str]:
        if self.safe:
            candidates = [c for c in column_names if not is_semantic_column(c)]
        else:
            candidates = list(column_names)
        if not candidates:
            return {}
        first_row = next((r for r in rows if not rm.row_is_empty(r)), None)
        if first_row is None:
            return {}
        row_values: Dict[str, str] = {}
        for column in candidates:
            val = first_row["cells"].get(column)
            if val is None:
                continue
            strings = [s.strip() for s in rm.value_to_strings(val) if s.strip()]
            if strings:
                row_values[column] = normalize_column_name(strings[0])
        hints_set = set(self.hints)
        if not any(v in hints_set for v in row_values.values()):
            return {}
        return row_values


class AliasLoadTimeAnalyzer:
    """Explicit rename dict (normalized-key match); target ``<remove>``
    drops the column (analyzers.py:124-150)."""

    def __init__(self, aliases: Dict[str, str]):
        self.aliases = aliases

    def build_mapping(self, column_names: List[str], rows: List[Row]) -> Dict[str, str]:
        all_columns = list(dict.fromkeys(column_names))
        normalized = {normalize_column_name(k): v for k, v in self.aliases.items()}
        return {
            col: normalized[normalize_column_name(col)]
            for col in all_columns
            if normalize_column_name(col) in normalized
        }


class ColumnNameSemanticLoadTimeAnalyzer:
    """Rename non-schema columns to schema names by embedding similarity of
    cell values vs schema column names (analyzers.py:153-258); own-name
    score guard for semantic candidates; greedy 1-to-1 assignment."""

    def __init__(
        self,
        threshold: float = 0.5,
        language: str = "en",
        schema: Optional[ColumnSchema] = None,
        vectorizer: Optional[NgramVectorizer] = None,
    ):
        self.threshold = threshold
        self.language = language
        self.schema = schema
        self.vec = vectorizer or NgramVectorizer()

    def build_mapping(self, column_names: List[str], rows: List[Row]) -> Dict[str, str]:
        if not self.schema:
            return {}
        candidates = renamable_source_columns(column_names, self.schema)
        if not candidates:
            return {}
        schema_columns = self.schema.column_names()
        scores: List[Tuple[float, str, str]] = []
        for candidate in candidates:
            values = _sample_values(rows, candidate)
            if not values:
                continue
            own_score = (
                self._semantic_score(values, candidate)
                if is_semantic_column(candidate)
                else None
            )
            for schema_column in schema_columns:
                score = self._semantic_score(values, schema_column)
                if score < self.threshold:
                    continue
                if own_score is not None and own_score >= score:
                    continue
                scores.append((score, candidate, schema_column))
        return _greedy_assignment(scores)

    def _semantic_score(self, values: List[str], column_name: str) -> float:
        name_text = column_name.replace("_", " ").replace("-", " ")
        if not self.vec.has_vector(name_text):
            return 0.0
        scores = [
            self.vec.similarity(name_text, v[:128])
            for v in values
            if self.vec.has_vector(v[:128])
        ]
        return sum(scores) / len(scores) if scores else 0.0


def _sample_values(rows: List[Row], column_name: str) -> List[str]:
    """First non-empty text per row for one column (analyzers.py:231-245)."""
    values = []
    for row in rows:
        cell = row["cells"].get(column_name)
        if cell is None:
            continue
        if isinstance(cell, str):
            text = cell.strip()
        else:
            text = cell[0]["value"].strip() if cell else ""
        if text:
            values.append(text)
    return values


# --- merge-time analyzers ---------------------------------------------------


class JaccardMergeTimeAnalyzer:
    """Rename numeric columns to semantic ones by Jaccard of cell-value sets
    across the two fragments (analyzers.py:276-355). Requires one
    all-numeric and one all-semantic side (or schema-driven source/target
    sets)."""

    def __init__(self, threshold: float = 0.5, schema: Optional[ColumnSchema] = None):
        self.threshold = threshold
        self.schema = schema

    def build_mapping(
        self,
        left_column_names: List[str],
        right_column_names: List[str],
        left_rows: List[Row],
        right_rows: List[Row],
    ) -> Dict[str, str]:
        left_sources = renamable_source_columns(left_column_names, self.schema)
        right_sources = renamable_source_columns(right_column_names, self.schema)
        left_targets = renamable_target_columns(left_column_names, self.schema)
        right_targets = renamable_target_columns(right_column_names, self.schema)

        if right_sources and left_targets and not left_sources:
            source_columns, source_rows = right_sources, right_rows
            target_columns, target_rows = left_targets, left_rows
        elif left_sources and right_targets and not right_sources:
            source_columns, source_rows = left_sources, left_rows
            target_columns, target_rows = right_targets, right_rows
        else:
            return {}

        source_sets = {c: self._value_set(source_rows, c) for c in source_columns}
        target_sets = {c: self._value_set(target_rows, c) for c in target_columns}

        scores = []
        for source in source_columns:
            for target in target_columns:
                j = self._jaccard(source_sets[source], target_sets[target])
                if j >= self.threshold:
                    scores.append((j, source, target))
        return _greedy_assignment(scores)

    @staticmethod
    def _extract_strs(value: rm.ColumnValue) -> List[str]:
        if value is None:
            return []
        if isinstance(value, str):
            return [ascii_fold(_WS_RE.sub(" ", value.strip()).lower())]
        return [ascii_fold(_WS_RE.sub(" ", v["value"].strip()).lower()) for v in value]

    # public name parity with the reference (analyzers.py:298)
    extract_column_str_values = _extract_strs

    def _value_set(self, rows: List[Row], column: str) -> Set[str]:
        result: Set[str] = set()
        for row in rows:
            val = row["cells"].get(column)
            if val is not None:
                result.update(self._extract_strs(val))
        return result

    @staticmethod
    def _jaccard(a: Set[str], b: Set[str]) -> float:
        union = len(a | b)
        return len(a & b) / union if union else 0.0


class ColumnValueSemanticMergeTimeAnalyzer:
    """Like the load-time semantic analyzer but targets are the opposing
    fragment's semantic column names (analyzers.py:358-458); runs after
    Jaccard."""

    def __init__(
        self,
        threshold: float = 0.5,
        language: str = "en",
        schema: Optional[ColumnSchema] = None,
        vectorizer: Optional[NgramVectorizer] = None,
    ):
        self.threshold = threshold
        self.language = language
        self.schema = schema
        self.vec = vectorizer or NgramVectorizer()

    def build_mapping(
        self,
        left_column_names: List[str],
        right_column_names: List[str],
        left_rows: List[Row],
        right_rows: List[Row],
    ) -> Dict[str, str]:
        left_sources = renamable_source_columns(left_column_names, self.schema)
        right_sources = renamable_source_columns(right_column_names, self.schema)
        left_targets = renamable_target_columns(left_column_names, self.schema)
        right_targets = renamable_target_columns(right_column_names, self.schema)

        if right_sources and left_targets and not left_sources:
            source_columns, source_rows = right_sources, right_rows
            target_columns = left_targets
        elif left_sources and right_targets and not right_sources:
            source_columns, source_rows = left_sources, left_rows
            target_columns = right_targets
        else:
            return {}

        scores = []
        for source in source_columns:
            values = _sample_values(source_rows, source)
            if not values:
                continue
            for target in target_columns:
                score = self._semantic_score(values, target)
                if score >= self.threshold:
                    scores.append((score, source, target))
        return _greedy_assignment(scores)

    def _semantic_score(self, values: List[str], column_name: str) -> float:
        name_text = column_name.replace("_", " ").replace("-", " ")
        if not self.vec.has_vector(name_text):
            return 0.0
        scores = [
            self.vec.similarity(name_text, v[:128])
            for v in values
            if self.vec.has_vector(v[:128])
        ]
        return sum(scores) / len(scores) if scores else 0.0


# --- aligner chains (columns_aligner.py) ------------------------------------


def append_column_value(
    existing: rm.ColumnValue, new_value: rm.ColumnValue
) -> rm.ColumnValue:
    """Rename-collision value concatenation (columns_aligner.py:5-20)."""
    if existing is None:
        return new_value
    if new_value is None:
        return existing
    if isinstance(existing, str) and isinstance(new_value, str):
        if not existing:
            return new_value
        if not new_value:
            return existing
        sep = " " if existing.endswith(".") else ". "
        return existing + sep + new_value
    if isinstance(existing, list) and isinstance(new_value, list):
        return existing + new_value
    return existing


class BaseColumnAligner:
    """columns_aligner.py:23-66: rename rows through an accumulated mapping
    with ``<remove>`` dropping and collision concatenation."""

    mapping: Dict[str, str]

    def __init__(self, max_sample: int = 50):
        self.max_sample = max_sample

    def rename_column(self, name: str) -> str:
        """columns_aligner.py reference API: mapped name or identity."""
        return self.mapping.get(name, name)

    def rename_row(self, row: Row) -> Row:
        if not self.mapping:
            return row
        renamed: Dict[str, rm.ColumnValue] = {}
        for column, value in row["cells"].items():
            new_name = self.mapping.get(column, column)
            if new_name == REMOVE_COLUMN:
                continue
            if new_name in renamed:
                if column == new_name:
                    renamed[new_name] = append_column_value(value, renamed[new_name])
                else:
                    renamed[new_name] = append_column_value(renamed[new_name], value)
            else:
                renamed[new_name] = value
        return rm.make_row(
            renamed, row["agreement_level"], row["sources"], row["row_idx"]
        )

    def sample_rows(self, fragment: Fragment) -> List[Row]:
        return fragment["rows"][: self.max_sample]

    @staticmethod
    def filter_remaining(remaining: List[str], mapped: Set[str]) -> List[str]:
        return [c for c in remaining if c not in mapped]

    @staticmethod
    def accumulate_mapping(
        accumulated: Dict[str, str], new_mapping: Dict[str, str]
    ) -> Set[str]:
        """Re-chain previously accumulated targets through the new mapping
        (columns_aligner.py:59-66)."""
        for k in accumulated:
            if accumulated[k] in new_mapping:
                accumulated[k] = new_mapping[accumulated[k]]
        accumulated.update(new_mapping)
        return set(new_mapping.keys())


class LoadTimeColumnAligner(BaseColumnAligner):
    """columns_aligner.py:69-95."""

    def __init__(
        self,
        fragment: Fragment,
        analyzers: list = [],
        max_sample: int = 50,
    ):
        super().__init__(max_sample)
        self.analyzers = analyzers
        self.mapping = self._build(fragment)

    def _build(self, fragment: Fragment) -> Dict[str, str]:
        rows = self.sample_rows(fragment)
        if not rows:
            return {}
        remaining = rm.fragment_column_names(fragment)
        accumulated: Dict[str, str] = {}
        for analyzer in self.analyzers:
            candidates = remaining + list(accumulated.values())
            if not candidates:
                break
            new_mapping = analyzer.build_mapping(candidates, rows)
            if not new_mapping:
                continue
            mapped = self.accumulate_mapping(accumulated, new_mapping)
            remaining = self.filter_remaining(remaining, mapped)
        return accumulated


class MergeTimeColumnAligner(BaseColumnAligner):
    """columns_aligner.py:98-131."""

    def __init__(
        self,
        left: Fragment,
        right: Optional[Fragment],
        analyzers: list = [],
        max_sample: int = 50,
    ):
        super().__init__(max_sample)
        self.analyzers = analyzers
        self.mapping = self._build(left, right)

    def _build(self, left: Fragment, right: Optional[Fragment]) -> Dict[str, str]:
        left_rows = self.sample_rows(left)
        right_rows = self.sample_rows(right) if right is not None else []
        if not left_rows:
            return {}
        remaining_left = rm.fragment_column_names(left)
        remaining_right = rm.fragment_column_names(right) if right is not None else []
        accumulated: Dict[str, str] = {}
        for analyzer in self.analyzers:
            if not remaining_left and not remaining_right:
                break
            new_mapping = analyzer.build_mapping(
                remaining_left, remaining_right, left_rows, right_rows
            )
            if not new_mapping:
                continue
            mapped = self.accumulate_mapping(accumulated, new_mapping)
            remaining_left = self.filter_remaining(remaining_left, mapped)
            remaining_right = self.filter_remaining(remaining_right, mapped)
        return accumulated


# --- alias config parsing (aliases.py) --------------------------------------


def parse_column_aliases(text: str) -> Dict[str, str]:
    """``"familia:family notes:<remove>"`` → dict (aliases.py:12-18)."""
    from ..functions.text import tokenize_schema

    aliases = {}
    for part in tokenize_schema(text):
        if ":" in part:
            alias, target = part.split(":", 1)
            aliases[alias] = target
    return aliases


def parse_paper_aliases(text: str) -> Dict[str, Tuple[str, int]]:
    """``"alias:canonical[:page_offset]"`` → {alias: (canonical, offset)}
    (aliases.py:21-37)."""
    from ..functions.text import tokenize_schema

    aliases: Dict[str, Tuple[str, int]] = {}
    for part in tokenize_schema(text):
        parts = part.split(":", 2)
        if len(parts) >= 2:
            alias, canonical = parts[0], parts[1]
            offset = 0
            if len(parts) == 3:
                try:
                    offset = int(parts[2])
                except ValueError:
                    raise ValueError(
                        f"Invalid page offset in alias '{part}': '{parts[2]}' is not an integer"
                    )
            aliases[alias] = (canonical, offset)
    return aliases
