"""Fragment / tablesfile transformers (doc-local, run inside map_batches).

Behavioral parity with /root/reference/src/tablemerge/fragment_transformer.py
and tablesfile_transformer.py, re-expressed over the plain-dict row model.
Each class transforms one fragment ``{"rows": [...], "page": int}`` or one
tablesfile tree ``{"tables": [...], ...}``; the Ray wiring (which chains them
over every fragment of every doc in a batch) lives in pipelines/.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Set, Tuple

from .. import rowmodel as rm
from ..functions.text import (
    LEADING_NUMBER_RE,
    TITLE_ROW_RE,
    ColumnSchema,
    coerce_str,
    is_semantic_column,
    normalize_column_name,
    normalize_punctuation,
)
from .semantic import NgramVectorizer

Fragment = rm.Fragment
Row = rm.Row


# --- header-row detection (reference merge.py:11-56) ------------------------


def value_matches_header(column_name: str, value: rm.ColumnValue) -> bool:
    if value is None:
        return False
    normalized_name = normalize_column_name(column_name)
    if isinstance(value, str):
        return normalize_column_name(value) == normalized_name
    non_empty = [v["value"] for v in value if v["value"].strip()]
    return bool(non_empty) and all(
        normalize_column_name(v) == normalized_name for v in non_empty
    )


def value_matches_hints(value: rm.ColumnValue, hints_set: Set[str]) -> bool:
    if value is None:
        return False
    if isinstance(value, str):
        return normalize_column_name(value.strip()) in hints_set
    return any(
        normalize_column_name(v["value"].strip()) in hints_set
        for v in value
        if v["value"].strip()
    )


def has_semantic_header_value(row: Row) -> bool:
    """merge.py:37-42."""
    return any(
        value_matches_header(col, val)
        for col, val in row["cells"].items()
        if not rm.is_empty_value(val) and is_semantic_column(col)
    )


def has_hints_header_value(row: Row, hints_set: Set[str]) -> bool:
    """merge.py:45-50."""
    return any(
        value_matches_hints(val, hints_set)
        for val in row["cells"].values()
        if not rm.is_empty_value(val)
    )


def is_header_row(row: Row, hints: List[str] = []) -> bool:
    """merge.py:53-56."""
    return has_semantic_header_value(row) or (
        bool(hints) and has_hints_header_value(row, set(hints))
    )


# --- fragment transformers --------------------------------------------------


class FilterTitleRowsTransformer:
    """Drop rows among the first 3 matching ``(figure|table|…) N`` titles,
    including titles split across several cells
    (fragment_transformer.py:38-64)."""

    def transform_fragment(self, fragment: Fragment) -> Fragment:
        rows = fragment["rows"]
        if not any(self.is_title_row(r) for r in rows[:3]):
            return fragment  # identity: no list/dict rebuild in the hot kernel
        head = [r for r in rows[:3] if not self.is_title_row(r)]
        return {"rows": head + rows[3:], "page": fragment["page"]}

    def is_title_row(self, row: Row) -> bool:
        # cheap gate: the concatenated title text starts with the FIRST
        # non-empty cell's text, and every title keyword (figure|fig.|
        # table|figura|tabla) starts with f/t — most rows exit here
        # without the full per-cell scan (this transformer is always-on
        # in the merge load path, the composed pipeline's hot kernel)
        first = None
        for val in row["cells"].values():
            if not rm.is_empty_value(val):
                first = val
                break
        if first is None:
            return False
        lead = rm.first_nonempty_text(first).lstrip()
        if not lead or lead[0] not in "fFtT":
            return False
        non_empty = {
            col: val
            for col, val in row["cells"].items()
            if not rm.is_empty_value(val)
        }
        if not non_empty:
            return False
        if len(non_empty) == 1:
            text = rm.first_nonempty_text(next(iter(non_empty.values())))
        else:
            text = "".join(rm.first_nonempty_text(v) for v in non_empty.values())
        return bool(TITLE_ROW_RE.match(text.strip()))


class LeadingRowNumberTransformer:
    """Strip ``"N. "`` prefixes per column when the first ≤5 non-empty
    samples all match and are strictly increasing
    (fragment_transformer.py:67-133)."""

    def transform_fragment(self, fragment: Fragment) -> Fragment:
        cols = rm.column_names(fragment["rows"])
        to_strip = {
            c for c in cols if self._should_strip(c, fragment["rows"])
        }
        if not to_strip:
            return fragment
        return {
            "rows": [self._strip_row(r, to_strip) for r in fragment["rows"]],
            "page": fragment["page"],
        }

    def _should_strip(self, column: str, rows: List[Row]) -> bool:
        samples: List[str] = []
        for row in rows:
            val = row["cells"].get(column)
            if val is None or rm.is_empty_value(val):
                continue
            text = rm.first_nonempty_text(val)
            if text:
                samples.append(text)
            if len(samples) == 5:
                break
        if len(samples) < 2:
            return False
        numbers: List[int] = []
        for text in samples:
            match = LEADING_NUMBER_RE.match(text)
            if not match:
                return False
            numbers.append(int(match.group(1)))
        return all(numbers[i] < numbers[i + 1] for i in range(len(numbers) - 1))

    def _strip_row(self, row: Row, to_strip: Set[str]) -> Row:
        cells = {
            col: self._strip_value(val) if col in to_strip else val
            for col, val in row["cells"].items()
        }
        return rm.make_row(cells, row["agreement_level"], row["sources"], row["row_idx"])

    def _strip_value(self, val: rm.ColumnValue) -> rm.ColumnValue:
        if isinstance(val, str):
            return LEADING_NUMBER_RE.sub("", val)
        if isinstance(val, list):
            return [
                rm.vwa(LEADING_NUMBER_RE.sub("", v["value"]), v["agreement_level"])
                for v in val
            ]
        return val


class FilterEmptyRowsTransformer:
    """fragment_transformer.py:136-142."""

    def transform_fragment(self, fragment: Fragment) -> Fragment:
        rows = fragment["rows"]
        kept = [r for r in rows if not rm.row_is_empty(r)]
        if len(kept) == len(rows):
            return fragment  # identity fast path (no empty rows — common)
        return {"rows": kept, "page": fragment["page"]}


class NormalizePunctuationTransformer:
    """fragment_transformer.py:145-182."""

    def transform_fragment(self, fragment: Fragment) -> Fragment:
        return {
            "rows": [self._row(r) for r in fragment["rows"]],
            "page": fragment["page"],
        }

    def _row(self, row: Row) -> Row:
        return rm.make_row(
            {c: self._value(v) for c, v in row["cells"].items()},
            row["agreement_level"],
            row["sources"],
            row["row_idx"],
        )

    def _value(self, val: rm.ColumnValue) -> rm.ColumnValue:
        if isinstance(val, str):
            return normalize_punctuation(val)
        if isinstance(val, list):
            return [
                rm.vwa(normalize_punctuation(v["value"]), v["agreement_level"])
                for v in val
            ]
        return val


class FilterHeaderRowsTransformer:
    """fragment_transformer.py:185-193."""

    def __init__(self, hints: List[str] = []):
        self.hints = hints

    def transform_fragment(self, fragment: Fragment) -> Fragment:
        return {
            "rows": [r for r in fragment["rows"] if not is_header_row(r, self.hints)],
            "page": fragment["page"],
        }


class SplitColumnTransformer:
    """Split ``a_and_b``-named columns into two; per-cell best split point
    chosen by embedding similarity of each half against the header halves
    (fragment_transformer.py:196-322; spaCy replaced by the deterministic
    NgramVectorizer — see stages/semantic.py)."""

    CONJUNCTIONS: Dict[str, Set[str]] = {
        "en": {"and", "or"},
        "es": {"y", "e", "o"},
    }

    def __init__(self, language: str = "en", vectorizer: Optional[NgramVectorizer] = None):
        self.language = language
        self.vec = vectorizer or NgramVectorizer()

    def find_conjunction_split(self, column_name: str) -> Optional[Tuple[str, str]]:
        tokens = column_name.split("_")
        conjunctions = self.CONJUNCTIONS.get(self.language, set())
        for i in range(len(tokens)):
            if tokens[i].lower() in conjunctions and 0 < i < len(tokens) - 1:
                return "_".join(tokens[:i]), "_".join(tokens[i + 1 :])
        return None

    @staticmethod
    def normalize_split_part(text: str) -> str:
        text = text.strip(" -")
        if text.startswith("(") and text.endswith(")"):
            text = text[1:-1].strip()
        return text

    def split_cell_value(
        self, value: str, left_header: str, right_header: str
    ) -> Tuple[str, str]:
        tokens = value.split()
        if len(tokens) <= 1:
            return value, ""
        # structural separators first: the reference's word vectors find
        # these splits semantically ("Buenos Aires - Argentina", "City
        # (Country)"); the deterministic substitute detects them
        # syntactically instead — a trailing parenthesized group or the
        # LAST " - " separator wins over the similarity scan.
        if value.rstrip().endswith(")"):
            depth, i = 0, len(value.rstrip()) - 1
            s = value.rstrip()
            for i in range(len(s) - 1, -1, -1):
                if s[i] == ")":
                    depth += 1
                elif s[i] == "(":
                    depth -= 1
                    if depth == 0:
                        break
            if depth == 0 and 0 < i:
                left_part = self.normalize_split_part(s[:i])
                if left_part:
                    return left_part, self.normalize_split_part(s[i:])
        if " - " in value:
            left_part, _, right_part = value.rpartition(" - ")
            return (
                self.normalize_split_part(left_part),
                self.normalize_split_part(right_part),
            )
        best_score, best_index = -1.0, 1
        for i in range(1, len(tokens)):
            score = self.vec.similarity(left_header, " ".join(tokens[:i])) + (
                self.vec.similarity(right_header, " ".join(tokens[i:]))
            )
            if score > best_score:
                best_score, best_index = score, i
        return (
            self.normalize_split_part(" ".join(tokens[:best_index])),
            self.normalize_split_part(" ".join(tokens[best_index:])),
        )

    def _split_value(self, value, left_header, right_header):
        if value is None:
            return None, None
        if isinstance(value, str):
            return self.split_cell_value(value, left_header, right_header)
        lefts, rights = [], []
        for entry in value:
            l, r = self.split_cell_value(entry["value"], left_header, right_header)
            lefts.append(rm.vwa(l, entry["agreement_level"]))
            rights.append(rm.vwa(r, entry["agreement_level"]))
        return lefts, rights

    def transform_fragment(self, fragment: Fragment) -> Fragment:
        splits: Dict[str, Tuple[str, str]] = {}
        for col in rm.column_names(fragment["rows"]):
            result = self.find_conjunction_split(col)
            if result is not None:
                splits[col] = result
        if not splits:
            return fragment
        headers = {
            col: (lh.replace("_", " "), rh.replace("_", " "))
            for col, (lh, rh) in splits.items()
        }
        rows = []
        for row in fragment["rows"]:
            cells: Dict[str, rm.ColumnValue] = {}
            for col, value in row["cells"].items():
                if col in splits:
                    lh_name, rh_name = splits[col]
                    lh, rh = headers[col]
                    lv, rv = self._split_value(value, lh, rh)
                    cells[lh_name] = lv
                    cells[rh_name] = rv
                else:
                    cells[col] = value
            rows.append(
                rm.make_row(cells, row["agreement_level"], row["sources"], row["row_idx"])
            )
        return {"rows": rows, "page": fragment["page"]}


class FragmentValuesReverser:
    """Detect mojibake-reversed fragments: reverse every cell and keep the
    reversed copy iff the known-word score improves
    (fragment_transformer.py:325-380; spaCy vocab replaced by the
    deterministic KNOWN_WORDS list)."""

    def __init__(self, language: str = "en", known_words=None):
        self.language = language
        # injectable vocabulary (the reference tests inject a FakeNlp
        # vocab the same way, test_fragment_transformer.py:16-45)
        self._known = known_words

    def _is_known(self, word: str) -> bool:
        if self._known is not None:
            return word in self._known
        return NgramVectorizer.is_known_word(word)

    def _count_known_words(self, text: str) -> int:
        return sum(
            1 for w in text.split() if len(text) > 2 and self._is_known(w)
        )

    def _row_score(self, row: Row) -> int:
        total = 0
        for value in row["cells"].values():
            if isinstance(value, str):
                total += self._count_known_words(value)
            elif isinstance(value, list):
                total += sum(self._count_known_words(v["value"]) for v in value)
        return total

    def _fragment_score(self, fragment: Fragment) -> int:
        return sum(self._row_score(r) for r in fragment["rows"])

    def _reverse_value(self, value: rm.ColumnValue) -> rm.ColumnValue:
        if isinstance(value, str):
            return value[::-1]
        if isinstance(value, list):
            return [rm.vwa(v["value"][::-1], v["agreement_level"]) for v in value]
        return value

    def transform_fragment(self, fragment: Fragment) -> Fragment:
        reversed_fragment = {
            "rows": [
                rm.make_row(
                    {c: self._reverse_value(v) for c, v in r["cells"].items()},
                    r["agreement_level"],
                    r["sources"],
                    r["row_idx"],
                )
                for r in fragment["rows"]
            ],
            "page": fragment["page"],
        }
        if self._fragment_score(reversed_fragment) > self._fragment_score(fragment):
            return reversed_fragment
        return fragment


# --- tablesfile transformers (tablesfile_transformer.py) --------------------


class FragmentsExploder:
    """Each fragment becomes its own single-fragment table
    (tablesfile_transformer.py:22-32)."""

    def transform(self, tablesfile: dict) -> dict:
        tables = [
            {"fragments": [frag]}
            for table in tablesfile["tables"]
            for frag in table["fragments"]
        ]
        return {**tablesfile, "tables": tables}


class ConsecutiveFragmentsCompactor:
    """Merge consecutive tables when their columns match
    (tablesfile_transformer.py:35-86)."""

    def non_semantic_columns_match(self, one: Fragment, other: Fragment) -> bool:
        raise NotImplementedError

    def semantic_fragments_are_close(self, one: Fragment, other: Fragment) -> bool:
        raise NotImplementedError

    @staticmethod
    def _all_semantic(fragment: Fragment) -> bool:
        return all(is_semantic_column(n) for n in rm.fragment_column_names(fragment))

    def columns_match(self, one: Fragment, other: Fragment) -> bool:
        if not rm.fragment_column_names(one) or not rm.fragment_column_names(other):
            return True
        if self._all_semantic(one) and self._all_semantic(other):
            return self.semantic_fragments_are_close(one, other) and (
                rm.fragment_column_names(one) == rm.fragment_column_names(other)
            )
        return self.non_semantic_columns_match(one, other)

    def transform(self, tablesfile: dict) -> dict:
        compacted: List[dict] = []
        for table in tablesfile["tables"]:
            fragments = table["fragments"]
            if (
                fragments
                and compacted
                and compacted[-1]["fragments"]
                and self.columns_match(compacted[-1]["fragments"][-1], fragments[0])
            ):
                compacted[-1] = {
                    "fragments": compacted[-1]["fragments"] + fragments
                }
            else:
                compacted.append({"fragments": list(fragments)})
        return {**tablesfile, "tables": compacted}


class SafeConsecutiveFragmentsCompactor(ConsecutiveFragmentsCompactor):
    """Identical semantic column names + page adjacency
    (tablesfile_transformer.py:89-98)."""

    def non_semantic_columns_match(self, one: Fragment, other: Fragment) -> bool:
        return False

    def semantic_fragments_are_close(self, one: Fragment, other: Fragment) -> bool:
        return one["page"] <= other["page"] <= one["page"] + 1


class UnsafeConsecutiveFragmentsCompactor(ConsecutiveFragmentsCompactor):
    """Equal column count suffices (tablesfile_transformer.py:101-110)."""

    def semantic_fragments_are_close(self, one: Fragment, other: Fragment) -> bool:
        return True

    def non_semantic_columns_match(self, one: Fragment, other: Fragment) -> bool:
        return len(rm.fragment_column_names(one)) == len(rm.fragment_column_names(other))


# --- postprocessors (merge.py:66-150, postprocessor.py) ---------------------


def filter_header_rows_tablesfile(tablesfile: dict, hints: List[str] = []) -> dict:
    tables = []
    for table in tablesfile["tables"]:
        fragments = [
            {
                "rows": [r for r in frag["rows"] if not is_header_row(r, hints)],
                "page": frag["page"],
            }
            for frag in table["fragments"]
        ]
        tables.append({"fragments": fragments})
    return {**tablesfile, "tables": tables}


def drop_empty_columns(tablesfile: dict, normalized: bool = False) -> dict:
    """``normalized``: rows are normalize_row outputs (e.g. the merged
    tablesfile) — emptiness is plain truthiness, no normalize chain.
    Equivalent even after schema coercion: coercion never turns a
    normalized value into a truthy-but-normalize-empty string."""
    is_empty = rm.is_empty_value_normalized if normalized else rm.is_empty_value
    tables = []
    for table in tablesfile["tables"]:
        fragments = []
        for frag in table["fragments"]:
            all_cols = rm.column_names(frag["rows"])
            empty_cols = {
                col
                for col in all_cols
                if all(is_empty(r["cells"].get(col)) for r in frag["rows"])
            }
            if not empty_cols:
                fragments.append(frag)  # identity: nothing to drop
                continue
            rows = [
                rm.make_row(
                    {k: v for k, v in r["cells"].items() if k not in empty_cols},
                    r["agreement_level"],
                    r["sources"],
                    r["row_idx"],
                )
                for r in frag["rows"]
            ]
            fragments.append({"rows": rows, "page": frag["page"]})
        tables.append({"fragments": fragments})
    return {**tablesfile, "tables": tables}


def drop_empty_tables(tablesfile: dict, normalized: bool = False) -> dict:
    if normalized:
        tables = []
        for table in tablesfile["tables"]:
            fragments = [
                f
                for f in table["fragments"]
                if not all(rm.row_is_empty_normalized(r) for r in f["rows"])
            ]
            if fragments:
                tables.append({"fragments": fragments})
        return {**tablesfile, "tables": tables}
    tables = []
    for table in tablesfile["tables"]:
        fragments = [f for f in table["fragments"] if not rm.fragment_is_empty(f)]
        if fragments:
            tables.append({"fragments": fragments})
    return {**tablesfile, "tables": tables}


def filter_semantic_columns(tablesfile: dict) -> dict:
    tables = []
    for table in tablesfile["tables"]:
        fragments = [
            {
                "rows": [
                    rm.make_row(
                        rm.semantic_columns(r),
                        r["agreement_level"],
                        r["sources"],
                        r["row_idx"],
                    )
                    for r in frag["rows"]
                ],
                "page": frag["page"],
            }
            for frag in table["fragments"]
        ]
        tables.append({"fragments": fragments})
    return {**tablesfile, "tables": tables}


class SchemaPostProcessor:
    """Filter/order/coerce against a user ColumnSchema
    (postprocessor.py:39-152)."""

    def __init__(
        self,
        schema: ColumnSchema,
        filter_columns: bool = False,
        order_columns: bool = False,
        coerce_types: bool = False,
    ):
        self.schema = schema
        self.filter_columns = filter_columns
        self.order_columns = order_columns
        self.coerce_types = coerce_types

    def postprocess(self, tablesfile: dict) -> dict:
        if self.filter_columns:
            tablesfile = self._filter(tablesfile)
        if self.order_columns:
            tablesfile = self._order(tablesfile)
        if self.coerce_types:
            tablesfile = self._coerce(tablesfile)
        return tablesfile

    def _table_columns(self, table: dict) -> Set[str]:
        return {
            col
            for frag in table["fragments"]
            for row in frag["rows"]
            for col in row["cells"]
        }

    def _filter(self, tablesfile: dict) -> dict:
        keys = set(self.schema.column_names())
        kept = [t for t in tablesfile["tables"] if keys & self._table_columns(t)]
        return {**tablesfile, "tables": kept}

    def _order(self, tablesfile: dict) -> dict:
        keys = self.schema.column_names()

        def reorder(row: Row) -> Row:
            cols = row["cells"]
            ordered = {k: cols[k] for k in keys if k in cols}
            ordered.update({k: v for k, v in cols.items() if k not in ordered})
            return rm.make_row(
                ordered, row["agreement_level"], row["sources"], row["row_idx"]
            )

        return self._map_rows(tablesfile, reorder)

    def _coerce(self, tablesfile: dict) -> dict:
        def coerce_value(value, target):
            if value is None:
                return None
            if isinstance(value, str):
                return coerce_str(value, target)
            return [
                rm.vwa(coerce_str(v["value"], target), v["agreement_level"])
                for v in value
            ]

        def coerce_row(row: Row) -> Row:
            cells = {
                col: (
                    coerce_value(val, self.schema.type_of(col))
                    if col in self.schema
                    else val
                )
                for col, val in row["cells"].items()
            }
            return rm.make_row(
                cells, row["agreement_level"], row["sources"], row["row_idx"]
            )

        return self._map_rows(tablesfile, coerce_row)

    @staticmethod
    def _map_rows(tablesfile: dict, fn) -> dict:
        tables = [
            {
                "fragments": [
                    {"rows": [fn(r) for r in frag["rows"]], "page": frag["page"]}
                    for frag in table["fragments"]
                ]
            }
            for table in tablesfile["tables"]
        ]
        return {**tablesfile, "tables": tables}


def build_postprocessors(
    schema: Optional[ColumnSchema] = None,
    filter_columns: bool = False,
    order_columns: bool = False,
    coerce_types: bool = False,
    only_semantic_columns: bool = False,
    with_drop_empty_columns: bool = True,
    with_drop_empty_tables: bool = True,
    normalized: bool = False,
) -> list:
    """postprocessor.py:155-175 (same defaults/order). ``normalized``:
    the input tablesfile's rows are normalize_row outputs (merge output),
    letting the empty-drops use truthiness instead of the normalize
    chain."""
    from functools import partial

    result: list = []
    if only_semantic_columns:
        result.append(("filter_semantic", filter_semantic_columns))
    if with_drop_empty_columns:
        result.append(
            ("drop_empty_columns", partial(drop_empty_columns, normalized=normalized))
        )
    if with_drop_empty_tables:
        result.append(
            ("drop_empty_tables", partial(drop_empty_tables, normalized=normalized))
        )
    if schema:
        sp = SchemaPostProcessor(schema, filter_columns, order_columns, coerce_types)
        result.append(("schema", sp.postprocess))
    return result


def apply_fragment_transformers(tablesfile: dict, transformers: list) -> dict:
    """Apply a chain of fragment transformers over every fragment
    (tablesfile_loader.py:45-67 equivalent)."""
    if not transformers:
        return tablesfile
    tables = []
    for table in tablesfile["tables"]:
        fragments = []
        for frag in table["fragments"]:
            for t in transformers:
                frag = t.transform_fragment(frag)
            fragments.append(frag)
        tables.append({"fragments": fragments})
    return {**tablesfile, "tables": tables}
