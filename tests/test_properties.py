"""Property-based invariants (hypothesis) for the core data paths:

- cells Arrow encoding round-trips the exact ColumnValue union;
- tables.json serialize/parse round-trips the internal tree;
- normalizers are idempotent and ASCII fast paths agree with the
  full unicode path;
- merge agreement conservation: merging R identical runs yields
  agreement_level == R on every merged row;
- shingle/simhash determinism.
"""

import string

import numpy as np
from hypothesis import given, settings, strategies as st

from paper2table_ray import rowmodel as rm
from paper2table_ray.functions.text import (
    normalize_column_name,
    normalize_column_value,
    normalize_punctuation,
    normalize_str,
)
from paper2table_ray.schema import (
    rows_to_table,
    table_to_row_records,
    tablesfile_to_records,
)
from paper2table_ray.sources.tablesfile_json import (
    parse_tablesfile,
    tablesfile_to_json_obj,
)
from paper2table_ray.stages import dedup as dd

# --- strategies -------------------------------------------------------------

col_name = st.text(
    alphabet=string.ascii_lowercase + "_", min_size=1, max_size=8
).filter(lambda s: s.strip("_"))

cell_value = st.one_of(
    st.none(),
    st.text(max_size=20),
    st.lists(
        st.fixed_dictionaries(
            {
                "value": st.text(max_size=10),
                "agreement_level": st.integers(1, 5),
            }
        ),
        max_size=3,
    ),
)

row_strategy = st.builds(
    lambda cells, agr, row_idx: rm.make_row(cells, agreement_level=agr, row_idx=row_idx),
    st.dictionaries(col_name, cell_value, min_size=1, max_size=4),
    st.one_of(st.none(), st.integers(1, 9)),
    st.one_of(st.none(), st.integers(0, 9)),
)

fragment_strategy = st.fixed_dictionaries(
    {"page": st.integers(1, 9), "rows": st.lists(row_strategy, min_size=1, max_size=4)}
)

tablesfile_strategy = st.fixed_dictionaries(
    {
        "tables": st.lists(
            st.fixed_dictionaries(
                {"fragments": st.lists(fragment_strategy, min_size=1, max_size=3)}
            ),
            min_size=1,
            max_size=3,
        ),
        "citation": st.one_of(st.none(), st.text(max_size=20)),
    }
)


# --- round-trips ------------------------------------------------------------


@settings(max_examples=60, deadline=None)
@given(tablesfile_strategy)
def test_cells_arrow_roundtrip(tf):
    records = tablesfile_to_records("doc1", "src1", tf)
    back = table_to_row_records(rows_to_table(records))
    assert len(back) == len(records)
    for a, b in zip(records, back):
        assert a["cells"] == b["cells"]
        assert a["agreement_level"] == b["agreement_level"]
        assert a["row_idx"] == b["row_idx"]
        assert a["page"] == b["page"]


@settings(max_examples=60, deadline=None)
@given(tablesfile_strategy)
def test_json_roundtrip(tf):
    tf = {**tf, "metadata": None, "uuid": None}
    back = parse_tablesfile(tablesfile_to_json_obj(tf))
    assert back["tables"] == tf["tables"]
    assert back["citation"] == tf["citation"]


# --- normalizer properties --------------------------------------------------


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=40))
def test_normalize_str_idempotent(s):
    once = normalize_str(s)
    assert normalize_str(once) == once


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=40))
def test_normalize_column_value_idempotent(s):
    once = normalize_column_value(s)
    assert normalize_column_value(once) == once


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet=st.characters(min_codepoint=0x20, max_codepoint=0x7E), max_size=40))
def test_ascii_fast_path_matches_full_path(s):
    # the full (non-fast) pipeline result for printable-ASCII input
    import re
    import unicodedata

    full = unicodedata.normalize("NFC", s)
    full = re.sub(r"[\x00-\x08\x0b\x0c\x0e-\x1f\x7f-\x9f�]", "", full)
    full = re.sub(r"\(cid:(\d+)\)", lambda m: chr(int(m.group(1))) if 160 <= int(m.group(1)) <= 255 else "", full)
    full = re.sub(r"[‐‑‒–—―−]", "-", full)
    full = re.sub(r"\s+", " ", full.strip())
    assert normalize_str(s) == full


@settings(max_examples=100, deadline=None)
@given(st.text(max_size=30))
def test_normalize_column_name_canonical(s):
    out = normalize_column_name(s)
    assert out == normalize_column_name(out)  # idempotent
    assert "__" not in out and not out.startswith("_") and not out.endswith("_")
    assert all(c in string.ascii_lowercase + string.digits + "_" for c in out)


@settings(max_examples=100, deadline=None)
@given(st.text(max_size=40))
def test_normalize_punctuation_stable(s):
    once = normalize_punctuation(s)
    assert normalize_punctuation(once) == once


# --- merge conservation -----------------------------------------------------


@settings(max_examples=30, deadline=None)
@given(tablesfile_strategy, st.integers(2, 4))
def test_identical_runs_agreement_equals_run_count(tf, runs):
    from paper2table_ray.stages.merge import TablesFileMerger

    copies = []
    for i in range(runs):
        copies.append(
            {
                "tables": [
                    {
                        "fragments": [
                            {
                                "page": f["page"],
                                "rows": [
                                    # default agreement (None→1): summed by
                                    # SimpleCountAgreement to exactly `runs`
                                    rm.make_row(
                                        dict(r["cells"]), row_idx=r["row_idx"]
                                    )
                                    for r in f["rows"]
                                ],
                            }
                            for f in t["fragments"]
                        ]
                    }
                    for t in tf["tables"]
                ],
                "citation": tf["citation"],
                "uuid": f"u{i}",
            }
        )
    merged = TablesFileMerger().merge(copies)
    for t in merged["tables"]:
        for f in t["fragments"]:
            for row in f["rows"]:
                # identical rows must stack, not passthrough
                assert row["agreement_level"] == runs


# --- hashing determinism ----------------------------------------------------


@settings(max_examples=60, deadline=None)
@given(st.text(max_size=60))
def test_shingles_and_simhash_deterministic(s):
    a = dd._shingle_hashes(s, 3)
    b = dd._shingle_hashes(s, 3)
    assert np.array_equal(a, b)
    assert dd.simhash64(s) == dd.simhash64(s)
    assert (np.sort(a) == a).all()  # sorted unique contract


@settings(max_examples=100, deadline=None)
@given(st.lists(st.integers(0, 2**64 - 1), min_size=1, max_size=50))
def test_popcount64_matches_python(xs):
    arr = np.array(xs, dtype=np.uint64)
    got = dd.popcount64(arr.copy())
    exp = np.array([int(x).bit_count() for x in xs], dtype=np.int64)
    assert np.array_equal(got, exp)


# --- round-2 kernel properties ------------------------------------------------


class TestGroupKernelProperties:
    """apply_fn_per_group must deliver EXACTLY one full group per key —
    equivalent to a pandas groupby-apply — for arbitrary key layouts."""

    @given(
        keys=st.lists(st.integers(min_value=0, max_value=9), min_size=1, max_size=60),
        seed=st.integers(min_value=0, max_value=2**31 - 1),
    )
    @settings(max_examples=40, deadline=None)
    def test_matches_pandas_groupby(self, keys, seed):
        import pandas as pd
        import pyarrow as pa

        from paper2table_ray.stages.shuffle import apply_fn_per_group

        rng = np.random.default_rng(seed)
        vals = rng.integers(0, 100, size=len(keys))
        tbl = pa.table({"k": pa.array(keys, pa.int64()), "v": pa.array(vals)})

        def summarize(g: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame(
                [{"k": int(g["k"].iloc[0]), "n": len(g), "s": int(g["v"].sum())}]
            )

        got = (
            apply_fn_per_group(tbl, ["k"], summarize, batch_format="pandas")
            .sort_values("k")
            .reset_index(drop=True)
        )
        expect = (
            tbl.to_pandas()
            .groupby("k", as_index=False)
            .agg(n=("v", "size"), s=("v", "sum"))
            .astype({"k": int, "n": int, "s": int})
            .sort_values("k")
            .reset_index(drop=True)
        )
        assert got.astype(int).equals(expect)


class TestMappingNormalizationProperties:
    """normalize_tables_mapping: compact form always apply-to-all with
    stringified ordinals; reference form preserves table order."""

    @given(
        n_cols=st.integers(min_value=0, max_value=6),
        header_mode=st.sampled_from(["all_pages", "first_page_only", "none"]),
    )
    @settings(max_examples=30, deadline=None)
    def test_compact_form(self, n_cols, header_mode):
        from paper2table_ray.stages.llmclient import normalize_tables_mapping

        compact = {
            "header_mode": header_mode,
            "column_mappings": {i: f"c{i}" for i in range(n_cols)},
        }
        out = normalize_tables_mapping(compact)
        assert out["apply_to_all"] is True
        assert len(out["tables"]) == 1
        t = out["tables"][0]
        assert t["header_mode"] == header_mode
        assert t["column_mappings"] == {str(i): f"c{i}" for i in range(n_cols)}

    @given(n_tables=st.integers(min_value=0, max_value=4))
    @settings(max_examples=20, deadline=None)
    def test_reference_form(self, n_tables):
        from paper2table_ray.stages.llmclient import normalize_tables_mapping

        ref = {
            "tables": [
                {
                    "title": f"t{i}",
                    "header_mode": "all_pages",
                    "first_page": 1,
                    "last_page": 2,
                    "column_mappings": [
                        {"from_column_number": 0, "to_column_name": f"name{i}"}
                    ],
                }
                for i in range(n_tables)
            ],
            "citation": "x",
            "metadata": None,
        }
        out = normalize_tables_mapping(ref)
        assert out["apply_to_all"] is False
        assert [t["column_mappings"] for t in out["tables"]] == [
            {"0": f"name{i}"} for i in range(n_tables)
        ]


class TestFoldProperties:
    @given(st.text(max_size=40))
    @settings(max_examples=80, deadline=None)
    def test_ascii_fold_idempotent_and_ascii_stable(self, s):
        from paper2table_ray.functions.text import ascii_fold

        once = ascii_fold(s)
        assert ascii_fold(once) == once
        if s.isascii():
            assert once == s

    @given(
        st.lists(
            st.sampled_from(["Αθήνα", "Москва", "北京", "café", "plain", "żółć"]),
            min_size=2,
            max_size=2,
            unique=True,
        )
    )
    @settings(max_examples=20, deadline=None)
    def test_distinct_scripts_never_collapse(self, pair):
        from paper2table_ray.functions.text import ascii_fold

        a, b = pair
        assert ascii_fold(a) != ascii_fold(b)


# --- whole-shard merge kernel ≡ per-doc reduce -------------------------------


corpus_strategy = st.dictionaries(
    st.sampled_from(["doc_a", "doc_b", "doc_c"]),
    st.dictionaries(
        st.sampled_from(["run-aaaa", "run-bbbb"]),
        tablesfile_strategy,
        min_size=1,
        max_size=2,
    ),
    min_size=1,
    max_size=3,
)


@settings(max_examples=40, deadline=None)
@given(corpus_strategy)
def test_merge_cells_table_matches_per_doc_reduce(corpus):
    """pipelines/merge.merge_cells_table (one decode + one encode per
    shard) must equal the per-doc merge_doc_records reduce on arbitrary
    multi-doc multi-source cells — every ColumnValue shape included."""
    from paper2table_ray.pipelines.merge import (
        MergeConfig,
        merge_cells_table,
        merge_doc_records,
    )

    records = []
    for doc_id, runs in corpus.items():
        for uuid, tf in runs.items():
            records.extend(tablesfile_to_records(doc_id, uuid, tf))
    cfg = MergeConfig(column_agreement=True)

    expected = []
    by_doc = {}
    for rec in records:
        by_doc.setdefault(rec["doc_id"], []).append(rec)
    for doc_id in sorted(by_doc):
        expected.extend(merge_doc_records(by_doc[doc_id], cfg))

    got = table_to_row_records(merge_cells_table(rows_to_table(records), cfg))

    assert len(got) == len(expected)
    for a, b in zip(got, expected):
        assert a["doc_id"] == b["doc_id"]
        assert a["cells"] == b["cells"]
        assert a["agreement_level"] == b["agreement_level"]
        assert (a["sources"] or []) == (b["sources"] or [])
