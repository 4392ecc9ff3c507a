"""Differential oracles for the OTHER reference tools (round-5 follow-up
to the merge differential): tablestats, filenorm, table2csv and
tablevalidate are pure Python and import with the same unidecode/spacy
shims — drive the reference's own functions and ours over identical
inputs and compare outputs. (table2html is excluded: the reference file
uses a backslash inside an f-string expression, a Python ≥3.12 feature —
SyntaxError on this 3.11 interpreter.)
"""

from __future__ import annotations

import hashlib
import json
import sys
import types
from pathlib import Path

import pandas as pd
import pyarrow as pa
import pytest

REF_SRC = Path("/root/reference/src")

pytestmark = pytest.mark.skipif(
    not REF_SRC.exists(), reason="reference checkout unavailable"
)


@pytest.fixture(scope="module")
def ref():
    from paper2table_ray.functions.text import ascii_fold

    if "unidecode" not in sys.modules:
        uni = types.ModuleType("unidecode")
        uni.unidecode = ascii_fold
        sys.modules["unidecode"] = uni
    if "spacy" not in sys.modules:
        spacy = types.ModuleType("spacy")
        lang_mod = types.ModuleType("spacy.language")

        class Language:
            pass

        lang_mod.Language = Language
        spacy.language = lang_mod
        spacy.load = lambda *a, **k: None
        sys.modules["spacy"] = spacy
        sys.modules["spacy.language"] = lang_mod

    sys.path.insert(0, str(REF_SRC))
    try:
        import filenorm.__main__ as fn_main
        import table2csv.__main__ as csv_main
        import tablestats.__main__ as ts_main
        import tablevalidate.schema as tv_schema
    finally:
        sys.path.remove(str(REF_SRC))
    return types.SimpleNamespace(
        filenorm=fn_main, table2csv=csv_main, tablestats=ts_main, schema=tv_schema
    )


N_DOCS = 20


@pytest.fixture(scope="module")
def dirs(tmp_path_factory, ray_session):
    """(raw run dir with plain-string cells, merged dir with agreement
    metadata) — the shared inputs for every tool differential."""
    from paper2table_ray.pipelines.tablemerge import run_tablemerge
    from paper2table_ray.schema import table_to_doc_tablesfiles
    from paper2table_ray.sources.resultsets import synth_resultsets_batch
    from paper2table_ray.sources.tablesfile_json import tablesfile_to_json_obj
    from paper2table_ray.state.settings import MergeSettings

    root = tmp_path_factory.mktemp("tool_diff")
    ids = pa.table({"doc_id": pa.array(range(N_DOCS), type=pa.int64())})
    cells = synth_resultsets_batch(ids, seed=99)
    run_dirs = []
    for d in ("run-aaaa", "run-bbbb", "run-cccc"):
        (root / d).mkdir()
        run_dirs.append(str(root / d))
    for doc_id, by_source in table_to_doc_tablesfiles(cells):
        for uuid, tf in by_source.items():
            (root / uuid / f"{doc_id}.tables.json").write_text(
                json.dumps(tablesfile_to_json_obj(tf), ensure_ascii=False),
                encoding="utf-8",
            )
    out = root / "merged_out"
    run_tablemerge(run_dirs, str(out), settings=MergeSettings(), resultset_uuid="m")
    return run_dirs[0], str(out / "m")


def test_tablestats_differential(ref, dirs, ray_session):
    """Reference compute_papers_stats vs our one-pass stats pipeline over
    the SAME merged resultset (agreement levels, shared row groups and
    shared values all populated)."""
    _raw, merged = dirs
    theirs = ref.tablestats.compute_papers_stats(merged).to_dict()

    from paper2table_ray.sources.tablesfile_json import read_resultsets
    from paper2table_ray.stages.stats import global_stats, paper_stats_dataset

    per_paper = paper_stats_dataset(read_resultsets([merged])).materialize()
    ours = global_stats(per_paper)

    for key in (
        "papers",
        "tables",
        "fragments",
        "rows",
        "unique_rows",
        "rows_with_agreement",
        "rows_in_shared_groups",
        "rows_with_shared_values",
    ):
        assert ours[key] == theirs[key], key
    for key in ("global_agreement_percentage", "global_shared_values_percentage"):
        if theirs[key] is None:
            assert ours[key] is None, key
        else:
            assert ours[key] == pytest.approx(theirs[key]), key

    ref_papers = {}
    for entry in theirs["papers_stats"]:
        ((name, st),) = entry.items()
        ref_papers[name.removesuffix(".tables.json")] = st
    our_rows = {r["doc_id"]: r for r in per_paper.to_pandas().to_dict("records")}
    assert sorted(our_rows) == sorted(ref_papers)
    for doc, st in ref_papers.items():
        mine = our_rows[doc]
        for key, val in st.items():
            if val is None:
                assert pd.isna(mine[key]) or mine[key] is None, (doc, key)
            elif isinstance(val, float):
                assert mine[key] == pytest.approx(val), (doc, key)
            else:
                assert mine[key] == val, (doc, key)


def test_unique_columns_differential(ref, dirs, ray_session):
    _raw, merged = dirs
    theirs = ref.tablestats.collect_unique_columns(merged)

    from paper2table_ray.sources.tablesfile_json import read_resultsets
    from paper2table_ray.stages.stats import fold_column_probes, paper_stats_dataset

    per_paper = paper_stats_dataset(
        read_resultsets([merged]), with_column_probe=True
    ).materialize()
    ours = fold_column_probes(per_paper)
    assert ours == theirs


def test_filenorm_differential(ref, tmp_path):
    """Reference plan_actions (md5sums real files) vs our (path, md5)
    fold — identical duplicates/renames/keepers, including the tie-break
    chain and the collision-suffix numbering."""
    d = tmp_path / "files"
    d.mkdir()
    contents = {
        "Ángel Report (1).TXT": b"alpha",
        "angel_report_1.txt": b"alpha",  # dup of the above, normalized name
        "Second FILE.TXT": b"beta",
        "second_file.txt": b"gamma",  # same normalized name, new content
        "weird   name!!.PDF": b"delta",
        "weird_name.pdf": b"delta",  # dup, already normalized
        "plain.txt": b"epsilon",
        "PLAIN.TXT": b"epsilon",  # dup differing only by case
    }
    files = []
    for name, blob in contents.items():
        p = d / name
        p.write_bytes(blob)
        files.append(str(p))
    files.sort()

    ref_dup, ref_ren, ref_keep = ref.filenorm.plan_actions(files)

    from paper2table_ray.stages.filenorm import plan_actions

    md5s = [(f, hashlib.md5(open(f, "rb").read()).hexdigest()) for f in files]
    our_dup, our_ren, our_keep = plan_actions(md5s)

    assert our_keep == ref_keep
    assert {k: sorted(v) for k, v in our_dup.items()} == {
        k: sorted(v) for k, v in ref_dup.items()
    }
    assert our_ren == ref_ren


def test_table2csv_differential(ref, dirs, tmp_path, ray_session):
    """Reference build_dataframes+to_csv vs our distributed write_csvs
    over the same RAW resultset (plain-string cells — the reference
    renders ValueWithAgreement lists as python reprs, a shape our
    exporter deliberately replaces with ' / '-joined values)."""
    raw, _merged = dirs
    papers = {
        p.name: ref.schema.TablesFile.model_validate(
            json.loads(p.read_text(encoding="utf-8"))
        )
        for p in Path(raw).glob("*.tables.json")
    }
    ref_out = tmp_path / "ref_csv"
    ref_out.mkdir()
    for basename, frames in ref.table2csv.build_dataframes(papers).items():
        for idx, frame in enumerate(frames):
            ref.table2csv.save_csv(
                frame,
                ref_out / f"{basename.replace('.tables.json', '')}_{idx}.csv",
            )

    from paper2table_ray.pipelines.export import write_csvs
    from paper2table_ray.sources.tablesfile_json import read_resultsets

    our_out = tmp_path / "our_csv"
    write_csvs(read_resultsets([raw]), str(our_out))

    ref_files = sorted(p.name for p in ref_out.glob("*.csv"))
    our_files = sorted(p.name for p in our_out.glob("*.csv"))
    assert our_files == ref_files
    for name in ref_files:
        theirs = pd.read_csv(ref_out / name, dtype=str).fillna("")
        mine = pd.read_csv(our_out / name, dtype=str).fillna("")
        assert list(mine.columns) == list(theirs.columns), name
        assert mine.equals(theirs), f"CSV content differs: {name}"


VALIDATION_CASES = [
    ("valid_with_rows", {"tables": [{"rows": [{"a": "x"}], "page": 1}], "citation": None}, True),
    ("valid_fragments", {"tables": [{"table_fragments": [{"rows": [], "page": 2}]}], "citation": "c"}, True),
    ("valid_vwa", {"tables": [{"rows": [{"a": [{"value": "x", "agreement_level": 2}]}], "page": 1}], "citation": None}, True),
    ("valid_meta", {"tables": [], "citation": None, "metadata": {"filename": "f", "curations": [{"curator": "me"}]}}, True),
    ("missing_page", {"tables": [{"rows": [{"a": "x"}]}], "citation": None}, False),
    ("missing_citation", {"tables": []}, False),
    ("bad_vwa_entry", {"tables": [{"rows": [{"a": [{"value": "x"}]}], "page": 1}], "citation": None}, False),
    ("bad_agreement_type", {"tables": [{"rows": [{"a": "x", "agreement_level_": "high"}], "page": 1}], "citation": None}, False),
    ("curation_extra_field", {"tables": [], "citation": None, "metadata": {"filename": "f", "curations": [{"curator": "me", "oops": 1}]}}, False),
    ("citation_vwa", {"tables": [], "citation": [{"value": "c", "agreement_level": 1}]}, True),
    # pydantic-lax coercions and strict fields, calibrated against the
    # reference schema on this interpreter
    ("agreement_bool", {"tables": [{"rows": [{"a": "x", "agreement_level_": True}], "page": 1}], "citation": None}, True),
    ("agreement_digit_str", {"tables": [{"rows": [{"a": "x", "agreement_level_": "2"}], "page": 1}], "citation": None}, True),
    ("row_meta_digit_str", {"tables": [{"rows": [{"a": "x", "row_": "1"}], "page": 1}], "citation": None}, True),
    ("sources_not_list", {"tables": [{"rows": [{"a": "x", "sources_": "run"}], "page": 1}], "citation": None}, False),
    ("sources_int_items", {"tables": [{"rows": [{"a": "x", "sources_": [1]}], "page": 1}], "citation": None}, False),
    ("metadata_missing_filename", {"tables": [], "citation": None, "metadata": {}}, False),
    ("metadata_filename_null", {"tables": [], "citation": None, "metadata": {"filename": None}}, True),
    ("curation_desc_int", {"tables": [], "citation": None, "metadata": {"filename": "f", "curations": [{"curator": "c", "description": 5}]}}, False),
    ("page_digit_str", {"tables": [{"rows": [], "page": "1"}], "citation": None}, True),
    ("page_float", {"tables": [{"rows": [], "page": 1.0}], "citation": None}, True),
    ("uuid_int", {"tables": [], "citation": None, "uuid": 5}, False),
    ("cell_int_passes", {"tables": [{"rows": [{"a": 5}], "page": 1}], "citation": None}, True),
    ("cell_str_list_passes", {"tables": [{"rows": [{"a": ["x", "y"]}], "page": 1}], "citation": None}, True),
    ("vwa_agreement_digit_str", {"tables": [{"rows": [{"a": [{"value": "x", "agreement_level": "2"}]}], "page": 1}], "citation": None}, True),
]


@pytest.mark.parametrize("name,obj,_expect", VALIDATION_CASES, ids=[c[0] for c in VALIDATION_CASES])
def test_tablevalidate_differential(ref, name, obj, _expect):
    """Our validator accepts exactly what the reference pydantic schema
    accepts, case by case."""
    from paper2table_ray.sources.tablesfile_json import validate_tablesfile_obj

    try:
        ref.schema.TablesFile.model_validate(obj)
        ref_ok = True
    except Exception:
        ref_ok = False
    our_ok = not validate_tablesfile_obj(obj)
    assert our_ok == ref_ok, f"{name}: ours={our_ok} ref={ref_ok}"
    assert ref_ok == _expect, f"{name}: reference verdict changed"
