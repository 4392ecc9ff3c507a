"""Differential merge oracle against the REFERENCE'S OWN CODE.

The reference's tablemerge is pure Python (/root/reference/src/tablemerge/)
and imports on this interpreter once two environment-blocked deps are
shimmed: ``unidecode`` (→ our ascii_fold — identical on the ASCII corpus
used here) and ``spacy`` (annotation-only at import time; the semantic
analyzers are never constructed in these surfaces).

Protocol: export the synthetic resultsets (sources/resultsets.py) as real
``*.tables.json`` resultset directories, run the reference's
``merge_resultsets`` lifecycle (__main__.py:177-241,244-310) AND our
``run_tablemerge`` over the same directories, and assert dict-equality of
every merged ``<doc>.tables.json`` (parsed through the same shape
normalizer). Library-level surfaces additionally drive the reference
``TablesFileMerger`` directly for ``column_agreement=True`` (which the
reference CLI never enables — tests/test_merge.py:635,670,690,801 only).

This witnesses the whole Phase-1/2/3 lifecycle against the real
implementation rather than a transcription of it (round-4 verdict item 2).
"""

from __future__ import annotations

import json
import sys
import types
from pathlib import Path

import pyarrow as pa
import pytest

REF_SRC = Path("/root/reference/src")

pytestmark = pytest.mark.skipif(
    not REF_SRC.exists(), reason="reference checkout unavailable"
)


@pytest.fixture(scope="module")
def ref():
    """Import the reference tablemerge with unidecode/spacy shims."""
    from paper2table_ray.functions.text import ascii_fold

    if "unidecode" not in sys.modules:
        uni = types.ModuleType("unidecode")
        uni.unidecode = ascii_fold
        sys.modules["unidecode"] = uni
    if "spacy" not in sys.modules:
        spacy = types.ModuleType("spacy")
        lang_mod = types.ModuleType("spacy.language")

        class Language:  # annotation target only
            pass

        lang_mod.Language = Language
        spacy.language = lang_mod

        def _no_load(*a, **k):
            raise RuntimeError("spacy unavailable in sandbox")

        spacy.load = _no_load
        sys.modules["spacy"] = spacy
        sys.modules["spacy.language"] = lang_mod

    sys.path.insert(0, str(REF_SRC))
    try:
        import tablemerge.__main__ as tm_main
        import tablemerge.agreement as tm_agreement
        import tablemerge.analyzers as tm_analyzers
        import tablemerge.fragment_transformer as tm_ft
        import tablemerge.postprocessor as tm_post
        import tablemerge.tablesfile_loader as tm_loader
        import tablemerge.tablesfile_merger as tm_merger
    finally:
        sys.path.remove(str(REF_SRC))
    return types.SimpleNamespace(
        main=tm_main,
        agreement=tm_agreement,
        analyzers=tm_analyzers,
        ft=tm_ft,
        post=tm_post,
        loader=tm_loader,
        merger=tm_merger,
    )


RUN_DIRS = ("run-aaaa", "run-bbbb", "run-cccc")  # sorted == given order
READERS = {"run-aaaa": "pdfplumber", "run-bbbb": "pymupdf", "run-cccc": "agent"}
N_DOCS = 40


@pytest.fixture(scope="module")
def resultset_dirs(tmp_path_factory):
    """Synthetic 3-run resultsets exported as real *.tables.json dirs."""
    from paper2table_ray.schema import table_to_doc_tablesfiles
    from paper2table_ray.sources.resultsets import synth_resultsets_batch
    from paper2table_ray.sources.tablesfile_json import tablesfile_to_json_obj

    root = tmp_path_factory.mktemp("diff_resultsets")
    ids = pa.table({"doc_id": pa.array(range(N_DOCS), type=pa.int64())})
    cells = synth_resultsets_batch(ids, seed=1234)
    dirs = []
    for d in RUN_DIRS:
        p = root / d
        p.mkdir()
        (p / "tables.metadata.json").write_text(
            json.dumps({"uuid": d, "reader": READERS[d]}), encoding="utf-8"
        )
        dirs.append(str(p))
    header_row = {
        "family": "Family",
        "scientific_name": "Scientific  Name",
        "status": "Status",
    }
    for idx, (doc_id, by_source) in enumerate(table_to_doc_tablesfiles(cells)):
        for uuid, tf in by_source.items():
            obj = tablesfile_to_json_obj(tf)
            if idx % 5 == 0 and uuid == "run-bbbb":
                # inject a header row (values normalize to the column
                # names) so the remove-header-rows surfaces actually
                # exercise is_header_row and its placement in the
                # lifecycle (the synth generator never emits one)
                first = obj["tables"][0]
                frag = first if "rows" in first else first["table_fragments"][0]
                frag["rows"].insert(0, dict(header_row))
            (root / uuid / f"{doc_id}.tables.json").write_text(
                json.dumps(obj, ensure_ascii=False), encoding="utf-8"
            )
    return dirs


def _canon(obj: dict) -> dict:
    """Both outputs → shape-normalized comparable tree (tables+citation;
    TableWithRows vs TableWithFragments unified, model_dump None-field
    noise dropped)."""
    from paper2table_ray.sources.tablesfile_json import parse_tablesfile

    tree = parse_tablesfile(obj)
    return {"tables": tree["tables"], "citation": tree["citation"]}


def _read_merged(path: Path) -> dict:
    return _canon(json.loads(path.read_text(encoding="utf-8")))


def _run_reference(ref, dirs, out_dir, **kwargs):
    ref.main.merge_resultsets(dirs, str(out_dir), workers=1, **kwargs)
    return {
        p.name.removesuffix(".tables.json"): _read_merged(p)
        for p in Path(out_dir).glob("*.tables.json")
    }


def _run_ours(dirs, out_dir, settings):
    from paper2table_ray.pipelines.tablemerge import run_tablemerge

    run_tablemerge(dirs, str(out_dir), settings=settings, resultset_uuid="m")
    return {
        p.name.removesuffix(".tables.json"): _read_merged(p)
        for p in (Path(out_dir) / "m").glob("*.tables.json")
    }


def _assert_same(ours: dict, theirs: dict):
    assert sorted(ours) == sorted(theirs), (
        f"doc sets differ: ours-only={sorted(set(ours) - set(theirs))}, "
        f"ref-only={sorted(set(theirs) - set(ours))}"
    )
    for doc in sorted(theirs):
        assert ours[doc] == theirs[doc], f"merged output differs for {doc}"


# --- full-lifecycle surfaces (reference merge_resultsets vs run_tablemerge) --


def _settings(**kw):
    from paper2table_ray.state.settings import MergeSettings

    return MergeSettings(**kw)


def test_lifecycle_default(ref, resultset_dirs, tmp_path):
    """Reference CLI defaults: simple-count agreement (column_agreement
    off), title filter, always-on empty-row filter, drop empties."""
    theirs = _run_reference(
        ref,
        resultset_dirs,
        tmp_path / "ref",
        pretransformers=[ref.ft.FilterTitleRowsTransformer(), ref.ft.FilterEmptyRowsTransformer()],
        postprocessors=ref.post.build_postprocessors(schema=None, filter_columns=False, order_columns=False, coerce_types=False),
    )
    ours = _run_ours(resultset_dirs, tmp_path / "ours", _settings())
    _assert_same(ours, theirs)


def test_lifecycle_jaccard(ref, resultset_dirs, tmp_path):
    """--jaccard-column-alignment: run-cccc's numeric column names align
    back to the semantic ones by value similarity."""
    _load, merge_an = ref.main.build_analyzers(
        use_jaccard=True,
        threshold=0.5,
        use_column_name_semantic=False,
        use_column_value_semantic=False,
        language="en",
        aliases={},
    )
    theirs = _run_reference(
        ref,
        resultset_dirs,
        tmp_path / "ref",
        pretransformers=[ref.ft.FilterTitleRowsTransformer(), ref.ft.FilterEmptyRowsTransformer()],
        merge_analyzers=merge_an,
        postprocessors=ref.post.build_postprocessors(schema=None, filter_columns=False, order_columns=False, coerce_types=False),
    )
    ours = _run_ours(
        resultset_dirs,
        tmp_path / "ours",
        _settings(jaccard_column_alignment=True),
    )
    _assert_same(ours, theirs)


def test_lifecycle_hints_aliases_headers(ref, resultset_dirs, tmp_path):
    """--column-names-hints (safe) + --column-aliases + --remove-header-rows
    (reference: per-source load-time posttransformer)."""
    hints = ["family", "status"]
    aliases = {"0": "family"}
    load_an, merge_an = ref.main.build_analyzers(
        use_jaccard=False,
        threshold=0.5,
        use_column_name_semantic=False,
        use_column_value_semantic=False,
        language="en",
        aliases=aliases,
        hints=hints,
        hints_mode="safe",
    )
    theirs = _run_reference(
        ref,
        resultset_dirs,
        tmp_path / "ref",
        remove_header_rows=True,
        hints=hints,
        pretransformers=[ref.ft.FilterTitleRowsTransformer(), ref.ft.FilterEmptyRowsTransformer()],
        load_analyzers=load_an,
        merge_analyzers=merge_an,
        postprocessors=ref.post.build_postprocessors(schema=None, filter_columns=False, order_columns=False, coerce_types=False),
    )
    ours = _run_ours(
        resultset_dirs,
        tmp_path / "ours",
        _settings(
            column_names_hints="family status",
            hints_column_alignment="safe",
            column_aliases="0:family",
            remove_header_rows=True,
        ),
    )
    _assert_same(ours, theirs)


def test_lifecycle_pretransformers(ref, resultset_dirs, tmp_path):
    """--strip-leading-row-numbers + --normalize-punctuation."""
    theirs = _run_reference(
        ref,
        resultset_dirs,
        tmp_path / "ref",
        pretransformers=[
            ref.ft.FilterTitleRowsTransformer(),
            ref.ft.LeadingRowNumberTransformer(),
            ref.ft.NormalizePunctuationTransformer(),
            ref.ft.FilterEmptyRowsTransformer(),
        ],
        postprocessors=ref.post.build_postprocessors(schema=None, filter_columns=False, order_columns=False, coerce_types=False),
    )
    ours = _run_ours(
        resultset_dirs,
        tmp_path / "ours",
        _settings(strip_leading_row_numbers=True, normalize_punctuation=True),
    )
    _assert_same(ours, theirs)


@pytest.mark.parametrize("transform", ["safe-compact", "unsafe-compact", "explode"])
def test_lifecycle_tablesfile_transformer(ref, resultset_dirs, tmp_path, transform):
    """--transform-tablesfile: the compactors/exploder run between the
    pretransformers (incl. the always-appended empty-row filter) and the
    load-time column alignment (tablesfile_loader.py:40-43)."""
    theirs = _run_reference(
        ref,
        resultset_dirs,
        tmp_path / "ref",
        pretransformers=[ref.ft.FilterTitleRowsTransformer(), ref.ft.FilterEmptyRowsTransformer()],
        tablesfile_transformer=ref.main.TRANSFORMER_MAP[transform],
        postprocessors=ref.post.build_postprocessors(schema=None, filter_columns=False, order_columns=False, coerce_types=False),
    )
    ours = _run_ours(
        resultset_dirs,
        tmp_path / "ours",
        _settings(transform_tablesfile=transform),
    )
    _assert_same(ours, theirs)


def test_lifecycle_schema_postprocessors(ref, resultset_dirs, tmp_path):
    """Typed schema postprocessing: filter+order+coerce columns."""
    sys.path.insert(0, str(REF_SRC))
    try:
        from utils.column_schema import ColumnSchema as RefSchema
    finally:
        sys.path.remove(str(REF_SRC))
    schema_str = "family:str scientific_name:scientific_name status:str"
    ref_schema = RefSchema.parse(schema_str)
    theirs = _run_reference(
        ref,
        resultset_dirs,
        tmp_path / "ref",
        pretransformers=[ref.ft.FilterTitleRowsTransformer(), ref.ft.FilterEmptyRowsTransformer()],
        postprocessors=ref.post.build_postprocessors(
            schema=ref_schema,
            filter_columns=True,
            order_columns=True,
            coerce_types=False,
        ),
    )
    ours = _run_ours(
        resultset_dirs,
        tmp_path / "ours",
        _settings(
            schema=schema_str,
            filter_schema_columns=True,
            order_schema_columns=True,
        ),
    )
    _assert_same(ours, theirs)


def test_lifecycle_paper_aliases(ref, resultset_dirs, tmp_path):
    """--paper-aliases: alias stems merge into the canonical doc with a
    per-source page offset (reference group_tablesfiles,
    __main__.py:149-162). run-bbbb's copies of docs 0-4 are renamed to
    ``<doc>_v1`` with offset 1 on disk, then aliased back."""
    import shutil

    sys.path.insert(0, str(REF_SRC))
    try:
        from tablemerge.aliases import PaperAlias, parse_paper_aliases
    finally:
        sys.path.remove(str(REF_SRC))

    # clone the resultsets, renaming a few run-bbbb docs to alias stems
    # and shifting their pages by -1 so the +1 alias offset re-aligns
    root = tmp_path / "aliased"
    dirs = []
    alias_parts = []
    for d in resultset_dirs:
        dst = root / Path(d).name
        shutil.copytree(d, dst)
        dirs.append(str(dst))
    for i in range(5):
        doc = f"doc_{i:06d}"
        src = root / "run-bbbb" / f"{doc}.tables.json"
        if not src.exists():
            continue
        obj = json.loads(src.read_text(encoding="utf-8"))
        for table in obj["tables"]:
            frags = [table] if "rows" in table else table["table_fragments"]
            for frag in frags:
                frag["page"] = frag["page"] - 1
        (root / "run-bbbb" / f"{doc}_v1.tables.json").write_text(
            json.dumps(obj, ensure_ascii=False), encoding="utf-8"
        )
        src.unlink()
        alias_parts.append(f"{doc}_v1:{doc}:1")

    alias_str = " ".join(alias_parts)
    theirs = _run_reference(
        ref,
        dirs,
        tmp_path / "ref",
        pretransformers=[ref.ft.FilterTitleRowsTransformer(), ref.ft.FilterEmptyRowsTransformer()],
        paper_aliases=parse_paper_aliases(alias_str),
        postprocessors=ref.post.build_postprocessors(schema=None, filter_columns=False, order_columns=False, coerce_types=False),
    )
    ours = _run_ours(
        dirs,
        tmp_path / "ours",
        _settings(paper_aliases=alias_str),
    )
    _assert_same(ours, theirs)


def test_lifecycle_distinct_readers(ref, resultset_dirs, tmp_path):
    """--agreement-method distinct-readers (uuid→reader from metadata)."""
    theirs = _run_reference(
        ref,
        resultset_dirs,
        tmp_path / "ref",
        agreement_method="distinct-readers",
        pretransformers=[ref.ft.FilterTitleRowsTransformer(), ref.ft.FilterEmptyRowsTransformer()],
        postprocessors=ref.post.build_postprocessors(schema=None, filter_columns=False, order_columns=False, coerce_types=False),
    )
    ours = _run_ours(
        resultset_dirs,
        tmp_path / "ours",
        _settings(agreement_method="distinct-readers"),
    )
    _assert_same(ours, theirs)


# --- library-level surfaces (column_agreement=True, CLI-unreachable) --------


def _ref_merge_doc(ref, dirs, doc_id, column_agreement, agreement=None):
    loader = ref.loader.TablesFileLoader(
        pretransformers=[
            ref.ft.FilterTitleRowsTransformer(),
            ref.ft.FilterEmptyRowsTransformer(),
        ]
    )
    tfs, offsets = [], []
    for d in dirs:
        p = Path(d) / f"{doc_id}.tables.json"
        if not p.exists():
            continue
        tf = loader.load(p)
        tf.uuid = Path(d).name
        tfs.append(tf)
        offsets.append(0)
    merged = ref.merger.TablesFileMerger(
        agreement=agreement or ref.agreement.SimpleCountAgreement(),
        column_agreement=column_agreement,
    ).merge(tfs, page_offsets=offsets)
    for post in ref.post.build_postprocessors(schema=None, filter_columns=False, order_columns=False, coerce_types=False):
        merged = post.postprocess(merged)
    return _canon(merged.model_dump())


def _our_merge_doc(dirs, doc_id, config):
    from paper2table_ray.pipelines.merge import merge_doc_sources
    from paper2table_ray.sources.tablesfile_json import parse_tablesfile

    by_source = {}
    for d in dirs:
        p = Path(d) / f"{doc_id}.tables.json"
        if not p.exists():
            continue
        tf = parse_tablesfile(json.loads(p.read_text(encoding="utf-8")))
        by_source[Path(d).name] = tf
    merged = merge_doc_sources(doc_id, by_source, config)
    assert merged is not None
    from paper2table_ray.sources.tablesfile_json import tablesfile_to_json_obj

    return _canon(tablesfile_to_json_obj(merged))


def test_library_column_agreement(ref, resultset_dirs):
    """column_agreement=True vote merge — the reference enables this only
    via the library API (tests/test_merge.py:635)."""
    from paper2table_ray.pipelines.merge import MergeConfig

    cfg = MergeConfig(column_agreement=True, jaccard_alignment=False)
    for i in range(N_DOCS):
        doc = f"doc_{i:06d}"
        assert _our_merge_doc(resultset_dirs, doc, cfg) == _ref_merge_doc(
            ref, resultset_dirs, doc, column_agreement=True
        ), f"vote-merge output differs for {doc}"


def test_library_distinct_readers_column_agreement(ref, resultset_dirs):
    from paper2table_ray.pipelines.merge import MergeConfig

    uuid_to_reader = dict(READERS)
    cfg = MergeConfig(
        column_agreement=True,
        jaccard_alignment=False,
        distinct_readers=True,
        uuid_to_reader=uuid_to_reader,
    )
    agr = ref.agreement.DistinctReadersAgreement(uuid_to_reader)
    for i in range(0, N_DOCS, 2):
        doc = f"doc_{i:06d}"
        assert _our_merge_doc(resultset_dirs, doc, cfg) == _ref_merge_doc(
            ref, resultset_dirs, doc, column_agreement=True, agreement=agr
        ), f"distinct-readers vote-merge output differs for {doc}"
