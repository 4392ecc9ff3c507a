"""LLM-client seam (S5/ST4): protocol, 503 classification, rate pacing,
skip-on-unavailable + resume-retry through the real planning pipeline."""

import json

import pyarrow as pa
import pytest

import ray.data

from paper2table_ray.pipelines.extract import plan_mappings_ds
from paper2table_ray.schema import SPAN_STRUCT
from paper2table_ray.stages.llmclient import (
    DeterministicPlannerClient,
    ModelUnavailableError,
    RateLimitedClient,
    is_model_unavailable,
    unwrap_cause,
)

CELL_SEP = "\t"


def _docs(ids):
    rows = [
        [
            {
                "kind": "table_row",
                "text": CELL_SEP.join(["family", "count"]),
                "media_ref": "",
                "offset": 0,
            }
        ]
        for _ in ids
    ]
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(ids, pa.string()),
                "spans": pa.array(rows, pa.list_(SPAN_STRUCT)),
            }
        )
    )


class TestClassification:
    def test_status_code_503(self):
        class E(Exception):
            status_code = 503

        assert is_model_unavailable(E("x"))

    def test_text_503_unavailable(self):
        assert is_model_unavailable(Exception("503: model unavailable"))
        assert is_model_unavailable(Exception("Error 503 due to high demand"))

    def test_plain_500_not_unavailable(self):
        assert not is_model_unavailable(Exception("500 internal error"))
        assert not is_model_unavailable(Exception("503"))  # no reason text

    def test_unwrap_cause_walks_chain(self):
        root = Exception("503 unavailable")
        try:
            try:
                raise root
            except Exception as r:
                raise RuntimeError("wrapper") from r
        except RuntimeError as outer:
            assert unwrap_cause(outer) is root


class _Flaky:
    """Raises a 503-shaped error the first ``fail_n`` calls per doc."""

    def __init__(self, fail_n=1):
        self.fail_n = fail_n
        self.calls = {}
        self.inner = DeterministicPlannerClient()

    def plan(self, doc_id, spans):
        n = self.calls.get(doc_id, 0)
        self.calls[doc_id] = n + 1
        if n < self.fail_n:
            raise Exception("503: model unavailable right now")
        return self.inner.plan(doc_id, spans)


class TestRateLimitedClient:
    def test_sleeps_before_every_call(self):
        slept = []
        c = RateLimitedClient(
            DeterministicPlannerClient(), model_sleep=0.5, sleep_fn=slept.append
        )
        spans = [
            {"kind": "table_row", "text": "a\tb", "media_ref": "", "offset": 0}
        ]
        c.plan("d1", spans)
        c.plan("d2", spans)
        assert slept == [0.5, 0.5]

    def test_retries_unavailable_with_backoff_then_succeeds(self):
        slept = []
        c = RateLimitedClient(
            _Flaky(fail_n=2),
            max_retries=3,
            backoff_base=1.0,
            sleep_fn=slept.append,
        )
        spans = [
            {"kind": "table_row", "text": "a\tb", "media_ref": "", "offset": 0}
        ]
        out = c.plan("d1", spans)
        assert out["column_mappings"] == {"0": "a", "1": "b"}
        assert slept == [1.0, 2.0]  # exponential backoff between attempts

    def test_exhausted_retries_raise_model_unavailable(self):
        c = RateLimitedClient(_Flaky(fail_n=99), max_retries=1, sleep_fn=lambda s: None)
        with pytest.raises(ModelUnavailableError):
            c.plan("d1", [])

    def test_non_503_errors_propagate_unwrapped(self):
        class Bad:
            def plan(self, doc_id, spans):
                raise ValueError("genuine bug")

        c = RateLimitedClient(Bad(), sleep_fn=lambda s: None)
        with pytest.raises(ValueError):
            c.plan("d1", [])


# ship this test module's functions BY VALUE into Ray workers (the
# module itself is not importable there)
import sys

from ray import cloudpickle as _rcp

_rcp.register_pickle_by_value(sys.modules[__name__])


def _down_factory():
    """Always-503 client (class defined function-locally so cloudpickle
    ships it by value into Ray workers)."""

    class AlwaysDown:
        def plan(self, doc_id, spans):
            raise Exception("503: model unavailable right now")

    return RateLimitedClient(AlwaysDown(), max_retries=0, sleep_fn=lambda s: None)


@pytest.mark.usefixtures("ray_session")
class TestSkipAndResume:
    def test_unavailable_docs_skipped_then_planned_on_resume(self, tmp_path):
        # run 1: the model is down for every doc → no mappings, no cache
        down = plan_mappings_ds(
            _docs(["a", "b"]),
            cache_dir=str(tmp_path),
            client_factory=_down_factory,
        ).to_pandas()
        assert len(down) == 0
        assert not list(tmp_path.glob("*.mapping.json"))

        # run 2 (resume with a healthy model): every doc planned + cached
        up = plan_mappings_ds(
            _docs(["a", "b"]),
            cache_dir=str(tmp_path),
            client_factory=DeterministicPlannerClient,
        ).to_pandas()
        assert sorted(up["doc_id"]) == ["a", "b"]
        assert len(list(tmp_path.glob("*.mapping.json"))) == 2

        # run 3: cache hits — a client that always 503s is never invoked
        cached = plan_mappings_ds(
            _docs(["a", "b"]),
            cache_dir=str(tmp_path),
            client_factory=_down_factory,
        ).to_pandas()
        assert sorted(cached["doc_id"]) == ["a", "b"]
        m = json.loads(
            cached.set_index("doc_id").loc["a", "mapping_json"]
        )
        assert m["column_mappings"] == {"0": "family", "1": "count"}
