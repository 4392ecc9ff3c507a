#!/usr/bin/env python
"""Benchmark harness (driver contract).

Default: run the headline pipelines over $GRAFT_SF_DIR (default
/root/testdata/sf0.1) under ray.init(address="local",
num_cpus=$RAY_GRAFT_CPUS or 32) and print ONE JSON line:

    {"metric": ..., "value": <headline sec>, "unit": "sec",
     "queries": {...per-query sec...}, "sf": ..., "num_cpus": N, ...}

--scaling: run the headline pipeline twice in FRESH processes at 8 and 32
CPUs on the same input (the sandbox substitute for the N vs 4N node
criterion) and report both throughputs + scaling efficiency.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

BENCH_QUERIES = [
    "lineitem_agg",
    "orders_by_nation",
    "filter_project",
    "events_hourly",
    "doc_features",
    "exact_dedup",
    "minhash_pairs",
    "simhash_pairs",
    "knn_cosine",
    "revenue_by_brand",
    "user_sessions",
    "merge_cells",
]


def _consume(result) -> int:
    """Force execution; return row count."""
    import pandas as pd

    if isinstance(result, pd.DataFrame):
        return len(result)
    return int(result.count())  # ray.data.Dataset


def run_bench() -> dict:
    import ray
    from ray.data import DataContext

    ray.init(
        address="local",
        num_cpus=NUM_CPUS,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False

    from paper2table_ray.pipelines.extract import extract_pipeline, synth_docs_dataset
    from paper2table_ray.pipelines.queries import QUERIES

    # warm OS page cache (untimed): one full read of the inputs we bench
    n_docs = synth_docs_dataset(SF_DIR).count()
    import ray.data as rd

    for t in ("lineitem", "orders", "customer", "nation", "events", "documents", "embeddings"):
        rd.read_parquet(f"{SF_DIR}/{t}.parquet").count()

    # headline: flagship extraction (synth → parse → spans), consumed fully
    t0 = time.perf_counter()
    n_spans = extract_pipeline(SF_DIR).count()
    headline = time.perf_counter() - t0

    timings = {}
    for name in BENCH_QUERIES:
        t0 = time.perf_counter()
        _consume(QUERIES[name](SF_DIR))
        timings[name] = round(time.perf_counter() - t0, 3)

    result = {
        "metric": "flagship extraction wall time (synth -> span parse -> spans) + operator suite",
        "value": round(headline, 3),
        "unit": "sec",
        "queries": timings,
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        "docs": n_docs,
        "spans": n_spans,
        "docs_per_sec": round(n_docs / headline, 2),
    }
    ray.shutdown()
    return result


def run_scaling() -> dict:
    def run(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env,
            capture_output=True,
            text=True,
            check=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    lo, hi = 8, 32
    r_lo = run(lo)
    r_hi = run(hi)
    tp_lo = r_lo["docs_per_sec"]
    tp_hi = r_hi["docs_per_sec"]
    eff = tp_hi / (tp_lo * (hi / lo))
    return {
        "metric": "scaling efficiency (docs/sec @32 cpus) / (4 x docs/sec @8 cpus)",
        "sec_8": r_lo["value"],
        "sec_32": r_hi["value"],
        "docs_per_sec_8": tp_lo,
        "docs_per_sec_32": tp_hi,
        "scaling_efficiency": round(eff, 3),
        "sf": SF_DIR,
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_bench()))
