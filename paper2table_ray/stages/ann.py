"""Similarity search over embedding columns.

- ``topk_cosine``: brute-force cosine top-k — vectorized numpy matmul per
  batch against a broadcast query vector (``ray.put`` once, read per task),
  per-batch partial top-k, tiny global sort+limit. The exact baseline.
- ``SignLSHIndexer`` / ``lsh_bucketed_topk``: the scale path — random
  hyperplane (sign) LSH buckets (Charikar '02): vectors land in 2^n_bits
  buckets; a query probes its own bucket plus Hamming-≤1 neighbors and only
  scores those. Approximate; recall grows with probes.
- ``embedding_cosine_dedup_pairs``: embedding near-duplicate pairs via the
  same bucket groupby + in-bucket pairwise cosine.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data


def _batch_matrix(batch: pa.Table, col: str = "embedding") -> np.ndarray:
    arr = batch.column(col)
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    # zero-copy path for fixed-length float lists
    flat = arr.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    n = len(arr)
    return flat.reshape(n, -1)


def _normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


def topk_cosine(
    embeddings: ray.data.Dataset,
    query: Sequence[float],
    k: int = 10,
    id_col: str = "vec_id",
) -> ray.data.Dataset:
    """Exact cosine top-k: per-batch score+prune to k, then global
    sort+limit over the tiny partials (no full materialization)."""
    q = np.asarray(list(query), dtype=np.float64)
    q = q / (np.linalg.norm(q) or 1.0)
    q_ref = ray.put(q)

    def score(batch: pa.Table) -> pa.Table:
        qv = ray.get(q_ref)
        m = _normalize(_batch_matrix(batch))
        scores = m @ qv
        keep = min(k, len(scores))
        idx = np.argpartition(-scores, keep - 1)[:keep] if len(scores) > keep else np.arange(len(scores))
        ids = batch.column(id_col).take(pa.array(idx, type=pa.int64()))
        return pa.table(
            {
                id_col: ids,
                "score": pa.array(scores[idx], type=pa.float64()),
            }
        )

    partials = embeddings.map_batches(score, batch_format="pyarrow", batch_size=4096)
    return partials.sort("score", descending=True).limit(k)


class SignLSHIndexer:
    """Adds ``bucket`` = sign-LSH code (int64) per embedding. Hyperplanes
    are seeded → deterministic; built once per actor."""

    def __init__(self, dim: int, n_bits: int = 8, seed: int = 7):
        rng = np.random.RandomState(seed)
        self.planes = rng.standard_normal((dim, n_bits))
        self.n_bits = n_bits

    def code(self, m: np.ndarray) -> np.ndarray:
        bits = (m @ self.planes) > 0
        weights = (1 << np.arange(self.n_bits, dtype=np.int64))
        return bits @ weights

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _batch_matrix(batch)
        return batch.append_column(
            "bucket", pa.array(self.code(m), type=pa.int64())
        )


def lsh_bucketed_topk(
    embeddings: ray.data.Dataset,
    query: Sequence[float],
    k: int = 10,
    n_bits: int = 8,
    seed: int = 7,
    id_col: str = "vec_id",
) -> ray.data.Dataset:
    """Approximate top-k: score only vectors whose LSH bucket is within
    Hamming distance 1 of the query's bucket (1 + n_bits probes)."""
    q = np.asarray(list(query), dtype=np.float64)
    dim = q.shape[0]
    indexer = SignLSHIndexer(dim, n_bits=n_bits, seed=seed)
    q_code = int(indexer.code(q.reshape(1, -1))[0])
    probes = {q_code} | {q_code ^ (1 << b) for b in range(n_bits)}

    coded = embeddings.map_batches(
        SignLSHIndexer,
        fn_constructor_kwargs={"dim": dim, "n_bits": n_bits, "seed": seed},
        batch_format="pyarrow",
        batch_size=4096,
        concurrency=(1, 4),
    )
    probe_arr = pa.array(sorted(probes), type=pa.int64())

    def filter_probes(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return batch.filter(pc.is_in(batch.column("bucket"), value_set=probe_arr))

    candidates = coded.map_batches(filter_probes, batch_format="pyarrow")
    return topk_cosine(candidates, query, k=k, id_col=id_col)


def embedding_cosine_dedup_pairs(
    embeddings: ray.data.Dataset,
    threshold: float = 0.95,
    n_bits: int = 10,
    seed: int = 7,
    id_col: str = "vec_id",
    dim: Optional[int] = None,
) -> ray.data.Dataset:
    """Embedding near-duplicate pairs: sign-LSH bucket groupby → in-bucket
    pairwise cosine ≥ threshold. Buckets are ~n/2^bits vectors, so the
    quadratic step stays tiny; recall is per-bucket (raise bits↓/probes↑
    for stricter recall needs)."""
    if dim is None:
        first = embeddings.take(1)[0]
        dim = len(first["embedding"])

    coded = embeddings.map_batches(
        SignLSHIndexer,
        fn_constructor_kwargs={"dim": dim, "n_bits": n_bits, "seed": seed},
        batch_format="pyarrow",
        batch_size=4096,
        concurrency=(1, 4),
    )

    def bucket_pairs(group: pd.DataFrame) -> pd.DataFrame:
        if len(group) < 2:
            return pd.DataFrame(columns=["id_a", "id_b", "cosine"])
        m = _normalize(np.stack(group["embedding"].to_numpy()))
        ids = group[id_col].to_numpy()
        order = np.argsort(ids)
        m, ids = m[order], ids[order]
        sims = m @ m.T
        ia, ib = np.triu_indices(len(ids), k=1)
        keep = sims[ia, ib] >= threshold
        return pd.DataFrame(
            {
                "id_a": ids[ia[keep]],
                "id_b": ids[ib[keep]],
                "cosine": sims[ia[keep], ib[keep]],
            }
        )

    from .shuffle import groupby_apply

    # coarse-shard the bucket groupby (O(shards) scheduling, not O(buckets))
    return groupby_apply(coded, "bucket", bucket_pairs, batch_format="pandas")


# --- IVF (inverted-file) ANN ------------------------------------------------


def train_ivf_centroids(
    embeddings: ray.data.Dataset,
    n_centroids: int = 16,
    sample: int = 4096,
    iters: int = 10,
    seed: int = 7,
) -> np.ndarray:
    """Deterministic k-means-lite on a driver-side sample (Lloyd
    iterations, seeded init). The centroid table is tiny — it broadcasts;
    training cost is bounded by ``sample``, not corpus size."""
    df = embeddings.limit(sample).to_pandas()
    m = _normalize(np.stack(df["embedding"].to_numpy()).astype(np.float64))
    rng = np.random.RandomState(seed)
    cent = m[rng.choice(len(m), size=min(n_centroids, len(m)), replace=False)]
    for _ in range(iters):
        assign = np.argmax(m @ cent.T, axis=1)
        for c in range(len(cent)):
            members = m[assign == c]
            if len(members):
                v = members.mean(axis=0)
                n = np.linalg.norm(v)
                if n:
                    cent[c] = v / n
    return cent


class IVFAssigner:
    """Adds ``centroid_id`` per embedding (nearest centroid by cosine).
    Centroids arrive via a Ray ObjectRef — resolved once per actor."""

    def __init__(self, centroids):
        if not isinstance(centroids, np.ndarray):
            centroids = ray.get(centroids)
        self.centroids = centroids

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _normalize(_batch_matrix(batch))
        assign = np.argmax(m @ self.centroids.T, axis=1)
        return batch.append_column(
            "centroid_id", pa.array(assign.astype(np.int32))
        )


def ivf_topk(
    embeddings: ray.data.Dataset,
    query: Sequence[float],
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 4,
    seed: int = 7,
    id_col: str = "vec_id",
) -> ray.data.Dataset:
    """IVF ANN: train centroids on a sample, assign vectors (broadcast
    centroids), score only the ``nprobe`` lists nearest the query —
    the classic inverted-file scale path (recall grows with nprobe)."""
    cent = train_ivf_centroids(
        embeddings, n_centroids=n_centroids, seed=seed
    )
    q = np.asarray(list(query), dtype=np.float64)
    qn = q / (np.linalg.norm(q) or 1.0)
    probes = np.argsort(-(cent @ qn))[:nprobe]
    probe_arr = pa.array(sorted(int(p) for p in probes), type=pa.int32())
    cent_ref = ray.put(cent)

    coded = embeddings.map_batches(
        IVFAssigner,
        fn_constructor_kwargs={"centroids": cent_ref},
        batch_format="pyarrow",
        batch_size=4096,
        concurrency=(1, 4),
    )

    def filter_probes(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return batch.filter(
            pc.is_in(batch.column("centroid_id"), value_set=probe_arr)
        )

    candidates = coded.map_batches(filter_probes, batch_format="pyarrow")
    return topk_cosine(candidates, query, k=k, id_col=id_col)
