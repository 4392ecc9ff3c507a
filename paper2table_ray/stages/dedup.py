"""Deduplication operators (exact + near-dup families).

Engine-level operators for large-scale training-data curation, following
the published designs (MinHash: Broder '97; LSH banding: Mining of Massive
Datasets ch.3; SimHash: Charikar '02 / Manku et al. WWW'07):

- exact dedup: content-hash → hash-partitioned groupby → keep first
  (reference analogue: filenorm md5 dedup, SURVEY.md O6,
  /root/reference/src/filenorm/__main__.py:21-66)
- MinHash signatures + banded LSH candidate pairs (signature-estimated or
  exact-verified Jaccard)
- SimHash 64-bit + chunk-pigeonhole candidate generation, Hamming verify
- word n-gram Jaccard verification on hashed shingle sets

Scale shape: everything is ``map_batches`` (vectorized numpy hashing) until
the one intentional shuffle — ``groupby`` on the content hash / LSH bucket
key — whose groups are tiny (bucket collisions), so no skew salting is
needed. Signatures ride along as fixed-width list columns; raw text never
crosses the shuffle for near-dup (only hashed shingle sets do when exact
verification is requested).
"""

from __future__ import annotations

import hashlib
from typing import Optional

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from .textqc import TOKEN_RE, canonical_text

_MERSENNE_P = (1 << 61) - 1
_HASH_RANGE = 1 << 32


def _perm_params(num_perm: int, seed: int = 1) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.RandomState(seed)
    a = rng.randint(1, _MERSENNE_P, size=num_perm, dtype=np.uint64)
    b = rng.randint(0, _MERSENNE_P, size=num_perm, dtype=np.uint64)
    return a, b


def _shingle_hashes(text: str, k: int) -> np.ndarray:
    """Hashed word-k-gram shingle set (uint32, unique, sorted)."""
    tokens = TOKEN_RE.findall(canonical_text(text))
    if len(tokens) < k:
        joined = [" ".join(tokens)] if tokens else []
    else:
        joined = [" ".join(tokens[i : i + k]) for i in range(len(tokens) - k + 1)]
    if not joined:
        return np.empty(0, dtype=np.uint64)
    hashes = {
        int.from_bytes(hashlib.blake2b(s.encode(), digest_size=4).digest(), "little")
        for s in joined
    }
    return np.fromiter(hashes, dtype=np.uint64, count=len(hashes))


def minhash_signature(
    shingles: np.ndarray, a: np.ndarray, b: np.ndarray
) -> np.ndarray:
    """sig_i = min over shingles x of ((a_i x + b_i) mod p) mod 2^32."""
    if shingles.size == 0:
        return np.full(a.shape[0], _HASH_RANGE - 1, dtype=np.uint64)
    # (num_perm, n_shingles) via broadcasting; python ints avoid overflow
    prod = (a[:, None] * shingles[None, :] + b[:, None]) % _MERSENNE_P
    return (prod % _HASH_RANGE).min(axis=1).astype(np.uint64)


class MinHasher:
    """Actor-pool batch UDF: adds ``minhash_sig`` (fixed-size uint64 list)
    and optionally ``shingles`` (exact hashed shingle set) columns."""

    def __init__(
        self,
        num_perm: int = 128,
        shingle_k: int = 3,
        keep_shingles: bool = False,
        seed: int = 1,
    ):
        self.num_perm = num_perm
        self.shingle_k = shingle_k
        self.keep_shingles = keep_shingles
        self.a, self.b = _perm_params(num_perm, seed)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        sigs, shingle_lists = [], []
        for t in texts:
            sh = _shingle_hashes(t or "", self.shingle_k)
            sigs.append(minhash_signature(sh, self.a, self.b).tolist())
            if self.keep_shingles:
                shingle_lists.append(np.sort(sh).tolist())
        out = batch.append_column(
            "minhash_sig", pa.array(sigs, type=pa.list_(pa.uint64()))
        )
        if self.keep_shingles:
            out = out.append_column(
                "shingles", pa.array(shingle_lists, type=pa.list_(pa.uint64()))
            )
        return out


def lsh_band_rows(
    batch: pa.Table, bands: int, rows_per_band: int, id_col: str = "doc_id"
) -> pa.Table:
    """Explode each signature into (band_id, band_hash, id, sig[, shingles])
    rows — the shuffle-ready LSH index entries."""
    ids = batch.column(id_col).to_pylist()
    sigs = batch.column("minhash_sig").to_pylist()
    has_sh = "shingles" in batch.column_names
    shingles = batch.column("shingles").to_pylist() if has_sh else None
    out_band, out_hash, out_id, out_sig, out_sh = [], [], [], [], []
    for i, (doc, sig) in enumerate(zip(ids, sigs)):
        for band in range(bands):
            chunk = sig[band * rows_per_band : (band + 1) * rows_per_band]
            h = hashlib.blake2b(
                np.asarray(chunk, dtype=np.uint64).tobytes(), digest_size=8
            ).hexdigest()
            out_band.append(band)
            out_hash.append(h)
            out_id.append(doc)
            out_sig.append(sig)
            if has_sh:
                out_sh.append(shingles[i])
    cols = {
        "band_id": pa.array(out_band, type=pa.int32()),
        "band_hash": pa.array(out_hash, type=pa.string()),
        id_col: pa.array(out_id),
        "minhash_sig": pa.array(out_sig, type=pa.list_(pa.uint64())),
    }
    if has_sh:
        cols["shingles"] = pa.array(out_sh, type=pa.list_(pa.uint64()))
    return pa.table(cols)


def _bucket_pairs(group: pd.DataFrame, threshold: float, exact: bool) -> pd.DataFrame:
    """All candidate pairs inside one LSH bucket, Jaccard-verified
    (signature-estimated, or exact when shingle sets are present)."""
    rows = group.sort_values("doc_id").to_dict("records")
    out = []
    for i in range(len(rows)):
        for j in range(i + 1, len(rows)):
            a, b = rows[i], rows[j]
            if a["doc_id"] == b["doc_id"]:
                continue
            if exact:
                sa, sb = set(a["shingles"]), set(b["shingles"])
                union = len(sa | sb)
                jac = len(sa & sb) / union if union else 0.0
            else:
                sig_a = np.asarray(a["minhash_sig"])
                sig_b = np.asarray(b["minhash_sig"])
                jac = float((sig_a == sig_b).mean())
            if jac >= threshold:
                out.append({"doc_a": a["doc_id"], "doc_b": b["doc_id"], "jaccard": jac})
    return pd.DataFrame(out, columns=["doc_a", "doc_b", "jaccard"])


def minhash_lsh_pairs(
    docs: ray.data.Dataset,
    threshold: float = 0.7,
    num_perm: int = 128,
    bands: int = 16,
    shingle_k: int = 3,
    exact_verify: bool = True,
    concurrency=(1, 8),
) -> ray.data.Dataset:
    """documents (doc_id, text) → near-duplicate pairs
    (doc_a, doc_b, jaccard), deduplicated.

    shingle+minhash (map_batches, vectorized) → band explode → groupby
    (band_id, band_hash) → in-bucket pairwise verify → pair dedup
    (groupby doc_a/doc_b keep max jaccard).
    """
    rows_per_band = num_perm // bands
    sigs = docs.map_batches(
        MinHasher,
        fn_constructor_kwargs={
            "num_perm": num_perm,
            "shingle_k": shingle_k,
            "keep_shingles": exact_verify,
        },
        batch_format="pyarrow",
        batch_size=256,
        concurrency=concurrency,
    )
    band_rows = sigs.map_batches(
        lambda b: lsh_band_rows(b, bands, rows_per_band),
        batch_format="pyarrow",
    )
    pairs = band_rows.groupby(["band_id", "band_hash"]).map_groups(
        lambda g: _bucket_pairs(g, threshold, exact_verify),
        batch_format="pandas",
    )
    # a pair can surface from several bands → dedupe
    return pairs.groupby(["doc_a", "doc_b"]).map_groups(
        lambda g: g.head(1), batch_format="pandas"
    )


def exact_dedup(
    docs: ray.data.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> ray.data.Dataset:
    """Keep the smallest id per identical content (SURVEY.md O6).

    Expressed as ``groupby(content_hash).aggregate(Min(id))`` — a
    hash-partitioned aggregate, fully vectorized (vs. per-group python of
    ``map_groups``, which pays per-group overhead on millions of tiny
    groups at scale)."""

    def add_hash(batch: pa.Table) -> pa.Table:
        import hashlib as h

        hashes = [
            h.md5((t or "").encode("utf-8")).hexdigest()
            for t in batch.column(text_col).to_pylist()
        ]
        return pa.table(
            {
                id_col: batch.column(id_col),
                "content_hash": pa.array(hashes, type=pa.string()),
            }
        )

    from ray.data.aggregate import Min

    hashed = docs.map_batches(add_hash, batch_format="pyarrow")
    out = hashed.groupby("content_hash").aggregate(Min(id_col, alias_name=id_col))
    return out.map_batches(
        lambda b: b.select([id_col, "content_hash"]), batch_format="pyarrow"
    )


# --- SimHash ----------------------------------------------------------------


def simhash64(text: str) -> int:
    """Charikar-style 64-bit SimHash over word features."""
    tokens = TOKEN_RE.findall(canonical_text(text))
    if not tokens:
        return 0
    acc = np.zeros(64, dtype=np.int64)
    shifts = np.arange(64, dtype=np.uint64)
    for tok in set(tokens):
        h = np.uint64(
            int.from_bytes(
                hashlib.blake2b(tok.encode(), digest_size=8).digest(), "little"
            )
        )
        bits = (h >> shifts) & np.uint64(1)
        acc += np.where(bits == 1, 1, -1)
    result = 0
    for i in range(64):
        if acc[i] > 0:
            result |= 1 << i
    return result


def add_simhash(batch: pa.Table) -> pa.Table:
    vals = [simhash64(t or "") for t in batch.column("text").to_pylist()]
    return batch.append_column("simhash", pa.array(vals, type=pa.uint64()))


def simhash_pairs(
    docs: ray.data.Dataset,
    max_hamming: int = 3,
    chunks: int = 4,
) -> ray.data.Dataset:
    """Near-dup pairs by SimHash: pigeonhole on 16-bit chunks (a pair
    within Hamming distance < chunks must agree on ≥1 chunk), then exact
    Hamming verify inside the bucket."""

    def explode(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        sims = batch.column("simhash").to_pylist()
        out_c, out_v, out_id, out_s = [], [], [], []
        width = 64 // chunks
        mask = (1 << width) - 1
        for doc, s in zip(ids, sims):
            for c in range(chunks):
                out_c.append(c)
                out_v.append((s >> (c * width)) & mask)
                out_id.append(doc)
                out_s.append(s)
        return pa.table(
            {
                "chunk_id": pa.array(out_c, type=pa.int32()),
                "chunk_val": pa.array(out_v, type=pa.uint64()),
                "doc_id": pa.array(out_id),
                "simhash": pa.array(out_s, type=pa.uint64()),
            }
        )

    def bucket_pairs(group: pd.DataFrame) -> pd.DataFrame:
        rows = group.sort_values("doc_id").to_dict("records")
        out = []
        for i in range(len(rows)):
            for j in range(i + 1, len(rows)):
                a, b = rows[i], rows[j]
                if a["doc_id"] == b["doc_id"]:
                    continue
                dist = bin(int(a["simhash"]) ^ int(b["simhash"])).count("1")
                if dist <= max_hamming:
                    out.append(
                        {"doc_a": a["doc_id"], "doc_b": b["doc_id"], "hamming": dist}
                    )
        return pd.DataFrame(out, columns=["doc_a", "doc_b", "hamming"])

    hashed = docs.map_batches(add_simhash, batch_format="pyarrow")
    exploded = hashed.map_batches(explode, batch_format="pyarrow")
    pairs = exploded.groupby(["chunk_id", "chunk_val"]).map_groups(
        bucket_pairs, batch_format="pandas"
    )
    return pairs.groupby(["doc_a", "doc_b"]).map_groups(
        lambda g: g.head(1), batch_format="pandas"
    )


def ngram_jaccard_pairs(
    docs: ray.data.Dataset,
    threshold: float = 0.5,
    shingle_k: int = 3,
    num_perm: int = 128,
    bands: int = 32,
) -> ray.data.Dataset:
    """Exact word-n-gram Jaccard near-dup pairs, LSH-pruned (high band
    count → high recall at moderate thresholds), always exact-verified on
    the hashed shingle sets."""
    return minhash_lsh_pairs(
        docs,
        threshold=threshold,
        num_perm=num_perm,
        bands=bands,
        shingle_k=shingle_k,
        exact_verify=True,
    )
