"""Similarity search over the ``embeddings`` table (``embedding:
list<float>``): brute-force cosine top-k (exact baseline), all-pairs near-dup
(exact, blocked), and an LSH-bucketed approximate variant (the scale path).

Pattern: the query matrix / full embedding matrix is broadcast once with
``ray.put``; every batch does one numpy matmul against it (vectorized, no
per-row Python). The LSH variant replaces the O(n·N) scan with per-bucket
scans — recall measured in tests/test_similarity.py.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray
import ray.data as rd

from crawler_ray.functions.rounding import round_np


def _read_emb(sf_dir: str) -> rd.Dataset:
    return rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])


def _stack(batch: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    ids = batch["vec_id"].to_numpy()
    mat = np.stack(batch["embedding"].to_numpy(zero_copy_only=False)).astype(np.float64)
    return ids, mat


def _normalize(mat: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return mat / norms


class CosineTopK:
    """Per-batch exact cosine vs a broadcast query vector, emitting only the
    batch-local top-k partial (the global top-k is a tiny final sort)."""

    def __init__(self, query_ref, k: int):
        self.q = ray.get(query_ref)  # (d,) float64, unit norm
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, mat = _stack(batch)
        sims = _normalize(mat) @ self.q
        order = np.lexsort((ids, -sims))[: self.k]
        return pa.table(
            {
                "vec_id": pa.array(ids[order], pa.int64()),
                "cos_sim": pa.array(round_np(sims[order], 4), pa.float64()),
            }
        )


def knn_brute_force(sf_dir: str, query_vec_id: int = 0, k: int = 20) -> rd.Dataset:
    """Exact top-k by cosine similarity to the embedding of ``query_vec_id``
    (excluded from results). Ties break on vec_id ascending."""
    t = pq.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"],
        filters=[("vec_id", "=", query_vec_id)],
    )
    q = np.asarray(t["embedding"].to_pylist()[0], dtype=np.float64)
    q = q / np.linalg.norm(q)
    query_ref = ray.put(q)

    ds = _read_emb(sf_dir).map_batches(
        lambda tb: tb.filter(pa.compute.not_equal(tb["vec_id"], query_vec_id)),
        batch_format="pyarrow",
    )
    partials = ds.map_batches(
        CosineTopK,
        fn_constructor_args=(query_ref, k),
        batch_format="pyarrow",
        concurrency=(1, 2),
        num_cpus=1,
    )
    return partials.sort(["cos_sim", "vec_id"], descending=[True, False]).limit(k)


def knn_sql(query_vec_id: int = 0, k: int = 20) -> str:
    return f"""
WITH q AS (SELECT embedding FROM embeddings WHERE vec_id = {query_vec_id})
SELECT e.vec_id,
       ROUND(list_cosine_similarity(e.embedding, q.embedding), 4) AS cos_sim
FROM embeddings e, q
WHERE e.vec_id != {query_vec_id}
ORDER BY list_cosine_similarity(e.embedding, q.embedding) DESC, e.vec_id
LIMIT {k}
"""


class NearDupPairs:
    """Blocked all-pairs: each batch row-block is matmul'd against the full
    broadcast matrix; emits (a < b) pairs above threshold. O(n²/p) work per
    worker but no shuffle; the LSH variant below is the sub-quadratic path."""

    def __init__(self, mat_ref, threshold: float):
        ids, mat = ray.get(mat_ref)
        self.all_ids = ids
        self.all_mat = _normalize(mat)
        self.threshold = threshold

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, mat = _stack(batch)
        sims = _normalize(mat) @ self.all_mat.T  # (b, N)
        sims = round_np(sims.ravel(), 3).reshape(sims.shape)
        bi, ni = np.nonzero(sims >= self.threshold)
        a = ids[bi]
        b = self.all_ids[ni]
        keep = a < b  # each unordered pair exactly once
        return pa.table(
            {
                "vec_a": pa.array(a[keep], pa.int64()),
                "vec_b": pa.array(b[keep], pa.int64()),
                "cos_sim": pa.array(sims[bi, ni][keep], pa.float64()),
            }
        )


def embedding_near_dup_pairs(sf_dir: str, threshold: float = 0.3) -> rd.Dataset:
    """All pairs with round(cosine, 3) ≥ threshold (round-then-threshold so
    the DuckDB oracle sees the identical boundary)."""
    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = t["vec_id"].to_numpy()
    mat = np.stack(t["embedding"].to_numpy(zero_copy_only=False)).astype(np.float64)
    mat_ref = ray.put((ids, mat))
    return _read_emb(sf_dir).map_batches(
        NearDupPairs,
        fn_constructor_args=(mat_ref, threshold),
        batch_format="pyarrow",
        batch_size=1024,
        concurrency=(1, 4),
        num_cpus=1,
    )


def embedding_near_dup_sql(threshold: float = 0.3) -> str:
    return f"""
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       ROUND(list_cosine_similarity(a.embedding, b.embedding), 3) AS cos_sim
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE ROUND(list_cosine_similarity(a.embedding, b.embedding), 3) >= {threshold}
"""


# ---------------------------------------------------------------------------
# LSH-bucketed ANN (the 100-TB path; approximate → rows-only + recall test)


class LshSignStage:
    """Random-hyperplane signature (b bits) per embedding — bucket key."""

    def __init__(self, planes_ref):
        self.planes = ray.get(planes_ref)  # (b, d)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, mat = _stack(batch)
        bits = (_normalize(mat) @ self.planes.T) > 0  # (n, b)
        sig = np.zeros(len(ids), dtype=np.int64)
        for j in range(bits.shape[1]):
            sig = (sig << 1) | bits[:, j].astype(np.int64)
        return pa.table(
            {
                "vec_id": pa.array(ids, pa.int64()),
                "bucket": pa.array(sig, pa.int64()),
                "embedding": batch["embedding"],
            }
        )


def ann_lsh_topk(
    sf_dir: str, query_vec_id: int = 0, k: int = 10, n_bits: int = 8, seed: int = 5
) -> rd.Dataset:
    """Approximate top-k: scan only the query's LSH bucket (plus Hamming-1
    neighbor buckets) instead of the full corpus. Sub-linear per query at
    scale; recall vs brute force asserted in tests."""
    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    d = len(t["embedding"][0])
    rng = np.random.Generator(np.random.PCG64(seed))
    planes = rng.standard_normal((n_bits, d))
    planes_ref = ray.put(planes)

    q = np.asarray(
        t.filter(pa.compute.equal(t["vec_id"], query_vec_id))["embedding"].to_pylist()[0],
        dtype=np.float64,
    )
    q = q / np.linalg.norm(q)
    qsig = 0
    for j in range(n_bits):
        qsig = (qsig << 1) | int((planes[j] @ q) > 0)
    # multi-probe: the query bucket plus all buckets within Hamming ≤ 2
    # (for 8-bit signatures that is 37/256 buckets ≈ 14% of the corpus —
    # still sub-linear, with much better recall than single-bucket probing)
    probe = {qsig} | {qsig ^ (1 << b) for b in range(n_bits)}
    probe |= {
        qsig ^ (1 << b1) ^ (1 << b2)
        for b1 in range(n_bits)
        for b2 in range(b1 + 1, n_bits)
    }
    probe_arr = pa.array(sorted(probe), pa.int64())
    query_ref = ray.put(q)

    ds = _read_emb(sf_dir).map_batches(
        lambda tb: tb.filter(pa.compute.not_equal(tb["vec_id"], query_vec_id)),
        batch_format="pyarrow",
    )
    bucketed = ds.map_batches(
        LshSignStage,
        fn_constructor_args=(planes_ref,),
        batch_format="pyarrow",
        concurrency=(1, 2),
        num_cpus=1,
    ).map_batches(
        lambda tb: tb.filter(pa.compute.is_in(tb["bucket"], value_set=probe_arr)),
        batch_format="pyarrow",
    )
    partials = bucketed.map_batches(
        CosineTopK,
        fn_constructor_args=(query_ref, k),
        batch_format="pyarrow",
        concurrency=(1, 2),
        num_cpus=1,
    )
    return partials.sort(["cos_sim", "vec_id"], descending=[True, False]).limit(k)
