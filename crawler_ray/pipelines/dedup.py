"""Deduplication suite over the ``documents`` table: exact, token-set exact,
MinHash+LSH near-dup, SimHash near-dup.

Generalizes the reference's exact-dedup family (SURVEY.md §2.7: image-MD5 J4,
category-id J5, visited-variant J6 — all hash-key first-wins) to the
content-dedup operators a training-data pipeline needs. The scalable shapes:

- exact dedup        = hash-partition on content hash + per-group first
- token-set dedup    = same, on a canonicalized token-set hash
- MinHash+LSH        = shingle→minhash per batch (actor pool) → explode to
                       (band, band_hash, doc) rows → groupby band bucket →
                       candidate pairs → exact-Jaccard verify
- SimHash            = 64-bit signature → band by 16-bit quarters → candidate
                       pairs → Hamming verify
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd
from ray.data.aggregate import Count, Min


def _read_docs(sf_dir: str, columns: list[str]) -> rd.Dataset:
    return rd.read_parquet(f"{sf_dir}/documents.parquet", columns=columns)


# ---------------------------------------------------------------------------
# exact dedup (md5 of text)


def exact_dedup_docs(sf_dir: str) -> rd.Dataset:
    """One representative (min doc_id) per distinct text + copy count."""
    ds = _read_docs(sf_dir, ["doc_id", "text"])

    def hash_batch(df: pd.DataFrame) -> pa.Table:
        # Arrow out: feeds the dedup groupby shuffle
        return pa.table(
            {
                "text_md5": pa.array(
                    [hashlib.md5(t.encode("utf-8")).hexdigest() for t in df["text"]],
                    pa.string(),
                ),
                "doc_id": pa.array(df["doc_id"].to_numpy(), pa.int64()),
            }
        )

    hashed = ds.map_batches(hash_batch, batch_format="pandas")
    return hashed.groupby("text_md5").aggregate(
        Min("doc_id", alias_name="rep_doc_id"),
        Count(alias_name="n_copies"),
    )


EXACT_DEDUP_SQL = """
SELECT md5(text) AS text_md5,
       MIN(doc_id) AS rep_doc_id,
       COUNT(*)    AS n_copies
FROM documents
GROUP BY md5(text)
"""


# ---------------------------------------------------------------------------
# token-set-identical pairs (word-level Jaccard == 1.0; integer-exact oracle)


def token_set_dup_pairs(sf_dir: str) -> rd.Dataset:
    """Pairs of docs with IDENTICAL distinct-token sets (Jaccard exactly 1):
    canonical token-set hash → hash-partition → within-group pairs. Avoids
    the all-pairs token join the naive SQL oracle does."""
    ds = _read_docs(sf_dir, ["doc_id", "text"])

    def key_batch(df: pd.DataFrame) -> pd.DataFrame:
        keys = df["text"].map(
            lambda t: hashlib.md5(
                "\x00".join(sorted(set(t.split()))).encode("utf-8")
            ).hexdigest()
        )
        return pa.table(
            {"set_key": pa.array(list(keys), pa.string()),
             "doc_id": pa.array(df["doc_id"].to_numpy(), pa.int64())}
        )

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = np.sort(g["doc_id"].to_numpy())
        if len(ids) < 2:
            return pd.DataFrame({"doc_a": [], "doc_b": []}).astype("int64")
        a, b = np.triu_indices(len(ids), k=1)
        return pd.DataFrame({"doc_a": ids[a], "doc_b": ids[b]})

    keyed = ds.map_batches(key_batch, batch_format="pandas")
    return keyed.groupby("set_key").map_groups(pairs, batch_format="pandas")


TOKEN_SET_DUP_SQL = r"""
WITH dtok AS (
    SELECT DISTINCT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS w
    FROM documents
),
cnt AS (SELECT doc_id, COUNT(*) AS n FROM dtok GROUP BY doc_id),
inter AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS c
    FROM dtok a JOIN dtok b ON a.w = b.w AND a.doc_id < b.doc_id
    GROUP BY 1, 2
)
SELECT doc_a, doc_b
FROM inter
JOIN cnt ca ON ca.doc_id = doc_a
JOIN cnt cb ON cb.doc_id = doc_b
WHERE c = ca.n AND c = cb.n
"""


# ---------------------------------------------------------------------------
# MinHash + LSH near-dup (char n-gram shingles)

_N_PERM = 128
_N_BANDS = 16  # 8 rows per band → LSH s-curve threshold ≈ (1/16)^(1/8) ≈ 0.71


def _perm_params(seed: int = 13) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.Generator(np.random.PCG64(seed))
    # odd multipliers → multiply-add over Z/2^64 (wraparound) is a bijection;
    # fully vectorizable in uint64, unlike Mersenne-prime modular arithmetic
    a = rng.integers(1, 1 << 63, size=_N_PERM, dtype=np.uint64) | np.uint64(1)
    b = rng.integers(0, 1 << 63, size=_N_PERM, dtype=np.uint64)
    return a, b


class MinHashStage:
    """doc → 128-perm MinHash over char n-gram shingles → one row per band:
    (band_id, band_hash, doc_id). Stateful setup (perm params, regex) once
    per actor."""

    def __init__(self, ngram: int = 3, seed: int = 13):
        self.ngram = ngram
        self.a, self.b = _perm_params(seed)

    def _signature(self, text: str) -> np.ndarray:
        """Fully vectorized: byte n-gram windows packed into uint64 (exact
        shingle identity for n ≤ 8 bytes), distinct via np.unique, splitmix64
        bit-mix, then one (m × 128) multiply-add in Z/2^64 with min over
        shingles. Byte (not unicode-char) shingles — a faithful approximation
        of char n-grams for candidate generation; the verifier uses exact
        char n-gram Jaccard either way."""
        raw = np.frombuffer(text.lower().encode("utf-8"), dtype=np.uint8)
        n = min(self.ngram, 8)
        if raw.size < n:
            u = np.array([int.from_bytes(raw.tobytes(), "big")], dtype=np.uint64)
        else:
            w = raw[: raw.size - n + 1].astype(np.uint64)
            for k in range(1, n):
                w = (w << np.uint64(8)) | raw[k : raw.size - n + 1 + k]
            u = np.unique(w)
        with np.errstate(over="ignore"):
            # splitmix64 finalizer — packed windows are low-entropy ints
            z = u + np.uint64(0x9E3779B97F4A7C15)
            z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
            z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
            z = z ^ (z >> np.uint64(31))
            vals = z[:, None] * self.a[None, :] + self.b[None, :]
        return vals.min(axis=0)

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        rows_per_band = _N_PERM // _N_BANDS
        out_doc, out_bucket = [], []
        for doc_id, text in zip(df["doc_id"], df["text"]):
            sig = self._signature(text)
            for band in range(_N_BANDS):
                chunk = sig[band * rows_per_band : (band + 1) * rows_per_band]
                # single composite bucket key (band prefix + band hash):
                # single-key groupby shuffles are much cheaper than multi-key
                bh = hashlib.blake2b(chunk.tobytes(), digest_size=8).hexdigest()
                out_doc.append(doc_id)
                out_bucket.append(f"{band:02d}:{bh}")
        # Arrow out: these rows feed a groupby shuffle, and sort-shuffles
        # over Arrow blocks are ~10x faster than over pandas blocks
        return pa.table(
            {"bucket": pa.array(out_bucket, pa.string()),
             "doc_id": pa.array(np.array(out_doc, dtype=np.int64), pa.int64())}
        )


class MinHashSignatures(MinHashStage):
    """doc → raw 128-perm signature (one binary cell per doc). Split from
    the banding so the signatures can ALSO drive the estimate prefilter."""

    def __call__(self, df: pd.DataFrame) -> pa.Table:
        sigs = [self._signature(t).tobytes() for t in df["text"]]
        return pa.table(
            {"doc_id": pa.array(df["doc_id"].to_numpy(), pa.int64()),
             "sig": pa.array(sigs, pa.binary())}
        )


def sig_to_bands(t: pa.Table) -> pa.Table:
    """Signature rows → (bucket, doc_id) band rows (stateless, Arrow out)."""
    rows_per_band = _N_PERM // _N_BANDS
    out_doc, out_bucket = [], []
    for doc_id, sig in zip(t["doc_id"].to_pylist(), t["sig"].to_pylist()):
        arr = np.frombuffer(sig, dtype=np.uint64)
        for band in range(_N_BANDS):
            chunk = arr[band * rows_per_band : (band + 1) * rows_per_band]
            bh = hashlib.blake2b(chunk.tobytes(), digest_size=8).hexdigest()
            out_doc.append(doc_id)
            out_bucket.append(f"{band:02d}:{bh}")
    return pa.table(
        {"bucket": pa.array(out_bucket, pa.string()),
         "doc_id": pa.array(np.array(out_doc, dtype=np.int64), pa.int64())}
    )


class JaccardVerifier:
    """Candidate-pair verification: a vectorized MinHash-estimate prefilter
    (signature agreement fraction, broadcast signature matrix) drops pairs
    whose estimated Jaccard is below ``threshold - margin`` (margin = 3σ of
    the 128-perm estimator), then exact n-gram Jaccard confirms survivors.
    Texts + signatures come from broadcast maps (``ray.put`` once). At corpus
    scales where those can't broadcast, carry the signature through the
    shuffle and hash-partition-join texts on doc_id instead."""

    MARGIN = 0.12  # ~3 * sqrt(j(1-j)/128) at j≈0.8

    def __init__(self, texts_ref, sigs_ref, ngram: int, threshold: float):
        self.texts: dict = ray.get(texts_ref)
        self.sig_ids, self.sig_mat = ray.get(sigs_ref)  # sorted ids, (n,128)
        self.ngram = ngram
        self.threshold = threshold

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        from crawler_ray.functions.text import char_ngrams, jaccard

        out = {"doc_a": [], "doc_b": [], "jaccard": []}
        if len(df):
            da = df["doc_a"].to_numpy(dtype=np.int64)
            db = df["doc_b"].to_numpy(dtype=np.int64)
            ia = np.searchsorted(self.sig_ids, da)
            ib = np.searchsorted(self.sig_ids, db)
            est = (self.sig_mat[ia] == self.sig_mat[ib]).mean(axis=1)
            keep = est >= self.threshold - self.MARGIN
            cache: dict[int, set] = {}

            def sh(d):
                if d not in cache:
                    cache[d] = char_ngrams(self.texts[d], self.ngram)
                return cache[d]

            for a, b in zip(da[keep].tolist(), db[keep].tolist()):
                j = jaccard(sh(a), sh(b))
                if j >= self.threshold:
                    out["doc_a"].append(a)
                    out["doc_b"].append(b)
                    out["jaccard"].append(round(j, 6))
        return pd.DataFrame(
            {"doc_a": np.array(out["doc_a"], dtype=np.int64),
             "doc_b": np.array(out["doc_b"], dtype=np.int64),
             "jaccard": np.array(out["jaccard"], dtype=np.float64)}
        )


def minhash_near_dup_pairs(
    sf_dir: str, ngram: int = 3, threshold: float = 0.8
) -> rd.Dataset:
    """MinHash→LSH candidate generation → exact-Jaccard verification.
    Rows-only driver check (LSH is probabilistic; recall vs brute force is
    asserted in tests/test_dedup.py on a corpus with planted near-dups)."""
    docs = _read_docs(sf_dir, ["doc_id", "text"])
    # signatures once (actor pool), reused by BOTH the banding path and the
    # estimate prefilter in verification
    sigs = docs.map_batches(
        MinHashSignatures,
        fn_constructor_args=(ngram,),
        batch_format="pandas",
        concurrency=(1, 8),
        num_cpus=1,
    ).materialize()
    banded = sigs.map_batches(sig_to_bands, batch_format="pyarrow")

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = np.sort(g["doc_id"].unique())
        if len(ids) < 2:
            return pd.DataFrame({"doc_a": pd.Series([], dtype="int64"),
                                 "doc_b": pd.Series([], dtype="int64")})
        a, b = np.triu_indices(len(ids), k=1)
        return pd.DataFrame({"doc_a": ids[a], "doc_b": ids[b]})

    # prune singleton buckets before the per-group UDF: the Count aggregate
    # is a cheap single-key Arrow shuffle (one row per bucket); only buckets
    # with >=2 members (rare) reach map_groups. At 5k docs this cuts the
    # map_groups group count from ~80k to a few hundred.
    hot = (
        banded.groupby("bucket")
        .aggregate(Count(alias_name="n"))
        .map_batches(lambda t: t.filter(pa.compute.greater_equal(t["n"], 2)),
                     batch_format="pyarrow")
        .to_pandas()
    )
    hot_ref = ray.put(pa.array(sorted(hot["bucket"]), pa.string()))

    def only_hot(t: pa.Table) -> pa.Table:
        keys = ray.get(hot_ref)
        return t.filter(pa.compute.is_in(t["bucket"], value_set=keys))

    candidates = (
        banded.map_batches(only_hot, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(bucket_pairs, batch_format="pandas")
    )
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    texts_ref = ray.put(dict(zip(t["doc_id"].to_pylist(), t["text"].to_pylist())))
    # broadcast the signature matrix for the estimate prefilter (n × 1 KiB)
    sig_t = pa.concat_tables(ray.get(sigs.to_arrow_refs()))
    sig_ids = sig_t["doc_id"].to_numpy()
    order = np.argsort(sig_ids)
    sig_mat = np.stack(
        [np.frombuffer(s, dtype=np.uint64) for s in sig_t["sig"].to_pylist()]
    )[order]
    sigs_ref = ray.put((sig_ids[order], sig_mat))
    # verify BEFORE pair-dedup: verification is idempotent and candidate
    # duplication across bands is small (~10%), so shuffling the huge
    # candidate set just to dedupe it costs far more than re-verifying;
    # the tiny verified output is deduped instead (packed int64 pair key,
    # assumes doc_id < 2^31).
    verified = candidates.map_batches(
        JaccardVerifier,
        fn_constructor_args=(texts_ref, sigs_ref, ngram, threshold),
        batch_format="pandas",
        concurrency=(1, 8),
        num_cpus=1,
    )
    packed = verified.map_batches(
        lambda t: t.append_column(
            "pair",
            pa.compute.add(pa.compute.multiply(t["doc_a"], 4294967296), t["doc_b"]),
        ),
        batch_format="pyarrow",
    )
    return (
        packed.groupby("pair")
        .aggregate(
            Min("doc_a", alias_name="doc_a"),
            Min("doc_b", alias_name="doc_b"),
            Min("jaccard", alias_name="jaccard"),
        )
        .select_columns(["doc_a", "doc_b", "jaccard"])
    )


# ---------------------------------------------------------------------------
# SimHash near-dup


class SimHashStage:
    def __init__(self):
        from crawler_ray.functions.hashing import simhash64
        from crawler_ray.functions.text import TOKEN_RE

        self.simhash = simhash64
        self.token_re = TOKEN_RE

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        sigs = df["text"].map(
            lambda t: self.simhash(self.token_re.findall(t.lower()))
        ).astype("int64")
        return pd.DataFrame({"doc_id": df["doc_id"], "simhash": sigs})


def simhash_near_dup_pairs(sf_dir: str, max_hamming: int = 3) -> rd.Dataset:
    """SimHash banding: 4×16-bit quarters — two signatures within Hamming
    distance ≤ 4-1 share at least one exact quarter (pigeonhole) → groupby
    quarter values → verify Hamming. Rows-only driver check."""
    from crawler_ray.functions.hashing import hamming64_batch

    docs = _read_docs(sf_dir, ["doc_id", "text"])
    sigs = docs.map_batches(
        SimHashStage, batch_format="pandas", concurrency=(1, 4), num_cpus=1
    )

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        s = df["simhash"].to_numpy().astype(np.uint64)
        parts = []
        for q in range(4):
            quarter = ((s >> np.uint64(16 * q)) & np.uint64(0xFFFF)).astype(np.int64)
            # single int64 bucket key: band in the high bits, quarter value low
            parts.append(pd.DataFrame({
                "bucket": (np.int64(q) << np.int64(16)) | quarter,
                "doc_id": df["doc_id"].to_numpy(),
                "simhash": df["simhash"].to_numpy(),
            }))
        # Arrow out: feeds the bucket groupby shuffle
        return pa.Table.from_pandas(pd.concat(parts, ignore_index=True),
                                    preserve_index=False)

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates("doc_id").sort_values("doc_id")
        n = len(g)
        if n < 2:
            return pd.DataFrame({"doc_a": pd.Series([], dtype="int64"),
                                 "doc_b": pd.Series([], dtype="int64"),
                                 "sh_a": pd.Series([], dtype="int64"),
                                 "sh_b": pd.Series([], dtype="int64")})
        a, b = np.triu_indices(n, k=1)
        ids = g["doc_id"].to_numpy()
        sh = g["simhash"].to_numpy()
        return pd.DataFrame({"doc_a": ids[a], "doc_b": ids[b], "sh_a": sh[a], "sh_b": sh[b]})

    exploded = sigs.map_batches(explode, batch_format="pandas")
    # prune singleton buckets (same pattern as MinHash-LSH above)
    hot = (
        exploded.groupby("bucket")
        .aggregate(Count(alias_name="n"))
        .map_batches(lambda t: t.filter(pa.compute.greater_equal(t["n"], 2)),
                     batch_format="pyarrow")
        .to_pandas()
    )
    hot_ref = ray.put(set(hot["bucket"]))

    def only_hot(t: pa.Table) -> pa.Table:
        keys = ray.get(hot_ref)
        import numpy as _np

        mask = pa.array(_np.isin(t["bucket"].to_numpy(), list(keys)))
        return t.filter(mask)

    # candidate pairs carry both signatures; Hamming-verify per batch first
    # (vectorized + idempotent), dedup only the small verified output
    cands = (
        exploded.map_batches(only_hot, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(bucket_pairs, batch_format="pandas")
    )

    def verify(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({"doc_a": pd.Series([], dtype="int64"),
                                 "doc_b": pd.Series([], dtype="int64"),
                                 "hamming": pd.Series([], dtype="int64")})
        d = hamming64_batch(df["sh_a"].to_numpy(), df["sh_b"].to_numpy())
        out = df.assign(hamming=d.astype("int64"))
        out = out[out["hamming"] <= max_hamming]
        return out[["doc_a", "doc_b", "hamming"]]

    verified = cands.map_batches(verify, batch_format="pandas")
    packed = verified.map_batches(
        lambda t: t.append_column(
            "pair",
            pa.compute.add(pa.compute.multiply(t["doc_a"], 4294967296), t["doc_b"]),
        ),
        batch_format="pyarrow",
    )
    return (
        packed.groupby("pair")
        .aggregate(
            Min("doc_a", alias_name="doc_a"),
            Min("doc_b", alias_name="doc_b"),
            Min("hamming", alias_name="hamming"),
        )
        .select_columns(["doc_a", "doc_b", "hamming"])
    )


# ---------------------------------------------------------------------------
# thresholded token-set Jaccard (bounded-vocabulary all-pairs)


class TokenJaccardPairs:
    """Blocked all-pairs word-level Jaccard against a broadcast boolean
    doc-term matrix: ``inter = A_batch @ A_all.T`` (popcount via int matmul),
    ``jaccard = inter / (na + nb - inter)``. Both operands are exact
    integers, so the single division produces bit-identical doubles in Ray
    and DuckDB — the threshold comparison is oracle-exact.

    Applicability: bounded vocabulary (matrix is n_docs × V booleans). For
    open vocabularies use the MinHash-LSH path above instead."""

    def __init__(self, matrix_ref, threshold: float):
        self.ids, self.mat = ray.get(matrix_ref)  # sorted ids, (n, V) uint8
        self.sizes = self.mat.sum(axis=1).astype(np.int64)
        self.threshold = threshold

    def __call__(self, t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy()
        idx = np.searchsorted(self.ids, ids)
        sub = self.mat[idx]
        inter = (sub.astype(np.int64) @ self.mat.T.astype(np.int64))
        na = self.sizes[idx][:, None]
        nb = self.sizes[None, :]
        union = na + nb - inter
        jac = inter / np.maximum(union, 1)
        bi, ni = np.nonzero(jac >= self.threshold)
        a = ids[bi]
        b = self.ids[ni]
        keep = a < b
        return pa.table(
            {
                "doc_a": pa.array(a[keep], pa.int64()),
                "doc_b": pa.array(b[keep], pa.int64()),
                "jaccard": pa.array(np.round(jac[bi, ni][keep], 6), pa.float64()),
            }
        )


def token_jaccard_pairs(sf_dir: str, threshold: float = 0.95) -> rd.Dataset:
    """All doc pairs with word-level Jaccard ≥ threshold (exact)."""
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    ids = t["doc_id"].to_numpy()
    order = np.argsort(ids)
    ids = ids[order]
    texts = [t["text"].to_pylist()[i] for i in order]
    token_sets = [set(x.split()) for x in texts]
    vocab = sorted(set().union(*token_sets)) if token_sets else []
    v_index = {w: i for i, w in enumerate(vocab)}
    mat = np.zeros((len(ids), len(vocab)), dtype=np.uint8)
    for r, s in enumerate(token_sets):
        for w in s:
            mat[r, v_index[w]] = 1
    matrix_ref = ray.put((ids, mat))
    return _read_docs(sf_dir, ["doc_id"]).map_batches(
        TokenJaccardPairs,
        fn_constructor_args=(matrix_ref, threshold),
        batch_format="pyarrow",
        batch_size=1024,
        concurrency=(1, 4),
        num_cpus=1,
    )


def token_jaccard_sql(threshold: float = 0.95) -> str:
    return rf"""
WITH dtok AS (
    SELECT DISTINCT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS w
    FROM documents
),
cnt AS (SELECT doc_id, COUNT(*) AS n FROM dtok GROUP BY doc_id),
inter AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS c
    FROM dtok a JOIN dtok b ON a.w = b.w AND a.doc_id < b.doc_id
    GROUP BY 1, 2
)
SELECT doc_a, doc_b,
       ROUND(c / (ca.n + cb.n - c)::DOUBLE, 6) AS jaccard
FROM inter
JOIN cnt ca ON ca.doc_id = doc_a
JOIN cnt cb ON cb.doc_id = doc_b
WHERE c / (ca.n + cb.n - c)::DOUBLE >= {threshold}
"""
