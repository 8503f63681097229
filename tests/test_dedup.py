"""Dedup suite: MinHash-LSH recall on planted near-dups, SimHash banding."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module")
def planted_corpus(tmp_path_factory):
    """Corpus with known near-dup pairs: base docs + mutated copies."""
    rng = np.random.default_rng(11)
    words = [f"w{i}" for i in range(200)]
    docs, truth = [], []
    doc_id = 0
    for b in range(30):
        base_words = list(rng.choice(words, size=60))
        base = " ".join(base_words)
        docs.append({"doc_id": doc_id, "text": base})
        base_id = doc_id
        doc_id += 1
        if b % 3 == 0:  # plant a near-dup: mutate ~5% of tokens
            mutated = list(base_words)
            for j in rng.choice(len(mutated), size=3, replace=False):
                mutated[j] = str(rng.choice(words))
            docs.append({"doc_id": doc_id, "text": " ".join(mutated)})
            truth.append((base_id, doc_id))
            doc_id += 1
        # plus unrelated docs
        docs.append({"doc_id": doc_id, "text": " ".join(rng.choice(words, size=60))})
        doc_id += 1
    d = tmp_path_factory.mktemp("corpus")
    pq.write_table(pa.Table.from_pylist(docs), f"{d}/documents.parquet")
    return str(d), docs, truth


def _brute_force_pairs(docs, ngram, threshold):
    from crawler_ray.functions.text import char_ngrams, jaccard

    sh = {r["doc_id"]: char_ngrams(r["text"], ngram) for r in docs}
    ids = sorted(sh)
    out = set()
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            if jaccard(sh[a], sh[b]) >= threshold:
                out.add((a, b))
    return out


def test_minhash_lsh_recall(ray_session, planted_corpus):
    from crawler_ray.pipelines.dedup import minhash_near_dup_pairs

    sf_dir, docs, truth = planted_corpus
    got = minhash_near_dup_pairs(sf_dir, ngram=3, threshold=0.8).to_pandas()
    got_pairs = {(int(a), int(b)) for a, b in zip(got["doc_a"], got["doc_b"])}
    exact = _brute_force_pairs(docs, 3, 0.8)
    assert exact, "fixture must contain true near-dups"
    # every planted pair is a true near-dup and must be found (LSH bands are
    # tuned for threshold .8 >> s-curve midpoint .71)
    recall = len(got_pairs & exact) / len(exact)
    assert recall >= 0.9
    # verification step guarantees NO false positives
    assert got_pairs <= exact


def test_simhash_finds_exact_dups(ray_session, planted_corpus, tmp_path):
    """Token-identical docs have simhash distance 0 and must pair up."""
    sf_dir, docs, truth = planted_corpus
    # append exact duplicates of the first two docs
    dup_docs = list(docs) + [
        {"doc_id": 90001, "text": docs[0]["text"]},
        {"doc_id": 90002, "text": docs[1]["text"]},
    ]
    pq.write_table(pa.Table.from_pylist(dup_docs), f"{tmp_path}/documents.parquet")
    from crawler_ray.pipelines.dedup import simhash_near_dup_pairs

    got = simhash_near_dup_pairs(str(tmp_path), max_hamming=3).to_pandas()
    pairs = {(int(a), int(b)) for a, b in zip(got["doc_a"], got["doc_b"])}
    assert (docs[0]["doc_id"], 90001) in pairs
    assert (docs[1]["doc_id"], 90002) in pairs
    ham0 = got.set_index(["doc_a", "doc_b"])["hamming"]
    assert ham0.loc[(docs[0]["doc_id"], 90001)] == 0


def test_exact_dedup_counts(ray_session, planted_corpus, tmp_path):
    sf_dir, docs, _ = planted_corpus
    tripled = list(docs) + [
        {"doc_id": 80001, "text": docs[0]["text"]},
        {"doc_id": 80002, "text": docs[0]["text"]},
    ]
    pq.write_table(pa.Table.from_pylist(tripled), f"{tmp_path}/documents.parquet")
    from crawler_ray.pipelines.dedup import exact_dedup_docs

    out = exact_dedup_docs(str(tmp_path)).to_pandas()
    assert out["n_copies"].max() == 3
    rep = out[out["n_copies"] == 3]["rep_doc_id"].iloc[0]
    assert rep == docs[0]["doc_id"]  # min doc_id wins
    assert len(out) == len({r["text"] for r in tripled})
