"""Repetition quality filters + benchmark decontamination (adversarial
fixtures — the synthetic corpus never hits the degenerate shapes)."""

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from crawler_ray.pipelines.textops import (
    doc_benchmark_overlap,
    doc_benchmark_overlap_sql,
    doc_repetition_metrics,
    doc_repetition_sql,
)


def _write_docs(tmp_path, texts: dict[int, str]):
    pq.write_table(
        pa.table(
            {"doc_id": pa.array(list(texts), pa.int64()),
             "text": pa.array([texts[k] for k in texts], pa.string())}
        ),
        f"{tmp_path}/documents.parquet",
    )
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{tmp_path}/documents.parquet')"
    )
    return con


def _sorted(df):
    return df.sort_values("doc_id").reset_index(drop=True)


def test_repetition_metrics_edges(ray_session, tmp_path):
    texts = {
        1: "",                      # empty -> 0/0 fractions, keep
        2: "only",                  # one token -> no bigrams
        3: "a a a a",               # dup 3/4, top bigram 3/3 -> drop
        4: "w x y z u v t s r q o n",  # 12 distinct tokens, top bigram 1/11 -> keep
        5: "  padded   whitespace  run  ",  # split() collapse must match trim+regex
        6: "p q p q p q",           # alternating: dup 4/6, 'p q' 3 of 5
    }
    con = _write_docs(tmp_path, texts)
    got = _sorted(doc_repetition_metrics(str(tmp_path)).to_pandas())
    exp = _sorted(con.sql(doc_repetition_sql()).df())
    pd.testing.assert_frame_equal(got[exp.columns], exp, check_dtype=True)
    m = got.set_index("doc_id")
    assert m.loc[1, "dup_token_frac"] == 0.0 and bool(m.loc[1, "keep"])
    assert m.loc[2, "top_bigram_frac"] == 0.0
    assert m.loc[3, "dup_token_frac"] == 0.75
    assert m.loc[3, "top_bigram_frac"] == 1.0 and not m.loc[3, "keep"]
    assert bool(m.loc[4, "keep"])
    assert m.loc[6, "top_bigram_frac"] == 3 / 5


def test_benchmark_overlap_planted(ray_session, tmp_path):
    bench = "alpha beta gamma delta epsilon zeta eta theta"
    texts = {
        0: bench,                                        # benchmark doc (0 % 97 == 0)
        1: "xx " + " ".join(bench.split()[:5]) + " yy",  # shares the 5-gram
        2: " ".join(bench.split()[:4]) + " unrelated tail words here",  # only 4-gram
        3: "alpha beta",                                 # < ngram tokens
        4: "completely different text with nothing shared at all",
        97: "totally disjoint benchmark entry one two three four five",  # 2nd bench doc
        5: "entry one two three four five suffix",       # hits the 2nd bench doc
    }
    con = _write_docs(tmp_path, texts)
    got = _sorted(doc_benchmark_overlap(str(tmp_path)).to_pandas())
    exp = _sorted(con.sql(doc_benchmark_overlap_sql()).df())
    pd.testing.assert_frame_equal(got[exp.columns], exp, check_dtype=True)
    flags = got.set_index("doc_id")["contaminated"]
    assert set(got["doc_id"]) == {1, 2, 3, 4, 5}  # benchmark docs excluded
    assert bool(flags[1]) and bool(flags[5])
    assert not (flags[2] or flags[3] or flags[4])
