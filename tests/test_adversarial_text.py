"""Adversarial-text conformance: every oracled query stays VALUE-EXACT vs
DuckDB on a corpus of pathological documents and props — empty strings,
whitespace-only (ASCII and Unicode: NBSP, zero-width, ideographic space),
CJK/RTL/emoji, 500-char tokens, embedded newlines/tabs, escaped-quote JSON
traps.

This sweep originally found FOUR engine/oracle semantic divergences that
the ASCII driver corpus could never expose, all since fixed in lockstep:

- tokenization: Python ``str.split()`` splits on Unicode whitespace while
  RE2's ``\\s`` is ASCII-only — every SQL twin now uses the verified
  char-exact class ``[\\s\\x0b\\x1c-\\x1f\\x85\\p{Z}\\x{2028}\\x{2029}]``;
- ``\\w``-based features: Python ``\\w`` is Unicode, RE2's is ASCII — the
  quality/punct twins now use ``[\\p{L}\\p{N}_]``;
- DuckDB ``levenshtein()`` counts BYTES (distance('😀','😀🚀') = 4); the
  typo oracle now expresses codepoint edit-distance-1 via codepoint-aware
  ``substr`` one-deletion/substitution checks;
- ``token_set_dup_pairs`` paired every tokenless doc with every other via
  a shared md5('') set key; empty token sets are now excluded per the
  token_jaccard family rule.

Float mean flakes also surfaced here (`part_type_stats`' accumulation-order
1-ulp flip) — the compare below is EXACT (dtype-strict, no atol), which is
what made them visible.
"""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import __ray_entry__ as entry_mod
from tests.conftest import SF_DIR

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]

NASTY_TEXTS = [
    "",
    "   \t  \n ",
    "café naïve 中文文本 العربية",
    "emoji \U0001F600\U0001F680 text \U0001F600",
    "word " * 40,
    "a" * 500,
    "Tab\tsep\tand  double  spaces",
    "quote\"s 'and' back\\slash %20 &amp; <tag>",
    "MiXeD CaSe MIXED case mixed CASE",
    "num3r1c 123 456.789 -42 1e10",
    " nbsp separated words",
    "line1\nline2\nline3\r\nline4",
    "zero​width​joined",
    "ends with space ",
    "こんにちは world こんにちは",
]

NASTY_PROPS = [
    '{"k": 0}', '{"k": -7}', '{"k": 123456789}',
    '{"s": "\\"k\\": 5", "k": 7}',
    '{"nested": {"k": 99}, "k": 3}',
    '{}', '{"other": 1}',
    '{"k": 5, "s": "emoji \\ud83d\\ude00"}',
]


@pytest.fixture(scope="module")
def nasty_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("sf_nasty")
    import shutil

    for t in TABLES:
        if t not in ("documents", "events"):
            shutil.copy(f"{SF_DIR}/{t}.parquet", str(d / f"{t}.parquet"))
    docs = pq.read_table(f"{SF_DIR}/documents.parquet").to_pandas()
    ids = docs["doc_id"].to_numpy()
    docs["text"] = [
        NASTY_TEXTS[int(i) % len(NASTY_TEXTS)]
        + (f" tail{int(i) // len(NASTY_TEXTS)}" if int(i) % 3 == 0 else "")
        for i in ids
    ]
    docs["n_chars"] = [len(t) for t in docs["text"]]
    pq.write_table(
        pa.Table.from_pandas(docs, preserve_index=False),
        str(d / "documents.parquet"),
    )
    ev = pq.read_table(f"{SF_DIR}/events.parquet").to_pandas()
    ev["props"] = [NASTY_PROPS[int(i) % len(NASTY_PROPS)]
                   for i in ev["event_id"].to_numpy()]
    pq.write_table(
        pa.Table.from_pandas(ev, preserve_index=False),
        str(d / "events.parquet"),
    )
    return str(d)


@pytest.fixture(scope="module")
def nasty_con(nasty_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{nasty_dir}/{t}.parquet')"
        )
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(
        drop=True
    )


def _to_pandas(result) -> pd.DataFrame:
    if isinstance(result, pd.DataFrame):
        return result
    return result.to_pandas()


# only the text/props-sensitive oracles: the purely relational ones read
# tables this fixture copies verbatim and are covered by test_conformance
def _text_sensitive() -> list[str]:
    names = []
    for n, sql in entry_mod.oracle_sql().items():
        s = sql.lower()
        if "documents" in s or "props" in s:
            names.append(n)
    return sorted(names)


@pytest.mark.slow
@pytest.mark.parametrize("name", _text_sensitive())
def test_oracle_exact_on_adversarial_text(ray_session, nasty_dir, nasty_con, name):
    got = _canon(_to_pandas(entry_mod.queries()[name](nasty_dir)))
    exp = _canon(nasty_con.sql(entry_mod.oracle_sql()[name]).df())
    assert list(got.columns) == list(exp.columns)
    assert len(got) == len(exp)
    for c in got.columns:
        a, b = got[c].to_numpy(), exp[c].to_numpy()
        if a.dtype.kind == "f" or b.dtype.kind == "f":
            assert np.array_equal(a, b, equal_nan=True), f"col {c} differs"
        elif len(a):
            assert (a == b).all(), f"col {c} differs"


# ---------------------------------------------------------------------------
# hot-key skew: 90% of events on ONE user — the hot-host/hot-user shape every
# web-scale event log has. Caught funnel_conversions' pandas index-vs-column
# groupby ambiguity on first run.


@pytest.fixture(scope="module")
def skew_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("sf_skew")
    import shutil

    for t in TABLES:
        if t != "events":
            shutil.copy(f"{SF_DIR}/{t}.parquet", str(d / f"{t}.parquet"))
    ev = pq.read_table(f"{SF_DIR}/events.parquet").to_pandas()
    ids = ev["event_id"].to_numpy()
    ev["user_id"] = np.where(ids % 10 < 9, 7, ev["user_id"])
    pq.write_table(
        pa.Table.from_pandas(ev, preserve_index=False),
        str(d / "events.parquet"),
    )
    return str(d)


@pytest.fixture(scope="module")
def skew_con(skew_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{skew_dir}/{t}.parquet')"
        )
    return con


def _events_sensitive() -> list[str]:
    return sorted(
        n for n, sql in entry_mod.oracle_sql().items()
        if "events" in sql.lower()
    )


@pytest.mark.slow
@pytest.mark.parametrize("name", _events_sensitive())
def test_oracle_exact_on_hot_user_skew(ray_session, skew_dir, skew_con, name):
    got = _canon(_to_pandas(entry_mod.queries()[name](skew_dir)))
    exp = _canon(skew_con.sql(entry_mod.oracle_sql()[name]).df())
    assert list(got.columns) == list(exp.columns)
    assert len(got) == len(exp)
    for c in got.columns:
        a, b = got[c].to_numpy(), exp[c].to_numpy()
        if a.dtype.kind == "f" or b.dtype.kind == "f":
            assert np.array_equal(a, b, equal_nan=True), f"col {c} differs"
        elif len(a):
            assert (a == b).all(), f"col {c} differs"
