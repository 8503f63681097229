"""Every registered pipeline is TOTAL on the empty corpus: zero-row input
tables (exact driver schemas) → a result frame, never an exception.

Why this matters at 100 TB: a whole-empty corpus is the degenerate twin of
shapes production hits constantly — a filter gate that drops everything, a
date range matching nothing, an empty probe snapshot. A pipeline that
crashes here (schema-less dataset after an empty ``groupby().map_groups``,
``min()`` of an empty driver fold, footer statistics missing on a zero-row
file) crashes there too. The round-3 scale smokes caught the per-block
version (zero-column empty BLOCKS); this pins the whole-input version.

Contract: q(empty_dir) returns a DataFrame — possibly empty, possibly even
column-less (Ray Data's ``to_pandas`` drops columns on a zero-block dataset
even when the schema is known, so column-stable empties are not promised) —
but NEVER raises.
"""

import pandas as pd
import pyarrow.parquet as pq
import pytest

import __ray_entry__ as entry_mod
from tests.conftest import SF_DIR

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def empty_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("sf_empty")
    for t in TABLES:
        schema = pq.ParquetFile(f"{SF_DIR}/{t}.parquet").schema_arrow
        pq.write_table(schema.empty_table(), str(d / f"{t}.parquet"))
    return str(d)


def _to_pandas(result) -> pd.DataFrame:
    if isinstance(result, pd.DataFrame):
        return result
    return result.to_pandas()


ALL = sorted(entry_mod.queries().keys())

# model TRAINING on an empty corpus yields the zero-initialized model —
# dim+1 weight rows is the honest result, not fabrication
MAY_EMIT_ROWS = {
    "train_doc_classifier",
    # scalar aggregates (no GROUP BY): SQL returns exactly ONE row even
    # over the empty set, and the engines are aligned on the COALESCEd
    # zero default (pipelines/result.scalar_safe)
    "forecast_revenue_change",
    "brand_size_quantity_revenue",
    "small_qty_part_revenue",
}


@pytest.mark.parametrize("name", ALL)
def test_query_total_on_empty_corpus(ray_session, empty_dir, name):
    df = _to_pandas(entry_mod.queries()[name](empty_dir))
    assert df is not None
    if name not in MAY_EMIT_ROWS:
        assert len(df) == 0, f"{name} fabricated {len(df)} rows from nothing"


@pytest.fixture(scope="module")
def one_row_dir(tmp_path_factory):
    """One row per table (head of sf0.001 — FKs may dangle, which is the
    point: broadcast key lists go empty, kmeans has fewer seeds than k,
    ANN shortlists collapse)."""
    d = tmp_path_factory.mktemp("sf_one")
    for t in TABLES:
        tab = pq.read_table(f"{SF_DIR}/{t}.parquet")
        pq.write_table(tab.slice(0, 1), str(d / f"{t}.parquet"))
    return str(d)


@pytest.mark.parametrize("name", ALL)
def test_query_total_on_single_row_corpus(ray_session, one_row_dir, name):
    """The other degenerate boundary: n=1 with dangling FKs. Caught five
    real probe-side crashes on first run (searchsorted+clip against empty
    broadcast key lists indexing [-1], kmeans folds assuming k seeds,
    np.array of an empty embedding shortlist collapsing to 1-D)."""
    df = _to_pandas(entry_mod.queries()[name](one_row_dir))
    assert df is not None


@pytest.fixture(scope="module")
def null_dir(tmp_path_factory):
    """NULLs in the nullable string columns (text/lang/props). The driver
    generator never emits them, but real crawled parquet can; the loaders
    coalesce string nulls to '' at the read boundary (dedup._read_docs),
    which this sweep pins — before that fix, 39 pipelines crashed here.
    Totality only: oracle NULL semantics legitimately differ (SQL length(
    NULL) is NULL), so no value compare on this corpus."""
    import shutil

    import numpy as np

    d = tmp_path_factory.mktemp("sf_nulls")
    for t in TABLES:
        if t not in ("documents", "events"):
            shutil.copy(f"{SF_DIR}/{t}.parquet", str(d / f"{t}.parquet"))
    import pyarrow as pa

    docs = pq.read_table(f"{SF_DIR}/documents.parquet").to_pandas()
    ids = docs["doc_id"].to_numpy()
    docs.loc[ids % 20 == 5, "text"] = None
    docs.loc[ids % 20 == 10, "lang"] = None
    pq.write_table(
        pa.Table.from_pandas(docs, preserve_index=False),
        str(d / "documents.parquet"),
    )
    ev = pq.read_table(f"{SF_DIR}/events.parquet").to_pandas()
    ev.loc[ev["event_id"].to_numpy() % 20 == 5, "props"] = None
    pq.write_table(
        pa.Table.from_pandas(ev, preserve_index=False),
        str(d / "events.parquet"),
    )
    return str(d)


@pytest.mark.parametrize("name", ALL)
def test_query_total_on_null_bearing_corpus(ray_session, null_dir, name):
    df = _to_pandas(entry_mod.queries()[name](null_dir))
    assert df is not None
