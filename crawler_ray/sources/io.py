"""Table IO: Lance-or-parquet datasets, local binary-file ingestion.

The north rule targets **Lance** tables for the image+caption output. This
container has no ``lance``/``pylance`` wheel, so the Lance path is gated
behind an import-try with parquet fallback — the call sites and layouts are
identical, and flipping to Lance on a real cluster is this module only.

``read_local_images`` is the reference's local-file image source (S5:
``UploadImgsByFile``/``GetImgStr``/``FileHelper.GetAllFiles``,
``BaseSpider.cs:251-261``, ``ShiweijiaProduct.cs:462-472``) re-expressed as
``ray.data.read_binary_files``.
"""

from __future__ import annotations

import pyarrow as pa
import ray.data as rd

try:  # pragma: no cover - not installed in this sandbox
    import lance  # noqa: F401

    HAVE_LANCE = True
except ImportError:
    HAVE_LANCE = False


def write_table(ds: rd.Dataset, uri: str, **kwargs) -> None:
    """Write a Dataset as Lance when available, parquet otherwise."""
    if HAVE_LANCE and hasattr(ds, "write_lance"):
        ds.write_lance(uri, **kwargs)  # pragma: no cover
    else:
        ds.write_parquet(uri, **kwargs)


def read_table(uri: str, columns: list[str] | None = None) -> rd.Dataset:
    """Read a Lance dataset when available (and the uri is Lance), else
    parquet. Column pruning pushed down either way."""
    if HAVE_LANCE and uri.endswith(".lance"):
        return rd.read_lance(uri, columns=columns)  # pragma: no cover
    return rd.read_parquet(uri, columns=columns)


def write_part(table: pa.Table, root: str, stem: str) -> str:
    """ONE deterministically-named part of a table directory — the unit every
    crawl sink writes (images, entities, errors, frontier). Lance fragment
    append when ``lance`` is available (the north-rule table format for the
    image+caption output); a parquet part file otherwise. Layout and
    resumability semantics are identical either way: the content-derived
    ``stem`` makes task retries idempotent. Returns the path written."""
    import os

    os.makedirs(root, exist_ok=True)
    if HAVE_LANCE:  # pragma: no cover - exercised via the mocked contract test
        import lance as _lance

        uri = os.path.join(root, "data.lance")
        _lance.write_dataset(table, uri, mode="append")
        return uri
    import pyarrow.parquet as pq

    # no dictionary encoding / compression: payloads are already-compressed
    # image bytes; pyarrow's dictionary encoding of large binary values
    # costs seconds per part file
    path = os.path.join(root, f"part-{stem}.parquet")
    pq.write_table(table, path, compression="none", use_dictionary=False)
    return path


def read_local_images(root: str) -> rd.Dataset:
    """Local image tree → (path, bytes, fmt) rows (S5). Decode/hash happens
    in the normal image stage downstream."""
    from crawler_ray.functions.mime import normalize_fmt

    ds = rd.read_binary_files(root, include_paths=True)

    def project(t: pa.Table) -> pa.Table:
        paths = t["path"].to_pylist()
        return pa.table(
            {
                "path": pa.array(paths, pa.string()),
                "bytes": t["bytes"],
                "fmt": pa.array([normalize_fmt(p) for p in paths], pa.string()),
            }
        )

    return ds.map_batches(project, batch_format="pyarrow")
