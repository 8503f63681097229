"""Crawl-output pipelines: reference-parity reports and views over the
tables a crawl produces (categories / products / images).

These mirror the reference's post-crawl behaviors (SURVEY.md §2):

- ``products_per_category`` — A1: ``ProductList.GroupBy(CategoryId)`` count
  joined to category names (``ShiweijiaProduct.cs:61-66``), with the J2
  child→parent category self-join for the parent name.
- ``submit_view`` — the submit payload projection (``BaseSpider.SubmitProduct``
  payload build, ``ShiweijiaProduct.cs:392-434``): M9 HTML detail renderer +
  M10 attribute JSON reshaper, as a *view* over the products table (submit ==
  publish row, S10 sandbox semantics).
- ``images_phash_near_dups`` — near-dup images by perceptual-hash Hamming
  distance (the ``phash`` hook of the input schema; banding like SimHash).
- ``recrawl_priority`` — O1: staleness-ordered recrawl frontier (oldest
  ``last_crawled`` first → highest priority), the generalization of
  ``ShiweijiaProduct.cs:50``'s UpdateDate ordering.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd
from ray.data.aggregate import Count


def _read_round_tables(out_dir: str, table: str) -> pa.Table | None:
    from crawler_ray.sources.io import read_parts_table

    return read_parts_table(os.path.join(out_dir, "tables", table))


def load_entity_df(out_dir: str, table: str) -> pd.DataFrame:
    """Crawled entity records (JSON in ``record``) → typed DataFrame."""
    t = _read_round_tables(out_dir, table)
    if t is None:
        return pd.DataFrame()
    return pd.DataFrame([json.loads(r) for r in t["record"].to_pylist()])


def products_per_category(out_dir: str) -> pd.DataFrame:
    """A1 report: product count per category with category + parent names
    (two-hop broadcast join against the small category table)."""
    products = load_entity_df(out_dir, "products")
    categories = load_entity_df(out_dir, "categories")
    if products.empty or categories.empty:
        return pd.DataFrame(
            columns=["category_id", "category_name", "parent_name", "n_products"]
        )
    cats = categories.drop_duplicates("id").set_index("id")
    counts = (
        products.groupby("category_id", sort=True)
        .size()
        .reset_index(name="n_products")
    )
    counts["category_name"] = counts["category_id"].map(cats["category_name"])
    parent_of = cats["parent_id"].to_dict()
    counts["parent_name"] = counts["category_id"].map(
        lambda c: cats["category_name"].get(parent_of.get(c)) if parent_of.get(c) is not None else None
    )
    return counts[["category_id", "category_name", "parent_name", "n_products"]]


def render_detail_html(specifications: dict[str, str], detail_imgs: list[str]) -> str:
    """M9: specs dict + detail images → HTML fragment
    (``GetProductDetails``, ``ShiweijiaProduct.cs:435-461``)."""
    parts = [f"<p>{k}:{v}</p>" for k, v in sorted(specifications.items())]
    parts += [f'<img src="{u}"/>' for u in detail_imgs]
    return "".join(parts)


def reshape_attributes(specifications: dict[str, str]) -> list[dict[str, str]]:
    """M10: ``{k: v}`` → ``[{AttributeName, AttributeValue}]``, empties
    dropped (``GetProductAttributeJson``, ``ShiweijiaProduct.cs:473-491``)."""
    return [
        {"AttributeName": k, "AttributeValue": v}
        for k, v in sorted(specifications.items())
        if k and v
    ]


def submit_view(out_dir: str) -> pd.DataFrame:
    """S10 submit projection as a view over crawled products."""
    products = load_entity_df(out_dir, "products")
    if products.empty:
        return pd.DataFrame()
    return pd.DataFrame(
        {
            "product_code": products["product_code"],
            "name": products["name"],
            "brand_name": products["brand_name"],
            "category_id": products["category_id"],
            "sale_price": products["sale_price"],
            "detail_html": [
                render_detail_html(s or {}, d or [])
                for s, d in zip(products["specifications"], products["detail_imgs"])
            ],
            "attributes_json": [
                json.dumps(reshape_attributes(s or {}), ensure_ascii=False)
                for s in products["specifications"]
            ],
            "main_img": products["main_imgs"].map(lambda xs: xs[0] if xs else None),
        }
    )


def images_phash_near_dups(
    images: rd.Dataset, max_hamming: int = 6
) -> rd.Dataset:
    """Near-dup image pairs by phash Hamming distance ≤ ``max_hamming``.

    ADAPTIVE banding: the 64-bit phash splits into ``max_hamming + 1`` bands
    (pigeonhole: two hashes within distance d share at least one of d+1
    disjoint bands unchanged), so recall is GUARANTEED for the requested
    threshold — the round-1 fixed 4×16 split silently guaranteed only
    d ≤ 3 at the default d = 6. Narrower bands mean more spurious bucket
    collisions; the exact Hamming verify removes them."""
    from crawler_ray.functions.hashing import hamming64_batch

    n_bands = min(8, max(2, max_hamming + 1))
    # band bit-boundaries, as even as 64/n_bands allows
    widths = [64 // n_bands + (1 if i < 64 % n_bands else 0) for i in range(n_bands)]
    offsets = np.cumsum([0] + widths[:-1]).tolist()

    def explode(t: pa.Table) -> pa.Table:
        ph = t["phash"].to_numpy().astype(np.uint64)
        ids = t["image_id"].to_pylist()
        rows_b, rows_i, rows_p = [], [], []
        for q in range(n_bands):
            band_val = (ph >> np.uint64(offsets[q])) & np.uint64(
                (1 << widths[q]) - 1
            )
            rows_b.append(
                (np.int64(q) << np.int64(48)) | band_val.astype(np.int64)
            )
            rows_i.extend(ids)
            rows_p.append(ph.astype(np.int64))
        return pa.table(
            {
                "bucket": pa.array(np.concatenate(rows_b), pa.int64()),
                "image_id": pa.array(rows_i, pa.string()),
                "phash": pa.array(np.concatenate(rows_p), pa.int64()),
            }
        )

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates("image_id").sort_values("image_id")
        n = len(g)
        if n < 2:
            return pd.DataFrame(
                {"img_a": pd.Series([], dtype="str"),
                 "img_b": pd.Series([], dtype="str"),
                 "ph_a": pd.Series([], dtype="int64"),
                 "ph_b": pd.Series([], dtype="int64")}
            )
        a, b = np.triu_indices(n, k=1)
        ids = g["image_id"].to_numpy()
        ph = g["phash"].to_numpy()
        return pd.DataFrame(
            {"img_a": ids[a], "img_b": ids[b], "ph_a": ph[a], "ph_b": ph[b]}
        )

    def verify(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame(
                {"img_a": pd.Series([], dtype="str"),
                 "img_b": pd.Series([], dtype="str"),
                 "hamming": pd.Series([], dtype="int64")}
            )
        d = hamming64_batch(df["ph_a"].to_numpy(), df["ph_b"].to_numpy())
        out = df.assign(hamming=d.astype("int64"))
        out = out[out["hamming"] <= max_hamming]
        return out[["img_a", "img_b", "hamming"]].drop_duplicates(["img_a", "img_b"])

    return (
        images.select_columns(["image_id", "phash"])
        .map_batches(explode, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(bucket_pairs, batch_format="pandas")
        .map_batches(verify, batch_format="pandas")
        .groupby(["img_a", "img_b"])
        .map_groups(lambda g: g.head(1), batch_format="pandas")
    )


def recrawl_priority(
    urls: pd.DataFrame, now_epoch: float, half_life_sec: float = 86400.0
) -> pd.DataFrame:
    """O1 staleness priority: priority grows with time since last crawl
    (deterministic given an injected ``now_epoch`` — no wall clock)."""
    age = np.maximum(now_epoch - urls["last_crawled_epoch"].to_numpy(), 0.0)
    out = urls.copy()
    out["priority"] = age / half_life_sec
    return out.sort_values(
        ["priority", "url"], ascending=[False, True], kind="mergesort"
    ).reset_index(drop=True)
