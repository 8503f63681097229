"""Arrow schemas for every logical table (SURVEY.md §1.4, FIXTURES.md).

The ``IMAGES`` schema is the authoritative input/output shape from
/root/repo/BASELINE.json ``input_hint``:
``(image_id:string, bytes:binary, w:int32, h:int32, fmt:string,
caption:string, phash:int64)``.
"""

from __future__ import annotations

import pyarrow as pa

# primary output table — one row per crawled image (input_hint schema)
IMAGES = pa.schema(
    [
        ("image_id", pa.string()),  # md5 hex of bytes (BaseSpider.cs:275 keying)
        ("bytes", pa.binary()),
        ("w", pa.int32()),
        ("h", pa.int32()),
        ("fmt", pa.string()),  # png | jpeg | webp
        ("caption", pa.string()),
        ("phash", pa.int64()),
    ]
)

# crawl frontier — one row per URL queued for fetching
FRONTIER = pa.schema(
    [
        ("url", pa.string()),  # normalized absolute URL (the seen-set key)
        ("host", pa.string()),
        ("kind", pa.string()),  # category_tree | product_list | product_detail | image
        ("depth", pa.int32()),
        ("priority", pa.float64()),
        ("seed_id", pa.string()),
        ("caption", pa.string()),  # carried parse context for kind=image rows
    ]
)

# synthetic site graph — one row per fetchable URL (FIXTURES.md T2)
PAGES = pa.schema(
    [
        ("url", pa.string()),
        ("host", pa.string()),
        ("kind", pa.string()),
        ("payload", pa.binary()),  # JSON body for pages; encoded image for kind=image
        ("out_links", pa.list_(pa.string())),
        ("status", pa.int32()),
    ]
)

SEEDS = pa.schema(
    [
        ("url", pa.string()),
        ("seed_id", pa.string()),
        ("priority", pa.float64()),
    ]
)

# crawl record tables (reference entity model, SURVEY.md §1.1 — nested types
# first-class instead of the reference's JSON-string columns)
CATEGORIES = pa.schema(
    [
        ("id", pa.int64()),
        ("category_name", pa.string()),
        ("category_img", pa.string()),
        ("parent_id", pa.int64()),  # null for roots (adjacency list)
        ("host", pa.string()),
    ]
)

PRODUCTS = pa.schema(
    [
        ("id", pa.int64()),
        ("product_code", pa.string()),
        ("brand_id", pa.int64()),
        ("brand_name", pa.string()),
        ("category_id", pa.int64()),
        ("style", pa.string()),
        ("name", pa.string()),
        ("sale_price", pa.float64()),
        ("cost_price", pa.float64()),
        ("custom_price", pa.float64()),
        ("main_imgs", pa.list_(pa.string())),
        ("detail_imgs", pa.list_(pa.string())),
        ("specifications", pa.map_(pa.string(), pa.string())),
        ("host", pa.string()),
    ]
)

# fetch results / dead letters
FETCHED = pa.schema(
    list(FRONTIER)
    + [
        ("status", pa.int32()),
        ("payload", pa.binary()),
        ("attempt", pa.int32()),
    ]
)

METRICS = pa.schema(
    [
        ("round", pa.int32()),
        ("host", pa.string()),
        ("kind", pa.string()),
        ("pages", pa.int64()),
        ("errors", pa.int64()),
        ("bytes", pa.int64()),
    ]
)
