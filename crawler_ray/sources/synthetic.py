"""Deterministic synthetic site graph — the pure-function stand-in for HTTP.

FIXTURES.md T2: one row per fetchable URL; payloads are JSON bodies shaped like
the reference API (category tree = nested ``Data[].Subs[]``; product list =
``{Data:{Rows:[{ID}...], PageIndex, Total}}`` with page-size pagination —
``ShiweijiaProduct.cs:105-127``; detail = wide product JSON —
``ShiweijiaProduct.cs:226-265``); image URLs serve deterministically generated
encoded image bytes. Everything derives from ``(spec, seed)`` — no wall clock,
no network — so golden outputs are bit-stable across runs and parallelism
levels (north-rule reproducibility).

Ground-truth companions (expected seen-set, expected images table) are computed
at generation time for the crawl tests.
"""

from __future__ import annotations

import hashlib
import json
import math
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa

from crawler_ray import schemas
from crawler_ray.functions.codecs import encode_image
from crawler_ray.functions.hashing import md5_hex, phash64

_BRANDS = ["凤凰", "Acme", "Nordia", "蓝天", "Vela"]
_STYLES = ["modern", "古典", "minimal", "rustic"]
_CATS = ["sofa", "桌子", "lamp", "chair", "柜子", "bed"]


@dataclass(frozen=True)
class SiteSpec:
    """Scale knobs (FIXTURES.md §'Scale knobs')."""

    n_hosts: int = 6
    products_per_host: int = 30  # mean; Zipf-skewed across hosts
    categories_per_host: int = 6  # tree nodes per host (1 root + children)
    page_size: int = 10  # product-list pagination quantum
    imgs_per_product: int = 2
    dup_image_frac: float = 0.25  # fraction of image links pointing at shared content
    error_frac: float = 0.05  # fraction of detail pages served as 500
    robots_frac: float = 0.15  # fraction of image URLs under a disallowed path
    zipf_s: float = 1.1
    seed: int = 42
    img_sizes: tuple[int, ...] = (16, 32)


def _rng_for(spec_seed: int, *parts) -> np.random.Generator:
    key = hashlib.blake2b(
        ("|".join(str(p) for p in parts)).encode(), digest_size=8,
        key=spec_seed.to_bytes(8, "big", signed=False),
    ).digest()
    return np.random.Generator(np.random.PCG64(int.from_bytes(key, "big")))


def make_pixels(content_id: str, w: int, h: int, seed: int) -> np.ndarray:
    """Deterministic RGB image: smooth gradient + seeded noise (so lossy
    round-trips are non-trivial but PSNR-comparable). Narrow dtypes
    throughout — wide intermediates made the synth memory-bandwidth-bound
    when many fetch actors run per node."""
    rng = _rng_for(seed, "px", content_id)
    xx = np.arange(w, dtype=np.int32)
    yy = np.arange(h, dtype=np.int32)
    base = np.empty((h, w, 3), dtype=np.int16)
    base[..., 0] = (xx * 255 // max(w - 1, 1)).astype(np.int16)[None, :]
    base[..., 1] = (yy * 255 // max(h - 1, 1)).astype(np.int16)[:, None]
    base[..., 2] = ((xx[None, :] + yy[:, None]) * 255 // max(w + h - 2, 1)).astype(
        np.int16
    )
    noise = rng.integers(-20, 21, size=(h, w, 3), dtype=np.int16)
    base += noise
    return np.clip(base, 0, 255, out=base).astype(np.uint8)


def image_meta_for(
    seed: int,
    host: str,
    content_id: str,
    img_sizes: tuple[int, ...],
    robots_frac: float,
) -> dict:
    """Deterministic (fmt, w, h, blocked) for an image content id on a host —
    shared by the generator AND the on-demand synthetic fetcher so image
    payloads can be re-synthesized from the URL alone (no payload index)."""
    r = _rng_for(seed, "img", host, content_id)
    fmt = ["png", "jpeg", "webp"][int(r.integers(3))]
    w = int(img_sizes[int(r.integers(len(img_sizes)))])
    h = int(img_sizes[int(r.integers(len(img_sizes)))])
    blocked = float(r.random()) < robots_frac
    return {"fmt": fmt, "w": w, "h": h, "blocked": blocked}


def synthesize_image_payload(
    seed: int, host: str, content_id: str, img_sizes: tuple[int, ...],
    robots_frac: float,
) -> bytes:
    """Encoded image bytes as a pure function of (seed, host, content_id)."""
    m = image_meta_for(seed, host, content_id, img_sizes, robots_frac)
    px = make_pixels(content_id, m["w"], m["h"], seed)
    return encode_image(px, m["fmt"])


def parse_image_url(url: str) -> tuple[str, str] | None:
    """('https://h/img/<cid>.<fmt>' | '.../private/...') → (host, content_id);
    None when the URL is not a synthetic image URL."""
    parts = url.split("/")
    if len(parts) == 5 and parts[3] in ("img", "private"):
        return parts[2], parts[4].rsplit(".", 1)[0]
    return None


@dataclass
class Site:
    pages: pa.Table
    seeds: pa.Table
    robots: dict[str, list[str]]  # host -> disallowed path prefixes
    expected_seen: set[str] = field(default_factory=set)  # reachable, robots-allowed
    expected_images: pa.Table | None = None  # ground-truth images table (deduped)


def _caption(content_id: str, seed: int) -> str:
    rng = _rng_for(seed, "cap", content_id)
    return (
        f"{_BRANDS[rng.integers(len(_BRANDS))]} "
        f"{_CATS[rng.integers(len(_CATS))]} "
        f"{_STYLES[rng.integers(len(_STYLES))]} #{int(rng.integers(1000))}"
    )


def generate_site(spec: SiteSpec) -> Site:
    """Build the full synthetic site graph + ground truth. Pure function of spec."""
    pages: dict[str, dict] = {}
    seeds = []
    robots: dict[str, list[str]] = {}
    image_meta: dict[str, dict] = {}  # url -> {content_id, fmt, w, h, caption, blocked}

    # Zipf-skewed products per host (hot-host skew, FIXTURES.md T2)
    weights = np.array([1.0 / (i + 1) ** spec.zipf_s for i in range(spec.n_hosts)])
    weights = weights / weights.sum() * spec.products_per_host * spec.n_hosts
    rng_global = _rng_for(spec.seed, "global")

    def add_image_link(host: str, content_id: str, blocked_ok: bool) -> str:
        """Register (or reuse) an image URL for a content id on a host."""
        m = image_meta_for(
            spec.seed, host, content_id, spec.img_sizes, spec.robots_frac
        )
        blocked = blocked_ok and m["blocked"]
        prefix = "private" if blocked else "img"
        url = f"https://{host}/{prefix}/{content_id}.{m['fmt']}"
        if url not in image_meta:
            image_meta[url] = {
                "content_id": content_id,
                "fmt": m["fmt"],
                "w": m["w"],
                "h": m["h"],
                "caption": _caption(content_id, spec.seed),
                "blocked": blocked,
            }
        return url

    next_pid = 1000
    for hi in range(spec.n_hosts):
        host = f"shop{hi}.example.com"
        robots[host] = ["/private/"]
        n_products = max(3, int(round(weights[hi])))
        n_cats = spec.categories_per_host

        # --- category tree (1 root, n_cats-1 leaves), EP2 semantics
        root_id = hi * 1000 + 1
        leaf_ids = [root_id + 1 + j for j in range(n_cats - 1)]
        cat_img_urls = {}
        for cid in [root_id] + leaf_ids:
            cat_img_urls[cid] = add_image_link(host, f"cat{cid}", blocked_ok=True)
        subs = [
            {
                "ID": cid,
                "Name": f"{_CATS[j % len(_CATS)]}-{cid}",
                "Img": cat_img_urls[cid],
                "ImgCaption": image_meta[cat_img_urls[cid]]["caption"],
                "Subs": [],
            }
            for j, cid in enumerate(leaf_ids)
        ]
        tree = [
            {
                "ID": root_id,
                "Name": f"root-{root_id}",
                "Img": cat_img_urls[root_id],
                "ImgCaption": image_meta[cat_img_urls[root_id]]["caption"],
                "Subs": subs,
            }
        ]
        cat_url = f"https://{host}/api/GetAllCategories"

        # --- products assigned round-robin to leaves
        prods_by_leaf: dict[int, list[int]] = {c: [] for c in leaf_ids}
        product_info: dict[int, dict] = {}
        for k in range(n_products):
            pid = next_pid
            next_pid += 1
            leaf = leaf_ids[k % len(leaf_ids)]
            prods_by_leaf[leaf].append(pid)
            r = _rng_for(spec.seed, "prod", pid)
            img_urls = []
            for ii in range(spec.imgs_per_product):
                if float(r.random()) < spec.dup_image_frac:
                    content = f"shared{int(r.integers(20))}"  # shared across products
                else:
                    content = f"p{pid}_{ii}"
                img_urls.append(add_image_link(host, content, blocked_ok=True))
            product_info[pid] = {
                "ID": pid,
                "ProductCode": f"P{pid:06d}",
                "BrandId": int(r.integers(len(_BRANDS))),
                "Brand": _BRANDS[int(r.integers(len(_BRANDS)))],
                "Name": f"prod-{pid}",
                "Pattern": _STYLES[int(r.integers(len(_STYLES)))],
                "SalePrice": round(float(r.uniform(10, 5000)), 2),
                "CostPrice": round(float(r.uniform(10, 5000)), 2),
                "CustomPrice": round(float(r.uniform(10, 5000)), 2),
                "CategoryId": leaf,
                "MainImgs": img_urls[:1],
                "DetailImgs": img_urls[1:],
                "ImgCaptions": {u: image_meta[u]["caption"] for u in img_urls},
                "Paras": [
                    {
                        "Paras": [
                            {"Name": "材质", "ParameterValue": _STYLES[int(r.integers(len(_STYLES)))]},
                            {"Name": "color", "ParameterValue": ""},  # dropped by M5
                        ]
                    }
                ],
                "_error": float(r.random()) < spec.error_frac,
            }

        # --- category tree page
        cat_out = [
            f"https://{host}/api/QueryProductByPage?Category={c}&PageIndex=1"
            for c in leaf_ids
        ] + [cat_img_urls[c] for c in [root_id] + leaf_ids]
        pages[cat_url] = {
            "url": cat_url,
            "host": host,
            "kind": "category_tree",
            "payload": json.dumps({"IsSuccess": True, "Data": tree}).encode(),
            "out_links": cat_out,
            "status": 200,
        }
        seeds.append(
            {"url": cat_url, "seed_id": f"seed-{hi}", "priority": float(spec.n_hosts - hi)}
        )

        # --- product list pages (paginated, M3/A2 semantics)
        for leaf, pids in prods_by_leaf.items():
            total = len(pids)
            n_pages = max(1, math.ceil(total / spec.page_size))
            for pg in range(1, n_pages + 1):
                url = f"https://{host}/api/QueryProductByPage?Category={leaf}&PageIndex={pg}"
                chunk = pids[(pg - 1) * spec.page_size : pg * spec.page_size]
                out = [
                    f"https://{host}/api/GetProductDetail?ProductId={p}" for p in chunk
                ]
                if pg < n_pages:
                    out.append(
                        f"https://{host}/api/QueryProductByPage?Category={leaf}&PageIndex={pg + 1}"
                    )
                pages[url] = {
                    "url": url,
                    "host": host,
                    "kind": "product_list",
                    "payload": json.dumps(
                        {
                            "IsSuccess": True,
                            "Data": {
                                "Rows": [{"ID": p} for p in chunk],
                                "PageIndex": pg,
                                "Total": total,
                                "PageSize": spec.page_size,
                            },
                        }
                    ).encode(),
                    "out_links": out,
                    "status": 200,
                }

        # --- product detail pages
        for pid, info in product_info.items():
            url = f"https://{host}/api/GetProductDetail?ProductId={pid}"
            err = info.pop("_error")
            out = info["MainImgs"] + info["DetailImgs"]
            pages[url] = {
                "url": url,
                "host": host,
                "kind": "product_detail",
                "payload": (
                    b"server error"
                    if err
                    else json.dumps({"IsSuccess": True, "Data": info}).encode()
                ),
                "out_links": [] if err else out,
                "status": 500 if err else 200,
            }

    # --- image pages (encode content once per (host, content, fmt, size))
    encoded_cache: dict[str, bytes] = {}
    for url, meta in image_meta.items():
        key = f"{meta['content_id']}|{meta['fmt']}|{meta['w']}x{meta['h']}"
        if key not in encoded_cache:
            px = make_pixels(meta["content_id"], meta["w"], meta["h"], spec.seed)
            encoded_cache[key] = encode_image(px, meta["fmt"])
        pages[url] = {
            "url": url,
            "host": url.split("/")[2],
            "kind": "image",
            "payload": encoded_cache[key],
            "out_links": [],
            "status": 200,
        }

    # --- ground truth: BFS reachability from seeds, robots-filtered
    blocked = {u for u, m in image_meta.items() if m["blocked"]}
    expected_seen: set[str] = set()
    frontier = [s["url"] for s in seeds]
    while frontier:
        nxt = []
        for u in frontier:
            if u in expected_seen or u in blocked:
                continue
            expected_seen.add(u)
            if u in pages and pages[u]["status"] == 200:
                nxt.extend(pages[u]["out_links"])
        frontier = nxt

    # ground-truth images table: reachable, allowed image URLs, deduped by bytes
    img_rows: dict[str, dict] = {}
    for url in sorted(expected_seen):
        m = image_meta.get(url)
        if m is None or url in blocked:
            continue
        data = pages[url]["payload"]
        iid = md5_hex(data)
        if iid not in img_rows:
            # phash is over the *decoded* pixels (input_hint: the hash a
            # consumer of the table can recompute from `bytes`)
            from crawler_ray.functions.codecs import decode_image

            px = decode_image(data, m["fmt"])
            img_rows[iid] = {
                "image_id": iid,
                "bytes": data,
                "w": m["w"],
                "h": m["h"],
                "fmt": m["fmt"],
                "caption": m["caption"],
                "phash": phash64(px),
            }
    expected_images = pa.Table.from_pylist(
        sorted(img_rows.values(), key=lambda r: r["image_id"]), schema=schemas.IMAGES
    )

    pages_table = pa.Table.from_pylist(list(pages.values()), schema=schemas.PAGES)
    seeds_table = pa.Table.from_pylist(seeds, schema=schemas.SEEDS)
    return Site(
        pages=pages_table,
        seeds=seeds_table,
        robots=robots,
        expected_seen=expected_seen,
        expected_images=expected_images,
    )


def generate_image_frontier(
    n_images: int,
    n_hosts: int = 32,
    dup_frac: float = 0.15,
    seed: int = 42,
    img_sizes: tuple[int, ...] = (32,),
) -> pa.Table:
    """Breadth-only frontier of image URLs (schemas.SEEDS + kind/caption) for
    the image-ingest throughput benchmark: payloads are synthesized on demand
    by the fetch stage (no fixture payloads — the site is a pure function).
    Zipf-ish host skew via round-robin over hosts with hot-host doubling."""
    rng = _rng_for(seed, "frontier")
    rows = []
    for i in range(n_images):
        host = f"shop{int(rng.zipf(1.3)) % n_hosts}.example.com"
        if float(rng.random()) < dup_frac:
            cid = f"dup{int(rng.integers(max(16, n_images // 50)))}"
        else:
            cid = f"img{i}"
        m = image_meta_for(seed, host, cid, img_sizes, robots_frac=0.0)
        rows.append(
            {
                "url": f"https://{host}/img/{cid}.{m['fmt']}",
                "seed_id": f"s{i % 64}",
                "priority": 1.0,
            }
        )
    return pa.Table.from_pylist(rows, schema=schemas.SEEDS)


def write_site(site: Site, out_dir: str) -> None:
    """Persist the fixture for multi-process use (bench, resume tests)."""
    import os

    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    pq.write_table(site.pages, f"{out_dir}/pages.parquet")
    pq.write_table(site.seeds, f"{out_dir}/seeds.parquet")
    with open(f"{out_dir}/robots.json", "w") as f:
        json.dump(site.robots, f)
    with open(f"{out_dir}/expected_seen.json", "w") as f:
        json.dump(sorted(site.expected_seen), f)
    if site.expected_images is not None:
        pq.write_table(site.expected_images, f"{out_dir}/expected_images.parquet")


def planted_image_batch(
    ids,
    seed: int = 42,
    *,
    dup: bool = False,
    mismatch: bool = False,
    lowq: bool = False,
    watermark: bool = False,
    orbit: bool = False,
    crop: bool = False,
    w: int = 32,
    h: int = 32,
) -> tuple[list[bytes], list[str]]:
    """Shared planted-failure image generator for the image-suite pipelines
    (one encoded PNG + caption per integer id) — the single source of truth
    for the id % 10 planting rules the planted-truth tests assert against:

    - ``dup``:      % 10 == 1 reuses the neighbor's content verbatim;
                    % 10 == 6 is a perturbed copy (rows 1+ only, so the
                    watermark row survives; phash lands within Hamming ≤ 2)
    - ``mismatch``: % 10 == 7 carries its NEIGHBOR's caption (misaligned)
    - ``lowq``:     % 10 == 3 is near-uniform, below the pixel quality gates
    - ``orbit``:    % 10 == 4 is the neighbor's content ROTATED 90° (exact
                    under a dihedral transform, ~32 bits away in plain
                    phash); % 10 == 9 is the neighbor's content MIRRORED
                    + perturbed (orbit-near)
    - ``crop``:     % 10 == 2 is the neighbor's TOP-LEFT quadrant verbatim
                    (its full phash equals the neighbor's q0 quadrant
                    phash exactly); % 10 == 5 is the neighbor's
                    BOTTOM-RIGHT quadrant perturbed (quadrant-near)
    - ``watermark``: row 0 carries md5(true caption) so the declared-fake
      CLIP image tower can read the signature back from decoded pixels

    Returns (bytes_list, caption_list)."""
    import hashlib

    from crawler_ray.functions.codecs import encode_image

    out_b: list[bytes] = []
    out_c: list[str] = []
    for d in ids:
        d = int(d)
        base = d - 1 if (
            (dup and d % 10 in (1, 6)) or (orbit and d % 10 in (4, 9))
            or (crop and d % 10 in (2, 5))
        ) else d
        cid = f"img{base}"
        true_cap = _caption(cid, seed)
        px = make_pixels(cid, w, h, seed).copy()
        if lowq and d % 10 == 3:
            px[1:] = 128
        if dup and d % 10 == 6:
            px[1::7, ::5] ^= 3
        if orbit and d % 10 == 4:
            px = np.rot90(px).copy()
        if orbit and d % 10 == 9:
            px = np.fliplr(px).copy()
            px[1::7, ::5] ^= 3
        if crop and d % 10 == 2:
            px = px[: px.shape[0] // 2, : px.shape[1] // 2].copy()
        if crop and d % 10 == 5:
            px = px[px.shape[0] // 2:, px.shape[1] // 2:].copy()
            px[1::7, ::5] ^= 3
        if watermark:
            px[0, :16, 0] = np.frombuffer(
                hashlib.md5(true_cap.encode("utf-8")).digest(), np.uint8
            )
        out_b.append(encode_image(px, "png"))
        out_c.append(
            _caption(f"img{d + 1}", seed)
            if mismatch and d % 10 == 7 else true_cap
        )
    return out_b, out_c


# --- 50k-scale planted-truth document corpus -------------------------------
#
# Shared by tests/test_scale_smoke.py (closed-form truth assertions) and
# bench.py's --scaling query bar (a corpus big enough that the heavy
# pipelines' compute dominates per-query fixed overheads — at sf0.1's 6k
# docs the suite finishes in seconds and measures Ray setup, not scaling).

SCALE_N_DOCS = 50_000
SCALE_BLOCK = 100  # plant layout repeats every SCALE_BLOCK doc_ids
SCALE_TRIPLE_EVERY = 50  # every 50th block plants a size-3 exact cluster

# offsets within each 100-id block (all distinct):
SCALE_OFF_EXACT = 1  # b+1 = verbatim copy of b+0
SCALE_OFF_TRIPLE = 2  # b+2 = verbatim copy of b+0, only in triple blocks
SCALE_OFF_NEAR_DONOR = 5
SCALE_OFF_NEAR = 6  # b+6 = b+5 minus one token (J >= 35/36)
SCALE_OFF_LANG = 11  # Spanish marker doc -> reason 'lang'
SCALE_OFF_QUALITY = 21  # short + punct-heavy -> reason 'quality'
SCALE_OFF_REP = 31  # one token repeated 60x -> reason 'repetition'

_SCALE_EN_MARKERS = ["the", "and", "of", "to"]  # subset of _LANG_MARKERS['en']
_SCALE_ES_MARKERS = ["el", "que", "y", "los", "del", "se", "las"]  # es-only


def gen_scale_corpus(out_dir: str, n_docs: int = SCALE_N_DOCS) -> None:
    """Deterministic n_docs-doc documents.parquet with the plant layout above.

    Normal docs: 30..58 distinct vocab words + 4 en-marker words + 2 salts,
    emitted as two independent permutations (length 2m: dup_frac = 0.5 < 0.6
    and no dominant bigram, so the repetition gate passes; n_tokens >= 72 and
    stopword ratio >= 0.0625 keep quality >= 0.77). The per-doc salt tokens
    make the near-dup truth CLOSED-FORM: cross-plant word-Jaccard <= 0.94,
    within-plant exact copies J = 1 and near copies J >= 35/36, so the only
    pairs >= 0.95 are exactly the planted ones."""
    import pyarrow.parquet as pq

    rng = np.random.default_rng(987654321)
    vocab = np.array([f"tok{i:03d}" for i in range(970)], dtype=object)
    texts: list[str] = [""] * n_docs

    def normal_text(i: int) -> str:
        k = int(rng.integers(30, 59))
        words = list(vocab[rng.permutation(970)[:k]])
        words += _SCALE_EN_MARKERS + [f"zq{i}a", f"zq{i}b"]
        w = np.array(words, dtype=object)
        seq = list(w[rng.permutation(len(w))]) + list(w[rng.permutation(len(w))])
        return " ".join(seq)

    for i in range(n_docs):
        off = i % SCALE_BLOCK
        if off == SCALE_OFF_EXACT:
            texts[i] = texts[i - 1]
        elif off == SCALE_OFF_TRIPLE and (i // SCALE_BLOCK) % SCALE_TRIPLE_EVERY == 0:
            texts[i] = texts[i - 2]
        elif off == SCALE_OFF_NEAR:
            donor = texts[i - 1].split()
            victim = next(t for t in donor if t.startswith("tok"))
            texts[i] = " ".join(t for t in donor if t != victim)
        elif off == SCALE_OFF_LANG:
            w = np.array(_SCALE_ES_MARKERS + [f"zq{i}a", f"zq{i}b"], dtype=object)
            seq = list(w[rng.permutation(9)]) + list(w[rng.permutation(9)][:11])
            texts[i] = " ".join(seq)
        elif off == SCALE_OFF_QUALITY:
            texts[i] = f"the zq{i}a zq{i}b " + "!" * 22
        elif off == SCALE_OFF_REP:
            texts[i] = " ".join(["rep"] * 60 + ["the", f"zq{i}a", f"zq{i}b"])
        else:
            texts[i] = normal_text(i)

    t_arr = pa.array(texts, pa.string())
    table = pa.table(
        {
            "doc_id": pa.array(np.arange(n_docs, dtype=np.int64), pa.int64()),
            "text": t_arr,
            "lang": pa.array(["en"] * n_docs, pa.string()),
            "source": pa.array(["smoke"] * n_docs, pa.string()),
            "n_chars": pa.compute.utf8_length(t_arr).cast(pa.int64()),
        }
    )
    pq.write_table(table, f"{out_dir}/documents.parquet", row_group_size=25_000)
