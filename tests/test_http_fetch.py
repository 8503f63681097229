"""Real-HTTP fetch path (VERDICT round-1 missing #1): a local ``http.server``
serves a tiny site speaking the reference's JSON envelope; the crawl runs with
``fetcher="http"`` (requests.Session per worker, redirects NOT followed
in-line) and must
  - traverse category tree → product lists → details over real sockets,
  - route a 301→302 redirect CHAIN through the frontier (each hop is a
    successor row passing robots + seen + quota — HttpResponse.cs:39-66
    semantics, Ray-Data-shaped),
  - retry + dead-letter a persistent 500,
  - land served PNG bytes bit-identically in the images table.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qsl, urlsplit

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from crawler_ray.functions.codecs import encode_png
from crawler_ray.functions.urls import normalize_url
from crawler_ray.pipelines.crawl import CrawlConfig, CrawlDriver, read_images_table


def _env(data) -> bytes:
    return json.dumps({"IsSuccess": True, "Data": data}).encode()


def _product(pid: int, base: str) -> bytes:
    return _env(
        {
            "ID": pid,
            "ProductCode": f"P{pid}",
            "BrandId": 7,
            "Brand": "acme",
            "CategoryId": 1,
            "Name": f"prod-{pid}",
            "SalePrice": 9.99,
            "BrandImg": f"{base}/img/brand_acme.png",
            "MainImgs": [f"{base}/img/p{pid}.png"],
            "DetailImgs": [],
            "Paras": [],
        }
    )


@pytest.fixture(scope="module")
def http_site(tmp_path_factory):
    pngs = {
        name: encode_png(
            (np.arange(12 * 12 * 3, dtype=np.uint8).reshape(12, 12, 3) + salt)
            % 255
        )
        for salt, name in enumerate(["cat1", "p112", "p12", "p13", "brand_acme"])
    }
    state = {"hits": [], "base": ""}

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def do_GET(self):
            base = state["base"]
            s = urlsplit(self.path)
            q = dict(parse_qsl(s.query))
            state["hits"].append(self.path)

            def send(code, body=b"", location=None, etag=None):
                self.send_response(code)
                if location:
                    self.send_header("Location", location)
                if etag:
                    self.send_header("ETag", etag)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            if s.path == "/api/GetCategoryTree":
                # served as UTF-16 with BOM: exercises the charset-sniffed
                # bytes→text parse boundary (FileHelper.cs:273-314 parity)
                body = _env([
                    {"ID": 1, "Name": "root", "Img": f"{base}/img/cat1.png",
                     "Subs": []},
                ]).decode("utf-8").encode("utf-16")
                send(200, body)
            elif s.path == "/api/QueryProductByPage":
                page = int(q.get("PageIndex", "1"))
                rows = {1: [{"ID": 11}, {"ID": 12}], 2: [{"ID": 13}, {"ID": 500}]}
                send(200, json.dumps({
                    "IsSuccess": True,
                    "Data": {"Rows": rows[page], "Total": 4, "PageSize": 2,
                             "PageIndex": page},
                }).encode())
            elif s.path == "/api/GetProductDetail":
                pid = q.get("ProductId", "")
                if pid == "11":  # redirect CHAIN: 11 --301--> 111 --302--> 112
                    send(301, location="/api/GetProductDetail?ProductId=111")
                elif pid == "111":
                    send(302, location=f"{base}/api/GetProductDetail?ProductId=112")
                elif pid == "500":
                    send(500)  # persistent server error -> dead letter
                elif pid in ("112", "12", "13"):
                    # validators on detail pages: the crawl's pages sink
                    # must capture them for the refresh manifest
                    send(200, _product(int(pid), base), etag=f'"detail-{pid}-v1"')
                else:
                    send(404)
            elif s.path.startswith("/img/"):
                name = s.path.split("/")[-1].removesuffix(".png")
                if name in pngs:
                    send(200, pngs[name])
                else:
                    send(404)
            else:
                send(404)

    server = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    port = server.server_address[1]
    state["base"] = f"http://127.0.0.1:{port}"
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()

    fix = tmp_path_factory.mktemp("http_site")
    pq.write_table(
        pa.table({
            "url": [f"{state['base']}/api/GetCategoryTree"],
            "priority": [1.0],
            "seed_id": ["s0"],
        }),
        str(fix / "seeds.parquet"),
    )
    (fix / "robots.json").write_text("{}")
    yield state, pngs, str(fix)
    server.shutdown()


def test_http_crawl_end_to_end(ray_session, http_site, tmp_path_factory):
    state, pngs, fix_dir = http_site
    out = tmp_path_factory.mktemp("http_out")
    drv = CrawlDriver(CrawlConfig(
        fixture_dir=fix_dir, out_dir=str(out), quota_per_host=50,
        fetch_concurrency=2, num_seen_shards=2, max_attempts=2,
        fetcher="http", http_opts={"timeout": 5.0},
    ))
    res = drv.run()
    base = state["base"]

    # redirect chain landed in the frontier: every hop is in the seen set
    # (checked via idempotent re-insertion) and the FINAL target's product
    # record was crawled
    seen_hops = drv.seen.check_and_insert([
        normalize_url(f"{base}/api/GetProductDetail?ProductId=111"),
        normalize_url(f"{base}/api/GetProductDetail?ProductId=112"),
    ])
    drv.shutdown()
    assert list(seen_hops) == [True, True]

    import os

    from crawler_ray.sources.io import read_parts_table

    prods = read_parts_table(
        os.path.join(str(out), "tables", "products")
    ).to_pylist()
    ids = sorted(json.loads(p["record"])["id"] for p in prods)
    assert ids == [12, 13, 112]  # 11 -> 111 -> 112 via the redirect chain

    # the redirect hops consumed real HTTP requests
    assert any("ProductId=11" in h for h in state["hits"])
    assert any("ProductId=111" in h for h in state["hits"])

    # persistent 500: retried max_attempts times then dead-lettered
    assert res.errors == 1
    err_root = os.path.join(str(out), "errors")
    errs = read_parts_table(err_root).to_pylist()
    assert len(errs) == 1 and errs[0]["status"] == 500 and errs[0]["attempt"] == 2
    n500 = sum("ProductId=500" in h for h in state["hits"])
    assert n500 == 2  # the retry budget was actually spent on the wire

    # served PNG bytes land bit-identically in the images table (incl. the
    # re-hosted brand image)
    imgs = read_images_table(str(out))
    assert imgs.num_rows == 5
    got = set(imgs["bytes"].to_pylist())
    assert got == set(pngs.values())

    # pages sink: every fetched 200 page row with its CAPTURED validators —
    # and the refresh manifest round-trips them (latest round per url)
    from crawler_ray.pipelines.revalidate import manifest_from_crawl
    from crawler_ray.sources.io import read_parts_table

    pages_rows = []
    proot = os.path.join(str(out), "tables", "pages")
    for rdir in sorted(os.listdir(proot)):
        t = read_parts_table(os.path.join(proot, rdir))
        if t is not None:
            pages_rows.extend(t.to_pylist())
    by_url = {r["url"]: r for r in pages_rows}
    for pid in ("112", "12", "13"):
        row = by_url[f"{base}/api/GetProductDetail?ProductId={pid}"]
        assert row["etag"] == f'"detail-{pid}-v1"'
    manifest = {r["url"]: r for r in manifest_from_crawl(str(out)).take_all()}
    assert len(manifest) == len(by_url)
    for pid in ("112", "12", "13"):
        assert (
            manifest[f"{base}/api/GetProductDetail?ProductId={pid}"]["etag"]
            == f'"detail-{pid}-v1"'
        )

    # brand lookup-or-insert: ONE brand row globally despite 3 products
    from crawler_ray.sources.io import read_parts_table as _rpt

    brands = _rpt(os.path.join(str(out), "tables", "brands")).to_pylist()
    assert len(brands) == 1
    brec = json.loads(brands[0]["record"])
    assert brec["brand_name"] == "acme"
    assert brec["brand_img"].endswith("/img/brand_acme.png")


def test_http_timeout_maps_to_599_with_retry_budget(ray_session):
    """A hanging server must surface as status 599 after spending the full
    retry budget on the wire — no exception, no infinite wait."""
    import threading
    import time as _time
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    hits = []

    class Slow(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def do_GET(self):
            hits.append(self.path)
            _time.sleep(3.0)  # longer than the client timeout
            self.send_response(200)
            self.send_header("Content-Length", "0")
            self.end_headers()

    srv = ThreadingHTTPServer(("127.0.0.1", 0), Slow)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    url = f"http://127.0.0.1:{srv.server_address[1]}/hang"

    from crawler_ray.stages.fetch import HttpFetchStage

    stage = HttpFetchStage(max_attempts=2, timeout=0.4)
    batch = pa.table({
        "url": [url], "host": ["127.0.0.1"], "kind": ["category_tree"],
        "depth": pa.array([0], pa.int32()), "priority": [1.0],
        "seed_id": ["s"], "caption": [""],
    })
    out = stage(batch)
    srv.shutdown()
    assert out["status"].to_pylist() == [599]
    assert out["attempt"].to_pylist() == [2]  # budget spent
    assert len(hits) == 2  # both attempts actually hit the socket
    assert out["redirect_url"].to_pylist() == [""]


@pytest.fixture(scope="module")
def http_post_site(tmp_path_factory):
    """A signed-POST API site (reference parity: every ShiweijiaProduct /
    ShiweijiaCategory fetch is a POST whose URL carries the signed query
    string — ShiweijiaProduct.cs:72-103,208-225, HttpClient.cs:36-136).
    GET on an /api/ path answers 405, so a passing crawl PROVES the POST
    path was used; a bad signature answers 403."""
    from crawler_ray.functions.signing import sign_request

    SECRET = "s3cr3t"
    pngs = {
        name: encode_png(
            (np.arange(8 * 8 * 3, dtype=np.uint8).reshape(8, 8, 3) + salt) % 255
        )
        for salt, name in enumerate(["p21", "p22", "p23", "p24", "brand_acme"])
    }
    state = {"hits": [], "base": "", "bad_sig": 0}

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def _send(self, code, body=b""):
            self.send_response(code)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            s = urlsplit(self.path)
            state["hits"].append(("GET", self.path))
            if s.path.startswith("/api/"):
                self._send(405)  # the reference API is POST-only
            elif s.path.startswith("/img/"):
                name = s.path.split("/")[-1].removesuffix(".png")
                self._send(200, pngs[name]) if name in pngs else self._send(404)
            else:
                self._send(404)

        def do_POST(self):
            base = state["base"]
            s = urlsplit(self.path)
            state["hits"].append(("POST", self.path))
            q = dict(parse_qsl(s.query))
            body = self.rfile.read(int(self.headers.get("Content-Length", 0)))
            nonce, t, sign = q.pop("nonce", ""), q.pop("t", "0"), q.pop("sign", "")
            if sign != sign_request(q, nonce, int(t), SECRET):
                state["bad_sig"] += 1
                return self._send(403)
            if json.loads(body or b"{}") != q:  # body mirrors signed params
                return self._send(400)
            if s.path == "/api/GetCategoryTree":
                self._send(200, _env([{"ID": 1, "Name": "root", "Img": "",
                                       "Subs": []}]))
            elif s.path == "/api/QueryProductByPage":
                page = int(q.get("PageIndex", "1"))
                rows = {1: [{"ID": 21}, {"ID": 22}], 2: [{"ID": 23}, {"ID": 24}]}
                self._send(200, json.dumps({
                    "IsSuccess": True,
                    "Data": {"Rows": rows[page], "Total": 4, "PageSize": 2,
                             "PageIndex": page},
                }).encode())
            elif s.path == "/api/GetProductDetail":
                self._send(200, _product(int(q["ProductId"]), base))
            else:
                self._send(404)

    server = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    state["base"] = f"http://127.0.0.1:{server.server_address[1]}"
    threading.Thread(target=server.serve_forever, daemon=True).start()

    fix = tmp_path_factory.mktemp("http_post_site")
    pq.write_table(
        pa.table({
            "url": [f"{state['base']}/api/GetCategoryTree"],
            "priority": [1.0],
            "seed_id": ["s0"],
        }),
        str(fix / "seeds.parquet"),
    )
    (fix / "robots.json").write_text("{}")
    yield state, pngs, str(fix), SECRET
    server.shutdown()


def test_http_signed_post_crawl_end_to_end(ray_session, http_post_site, tmp_path_factory):
    """Round-2 VERDICT #4: a POST-paginated signed API is crawled end-to-end
    through HttpFetchStage — frontier keeps logical GET-style URLs, the wire
    carries signed POSTs."""
    import os

    state, pngs, fix_dir, secret = http_post_site
    out = tmp_path_factory.mktemp("http_post_out")
    drv = CrawlDriver(CrawlConfig(
        fixture_dir=fix_dir, out_dir=str(out), quota_per_host=50,
        fetch_concurrency=2, num_seen_shards=2, max_attempts=2,
        fetcher="http",
        http_opts={
            "timeout": 5.0,
            "post": {"path_prefixes": ["/api/"], "mode": "json",
                     "secret": secret, "nonce": "n0nce",
                     "epoch_seconds": 1700000000.0},
        },
    ))
    res = drv.run()
    drv.shutdown()

    # all four products crawled across BOTH list pages (pagination over POST)
    from crawler_ray.sources.io import read_parts_table

    prods = read_parts_table(
        os.path.join(str(out), "tables", "products")
    ).to_pylist()
    ids = sorted(json.loads(p["record"])["id"] for p in prods)
    assert ids == [21, 22, 23, 24]

    # every /api request went over POST (no GETs on the API) and every
    # signature verified
    api_gets = [p for (m, p) in state["hits"] if m == "GET" and p.startswith("/api/")]
    assert api_gets == [] and state["bad_sig"] == 0
    assert any(m == "POST" and "PageIndex=2" in p for (m, p) in state["hits"])

    # image bytes (plain GET path) land bit-identically
    imgs = read_images_table(str(out))
    assert set(imgs["bytes"].to_pylist()) >= set(pngs.values())
    assert res.errors == 0


def test_post_body_wire_shape_form_and_multipart():
    """Raw body bytes for the form and multipart POST modes, captured off
    the wire. Form mode reproduces BaseSpider.cs:296 exactly: pairs joined
    with '&', the KEY verbatim, only the VALUE through ToUrlEncode
    (EscapeDataString: space → %20, uppercase hex) — NOT quote_plus form
    encoding of both halves."""
    from crawler_ray.stages.fetch import HttpFetchStage

    captured = {}

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def do_POST(self):
            body = self.rfile.read(int(self.headers.get("Content-Length", 0)))
            captured["body"] = body
            captured["ctype"] = self.headers.get("Content-Type", "")
            self.send_response(200)
            self.send_header("Content-Length", "2")
            self.end_headers()
            self.wfile.write(b"{}")

    server = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    base = f"http://127.0.0.1:{server.server_address[1]}"
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        url = f"{base}/api/Q?a b=x y&plain=ok"
        cfg = {"path_prefixes": ["/api/"], "mode": "form", "secret": "s",
               "nonce": "n", "epoch_seconds": 1700000000.0}
        stage = HttpFetchStage(post=dict(cfg))
        stage._issue(url)
        # key 'a b' verbatim, value 'x y' -> 'x%20y'; params sorted
        assert captured["body"] == b"a b=x%20y&plain=ok"
        assert captured["ctype"] == "application/x-www-form-urlencoded"

        stage = HttpFetchStage(post=dict(cfg, mode="multipart"))
        stage._issue(url)
        assert captured["ctype"].startswith("multipart/form-data; boundary=")
        assert b'name="a b"' in captured["body"]
        assert b"x y" in captured["body"]  # multipart values go raw
    finally:
        server.shutdown()


def test_retry_after_honored_and_host_throttled(ray_session):
    """A 429 with ``Retry-After: 0`` is retried in-place inside the attempt
    budget (second hit succeeds), the host's politeness bucket goes into
    DEBT for the advertised wait (subsequent grants blocked until the
    clock advances past it), and a 429 whose wait exceeds the cap
    surfaces as status 429 without burning the budget spinning."""
    import threading
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    import pyarrow as pa
    import ray

    from crawler_ray.stages.fetch import HttpFetchStage, _parse_retry_after
    from crawler_ray.state.politeness import PolitenessActor

    hits = {"flaky": 0, "slow": 0}

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def do_GET(self):
            def send(code, body=b"", retry_after=None):
                self.send_response(code)
                if retry_after is not None:
                    self.send_header("Retry-After", retry_after)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            if self.path == "/flaky":
                hits["flaky"] += 1
                if hits["flaky"] == 1:
                    send(429, retry_after="0")  # rate-limited once
                else:
                    send(200, b"recovered")
            elif self.path == "/slow":
                hits["slow"] += 1
                send(429, retry_after="3600")  # way past the cap
            else:
                send(404)

    server = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    base = f"http://127.0.0.1:{server.server_address[1]}"
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        actor = PolitenessActor.remote(rate=10.0, burst=50.0)
        stage = HttpFetchStage(
            politeness=[actor], max_attempts=3, timeout=5.0
        )
        out = stage(pa.table({
            "url": [f"{base}/flaky", f"{base}/slow"],
            "host": ["127.0.0.1", "127.0.0.1"],
        }))
        rows = {u.rsplit("/", 1)[1]: r for u, r in
                zip(out["url"].to_pylist(), out.to_pylist())}
        # short wait: retried in place, recovered on attempt 2
        assert rows["flaky"]["status"] == 200
        assert rows["flaky"]["attempt"] == 2
        assert rows["flaky"]["payload"] == b"recovered"
        assert hits["flaky"] == 2
        # long wait: surfaced immediately, budget NOT spent spinning
        assert rows["slow"]["status"] == 429 and rows["slow"]["attempt"] == 1
        assert hits["slow"] == 1
        # the host bucket is in debt for the 3600 s wait: zero grants now,
        # and still zero after a short virtual advance
        assert ray.get(actor.grant.remote("127.0.0.1", 5)) == 0
        ray.get(actor.advance_clock.remote(60.0))
        assert ray.get(actor.grant.remote("127.0.0.1", 5)) == 0
        ray.get(actor.advance_clock.remote(3600.0))
        assert ray.get(actor.grant.remote("127.0.0.1", 5)) == 5
        ray.kill(actor)
    finally:
        server.shutdown()

    # header parsing: delta-seconds only; HTTP-date degrades to None
    assert _parse_retry_after("120") == 120.0
    assert _parse_retry_after("0") == 0.0
    assert _parse_retry_after("Wed, 21 Oct 2026 07:28:00 GMT") is None
    assert _parse_retry_after("") is None
