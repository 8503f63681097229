"""Sitemap discovery: parser units + a LIVE http.server wire test (robots
``Sitemap:`` line → gzipped sitemapindex → urlset leaves → frontier rows)."""

from __future__ import annotations

import gzip
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from crawler_ray.schemas import FRONTIER
from crawler_ray.sources.sitemaps import (
    parse_sitemap,
    sitemap_seed_frontier,
    sitemaps_from_robots,
)

NS = 'xmlns="http://www.sitemaps.org/schemas/sitemap/0.9"'


def test_sitemaps_from_robots():
    txt = (
        "User-agent: *\nDisallow: /private\n"
        "Sitemap: https://a.example/sm.xml\n"
        "sitemap:   https://a.example/sm2.xml  \n"
        "Sitemap: https://a.example/sm.xml\n"  # dup dropped
    )
    assert sitemaps_from_robots(txt) == [
        "https://a.example/sm.xml", "https://a.example/sm2.xml",
    ]
    assert sitemaps_from_robots(None) == []


def test_parse_sitemap_urlset_index_gzip_text():
    urlset = (
        f'<urlset {NS}><url><loc>http://h/a</loc></url>'
        f'<url><loc> http://h/b </loc></url></urlset>'
    ).encode()
    assert parse_sitemap(urlset) == (["http://h/a", "http://h/b"], [])
    index = (
        f'<sitemapindex {NS}><sitemap><loc>http://h/s1.xml</loc></sitemap>'
        f'<sitemap><loc>http://h/s2.xml</loc></sitemap></sitemapindex>'
    ).encode()
    assert parse_sitemap(index) == ([], ["http://h/s1.xml", "http://h/s2.xml"])
    # gzip transport
    assert parse_sitemap(gzip.compress(urlset))[0] == ["http://h/a", "http://h/b"]
    # plain-text fallback, including malformed XML
    assert parse_sitemap(b"http://h/x\nnot-a-url\nhttp://h/y\n")[0] == [
        "http://h/x", "http://h/y",
    ]
    assert parse_sitemap(b"<urlset><url><loc>http://h/broken")[0] == []


@pytest.fixture(scope="module")
def sitemap_server():
    docs = {}

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def do_GET(self):
            body = docs.get(self.path)
            if body is None:
                self.send_response(404)
                self.send_header("Content-Length", "0")
                self.end_headers()
                return
            self.send_response(200)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

    srv = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    host = f"127.0.0.1:{srv.server_port}"
    docs["/robots.txt"] = (
        f"User-agent: *\nSitemap: http://{host}/smindex.xml.gz\n".encode()
    )
    docs["/smindex.xml.gz"] = gzip.compress(
        (
            f'<sitemapindex {NS}>'
            f'<sitemap><loc>http://{host}/sm1.xml</loc></sitemap>'
            f'<sitemap><loc>http://{host}/sm2.xml</loc></sitemap>'
            f'</sitemapindex>'
        ).encode()
    )
    docs["/sm1.xml"] = (
        f'<urlset {NS}><url><loc>http://{host}/p/1</loc></url>'
        f'<url><loc>http://{host}/p/2</loc></url></urlset>'
    ).encode()
    docs["/sm2.xml"] = (
        f'<urlset {NS}><url><loc>http://{host}/p/3</loc></url></urlset>'
    ).encode()
    yield host
    srv.shutdown()


def test_sitemap_seed_frontier_live(ray_session, sitemap_server):
    host = sitemap_server
    out = (
        sitemap_seed_frontier([host], scheme="http")
        .to_pandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    assert out["url"].tolist() == [
        f"http://{host}/p/1", f"http://{host}/p/2", f"http://{host}/p/3",
    ]
    assert (out["host"] == host).all()
    assert set(out.columns) == {f.name for f in FRONTIER}


def test_sitemap_default_location_when_no_robots(ray_session, sitemap_server):
    # a host with no robots.txt and no sitemap.xml yields zero rows,
    # not an error (crawler must survive absent sitemaps)
    out = sitemap_seed_frontier(["127.0.0.1:1"], scheme="http").to_pandas()
    assert len(out) == 0
