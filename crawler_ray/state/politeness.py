"""Per-host politeness (token buckets) + robots.txt cache.

The reference's politeness is a thread-blocking random sleep between pages
(3–6 s, ``BaseSpider.cs:139``; 1–3 s per detail variant,
``ShiweijiaProduct.cs:184``) and it has NO robots handling. Here (north rule):

- ``TokenBucket`` — deterministic token-bucket rate limiter with an
  *injectable clock* so tests and the reproducible-ordering contract never
  depend on wall time.
- ``RobotsCache`` — host → parsed robots.txt rules, populated lazily through
  a fetch callback (in-sandbox: the synthetic site's ``/robots.txt`` rows).
- ``PolitenessActor`` — one actor per host-shard holding both; the crawl's
  fetch stage asks ``grant(host, n)`` before issuing page fetches, and
  ``allowed(urls)`` to drop robots-disallowed frontier rows.

At batch scale the *per-round per-host quota* in the frontier-selection
shuffle (pipelines/crawl.py) is the primary politeness budget; the token
bucket governs intra-round pacing when running against a live clock.
"""

from __future__ import annotations

import urllib.robotparser
from urllib.parse import urlsplit

import numpy as np
import ray


class VirtualClock:
    """Deterministic clock for tests/replay (the reference's wall-clock
    signing + random sleeps are the nondeterminism we design out)."""

    def __init__(self, t0: float = 0.0):
        self.t = t0

    def now(self) -> float:
        return self.t

    def advance(self, dt: float) -> None:
        self.t += dt


class TokenBucket:
    def __init__(self, rate_per_sec: float, burst: float, clock=None):
        self.rate = rate_per_sec
        self.burst = burst
        self.tokens = burst
        self.clock = clock or VirtualClock()
        self.last = self.clock.now()

    def _refill(self) -> None:
        now = self.clock.now()
        self.tokens = min(self.burst, self.tokens + (now - self.last) * self.rate)
        self.last = now

    def try_acquire(self, n: float = 1.0) -> int:
        """Grant up to ``n`` whole tokens without blocking; returns granted."""
        self._refill()
        granted = max(0, int(min(n, self.tokens)))  # debt (<0) grants nothing
        self.tokens -= granted
        return granted

    def debit(self, seconds: float) -> None:
        """Server-directed backoff (429/503 ``Retry-After``): put the bucket
        into DEBT so the next ``seconds`` of refill yield zero grants —
        deterministic under the virtual clock, no thread sleeps."""
        self._refill()
        self.tokens = min(self.tokens, -self.rate * seconds)


def parse_robots(txt: str, host: str) -> urllib.robotparser.RobotFileParser:
    rp = urllib.robotparser.RobotFileParser(url=f"https://{host}/robots.txt")
    rp.parse(txt.splitlines())
    return rp


class RobotsCache:
    """host → RobotFileParser; ``fetch_fn(host) -> str | None`` supplies the
    robots.txt body (None/'' ⇒ allow-all, mirroring common crawler policy)."""

    def __init__(self, fetch_fn):
        self.fetch_fn = fetch_fn
        self.cache: dict[str, urllib.robotparser.RobotFileParser | None] = {}

    def _rules(self, host: str):
        if host not in self.cache:
            txt = self.fetch_fn(host)
            self.cache[host] = parse_robots(txt, host) if txt else None
        return self.cache[host]

    def allowed(self, urls: list[str], agent: str = "crawler-ray") -> np.ndarray:
        out = np.ones(len(urls), dtype=bool)
        for i, u in enumerate(urls):
            host = urlsplit(u).hostname or ""
            rules = self._rules(host)
            if rules is not None:
                out[i] = rules.can_fetch(agent, u)
        return out


@ray.remote(num_cpus=0.25)
class PolitenessActor:
    """One per host-shard: robots rules + per-host token buckets.

    ``robots_map`` is {host: robots_txt}; hosts absent from the map are
    allow-all. ``rate``/``burst`` are per-host tokens per (virtual) second.
    """

    def __init__(
        self,
        robots_map: dict[str, str] | None = None,
        rate: float = 10.0,
        burst: float = 50.0,
        virtual: bool = True,
    ):
        robots_map = robots_map or {}
        self.robots = RobotsCache(lambda host: robots_map.get(host))
        self.rate = rate
        self.burst = burst
        if virtual:
            self.clock: VirtualClock | None = VirtualClock()
        else:  # live wall clock
            import time

            class _Wall:
                now = staticmethod(time.monotonic)

            self.clock = _Wall()  # type: ignore[assignment]
        self.buckets: dict[str, TokenBucket] = {}

    def _bucket(self, host: str) -> TokenBucket:
        if host not in self.buckets:
            rate, burst = self.rate, self.burst
            # robots.txt Crawl-delay (de-facto standard the reference has no
            # notion of): a host that asks for N seconds between requests
            # gets a 1/N-per-second bucket with NO burst — the default
            # rate/burst apply only to hosts that don't state a preference.
            rules = self.robots._rules(host)
            delay = rules.crawl_delay("crawler-ray") if rules is not None else None
            if delay:
                rate = min(rate, 1.0 / float(delay))
                burst = 1.0
            self.buckets[host] = TokenBucket(rate, burst, self.clock)
        return self.buckets[host]

    def grant(self, host: str, n: int) -> int:
        """Non-blocking token grant; ungranted rows stay in the frontier for
        the next round (quota-splitting, not thread sleeps)."""
        return self._bucket(host).try_acquire(n)

    def grant_many(self, requests: dict[str, int]) -> dict[str, int]:
        """Batched grant — one RPC for a whole fetch batch."""
        return {h: self._bucket(h).try_acquire(n) for h, n in requests.items()}

    def allowed(self, urls: list[str]) -> np.ndarray:
        return self.robots.allowed(urls)

    def throttle(self, host: str, seconds: float) -> None:
        """Honor a server's 429/503 ``Retry-After``: the host's bucket goes
        into debt for ``seconds`` (fire-and-forget from fetch workers)."""
        self._bucket(host).debit(seconds)

    def advance_clock(self, dt: float) -> None:
        if isinstance(self.clock, VirtualClock):
            self.clock.advance(dt)
