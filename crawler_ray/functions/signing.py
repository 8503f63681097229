"""Request signing (M11) — deterministic re-expression of the reference's
API signature scheme (``ShiweijiaCategory.cs:42-43``,
``ShiweijiaProduct.cs:80-81,210-211``; MD5 helper ``Encrypt.cs:9-21``;
epoch-millis ``Extensions/DateTimeExtension.cs:13-16``).

The reference signs with wall-clock millis and a GUID nonce — the two
nondeterminism sources the ordering contract designs out (SURVEY.md §7.5):
here both are INJECTED so a replayed crawl produces identical requests.
"""

from __future__ import annotations

import hashlib
from urllib.parse import urlencode


def epoch_millis(epoch_seconds: float) -> int:
    """The reference's GetMilliseconds (injected clock, not wall time)."""
    return int(epoch_seconds * 1000)


def sign_request(
    params: dict[str, str], nonce: str, timestamp_ms: int, secret: str = ""
) -> str:
    """Uppercase MD5 over the sorted query string + nonce + epoch millis —
    the reference's signature recipe with injected nonce/clock."""
    qs = urlencode(sorted(params.items()))
    payload = f"{qs}&nonce={nonce}&t={timestamp_ms}{secret}"
    return hashlib.md5(payload.encode("utf-8")).hexdigest().upper()


def signed_url(
    base_url: str,
    params: dict[str, str],
    nonce: str,
    timestamp_ms: int,
    secret: str = "",
) -> str:
    sig = sign_request(params, nonce, timestamp_ms, secret)
    qs = urlencode(sorted(params.items()))
    sep = "&" if qs else ""
    return f"{base_url}?{qs}{sep}nonce={nonce}&t={timestamp_ms}&sign={sig}"
