"""Scalar / vectorized function library (SURVEY.md §2.8).

Pure functions only — no Ray, no I/O. Everything here is deterministic and
usable both inside ``map_batches`` bodies and in driver-side tests.
"""

from crawler_ray.functions.hashing import (  # noqa: F401
    md5_hex,
    sha1_hex,
    md5_hex_batch,
    phash64,
    simhash64,
    rolling_fingerprint,
)
from crawler_ray.functions.urls import (  # noqa: F401
    normalize_url,
    url_join,
    url_host,
    get_url_query_value,
    is_link,
    is_email,
    is_phone_num,
    to_url_encode,
)
from crawler_ray.functions.mime import ext_to_mime, normalize_fmt  # noqa: F401
