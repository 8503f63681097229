"""Build-once / publish-atomically protocol for on-disk derived artifacts
(persisted ANN/band indexes, benchmark corpora).

The pattern: derive a content-addressed cache directory from the inputs,
build into a staging dir, then ``os.rename`` it into place — the rename IS
the done marker, so a reader can never observe a partially-written
artifact, and concurrent builders race harmlessly (losers discard their
stage and serve the winner's copy). Interrupted builds leave only a
``.tmp-<pid>`` staging dir, never a corrupt artifact at the published path.

Used by ``dedup.ensure_minhash_band_index``, ``similarity.ensure_pq_index``
and bench.py's scaling-corpus cache; new persisted indexes should route
through here rather than re-implementing the protocol.
"""

from __future__ import annotations

import os
import shutil
import tempfile
from typing import Callable


def cache_dir(kind: str, *key_parts: object) -> str:
    """Canonical cache location under the system temp dir, content-addressed
    by ``kind`` plus the stringified key parts (path separators and other
    non-alphanumerics collapsed to '_')."""
    key = "_".join(
        "".join(c if c.isalnum() else "_" for c in str(p)) for p in key_parts
    )
    return os.path.join(tempfile.gettempdir(), f"crawler_ray_{kind}_{key}")


def source_fingerprint(*paths: str) -> str:
    """Make-style staleness key for the SOURCE file(s) an artifact derives
    from: ``mtimeNs-size`` per file. Every derived-index cache key must
    include this — a cache keyed on the source *path* alone silently serves
    a stale index when the data at that path changes in place (found by the
    oracle fuzzer: reruns mutate /tmp/fuzz_sf_<seed>/events.parquet under a
    fixed path, and the Z-order layout cache kept answering from the old
    corpus — same primary keys, different attribute values). Content
    hashing would cost a full read at the 100-TB design point; mtime+size
    is the standard dependency check and one ``stat`` per source."""
    parts = []
    for p in paths:
        st = os.stat(p)
        parts.append(f"{st.st_mtime_ns}-{st.st_size}")
    return "_".join(parts)


def ensure_dir(path: str, build: Callable[[str], None]) -> str:
    """Return ``path``, building it first via ``build(stage_dir)`` if absent.

    ``build`` must write the complete artifact into the staging directory it
    is given (which does not exist yet — most writers create it themselves;
    parquet/numpy writers that need it may ``os.makedirs`` it). The stage is
    atomically renamed to ``path`` on success; if another process published
    first, the stage is discarded and the winner's artifact is served.
    """
    if not os.path.isdir(path):
        stage = f"{path}.tmp-{os.getpid()}"
        shutil.rmtree(stage, ignore_errors=True)
        build(stage)
        try:
            os.rename(stage, path)  # atomic publish; losers keep serving
        except OSError:  # pragma: no cover - concurrent builder won
            shutil.rmtree(stage, ignore_errors=True)
    return path
