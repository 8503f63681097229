"""Batch-transform stages: fetch (actor pool), parse (stateless), image
processing (decode/hash/dedup), frontier selection."""
