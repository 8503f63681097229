"""End-to-end pipelines: the crawl driver, relational/text/dedup/similarity
query suites, and the flagship entry pipeline."""
