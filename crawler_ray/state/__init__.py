"""Stateful crawl infrastructure: approximate-membership filters, the sharded
URL/image seen-set actor pool, politeness + robots actors, checkpointing."""
