"""Vectorized (Arrow-batched) URL/string functions of the crawl engine."""
