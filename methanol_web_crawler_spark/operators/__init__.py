"""Crawl-pipeline operators (admission, dedup, politeness, fetch)."""
