"""Crawl-round orchestration: deterministic, resumable DataFrame jobs."""
