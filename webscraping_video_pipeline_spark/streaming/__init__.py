"""Structured Streaming variants of the engine's stream-shaped semantics
(SURVEY.md §2.10): the reference processes results off a queue while
producers run (parallel_scraper_manager.py:356-411); here micro-batches are
crawl rounds, watermarks bound late pages, and per-host politeness state
lives in applyInPandasWithState.
"""
