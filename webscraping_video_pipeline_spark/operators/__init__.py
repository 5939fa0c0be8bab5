"""Engine operators (SURVEY.md §2.9) — each preserves a cited reference
semantic but is implemented Spark-first (declarative plans, vectorized UDFs,
explicit partitioning), never as a translation of the reference's thread loop.
"""
