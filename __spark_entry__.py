"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship: one politeness-scheduled, deduped crawl batch
derived from the sf0.001 tables (the engine's core P1+J2 plan).
``queries()``/``oracle_sql()`` — the SURVEY.md §2 operator inventory as
(spark, sf_dir) callables with DuckDB oracle SQL, registered in
``webscraping_video_pipeline_spark.contract``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from webscraping_video_pipeline_spark.contract import (  # noqa: E402
    ordered_oracles,
    ordered_queries,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: deduped + politeness-scheduled crawl batch on sf0.001."""
    from webscraping_video_pipeline_spark.contract.crawl_ops import (
        q36_politeness_slots,
    )

    return q36_politeness_slots(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # Ordered so the driver's 50-entry correctness window certifies the
    # queries needing fresh evidence first (contract.DRIVER_PRIORITY).
    return ordered_queries()


def oracle_sql() -> dict[str, str]:
    return ordered_oracles()
