"""Driver-contract query registry (SURVEY.md §2 inventory → testdata queries).

Each operator from the SURVEY §2 inventory gets a named query: a
``(spark, sf_dir) -> DataFrame`` callable plus (where SQL-expressible) an
equivalent ANSI-SQL oracle string run by DuckDB on the same parquet tables.

Cross-engine determinism rules (so the driver's value-hash matches):

- additive double aggregates go through ``decimal(38,10)`` — exact,
  order-independent — then cast back to double (identical bits both engines);
- integer aggregates are cast to BIGINT explicitly (DuckDB sums to HUGEINT);
- no raw timestamps in outputs — format to strings or cast to date;
- every ranking has a total tiebreak; every output has stable column names.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def query(name: str, oracle: str | None = None):
    """Register a contract query (and optionally its DuckDB oracle SQL)."""

    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


from . import relational  # noqa: E402,F401
from . import text  # noqa: E402,F401
from . import similarity  # noqa: E402,F401
from . import crawl_ops  # noqa: E402,F401
from . import windows  # noqa: E402,F401
from . import quality  # noqa: E402,F401
