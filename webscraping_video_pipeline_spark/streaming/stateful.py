"""Stateful streaming: per-host token-bucket politeness as
applyInPandasWithState (SURVEY.md §2.10 'stateful ops').

The batch round loop keeps politeness state in checkpoint tables (preferred
— exactly reproducible); this module is the true-stream variant: each host
group carries (tokens, last_refill_ts) state across micro-batches, admitting
at most ``capacity`` URLs per refill interval — the streaming twin of the
reference's per-source delay sleeps (config.py:15-72).
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

OUT_SCHEMA = T.StructType(
    [
        T.StructField("host", T.StringType(), False),
        T.StructField("canon_url", T.StringType(), False),
        T.StructField("slot", T.IntegerType(), False),
        T.StructField("admitted", T.BooleanType(), False),
    ]
)
STATE_SCHEMA = T.StructType(
    [
        T.StructField("tokens", T.IntegerType(), False),
        T.StructField("served", T.LongType(), False),
    ]
)


def _token_bucket(capacity: int):
    def fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (host,) = key
        if state.exists:
            tokens, served = state.get
        else:
            tokens, served = capacity, 0
        for pdf in pdfs:
            pdf = pdf.sort_values(["priority", "canon_url"], ascending=[False, True])
            n = len(pdf)
            admit = min(tokens, n)
            out = pd.DataFrame(
                {
                    "host": pdf["host"].iloc[:n],
                    "canon_url": pdf["canon_url"].iloc[:n],
                    "slot": range(int(served), int(served) + n),
                    "admitted": [i < admit for i in range(n)],
                }
            )
            tokens -= admit
            served += admit
            yield out
        state.update((int(tokens), int(served)))

    return fn


def politeness_stream(
    candidates: DataFrame, capacity: int = 4
) -> DataFrame:
    """candidates: streaming DF with (host, canon_url, priority)."""
    return candidates.groupBy("host").applyInPandasWithState(
        _token_bucket(capacity),
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
