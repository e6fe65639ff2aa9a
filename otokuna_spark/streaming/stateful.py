"""Custom stateful streaming operators via ``applyInPandasWithState``
(SURVEY.md §2.12 extension surface; the reference has no stateful ops).

``streaming_first_seen``: exactly-once keyed dedup across micro-batches —
the streaming twin of Q2 keep-first dedup. State per key = the first-seen
marker; every later occurrence (same batch or any later batch) is
suppressed. This is the operator a continuous training-data ingest needs
so re-crawled/duplicated documents never enter the corpus twice.

State is bounded by key cardinality; production deployments add a state
TTL (``GroupStateTimeout.ProcessingTimeTimeout``) to age out keys.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as sty

FIRST_SEEN_SCHEMA = sty.StructType(
    [
        sty.StructField("key", sty.StringType()),
        sty.StructField("first_value", sty.StringType()),
        sty.StructField("n_new", sty.LongType()),
    ]
)

_STATE_SCHEMA = sty.StructType([sty.StructField("seen", sty.BooleanType())])


def _first_seen_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Emit one row the FIRST time a key appears across the stream's
    lifetime; afterwards the key's state suppresses it forever."""
    if state.exists:
        # already emitted in an earlier micro-batch — consume and drop
        for _ in pdfs:
            pass
        return
    first_value = None
    for pdf in pdfs:
        if len(pdf) and first_value is None:
            ordered = pdf.sort_values(["order_col"])
            first_value = str(ordered.iloc[0]["value"])
    if first_value is None:
        return
    state.update((True,))
    yield pd.DataFrame({"key": [key[0]], "first_value": [first_value], "n_new": [1]})


def streaming_first_seen(
    events: DataFrame,
    key_col: str,
    value_col: str,
    order_col: str,
) -> DataFrame:
    """Keyed first-seen dedup over a stream: one output row per NEW key
    per stream lifetime (keep-first by ``order_col`` within the first
    micro-batch that carries the key)."""
    prepared = events.selectExpr(
        f"CAST({key_col} AS STRING) AS key",
        f"CAST({value_col} AS STRING) AS value",
        f"{order_col} AS order_col",
    )
    return prepared.groupBy("key").applyInPandasWithState(
        _first_seen_fn,
        outputStructType=FIRST_SEEN_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
