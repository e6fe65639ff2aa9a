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


ANOMALY_SCHEMA = sty.StructType(
    [
        sty.StructField("key", sty.StringType()),
        sty.StructField("order_col", sty.LongType()),
        sty.StructField("value", sty.DoubleType()),
        sty.StructField("p25", sty.DoubleType()),
        sty.StructField("p75", sty.DoubleType()),
        sty.StructField("is_anomaly", sty.IntegerType()),
    ]
)

_ANOM_STATE_SCHEMA = sty.StructType(
    [sty.StructField("window", sty.ArrayType(sty.DoubleType()))]
)


def streaming_rolling_anomalies(
    events: DataFrame,
    key_col: str,
    order_col: str,
    value_col: str,
    lookback: int = 12,
    min_obs: int = 8,
    k: float = 1.5,
) -> DataFrame:
    """Stateful streaming twin of ``operators.windows.rolling_robust_
    anomalies``: per-key state is the trailing window of the last
    ``lookback`` values (bounded — state size never depends on stream
    length), each arriving point is judged against the Tukey fences of
    the state BEFORE being appended to it (the point cannot vote on its
    own fences, exactly like the batch operator's ``-lookback..-1``
    frame).

    Quartiles use numpy's linear interpolation — the same ``quantile_
    cont`` semantics as the batch operator's exact ``percentile`` — so a
    stream fed files in order-column order emits the same flags as the
    batch window (pinned by the batch-equivalence test). Rows inside one
    micro-batch are sorted by ``order_col``; cross-batch order is
    arrival order, the streaming contract.
    """
    import numpy as np

    def fn(key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        window = list(state.get[0]) if state.exists else []
        out: dict[str, list] = {c: [] for c in ("order_col", "value", "p25", "p75", "is_anomaly")}
        for pdf in pdfs:
            for _, row in pdf.sort_values("order_col").iterrows():
                v = float(row["value"])
                if len(window) >= min_obs:
                    p25 = float(np.quantile(window, 0.25))
                    p75 = float(np.quantile(window, 0.75))
                    iqr = p75 - p25
                    flag = int(v < p25 - k * iqr or v > p75 + k * iqr)
                else:
                    p25 = p75 = float("nan")
                    flag = 0
                out["order_col"].append(int(row["order_col"]))
                out["value"].append(v)
                out["p25"].append(p25)
                out["p75"].append(p75)
                out["is_anomaly"].append(flag)
                window.append(v)
                if len(window) > lookback:
                    window.pop(0)
        state.update(([float(x) for x in window],))
        if out["order_col"]:
            yield pd.DataFrame({"key": [key[0]] * len(out["order_col"]), **out})

    prepared = events.selectExpr(
        f"CAST({key_col} AS STRING) AS key",
        f"CAST({order_col} AS LONG) AS order_col",
        f"CAST({value_col} AS DOUBLE) AS value",
    )
    return prepared.groupBy("key").applyInPandasWithState(
        fn,
        outputStructType=ANOMALY_SCHEMA,
        stateStructType=_ANOM_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
