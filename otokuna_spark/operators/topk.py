"""Sorts / limits / top-k (SURVEY.md §2.7 O1-O4, §2.12 window idioms).

- ``top_k``: global ordered limit. Spark executes ``orderBy().limit(k)`` as
  TakeOrderedAndProject — each partition keeps a k-heap, only k rows per
  partition move — so the serving query (app/app.py:160) never global-sorts
  at 100 TB.
- ``grouped_top_k``: per-group ranking via ``row_number`` window; one
  shuffle on the group key, heap-based WindowGroupLimit pushdown (Spark
  3.5+) keeps per-partition state at k rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def top_k(df: DataFrame, order: list[Column], k: int) -> DataFrame:
    return df.orderBy(*order).limit(k)


def grouped_top_k(df: DataFrame, group: list[str], order: list[Column], k: int, rank_col: str = "rank") -> DataFrame:
    w = Window.partitionBy(*group).orderBy(*order)
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= k)
    )
