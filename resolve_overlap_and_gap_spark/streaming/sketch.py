"""Streaming KMV distinct-count — the streaming face of
operators/sketch.kmv_distinct.

The keyed state IS the sketch: the k smallest distinct hashes seen so far
per group (<= k longs — bounded regardless of stream length, exactly what
a state store wants) plus an update counter.  Merging a micro-batch is
the KMV merge rule: union the incoming hashes with the held set and
re-take the k smallest.  A hash evicted once can never matter again —
the k-th-smallest bound only decreases — so truncating every batch loses
nothing, and after any prefix of the stream the state equals the batch
sketch over that prefix (test_streaming_sketch pins stream == batch).

The hash is computed BEFORE the stateful operator by the same SQL
formula the batch side uses (dedup.h32_of_sql) — the Python below never
hashes, it only maintains a sorted bounded set, so batch and stream
cannot drift.
"""

from __future__ import annotations

import math
from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from resolve_overlap_and_gap_spark.derive import SPARK
from resolve_overlap_and_gap_spark.operators.dedup import h32_of_sql
from resolve_overlap_and_gap_spark.operators.sketch import TWO32

OUT_SCHEMA = T.StructType([
    T.StructField("grp", T.StringType()),
    T.StructField("n_seen", T.LongType()),
    T.StructField("kmv_est", T.LongType()),
    T.StructField("n_updates", T.LongType()),
])

STATE_SCHEMA = T.StructType([
    T.StructField("hs", T.ArrayType(T.LongType())),
    T.StructField("n_updates", T.LongType()),
])


def kmv_stream(rows: DataFrame, expr: str, k: int = 64,
               group_expr: str = "'all'", salt: str = "kmv") -> DataFrame:
    """rows: streaming DF. -> per micro-batch one (grp, n_seen, kmv_est,
    n_updates) row per updated group; the row with the max n_updates per
    group is the current estimate (update output mode)."""
    h = h32_of_sql(expr, f":{salt}", SPARK)
    hashed = rows.selectExpr(f"cast({group_expr} as string) as grp",
                             f"{h} as h")

    def fn(key: tuple, pdfs: Iterable[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        if state.exists:
            st = state.get
            hs = sorted(int(x) for x in st[0])
            n_updates = int(st[1] or 0)
        else:
            hs, n_updates = [], 0
        s = set(hs)
        for pdf in pdfs:
            s.update(int(x) for x in pdf["h"])
        hs = sorted(s)[:k]
        n_updates += 1
        state.update((hs, n_updates))
        if len(hs) < k:
            est = len(hs)
        else:
            # same IEEE double floor as the batch SQL formula
            est = int(math.floor((k - 1) * float(TWO32) / hs[-1]))
        yield pd.DataFrame(
            {"grp": [key[0]], "n_seen": [len(hs)], "kmv_est": [est],
             "n_updates": [n_updates]})

    return hashed.groupBy("grp").applyInPandasWithState(
        fn, OUT_SCHEMA, STATE_SCHEMA, "update", GroupStateTimeout.NoTimeout)
