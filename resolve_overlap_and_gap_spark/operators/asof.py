"""As-of (most-recent-event) join — a scale-path temporal join the reference
lacks (SURVEY.md §2.3 "(none) as-of / interval" row); standard in
training-data pipelines for attaching the latest snapshot/label to a fact row.

Spark-first design: NO inequality join (which Catalyst would plan as a
broadcast-nested-loop or cartesian). Instead the classic union + window
formulation:

  1. tag right rows (the lookup side) and left rows (the probe side),
  2. union them into one table keyed by the join key,
  3. a single window (partitionBy key, orderBy ts with right-before-left
     tie order) carries the last-seen right payload forward,
  4. keep left rows whose carried payload is non-null.

Cost: ONE shuffle on the key (same as an equi-join), fully JVM-side,
skew handled by AQE. This survives 100TB: it never materializes the
|left| x |right-per-key| candidate product the window-over-join oracle
formulation implies.

Tie semantics (deterministic): among right rows with right_ts <= left_ts,
pick max(right_ts), ties broken by max(tie_col).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    payload_cols: list[str],
    tie_col: str,
) -> DataFrame:
    """Inner as-of join: for each left row, the right row with the greatest
    right_ts <= left_ts (ties by greatest tie_col). Returns all left columns
    plus `payload_cols` from the matched right row."""
    left_cols = left.columns
    # reserved internal names and output-collision guards: a left column
    # named _ts/_r/... or a payload name shadowing a left column would
    # silently produce wrong or duplicate-named output
    reserved = {"_ts", "_r", "_tie", "_p", "_m"}
    clash = reserved.intersection(left_cols).union(reserved.intersection(right.columns))
    if clash:
        raise ValueError(f"asof_join: input columns collide with internal names: {sorted(clash)}")
    dup = set(payload_cols).intersection(c for c in left_cols if c != key)
    if dup:
        raise ValueError(f"asof_join: payload_cols duplicate left columns: {sorted(dup)}")
    # payloads travel as ONE struct so the carried match is atomic — a
    # per-column last(ignorenulls) would stitch values from DIFFERENT right
    # rows whenever a payload column holds nulls
    pay = F.struct(*[F.col(c).alias(c) for c in payload_cols])
    r = right.select(
        F.col(key),
        F.col(right_ts).alias("_ts"),
        F.lit(1).alias("_r"),
        F.col(tie_col).alias("_tie"),
        pay.alias("_p"),
    )
    l = left.withColumn("_ts", F.col(left_ts)).withColumn("_r", F.lit(0))
    l = l.withColumn("_p", F.lit(None).cast(r.schema["_p"].dataType))
    l = l.withColumn("_tie", F.lit(None).cast(r.schema["_tie"].dataType))
    u = l.select(key, "_ts", "_r", "_tie", "_p",
                 *[c for c in left_cols if c != key]).unionByName(
        r.select(key, "_ts", "_r", "_tie", "_p",
                 *[F.lit(None).cast(left.schema[c].dataType).alias(c)
                   for c in left_cols if c != key])
    )
    # right rows sort before left rows at equal ts (inclusive <=); within
    # right rows at equal ts, ascending tie order makes last() = max(tie).
    w = (
        Window.partitionBy(key)
        .orderBy(F.col("_ts").asc(), F.col("_r").desc(), F.col("_tie").asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = u.select("*", F.last("_p", ignorenulls=True).over(w).alias("_m"))
    out = carried.where((F.col("_r") == 0) & F.col("_m").isNotNull())
    return out.select(
        key,
        *[c for c in left_cols if c != key],
        *[F.col(f"_m.{c}").alias(c) for c in payload_cols],
    )
