"""Interval / range join — temporal range predicates on an equi-key,
planned WITHOUT an inequality join (which Catalyst would execute as a
broadcast-nested-loop over the key group product).

Pattern (same family as the latitude-band join in geodist.py): bucket time
into windows the size of the range; a probe interval [t0, t0+len) can only
match fact rows in bucket(t0) .. bucket(t0+len), so exploding the probe to
that bucket span and equi-joining on (key, bucket) yields a strict superset;
the exact range predicate then filters JVM-side. One shuffle, AQE handles
hot keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_count_join(
    probes: DataFrame,   # key, probe_id, t0 (timestamp), plus anything
    facts: DataFrame,    # key, ft (timestamp)
    length_days: int,
    key: str = "key",
) -> DataFrame:
    """Count facts per probe with ft in [t0, t0 + length_days). Buckets are
    length_days wide, so a probe spans at most 2 buckets."""
    secs = length_days * 86400
    # epoch-as-double matches DuckDB's epoch() bit-for-bit (us / 1e6)
    f_b = facts.withColumn("_fe", F.col("ft").cast("timestamp").cast("double")).withColumn(
        "bucket", F.floor(F.col("_fe") / secs).cast("long")
    )
    p_b = probes.withColumn("_pe", F.col("t0").cast("timestamp").cast("double")).withColumn(
        "bucket",
        F.explode(F.array(*[
            F.floor(F.col("_pe") / secs).cast("long") + d for d in (0, 1)
        ])),
    )
    j = p_b.join(f_b, [key, "bucket"]).where(
        (F.col("_fe") >= F.col("_pe")) & (F.col("_fe") < F.col("_pe") + secs)
    )
    return j.groupBy(key, "probe_id").agg(F.count("*").alias("n_in_range"))
