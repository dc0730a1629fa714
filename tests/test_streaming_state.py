"""applyInPandasWithState sessionization: final per-user session stats on a
file stream must match the batch sessionize computation."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from resolve_overlap_and_gap_spark.streaming.sessions import track_sessions

SF = "/root/testdata/sf0.001"


@pytest.mark.spark
def test_stateful_sessions_match_batch(spark, tmp_path):
    src = str(tmp_path / "ev")
    ev = spark.read.parquet(f"{SF}/events.parquet").select("user_id", "ts")
    ev.write.parquet(src)

    stream = spark.readStream.schema(ev.schema).parquet(src)
    out = track_sessions(stream, gap_seconds=1800.0)
    q = (
        out.writeStream.format("memory").queryName("sess")
        .outputMode("update").trigger(availableNow=True).start()
    )
    q.awaitTermination(180)
    # last update per (user, session) is the final count
    got = {
        (r.user_id, r.session_id): r.n_events
        for r in spark.sql(
            "select user_id, session_id, max(n_events) as n_events "
            "from sess group by 1, 2"
        ).collect()
    }

    batch = spark.sql(f"""
        select user_id, session_id, count(*) as n_events from (
          select user_id, ts,
                 sum(is_new) over (partition by user_id order by ts
                                   rows between unbounded preceding and current row) as session_id
          from (
            select user_id, ts,
                   case when lag(ts) over (partition by user_id order by ts) is null then 1
                        when ts > lag(ts) over (partition by user_id order by ts)
                             + interval '30' minute then 1
                        else 0 end as is_new
            from parquet.`{src}`) t) s
        group by 1, 2
    """)
    want = {(r.user_id, r.session_id): r.n_events for r in batch.collect()}
    assert got == want
    assert len(want) > 100