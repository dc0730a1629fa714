"""Token-budget sequence packing — assign documents to fixed-capacity
training sequences (the LM-pipeline packing step that turns a cleaned
corpus into ~capacity-token concatenation groups).

Semantics (deterministic, engine-independent):
  * shard = doc_id % n_shards — sharding IS the parallelism: greedy
    packing is inherently sequential, so the corpus is split into
    independent streams packed in parallel (at 100 TB, set n_shards to
    ~2-4x the executor-core count).  Execution is repartition-by-shard +
    sortWithinPartitions + mapInPandas: each task STREAMS its sorted
    Arrow batches through the greedy fold, carrying only (seq_idx, fill)
    per shard across batch boundaries — a shard is never materialized as
    one in-memory frame, so shard size is bounded by the shuffle sort's
    spill, not executor memory.
  * within a shard, docs are packed in doc_id order with the greedy
    first-overflow rule: a doc that would push the running fill past
    `capacity` starts a new sequence; a single doc longer than
    `capacity` occupies its own sequence (never split — the common
    "no cross-doc attention" packing variant).
  * n_tokens = whitespace token count of the normalized text (the
    repo-wide normalization in dedup.normalize_sql), so the packing key
    is reproducible in any engine.

Output: one row per doc — (doc_id, shard, seq_idx, n_tokens) with
seq_idx numbered from 0 per shard.  SQL-expressible (the oracle is a
per-shard recursive CTE), hence hash-exact against DuckDB.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from resolve_overlap_and_gap_spark.derive import SPARK
from resolve_overlap_and_gap_spark.operators.dedup import normalize_sql

OUT_SCHEMA = "doc_id long, shard long, seq_idx long, n_tokens long"


def pack_sequences(docs: DataFrame, capacity: int = 512, n_shards: int = 8,
                   text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Greedy fixed-capacity packing per shard (see module docstring)."""
    norm = normalize_sql(text_col, SPARK)
    slim = docs.selectExpr(
        f"cast({id_col} as bigint) as doc_id",
        f"cast(pmod(cast({id_col} as bigint), {n_shards}) as bigint) as shard",
        f"cast(size(split({norm}, ' ')) as bigint) as n_tokens",
    )

    from typing import Iterator

    def pack(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # per-shard carry state across Arrow batches: shard -> (seq, fill).
        # sortWithinPartitions guarantees each shard's docs arrive in
        # doc_id order and contiguously, so the dict holds at most the
        # few shards hashed into this partition — two ints each.
        state: dict[int, tuple[int, int]] = {}
        for pdf in batches:
            seqs = []
            for sh, t in zip(pdf["shard"], pdf["n_tokens"]):
                seq, fill = state.get(int(sh), (0, 0))
                if fill and fill + int(t) > capacity:
                    seq += 1
                    fill = 0
                fill += int(t)
                state[int(sh)] = (seq, fill)
                seqs.append(seq)
            out = pdf[["doc_id", "shard", "n_tokens"]].copy()
            out["seq_idx"] = pd.Series(seqs, dtype="int64")
            yield out[["doc_id", "shard", "seq_idx", "n_tokens"]]

    return (slim.repartition(n_shards, "shard")
            .sortWithinPartitions("shard", "doc_id")
            .mapInPandas(pack, OUT_SCHEMA))


def pack_sequences_duckdb_sql(capacity: int = 512, n_shards: int = 8,
                              text_col: str = "text", id_col: str = "doc_id",
                              table: str = "documents") -> str:
    """The same packing as a per-shard recursive CTE (the greedy fold
    written as row-at-a-time recursion — fine for oracle scale)."""
    norm = normalize_sql(text_col, "duckdb")
    return f"""
        with recursive d as (
          select cast({id_col} as bigint) as doc_id,
                 cast({id_col} as bigint) % {n_shards} as shard,
                 cast(length(string_split({norm}, ' ')) as bigint) as n_tokens,
                 row_number() over (partition by cast({id_col} as bigint) % {n_shards}
                                    order by cast({id_col} as bigint)) as rn
          from {table}),
        r as (
          select shard, rn, doc_id, n_tokens,
                 cast(0 as bigint) as seq_idx, n_tokens as fill
          from d where rn = 1
          union all
          select d.shard, d.rn, d.doc_id, d.n_tokens,
                 case when r.fill + d.n_tokens > {capacity}
                      then r.seq_idx + 1 else r.seq_idx end,
                 case when r.fill + d.n_tokens > {capacity}
                      then d.n_tokens else r.fill + d.n_tokens end
          from r join d on d.shard = r.shard and d.rn = r.rn + 1)
        select doc_id, shard, seq_idx, n_tokens from r
    """
