"""Distributed sketches: KMV distinct-count, Bloom membership, Count-Min
frequency.

Design rule shared by all three: the sketch itself is a BOUNDED relation
(<= k, m, or d*w rows regardless of input size), built with one map-side-
combinable aggregation, and consumed via a broadcast join — never a
driver collect of data rows.  Hashes are the portable md5-prefix h32 (see
dedup.h32_of_sql) so a DuckDB oracle reproduces every estimate — and
every FALSE POSITIVE / hash-collision overestimate — bit for bit: the
approximation error of each sketch is deterministic given (data, seed),
which is what makes an approximate structure exactly testable.

Spark ships native approx sketches (approx_count_distinct = HLL++,
DataFrameStatFunctions.bloomFilter / countMinSketch on the Scala side);
these operators exist because (a) the engine's contract requires cross-
engine reproducibility, which HLL++ internals don't give, and (b) the
probe side must be a relational join, not a driver-held object.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from resolve_overlap_and_gap_spark.derive import SPARK
from resolve_overlap_and_gap_spark.operators.dedup import h32_of_sql

TWO32 = 4294967296  # h32 range; KMV normalizes hashes to u = h / 2^32


# --------------------------------------------------------------- KMV
def kmv_distinct(df: DataFrame, expr: str, k: int = 64,
                 group_col: str | None = None, salt: str = "kmv") -> DataFrame:
    """K-minimum-values distinct-count sketch (Bar-Yossef et al. 2002):
    keep the k smallest distinct hash values; if the k-th smallest
    normalized hash is u_k, estimate D ~ (k-1)/u_k.  When fewer than k
    distinct hashes exist the sketch is exact (estimate = count seen).

    Output per group: (group, n_seen, kmv_est) with kmv_est quantized to
    a bigint (floor) so the estimate hash-compares across engines.

    Scale shape: distinct-hash reduce (map-side combine), then a SALTED
    two-level top-k — level 1 ranks within (group, h % n_salts) so the
    sort is n_salts-way parallel and externally spillable even when there
    are few groups (a plain per-group window would be one giant sort
    task per group at 100 TB); level 2 ranks the <= n_salts*k survivors.
    Union/merge of two KMV sketches = union the hash sets and re-take
    the k smallest, which is the same query over a union — the property
    that makes KMV mergeable across 1000 executors."""
    from pyspark.sql import Window

    g = group_col or "'all'"
    h = h32_of_sql(expr, f":{salt}", SPARK)
    n_salts = 32
    hashes = df.selectExpr(f"{g} as grp", f"{h} as h").distinct()
    w1 = Window.partitionBy("grp", F.expr(f"h % {n_salts}")).orderBy("h")
    survivors = (hashes.withColumn("rk1", F.row_number().over(w1))
                 .where(F.col("rk1") <= k))
    w2 = Window.partitionBy("grp").orderBy("h")
    topk = (survivors.withColumn("rk", F.row_number().over(w2))
            .where(F.col("rk") <= k))
    return (topk.groupBy("grp")
            .agg(F.count("*").alias("n_seen"), F.max("h").alias("hk"))
            .selectExpr(
                "grp",
                "cast(n_seen as bigint) as n_seen",
                f"cast(case when n_seen < {k} then n_seen else "
                f"floor(({k} - 1) * cast({TWO32} as double) / hk) end "
                "as bigint) as kmv_est"))


def kmv_distinct_duckdb_sql(expr: str, k: int = 64,
                            group_col: str | None = None, salt: str = "kmv",
                            table: str = "documents") -> str:
    """DuckDB twin of kmv_distinct (same hash, same floor quantization)."""
    g = group_col or "'all'"
    h = h32_of_sql(expr, f":{salt}", "duckdb")
    return f"""
        with hashes as (
          select distinct {g} as grp, {h} as h from {table}),
        topk as (
          select * from (
            select grp, h,
                   row_number() over (partition by grp order by h) as rk
            from hashes) where rk <= {k})
        select grp, cast(count(*) as bigint) as n_seen,
               cast(case when count(*) < {k} then count(*) else
                    floor(({k} - 1) * cast({TWO32} as double) / max(h)) end
                    as bigint) as kmv_est
        from topk group by grp
    """


# --------------------------------------------------------------- Bloom
def _bloom_positions_expr(key_expr: str, m: int, k: int, salt: str,
                          dialect: str) -> list[str]:
    return [f"({h32_of_sql(key_expr, f':{salt}{i}', dialect)} % {m})"
            for i in range(k)]


def bloom_membership(insert_df: DataFrame, probe_df: DataFrame,
                     insert_expr: str, probe_expr: str, probe_id: str,
                     m: int = 2048, k: int = 5,
                     salt: str = "bloom") -> DataFrame:
    """Bloom-filter membership probe as a relational plan: the filter is
    the DISTINCT set of bit positions lit by the insert keys (<= m rows —
    bounded by the sketch size, so always broadcastable), and a probe key
    might_contain iff ALL k of its positions are lit.

    Output: (probe_id, might_contain).  False positives are real and
    deterministic — the oracle reproduces them, and the companion query
    joins the ground truth to count them.

    Scale shape: insert side = one distinct over k*n position rows
    (map-side combine collapses to <= m), broadcast to the probe side;
    probe = k generated rows per key, left-broadcast-join, all-matched
    groupBy.  No driver bitset, no UDF; swapping the position dim for an
    actual broadcast long[] is a constant-factor variant behind the same
    semantics."""
    pos_exprs = _bloom_positions_expr(insert_expr, m, k, salt, SPARK)
    lit = (insert_df.selectExpr(f"explode(array({', '.join(pos_exprs)})) as pos")
           .distinct())
    probe_pos = _bloom_positions_expr(probe_expr, m, k, salt, SPARK)
    probes = probe_df.selectExpr(
        f"cast({probe_id} as bigint) as probe_id",
        f"explode(array({', '.join(probe_pos)})) as pos")
    hit = probes.join(F.broadcast(lit.withColumn("hit", F.lit(1))),
                      "pos", "left")
    return (hit.groupBy("probe_id")
            .agg((F.count("*") == F.sum(F.coalesce(F.col("hit"), F.lit(0))))
                 .alias("might_contain"))
            .selectExpr("probe_id", "might_contain"))


def bloom_membership_duckdb_sql(insert_sql: str, probe_sql: str,
                                insert_expr: str, probe_expr: str,
                                probe_id: str, m: int = 2048, k: int = 5,
                                salt: str = "bloom") -> str:
    """DuckDB twin: same positions, same all-k rule (insert_sql/probe_sql
    are full SELECT statements producing the two key relations)."""
    ins = _bloom_positions_expr(insert_expr, m, k, salt, "duckdb")
    prb = _bloom_positions_expr(probe_expr, m, k, salt, "duckdb")
    ins_cols = ", ".join(f"{e} as p{i}" for i, e in enumerate(ins))
    prb_cols = ", ".join(f"{e} as p{i}" for i, e in enumerate(prb))
    unp_i = " union all ".join(
        f"select p{i} as pos from ipos" for i in range(k))
    unp_p = " union all ".join(
        f"select probe_id, p{i} as pos from ppos" for i in range(k))
    return f"""
        with ipos as (select {ins_cols} from ({insert_sql})),
        lit as (select distinct pos from ({unp_i})),
        ppos as (select cast({probe_id} as bigint) as probe_id, {prb_cols}
                 from ({probe_sql})),
        probes as ({unp_p})
        select probe_id,
               count(*) = sum(case when lit.pos is null then 0 else 1 end)
                 as might_contain
        from probes left join lit using (pos)
        group by probe_id
    """


# --------------------------------------------------------------- Count-Min
def cms_freq(df: DataFrame, expr: str, probe_df: DataFrame, probe_expr: str,
             w: int = 16, d: int = 3, salt: str = "cm") -> DataFrame:
    """Count-Min frequency sketch (Cormode & Muthukrishnan 2005): d hash
    rows of width w; estimate(term) = min over rows of the counter at
    (row, h_row(term) % w).  Always >= the true count; collisions only
    inflate.

    Output per probe term: (term, cms_est).  The sketch table is <= d*w
    rows — one groupBy over d generated rows per input row (map-side
    combine collapses to the sketch size per partition), then a broadcast
    join to the probes.  Mergeable: sketches of two corpora add
    counter-wise, which is exactly what the partial aggregation does."""
    rows = []
    for i in range(d):
        h = h32_of_sql(expr, f":{salt}{i}", SPARK)
        rows.append(f"struct({i} as r, {h} % {w} as c)")
    cells = (df.selectExpr(f"explode(array({', '.join(rows)})) as rc")
             .selectExpr("rc.r as r", "rc.c as c")
             .groupBy("r", "c").agg(F.count("*").alias("cnt")))
    probe_rows = []
    for i in range(d):
        h = h32_of_sql(probe_expr, f":{salt}{i}", SPARK)
        probe_rows.append(f"struct({i} as r, {h} % {w} as c)")
    probes = probe_df.selectExpr(
        f"{probe_expr} as term",
        f"explode(array({', '.join(probe_rows)})) as rc").selectExpr(
        "term", "rc.r as r", "rc.c as c")
    return (probes.join(F.broadcast(cells), ["r", "c"], "left")
            .groupBy("term")
            .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("cms_est"))
            .selectExpr("term", "cast(cms_est as bigint) as cms_est"))


def cms_freq_duckdb_sql(data_sql: str, expr: str, probe_sql: str,
                        probe_expr: str, w: int = 16, d: int = 3,
                        salt: str = "cm") -> str:
    """DuckDB twin of cms_freq."""
    cell_rows = " union all ".join(
        f"select {i} as r, {h32_of_sql(expr, f':{salt}{i}', 'duckdb')} % {w} "
        f"as c from ({data_sql})" for i in range(d))
    probe_rows = " union all ".join(
        f"select {probe_expr} as term, {i} as r, "
        f"{h32_of_sql(probe_expr, f':{salt}{i}', 'duckdb')} % {w} as c "
        f"from ({probe_sql})" for i in range(d))
    return f"""
        with cells as (
          select r, c, count(*) as cnt from ({cell_rows}) group by r, c),
        probes as ({probe_rows})
        select term, cast(min(coalesce(cnt, 0)) as bigint) as cms_est
        from probes left join cells using (r, c)
        group by term
    """


# ------------------------------------------------------- exact quantiles
def exact_quantiles(df: DataFrame, val_expr: str, qs: list[float],
                    group_col: str | None = None) -> DataFrame:
    """Exact type-1 quantiles (no interpolation: the value at rank
    ceil(q*n)) per group, via the counting-sort shape: aggregate to
    (group, value, count), cumulative-sum over DISTINCT values, pick the
    smallest value whose cumulative count reaches the rank.

    Scale shape: the window runs over distinct values per group — bounded
    by the value DOMAIN (doc lengths, quantized scores), not the row
    count, so a 100 TB column with a few thousand distinct lengths sorts
    a few thousand rows per group.  For truly continuous high-cardinality
    columns quantize first or use a two-pass histogram refinement; a
    row-level sort here would be the same single-giant-task trap the
    salted KMV avoids.

    Output: (grp, q, qval)."""
    from pyspark.sql import Window

    g = group_col or "'all'"
    agg = (df.selectExpr(f"{g} as grp", f"cast({val_expr} as bigint) as val")
           .groupBy("grp", "val").agg(F.count("*").alias("cnt")))
    wcum = (Window.partitionBy("grp").orderBy("val")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    wtot = Window.partitionBy("grp")
    cum = (agg.withColumn("cum", F.sum("cnt").over(wcum))
           .withColumn("n", F.sum("cnt").over(wtot)))
    qlits = ", ".join(f"cast({q} as double)" for q in qs)
    return (cum.selectExpr("grp", "val", "cnt", "cum", "n",
                           f"explode(array({qlits})) as q")
            .where("cum >= ceil(q * n) and cum - cnt < ceil(q * n)")
            .selectExpr("grp", "q", "val as qval"))


def exact_quantiles_duckdb_sql(val_expr: str, qs: list[float],
                               group_col: str | None = None,
                               table: str = "documents") -> str:
    """DuckDB twin of exact_quantiles (same rank rule)."""
    g = group_col or "'all'"
    qlits = ", ".join(f"(cast({q} as double))" for q in qs)
    return f"""
        with agg as (
          select {g} as grp, cast({val_expr} as bigint) as val,
                 count(*) as cnt
          from {table} group by 1, 2),
        cum as (
          select *, sum(cnt) over (partition by grp order by val
                     rows between unbounded preceding and current row) as cum,
                 sum(cnt) over (partition by grp) as n
          from agg)
        select grp, q, val as qval
        from cum, (values {qlits}) as quo(q)
        where cum >= ceil(q * n) and cum - cnt < ceil(q * n)
    """
