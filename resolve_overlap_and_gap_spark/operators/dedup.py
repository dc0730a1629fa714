"""Deduplication operators over the documents/pages table.

Exact dedup = hash-groupBy (one shuffle, map-side partial agg).
MinHash / SimHash / n-gram Jaccard use md5-based hashes so the DuckDB oracle
can reproduce them bit-for-bit (Spark's hash() and DuckDB's hash() differ;
md5 is the portable common denominator — the production path can swap in
xxhash64 behind the same API).

The min-id keep rule is the reference's canonical-owner rule
(view_get_left_over_borders.sql:15-28) applied to duplicate groups.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from resolve_overlap_and_gap_spark.derive import SPARK, norm_ws_sql


def normalize_sql(col: str, dialect: str) -> str:
    return f"lower({norm_ws_sql(col, dialect)})"


def h32_of_sql(expr: str, salt: str, dialect: str) -> str:
    """32-bit bigint hash of an expression (portable md5 prefix)."""
    if dialect == SPARK:
        return f"cast(conv(substr(md5(concat({expr}, '{salt}')),1,8),16,10) as bigint)"
    return f"(('0x' || substr(md5(concat({expr}, '{salt}')),1,8))::bigint)"


def exact_dedup(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep min-id per identical normalized text; report group size."""
    return (
        docs.selectExpr(
            f"md5({normalize_sql(text_col, SPARK)}) as text_hash",
            f"cast({id_col} as bigint) as doc_id",
        )
        .groupBy("text_hash")
        .agg(F.min("doc_id").alias("keep_id"), F.count("*").alias("n_dups"))
    )


def shingles(docs: DataFrame, k: int = 3, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Distinct word k-shingles per doc. JVM-side: split -> transform over an
    index sequence -> explode (no Python)."""
    norm = normalize_sql(text_col, SPARK)
    return (
        docs.selectExpr(
            f"cast({id_col} as bigint) as doc_id", f"split({norm}, ' ') as toks"
        )
        .selectExpr(
            "doc_id",
            f"explode(transform(sequence(1, greatest(size(toks)-{k}+1, 1)), "
            f"i -> array_join(slice(toks, i, {k}), ' '))) as shingle",
        )
        .distinct()
    )


def shingles_duckdb_sql(k: int = 3, text_col: str = "text", id_col: str = "doc_id",
                        table: str = "documents") -> str:
    """DuckDB rendering of the same shingling (list slice + unnest)."""
    norm = normalize_sql(text_col, "duckdb")
    return f"""
        select distinct cast({id_col} as bigint) as doc_id,
               array_to_string(t[i:i+{k}-1], ' ') as shingle
        from (select {id_col}, string_split({norm}, ' ') as t from {table}),
             unnest(generate_series(1, greatest(length(t)-{k}+1, 1))) as u(i)
    """


def minhash_signatures(sh: DataFrame, n_hashes: int = 16) -> DataFrame:
    """MinHash signature per doc: min over shingles of h32(shingle||seed)."""
    hashes = [
        F.expr(h32_of_sql("shingle", f":{i}", SPARK)).alias(f"h{i}")
        for i in range(n_hashes)
    ]
    per = sh.select("doc_id", *hashes)
    aggs = [F.min(f"h{i}").alias(f"mh{i}") for i in range(n_hashes)]
    return per.groupBy("doc_id").agg(*aggs)


def minhash_lsh_pairs(sig: DataFrame, bands: int = 4, rows_per_band: int = 4) -> DataFrame:
    """LSH banding: docs sharing any band bucket become candidate pairs.

    No materialization of ``sig``: although the plan text shows the
    signature pipeline 2 x bands times, AQE reuses the identical shuffle
    stages at runtime — an explicit localCheckpoint was measured SLOWER
    (2.99 s vs 1.91 s at sf0.1, r6) because it adds a blocking job and
    breaks pipelining into the band joins."""
    out = None
    for b in range(bands):
        cols = [f"mh{b * rows_per_band + r}" for r in range(rows_per_band)]
        key = F.md5(F.concat_ws("_", *[F.col(c).cast("string") for c in cols]))
        banded = sig.select(F.col("doc_id"), key.alias("bucket"))
        j = (
            banded.alias("a")
            .join(banded.alias("b"), "bucket")
            .where(F.col("a.doc_id") < F.col("b.doc_id"))
            .select(
                F.col("a.doc_id").alias("id_a"),
                F.col("b.doc_id").alias("id_b"),
            )
        )
        out = j if out is None else out.unionByName(j)
    return out.distinct()


def ngram_jaccard_pairs(docs: DataFrame, k: int = 3, threshold: float = 0.5,
                        text_col: str = "text", id_col: str = "doc_id",
                        max_df: int | None = None) -> DataFrame:
    """Exact n-gram Jaccard for candidate pairs sharing >=1 shingle.
    |A∩B| via shingle equi-join; |A∪B| = |A|+|B|-|A∩B|. Jaccard reported
    x1e6 floored (portable integer output).

    max_df (stop-shingle cap): a shingle appearing in more than max_df
    documents contributes df^2 rows to the equi-join — one corpus-wide
    boilerplate shingle makes the join quadratic in corpus size. With
    max_df set, shingles with document frequency > max_df are dropped
    BEFORE the join (from both the intersection and the per-doc sizes, so
    Jaccard stays a true Jaccard over the filtered shingle space). The
    dropped set has at most total_shingle_rows / max_df entries, so the
    anti-join side is bounded; AQE broadcasts it when small."""
    sh = shingles(docs, k, text_col, id_col)
    if max_df is not None:
        hot = (sh.groupBy("shingle").agg(F.count("*").alias("df"))
                 .where(F.col("df") > max_df).select("shingle"))
        sh = sh.join(hot, "shingle", "left_anti")
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    inter = (
        sh.alias("a").join(sh.alias("b"), "shingle")
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
        .agg(F.count("*").alias("n_inter"))
    )
    j = (
        inter.join(sizes.withColumnRenamed("doc_id", "id_a").withColumnRenamed("n_sh", "na"), "id_a")
        .join(sizes.withColumnRenamed("doc_id", "id_b").withColumnRenamed("n_sh", "nb"), "id_b")
        .withColumn(
            "jaccard_x1e6",
            F.expr("cast(floor(cast(n_inter as double) / cast(na + nb - n_inter as double) * 1000000.0) as bigint)"),
        )
    )
    return j.where(F.col("jaccard_x1e6") >= int(threshold * 1e6)).select(
        "id_a", "id_b", "jaccard_x1e6"
    )


def simhash(docs: DataFrame, bits: int = 16, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """SimHash over word tokens: bit i set iff sum over tokens of
    ±1 (by bit i of h32(token)) is positive. Portable integer math."""
    norm = normalize_sql(text_col, SPARK)
    toks = docs.selectExpr(
        f"cast({id_col} as bigint) as doc_id",
        f"explode(split({norm}, ' ')) as tok",
    ).withColumn("h", F.expr(h32_of_sql("tok", ":sh", SPARK)))
    aggs = [
        (2 * F.sum(F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1))) - F.count("*") > 0)
        .cast("long").alias(f"b{i}")
        for i in range(bits)
    ]
    per = toks.groupBy("doc_id").agg(*aggs)
    expr = F.lit(0).cast("long")
    for i in range(bits):
        expr = expr + F.shiftleft(F.col(f"b{i}"), i)
    return per.select("doc_id", expr.alias("simhash"))


def simhash_neardup_pairs(sh: DataFrame, bits: int = 16, bands: int = 4,
                          max_hamming: int = 3) -> DataFrame:
    """SimHash near-duplicate pairs: hamming(simhash_a, simhash_b) <=
    max_hamming, candidates via band blocking (pigeonhole: with
    max_hamming < bands, at least one of `bands` equal-width bit-bands is
    identical between any near-dup pair, so the band equi-join is a strict
    superset of the answer — never a cross join). Exact hamming refine is
    JVM-side xor + bit_count.

    Requires max_hamming < bands for completeness (asserted)."""
    assert max_hamming < bands, "pigeonhole completeness needs max_hamming < bands"
    rows = bits // bands
    mask = (1 << rows) - 1
    # one evaluation of the upstream simhash aggregation (the self-join's
    # two aliases would re-run it twice otherwise)
    sh = sh.localCheckpoint()
    banded = sh.select(
        "doc_id", "simhash",
        F.explode(F.array(*[
            F.struct(
                F.lit(b).alias("band_idx"),
                F.shiftright(F.col("simhash"), b * rows).bitwiseAND(F.lit(mask)).alias("band_val"),
            ) for b in range(bands)
        ])).alias("bk"),
    ).select("doc_id", "simhash", "bk.band_idx", "bk.band_val")
    a = banded.alias("a")
    b = banded.alias("b")
    # canonical-band dedup instead of a distinct(): a qualifying pair is
    # emitted ONLY from the first band the two hashes share — derivable
    # from simhash_a ^ simhash_b alone, so no shuffle-for-distinct of the
    # (quadratic-in-group) pair table is needed (the celljoin
    # canonical-cell rule applied to band space)
    xor = F.expr("a.simhash ^ b.simhash")
    first_shared = F.lit(None).cast("int")
    for bi in reversed(range(bands)):
        band_zero = F.shiftright(xor, bi * rows).bitwiseAND(F.lit(mask)) == 0
        first_shared = F.when(band_zero, F.lit(bi)).otherwise(first_shared)
    pairs = (
        a.join(b, ["band_idx", "band_val"])
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .where(F.col("band_idx") == first_shared)
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            F.expr("bit_count(a.simhash ^ b.simhash)").cast("long").alias("hamming"),
        )
        .where(F.col("hamming") <= max_hamming)
    )
    return pairs


def positioned_grams(docs: DataFrame, k: int, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """(doc_id, pos, gram): word k-gram starting at 1-based token pos —
    the positioned (non-distinct) sibling of `shingles`, the input to
    exact shared-substring span detection.  JVM-side end to end."""
    norm = normalize_sql(text_col, SPARK)
    return (
        docs.selectExpr(
            f"cast({id_col} as bigint) as doc_id", f"split({norm}, ' ') as toks"
        )
        .selectExpr(
            "doc_id",
            f"posexplode(transform(sequence(1, greatest(size(toks)-{k}+1, 1)), "
            f"i -> array_join(slice(toks, i, {k}), ' '))) as (p, gram)",
        )
        .selectExpr("doc_id", "cast(p + 1 as bigint) as pos", "gram")
    )


def positioned_grams_duckdb_sql(k: int, text_col: str = "text",
                                id_col: str = "doc_id",
                                table: str = "documents") -> str:
    """DuckDB rendering of the same positioned k-grams."""
    norm = normalize_sql(text_col, "duckdb")
    return f"""
        select cast({id_col} as bigint) as doc_id, cast(i as bigint) as pos,
               array_to_string(t[i:i+{k}-1], ' ') as gram
        from (select {id_col}, string_split({norm}, ' ') as t from {table}),
             unnest(generate_series(1, greatest(length(t)-{k}+1, 1))) as u(i)
    """


def shared_span_pairs(docs: DataFrame, k: int = 6, min_tokens: int = 12,
                      max_df: int | None = 1000, text_col: str = "text",
                      id_col: str = "doc_id") -> DataFrame:
    """Exact shared-substring spans across document pairs — the training-
    data substring-dedup primitive (find every verbatim run of
    >= min_tokens tokens appearing in two documents; Lee et al. 2021 use
    a suffix array for the same query, but on Spark the scalable shape is
    a positioned-k-gram equi-join + per-diagonal run chaining):

      1. positioned k-grams, one shuffle-free Project per doc;
      2. gram equi-join (a.doc_id < b.doc_id) — one hash shuffle, the
         only quadratic risk is a gram shared by many docs, capped by
         dropping grams with more than max_df OCCURRENCES corpus-wide
         (the `ngram_jaccard_pairs` stop-shingle rule; a dropped hot
         gram can split a span that crosses it — documented semantics,
         mirrored exactly in the oracle);
      3. a shared span of length L appears as L-k+1 matches on one
         diagonal (pa - pb constant); maximal runs found per
         (pair, diagonal) with the gaps-and-islands window
         (island = pa - row_number), no global sort.

    Returns (doc_a, doc_b, start_a, start_b, span_tokens, n_grams), one
    row per maximal shared run with span_tokens >= min_tokens.  At 100 TB
    the pair table is bounded by true duplication x (span length / 1),
    not corpus^2, and every stage is JVM-side."""
    from pyspark.sql import Window

    g = positioned_grams(docs, k, text_col, id_col)
    if max_df is not None:
        hot = (g.groupBy("gram").agg(F.count("*").alias("df"))
               .where(F.col("df") > max_df).select("gram"))
        g = g.join(hot, "gram", "left_anti")
    a, b = g.alias("a"), g.alias("b")
    pairs = (
        a.join(b, "gram")
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.pos").alias("pa"),
            F.col("b.pos").alias("pb"),
            (F.col("a.pos") - F.col("b.pos")).alias("diag"),
        )
    )
    w = Window.partitionBy("doc_a", "doc_b", "diag").orderBy("pa")
    runs = pairs.withColumn("island", F.col("pa") - F.row_number().over(w))
    return (
        runs.groupBy("doc_a", "doc_b", "diag", "island")
        .agg(
            F.min("pa").alias("start_a"),
            F.min("pb").alias("start_b"),
            (F.max("pa") - F.min("pa") + F.lit(k)).cast("long").alias("span_tokens"),
            F.count("*").alias("n_grams"),
        )
        .where(F.col("span_tokens") >= min_tokens)
        .select("doc_a", "doc_b", "start_a", "start_b", "span_tokens", "n_grams")
    )


def mixture_downsample(docs: DataFrame, weights: dict[str, tuple[int, int]],
                       salt: str = "mix", id_col: str = "doc_id",
                       source_col: str = "source") -> DataFrame:
    """Deterministic data-mixing step: downsample each source to a target
    fraction num/den of its own row count (the mixture-reweighting
    operation of LM corpus pipelines), keeping a reproducible
    pseudo-random subset — docs ranked per source by the portable md5
    hash h32(doc_id||salt) (tie: doc_id) and kept while
    rank <= cnt*num intdiv den.  Quotas are pure integer math so any
    engine lands the same keep-set bit for bit.

    One window pass computes rank and per-source count together (one
    shuffle on source); the weights table is a broadcast literal dim.
    Sources absent from `weights` are kept whole (num=den=1).  At 100 TB
    the exact per-source rank is a sort per source — if a single source
    dominates the corpus, swap the rank for the hash-threshold variant
    (keep h32 % den < num): no sort, same expectation, approximate
    quota."""
    from pyspark.sql import Window

    spark = docs.sparkSession
    wdim = spark.createDataFrame(
        [(s, n, d) for s, (n, d) in sorted(weights.items())],
        "source string, num long, den long")
    h = h32_of_sql(f"cast({id_col} as string)", salt, SPARK)
    slim = docs.selectExpr(
        f"cast({id_col} as bigint) as doc_id",
        f"{source_col} as source",
        f"{h} as h")
    w = Window.partitionBy("source").orderBy("h", "doc_id")
    ranked = (slim
              .withColumn("rk", F.row_number().over(w))
              .withColumn("cnt", F.count("*").over(Window.partitionBy("source"))))
    return (ranked.join(F.broadcast(wdim), "source", "left")
            .where(F.col("rk") <= F.expr(
                "cnt * coalesce(num, 1) div coalesce(den, 1)"))
            .selectExpr("doc_id", "source", "cast(rk as bigint) as rk"))


def mixture_downsample_duckdb_sql(weights: dict[str, tuple[int, int]],
                                  salt: str = "mix", id_col: str = "doc_id",
                                  source_col: str = "source",
                                  table: str = "documents") -> str:
    """DuckDB twin of mixture_downsample (same hash, same integer quota)."""
    h = h32_of_sql(f"cast({id_col} as string)", salt, "duckdb")
    vals = ", ".join(f"('{s}', {n}, {d})" for s, (n, d) in sorted(weights.items()))
    return f"""
        with wdim(source, num, den) as (values {vals}),
        slim as (
          select cast({id_col} as bigint) as doc_id, {source_col} as source,
                 {h} as h
          from {table}),
        ranked as (
          select doc_id, source,
                 row_number() over (partition by source order by h, doc_id) as rk,
                 count(*) over (partition by source) as cnt
          from slim)
        select doc_id, source, cast(rk as bigint) as rk
        from ranked left join wdim using (source)
        where rk <= cnt * coalesce(num, 1) // coalesce(den, 1)
    """


def docs_to_lines(docs: DataFrame, tokens_per_line: int = 10,
                  text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(doc_id, pos, line): deterministic re-lining of a token stream into
    fixed-width pseudo-sentences (the corpus here carries no newlines; a
    real crawl corpus would `split(text, '\\n')` instead — the dedup step
    below is agnostic to how lines were produced).  JVM-side end to end."""
    norm = normalize_sql(text_col, SPARK)
    t = tokens_per_line
    return (
        docs.selectExpr(
            f"cast({id_col} as bigint) as doc_id", f"split({norm}, ' ') as toks"
        )
        .selectExpr(
            "doc_id",
            f"posexplode(transform(sequence(1, size(toks), {t}), "
            f"i -> array_join(slice(toks, i, {t}), ' '))) as (p, line)",
        )
        .selectExpr("doc_id", "cast(p + 1 as bigint) as pos", "line")
    )


def docs_to_lines_duckdb_sql(tokens_per_line: int = 10, text_col: str = "text",
                             id_col: str = "doc_id",
                             table: str = "documents") -> str:
    """DuckDB rendering of the same re-lining."""
    norm = normalize_sql(text_col, "duckdb")
    t = tokens_per_line
    return f"""
        select cast({id_col} as bigint) as doc_id,
               cast((i - 1) // {t} + 1 as bigint) as pos,
               array_to_string(t[i:i+{t}-1], ' ') as line
        from (select {id_col}, string_split({norm}, ' ') as t from {table}),
             unnest(generate_series(1, greatest(length(t), 1), {t})) as u(i)
    """


def line_dedup_docs(docs: DataFrame, tokens_per_line: int = 10,
                    text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Corpus-wide line-level dedup (the C4/RefinedWeb cleanup step):
    every duplicated line keeps only its globally FIRST occurrence —
    ordered by (doc_id, pos) — and each document is reconstructed from
    its surviving lines in order.  Output: (doc_id, n_lines, n_kept,
    clean_text).

    Scale shape: ONE shuffle on the line value (the row_number window);
    reconstruction is a groupBy on doc_id (second shuffle).  No driver
    state, no UDFs; at 100 TB the line window is the same partition-by-
    hash pattern as exact_dedup, and skew (a viral boilerplate line) is
    bounded because only rank-1 survives the window — AQE splits the
    oversized partition.

    C4 (Raffel et al. 2020 §2.2) discards all-but-one occurrence of any
    repeated three-sentence span; this operator is that rule at line
    granularity with a deterministic first-wins keep rule (the min-id
    canonical-owner rule, reference view_get_left_over_borders.sql)."""
    from pyspark.sql import Window

    lines = docs_to_lines(docs, tokens_per_line, text_col, id_col)
    w = Window.partitionBy("line").orderBy("doc_id", "pos")
    flagged = lines.withColumn(
        "keep", F.row_number().over(w) == F.lit(1))
    return (
        flagged.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_lines"),
            F.sum(F.col("keep").cast("long")).alias("n_kept"),
            F.expr(
                "array_join(transform(filter(sort_array(collect_list("
                "struct(pos, line, keep))), s -> s.keep), s -> s.line), ' ')"
            ).alias("clean_text"),
        )
        .selectExpr("doc_id", "cast(n_lines as bigint) as n_lines",
                    "cast(n_kept as bigint) as n_kept", "clean_text")
    )


def line_dedup_docs_duckdb_sql(tokens_per_line: int = 10,
                               text_col: str = "text", id_col: str = "doc_id",
                               table: str = "documents") -> str:
    """DuckDB twin of line_dedup_docs (same keep rule, same reassembly)."""
    return f"""
        with l as ({docs_to_lines_duckdb_sql(tokens_per_line, text_col,
                                             id_col, table)}),
        r as (
          select *, row_number() over
                 (partition by line order by doc_id, pos) as rn
          from l)
        select doc_id, cast(count(*) as bigint) as n_lines,
               cast(sum(case when rn = 1 then 1 else 0 end) as bigint) as n_kept,
               coalesce(string_agg(case when rn = 1 then line end, ' '
                                   order by pos), '') as clean_text
        from r group by doc_id
    """
