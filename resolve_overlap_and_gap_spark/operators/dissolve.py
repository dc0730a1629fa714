"""Dissolve (geometric union by key) — A2 in SURVEY.md §2.4:
`ST_Union(geo) GROUP BY key` (find_overlap_and_gap-pre.sql:597-615, line
merge pipelines …single_cell.sql:360-369).

Spark-native: groupBy(key) -> Arrow-batched arrangement union per group.
Because resolve() pieces tile exactly on snap-grid-aligned cell borders,
dissolving an owner's per-cell pieces drops the internal border edges —
this IS the cross-cell heal for owner geometry (reference job type 4,
ST_ModEdgeHeal semantics): two pieces meeting at a grid border merge into
one face with the border edge gone.

Scale note: one shuffle on the dissolve key; a single group holds one key's
geometry (bounded for real layers — a municipality's pieces, not the world).
Global all-rows union would instead tree-reduce per partition first.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from resolve_overlap_and_gap_spark.geom import wkb
from resolve_overlap_and_gap_spark.geom.arrangement import union_faces

DISSOLVE_SCHEMA = T.StructType([
    T.StructField("key", T.LongType()),
    T.StructField("area", T.DoubleType()),
    T.StructField("n_parts", T.IntegerType()),
    T.StructField("geom", T.BinaryType()),
])


def _union_one_group(key: int, geoms: list[bytes], grid_size: float) -> tuple:
    polys = []
    for b in geoms:
        for rings in wkb.load_polygons(bytes(b)):
            ir = [np.floor(np.asarray(r, np.float64) / grid_size + 0.5).astype(np.int64)
                  for r in rings]
            polys.append((0, ir))
    if len(polys) == 1:
        # fast path: a single polygon part IS its own union — skip the
        # arrangement entirely (the common case after per-cell resolve)
        from resolve_overlap_and_gap_spark.geom.core import ring_area2

        rings = polys[0][1]
        a2 = abs(ring_area2(rings[0].astype(np.float64)))
        for h in rings[1:]:
            a2 -= abs(ring_area2(h.astype(np.float64)))
        mp = [[r.astype(np.float64) * grid_size for r in rings]]
        return (key, a2 / 2.0 * grid_size * grid_size, 1, wkb.dump_multipolygon(mp))
    out = union_faces(polys)
    mp = [
        [f.shell.astype(np.float64) * grid_size]
        + [h.astype(np.float64) * grid_size for h in f.holes]
        for f in out
    ]
    area = sum(f.area2 for f in out) / 2.0 * grid_size * grid_size
    return (key, area, len(out), wkb.dump_multipolygon(mp))


def dissolve(df: DataFrame, key_col: str, grid_size: float,
             geom_col: str = "geom") -> DataFrame:
    """-> (key, area, n_parts, geom WKB multipolygon): union of all
    geometries per key on the snap grid (winding >= 1 rule, so overlapping
    inputs union correctly)."""
    slim = df.select(
        F.col(key_col).cast("long").alias("key"), F.col(geom_col).alias("geom")
    )

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        rows = [
            _union_one_group(int(k), list(sub["geom"]), grid_size)
            for k, sub in pdf.groupby("key", sort=True)
        ]
        return pd.DataFrame(rows, columns=["key", "area", "n_parts", "geom"])

    # hashed buckets: many keys per Arrow round-trip
    bucketed = slim.withColumn("bucket", F.pmod(F.hash("key"), F.lit(256)))
    return bucketed.groupBy("bucket").applyInPandas(kernel, DISSOLVE_SCHEMA)
