"""Deterministic geometry derivation ("geo-parse" stage).

The graft's input is a Common-Crawl-style pages table (url, warc_ts, html,
text, lang) — BASELINE.json input_hint. Geometries (a lon/lat point per page,
plus an axis-aligned footprint box for a subset) are derived deterministically
from the row key via md5, so the same SQL produces bit-identical doubles in
Spark and DuckDB. This is the graft analog of the reference's fixture
geometries (src/test/sql/regress/overlap_gap_input_t1.sql:28-40) and lets
every spatial operator be oracle-checked end-to-end.

All formulas exist once, parameterized by dialect; `spark` and `duckdb`
renderings differ only in the hex->bigint cast spelling.
"""

from __future__ import annotations

SPARK = "spark"
DUCKDB = "duckdb"


def regex_replace_all_sql(col: str, pattern: str, repl: str, dialect: str) -> str:
    """Global regex replace, portable. ``pattern`` is the raw regex (e.g.
    r"\\s+"). Spark escapes backslashes inside SQL string literals and is
    global by default; DuckDB takes raw backslashes and needs the 'g' flag."""
    if dialect == SPARK:
        pat = pattern.replace("\\", "\\\\")
        return f"regexp_replace({col}, '{pat}', '{repl}')"
    return f"regexp_replace({col}, '{pattern}', '{repl}', 'g')"


def regex_extract_sql(col: str, pattern: str, dialect: str) -> str:
    """First match (group 0) of a regex, portable — same backslash
    escaping split as regex_replace_all_sql; '' when no match in both
    engines."""
    if dialect == SPARK:
        pat = pattern.replace("\\", "\\\\")
        return f"regexp_extract({col}, '{pat}', 0)"
    return f"coalesce(regexp_extract({col}, '{pattern}'), '')"


def norm_ws_sql(col: str, dialect: str) -> str:
    """trim + squeeze internal whitespace to single spaces."""
    return regex_replace_all_sql(f"trim({col})", r"\s+", " ", dialect)


def h32(key_expr: str, salt: str, dialect: str) -> str:
    """32-bit unsigned hash (as bigint) of ``key_expr`` + salt via md5 — the
    only construct that differs between dialects."""
    if dialect == SPARK:
        s = f"concat(cast({key_expr} as string), '{salt}')"
        return f"cast(conv(substr(md5({s}),1,8),16,10) as bigint)"
    s = f"concat(cast({key_expr} as varchar), '{salt}')"
    return f"(('0x' || substr(md5({s}),1,8))::bigint)"


def lon_sql(key_expr: str, dialect: str) -> str:
    """Longitude in [-180, 180) with 1e-4 degree granularity."""
    return f"(-180.0 + cast({h32(key_expr, ':lon', dialect)} % 3600000 as double) / 10000.0)"


def lat_sql(key_expr: str, dialect: str) -> str:
    """Latitude in [-85, 85) (polar caps excluded, like web-mercator tiles)."""
    return f"(-85.0 + cast({h32(key_expr, ':lat', dialect)} % 1700000 as double) / 10000.0)"


def halfwidth_sql(key_expr: str, dialect: str, scale: float = 1.0) -> str:
    """Footprint half-width in degrees, in [0.05, 0.55) * scale."""
    return f"((0.05 + cast({h32(key_expr, ':w', dialect)} % 5000 as double) / 10000.0) * {scale!r})"


def box_sql(key_expr: str, dialect: str, scale: float = 1.0) -> dict[str, str]:
    """Axis-aligned footprint box around the derived point."""
    lon, lat = lon_sql(key_expr, dialect), lat_sql(key_expr, dialect)
    w = halfwidth_sql(key_expr, dialect, scale)
    return {
        "xmin": f"({lon} - {w})",
        "xmax": f"({lon} + {w})",
        "ymin": f"({lat} - {w})",
        "ymax": f"({lat} + {w})",
    }


def point_select(key_col: str, id_alias: str, dialect: str) -> list[str]:
    """SELECT-list fragments: id, px, py."""
    return [
        f"cast({key_col} as bigint) as {id_alias}",
        f"{lon_sql(key_col, dialect)} as px",
        f"{lat_sql(key_col, dialect)} as py",
    ]


def box_select(key_col: str, id_alias: str, dialect: str, scale: float = 1.0) -> list[str]:
    b = box_sql(key_col, dialect, scale)
    return [
        f"cast({key_col} as bigint) as {id_alias}",
        f"{b['xmin']} as xmin",
        f"{b['ymin']} as ymin",
        f"{b['xmax']} as xmax",
        f"{b['ymax']} as ymax",
    ]


def phase_sql(key_expr: str, dialect: str) -> str:
    """Rotation phase in [0, 6.283) radians."""
    return f"(cast({h32(key_expr, ':rot', dialect)} % 6283 as double) / 1000.0)"


def regular_ngon_vertices_sql(key_expr: str, k: int, dialect: str,
                              scale: float = 1.0) -> list[tuple[str, str]]:
    """Vertices of a regular (convex, counterclockwise) k-gon footprint
    around the derived page point, rotated by a per-key phase. The SAME
    literal angle constants render in both dialects, and the numpy mirror
    (sources.pages.with_regular_ngon) uses the same formula, so the Spark
    WKB path and the SQL oracle see identical vertices."""
    import math

    cx, cy = lon_sql(key_expr, dialect), lat_sql(key_expr, dialect)
    r = halfwidth_sql(key_expr, dialect, scale)
    ph = phase_sql(key_expr, dialect)
    out = []
    for i in range(k):
        a = repr(2.0 * math.pi * i / k)
        out.append((
            f"({cx} + {r} * cos({ph} + {a}))",
            f"({cy} + {r} * sin({ph} + {a}))",
        ))
    return out
