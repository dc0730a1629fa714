"""Engine configuration.

Mirrors the reference's composite config types
(src/main/sql/types_resolve_overlap.sql:1-113) as a plain dataclass: the
resolve_overlap_data_input_type / _topology_type / _clean_type fields that
still make sense in a Spark engine are kept under the same semantics, with
the reference's derived constants (tol/20, tol/5, 2*tol, 12*tol corridor)
exposed as properties so they are named, not magic.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class GridConfig:
    """Content-balanced grid parameters.

    Reference: cbg_content_based_balanced_grid recursion
    (src/test/sql/regress/find_overlap_and_gap-pre.sql:121-249): split a cell
    into quadrants while it holds more than ``max_rows_in_each_cell`` rows and
    its side exceeds a minimum. Here cells are Z-order (Morton) quadtree cells
    over lon/lat; refinement = move rows to the 4 child cells.
    """

    base_resolution: int = 4          # starting cell resolution (2^r x 2^r grid)
    max_resolution: int = 16          # analog of the 1000 m min-cell-side stop
    max_rows_in_each_cell: int = 5000  # reference default (function_resolve_overlap_gap_run.sql:23)


@dataclass(frozen=True)
class EngineConfig:
    """Top-level engine config (analog of resolve_overlap_data_input_type,
    types_resolve_overlap.sql:1-33)."""

    snap_tolerance: float = 1e-5      # _snap_tolerance; grid size of the dissolve
    min_area_to_keep: float = 0.0     # slivers below this merge into neighbors
    simplify_tolerance: float = 0.0   # 0 = no simplify (ST_SimplifyPreserveTopology analog)
    chaikins_iterations: int = 0      # smoothing off by default
    utm: bool = False                 # planar (True) vs geographic degrees (False)
    geodesic_measure: bool = False    # when True (and utm=False): sliver/min
                                      # areas are m^2, the reference's
                                      # ST_Area(g,true) path
                                      # (…utils/function_01_get_face_area.sql:24-28)
    geodesic_spheroid: bool = True    # geodesic measure figure: WGS84
                                      # spheroid (reference/PostGIS parity;
                                      # authalic q-series) vs mean-radius
                                      # sphere (False — up to ~0.5% area
                                      # divergence, the round-3 behavior)
    noding_max_iter: int = 8          # snap-noding fixpoint budget; features
                                      # still interacting after this many
                                      # rounds are QUARANTINED (reference
                                      # _no_cut_line_failed,
                                      # function_resolve_overlap_gap_init.sql:221-232)
    grid: GridConfig = field(default_factory=GridConfig)

    # --- reference-derived constants, kept under their origin names ---
    @property
    def presnap_grid(self) -> float:
        """Pre-snap grid before union/merge: tolerance/20 (degrees runs) —
        view_get_simplified_border_lines_function_v.sql:45-49."""
        return self.snap_tolerance / (5.0 if self.utm else 20.0)

    @property
    def border_strip_width(self) -> float:
        """Inner boundary shrink: 2 x tolerance
        (view_get_simplified_border_lines_function_v.sql:58-62)."""
        return 2.0 * self.snap_tolerance

    @property
    def border_corridor_width(self) -> float:
        """Cell-border corridor: 12 x tolerance
        (function_resolve_overlap_gap_job_list.sql:45,125)."""
        return 12.0 * self.snap_tolerance
