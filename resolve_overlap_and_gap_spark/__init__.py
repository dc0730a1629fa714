"""resolve_overlap_and_gap_spark — a from-scratch PySpark-native spatial-join +
tiling engine with the query semantics of larsop/resolve-overlap-and-gap.

Built Spark-first: DataFrame/Catalyst plans, JVM built-in expressions for the
grid index and joins, Arrow-batched pandas UDFs (never per-row Python) only for
the geometry kernels Spark cannot express.

Reference semantics are documented per-module with /root/reference file:line
citations (see SURVEY.md).
"""

from resolve_overlap_and_gap_spark.config import EngineConfig
from resolve_overlap_and_gap_spark.session import get_spark

__all__ = ["EngineConfig", "get_spark"]
__version__ = "0.1.0"
