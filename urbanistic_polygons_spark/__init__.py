"""urbanistic_polygons_spark — a from-scratch PySpark-native spatial-join +
urban-polygon engine with the capabilities of anyways-open/urbanistic-polygons.

Architecture (Spark-first, not a port):
- columnar tables (parquet/Iceberg) instead of per-tile binary graph files
- cell-grid (z14 slippy tile) equi-joins instead of R-tree probes
- Catalyst/AQE for pushdown, broadcast, skew; explicit salting on hot cells
- per-cell ``applyInPandas`` kernels only for the inherently sequential
  half-edge face walk; everything else is declarative DataFrame ops
"""

__version__ = "0.1.0"
