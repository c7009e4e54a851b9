"""pdxbldgimport_spark — a from-scratch PySpark-native spatial conflation +
tiling engine with the query/data-processing capabilities of the reference
pipeline ``pdxosgeo/pdxbldgimport`` (PostGIS/Rake building-import DAG),
re-expressed over Common-Crawl-style webtext tables per BASELINE.json.

Architecture (Spark-first, NOT a port):

- Geometry has no native Spark type. The engine's canonical representation is
  **columnar ring coordinates** (``array<double>`` flat [x0,y0,x1,y1,...])
  plus derived scalar columns (``lon``, ``lat``, bbox, centroid) and a
  **Z-order hierarchical cell index** (``geo.cells``) playing the role the
  reference's GiST spatial indexes play (reference: ``add_spatial_index``
  sites, tasks/pdx_bldgs.rake:120-121 et al.). All geometry math is
  vectorized numpy inside Arrow pandas UDFs — no per-row Python.
- Spatial joins (reference ST_Intersects joins, e.g. tasks/pdx_bldgs.rake:143)
  become cell-bucketed equi-joins (broadcast or shuffle, hot-cell salted)
  with an exact vectorized refine step (``operators.pip_join``).
- Every derived-table rake task (tasks/*.rake ``table`` blocks) becomes a
  pure DataFrame→DataFrame stage; UPDATE/DELETE-in-place chains become
  functional recompositions (join + coalesce / filter splits).
"""

__version__ = "0.4.0"
