"""Vectorized geometry kernels (pure numpy, Arrow-batched).

The environment has no shapely/h3/pyproj, so the engine ships its own
minimal, fully vectorized kernel set:

- ``cells``  — hierarchical Z-order grid cell index over the working extent
               (plays H3/S2 per BASELINE.json north_rule, and plays the
               reference's GiST indexes).
- ``core``   — ray-cast point-in-polygon, shoelace area/centroid,
               point-on-surface, rectangle/edge intersection, closedness,
               simplification: the PostGIS surface of SURVEY.md §2.8.
- ``wkb``    — ISO WKB encode/decode for interchange/golden artifacts
               (NOT the hot path; the hot path is columnar ring coords).
"""
