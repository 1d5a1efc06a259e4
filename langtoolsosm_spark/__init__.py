"""langtoolsosm_spark — a PySpark-native geospatial analytics engine.

Brand-new engine with the query/data-processing capabilities of the
reference repo OSM-Catalan/LangToolsOSM (read-only at /root/reference),
re-expressed Spark-first: H3-style quadtree cell indexing, point-in-polygon
joins, kNN enrichment, raster<->vector tiling, translation-fill operators,
dedup / similarity / text-analysis pipelines, and a snapshot/checkpoint
layer — all DataFrame + vectorized Arrow/pandas UDFs, no per-row Python.

See SURVEY.md for the reference->engine mapping (file:line citations).
"""

__version__ = "0.1.0"
