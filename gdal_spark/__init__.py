"""gdal_spark — a PySpark-native spatial-join + tiling engine.

A from-scratch reimplementation of the *semantics* of GDAL's core
raster/vector operators (reference: GDAL 3.7.0 at /root/reference) as
Spark DataFrame stages over a table of geo-referenced image tiles:

- tile-grid / cell assignment  (``gdal_spark.grid``, ``operators.cells``)
  — WebMercator + Geodetic z/x/y grids with quadkey hierarchy, the
  engine's "H3/S2" cell family (reference: osgeo_utils/gdal2tiles.py:337-653)
- spatial join (point-in-polygon)  (``operators.spatial_join``)
  — cell-prefix equi-prefilter + exact even-odd ray-cast refine
  (reference: ogr/ogrsf_frmts/generic/ogrlayer.cpp:1445 FilterGeometry,
  alg/llrasterize.cpp:76 scanline even-odd rule)
- kNN via cell-ring expansion  (``operators.knn``)
  (reference: alg/gdalgrid.cpp:259-375 quadtree radius search)
- warp / reproject with the 14 GDAL resamplers  (``operators.warp``)
  (reference: alg/gdalwarpkernel.cpp, alg/gdalwarper.h:51-85)
- rasterize / polygonize  (``operators.rasterize``, ``operators.polygonize``)
  (reference: alg/gdalrasterize.cpp, alg/polygonize.cpp)
- tile pyramid build with resumable checkpointing  (``operators.pyramid``)
  (reference: osgeo_utils/gdal2tiles.py generate_base_tiles/create_overview_tile)
- band statistics / histogram / GDAL checksum  (``operators.stats``)
  (reference: gcore/gdalrasterband.cpp:5568, alg/gdalchecksum.cpp:66)

plus the large-scale training-data-pipeline layer (``functions``):
dedup (exact / MinHash-LSH / SimHash / n-gram Jaccard), similarity
search over embeddings, text analysis (lang-id, quality, tokens,
fingerprints), and multimodal binary-column plumbing.

Design rules (see SURVEY.md §7): semantics live in vectorized numpy
inside pandas/Arrow UDFs; orchestration (partitioning, joins,
aggregation, pruning, resume) is native DataFrame ops so Catalyst can
optimize. No per-row Python anywhere.
"""

__version__ = "0.1.0"
