"""geomesa_ray — a Ray-Data-native spatio-temporal indexing and query engine.

A from-scratch re-creation of the computation performed by the reference
GeoMesa engine (space-filling-curve keys, range planning, spatial joins, kNN,
density/tile aggregation, stats sketches) expressed as ``ray.data.Dataset``
pipelines of vectorized ``map_batches`` over zero-copy Arrow batches, with
actor pools for stateful stages.

Layout:
    curves/     pure numpy kernels: Z2/Z3 interleave, normalization, time
                binning, XZ2, geohash, quadtree cells, range planning,
                S2 scheme, H3-analog hex tessellation (hexgrid)
    geometry/   from-scratch vectorized geometry: WKB/WKT, point-in-polygon,
                STRtree, measures (no shapely/GEOS in this environment)
    stages/     Ray Data operators (extract, encode, join, knn, density, ...)
    sources/    readers/writers + the deterministic synthetic pages generator
    functions/  the st_* scalar function library
    pipelines/  composed query pipelines (ingest, scan, join, tiles)
    state/      checkpoint manifest / per-partition lineage
"""

__version__ = "0.1.0"
