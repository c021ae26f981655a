"""hand_index_ray — a Ray-Data-native spatial-index + spatial-join engine.

From-scratch re-expression of the capabilities of NGWPC/hand-index
(reference snapshot at /root/reference, studied for *behavior* only):
a spatial catalog builder + query engine over tables of image+caption
tiles ("rasters") and catchment polygons, built as idiomatic Ray Data
pipelines — ``ray.data.Dataset`` → ``map_batches`` over zero-copy Arrow
batches, actor pools for stateful stages, groupby/sort shuffles for the
wide steps — instead of the reference's single-process DuckDB-SQL
execution (reference: load.py, query_geojson.py).

Layout:
  kernels/    pure numpy/pyarrow vectorized kernels (no Ray imports)
  sources/    deterministic synthetic fixture generation + readers
  state/      lineage manifest (per-partition checkpoint/resume)
  stages/     map_batches callables (stateless fns + actor-pool classes)
  pipelines/  end-to-end Dataset pipelines (build / query / dedup / ann / text)
  relational  generic relational operators over Arrow batches

Library code never calls ``ray.init()`` / ``ray.shutdown()`` — the
caller (driver, bench.py, tests' conftest) owns the Ray session.
"""

__version__ = "0.1.0"
