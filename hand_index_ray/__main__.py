"""CLI — the migration surface for reference users.

Maps the reference's two entry points onto this engine:

  load.py  (build an index from a HAND directory)        → ``build`` /
      ``build-catchments`` / ``compact``
  query_geojson.py (ROI query → per-catchment parquet)   → ``query``
  viz/query_visualization.py (validation counts)         → ``validate``
  (new, north rule)                                      → ``bbox`` /
      ``knn`` / ``zonal``

The CLI owns the Ray session (guarded init; library code never calls
ray.init — SURVEY.md §7.0). Flags mirror the reference's knobs:
``--threshold`` (query_geojson.py:269-275), ``--h3-resolution``-family
(load.py:314), batch sizing (load.py:317-322).
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def _ray():
    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="hand_index_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build", help="build the footprint index from an images table")
    b.add_argument("--images-dir", required=True)
    b.add_argument("--output-dir", required=True)
    b.add_argument("--no-resume", action="store_true",
                   help="rebuild everything (default resumes from the manifest)")
    b.add_argument("--compact", action="store_true", help="compact after building")
    b.add_argument("--part-level", type=int, default=None,
                   help="S2 level of the partition key (the engine's analog of "
                        "the reference's --h3-resolution, load.py:314)")
    b.add_argument("--batch-size", type=int, default=None,
                   help="decode batch size per task (reference --batch-size, "
                        "load.py:317-322)")

    bc = sub.add_parser("build-catchments", help="build the vector-side catalog "
                        "(grouped union per branch, reference load.py:146-173)")
    bc.add_argument("--input", required=True,
                    help="parquet with (geometry, branch_path), or a "
                         "*.gpkg / *.shp glob (branch_path = parent dir, "
                         "reference load.py:41,143)")
    bc.add_argument("--output", required=True)
    bc.add_argument("--partition-by-cell", action="store_true",
                    help="hive-partition output by h3_index "
                         "(reference PARTITION_BY, load.py:279-283)")
    bc.add_argument("--h3-resolution", type=int, default=None,
                    help="centroid cell resolution (reference default 1, load.py:314)")
    bc.add_argument("--simplify-tolerance", type=float, default=None,
                    help="geometry simplify tolerance in meters "
                         "(reference 100 m, load.py:155-156)")

    c = sub.add_parser("compact", help="merge per-fragment files into per-cell files")
    c.add_argument("--index-dir", required=True)

    sc = sub.add_parser("attach-sidecars", help="build hydrotable/raster pointer "
                        "tables from a HAND file tree (reference load.py:206-253)")
    sc.add_argument("--root", required=True, help="HAND tree root to list")
    sc.add_argument("--catchments", required=True, help="catchments parquet")
    sc.add_argument("--out-dir", required=True)
    sc.add_argument("--calb", action="store_true",
                    help="calibrated-tree layout: hydrotable CSVs one level under "
                         "the root, widened branch extract (reference load.py:42,208)")
    sc.add_argument("--schema-version", default="fim100",
                    help="registry version to validate outputs against "
                         "(the reference's --schema-path analog, load.py:307-311)")

    q = sub.add_parser("query", help="ROI query -> per-catchment parquet files "
                       "(reference query_geojson.py)")
    q.add_argument("-g", "--geojson", required=True)
    q.add_argument("-p", "--catchments", required=True, help="catchments parquet")
    q.add_argument("--vector-dir", required=True, help="dir with sidecar parquets")
    q.add_argument("-t", "--threshold", type=float, default=10.0)
    q.add_argument("-o", "--outdir", required=True)

    v = sub.add_parser("validate", help="candidate-vs-filtered QA counts "
                       "(reference viz, SURVEY.md §3.3)")
    v.add_argument("-g", "--geojson", required=True)
    v.add_argument("-p", "--catchments", required=True)
    v.add_argument("-t", "--threshold", type=float, default=10.0)
    v.add_argument("-o", "--geojson-out", default=None,
                   help="also write the query/intersecting/kept sets as one "
                        "GeoJSON FeatureCollection (the reference's folium "
                        "overlay, viz:178-472, as a portable artifact)")
    v.add_argument("--html-out", default=None,
                   help="also render a self-contained SVG-in-HTML QA map of "
                        "the three sets (reference viz parity, no folium "
                        "needed)")

    bb = sub.add_parser("bbox", help="bbox scan over the footprint index")
    bb.add_argument("--index-dir", required=True)
    bb.add_argument("--bbox", nargs=4, type=float, required=True,
                    metavar=("MINLON", "MINLAT", "MAXLON", "MAXLAT"))
    bb.add_argument("-o", "--out", help="write matching rows to this parquet dir")

    kn = sub.add_parser("knn", help="k nearest tiles to a point")
    kn.add_argument("--index-dir", required=True)
    kn.add_argument("--lon", type=float, required=True)
    kn.add_argument("--lat", type=float, required=True)
    kn.add_argument("-k", type=int, default=10)

    z = sub.add_parser("zonal", help="zonal footprint×catchment join")
    z.add_argument("--index-dir", required=True)
    z.add_argument("--catchments", required=True)
    z.add_argument("-o", "--out", help="write pairs to this parquet dir")

    pl = sub.add_parser("pipeline", help="run a spec-assembled pipeline "
                        "(steps.Pipeline.from_spec; JSON spec file)")
    pl.add_argument("--spec", required=True, help="path to the JSON spec")

    mv = sub.add_parser("export-mvt", help="export a geometry table as "
                        "Mapbox Vector Tiles (one .mvt per grid tile)")
    mv.add_argument("--catchments", required=True,
                    help="parquet with (geometry WKB, id)")
    mv.add_argument("--out-dir", required=True)
    mv.add_argument("--grid", type=int, default=8,
                    help="N×N tile grid over the collection bbox")
    mv.add_argument("--extent", type=int, default=4096)
    mv.add_argument("--id-col", default="catchment_id")

    gl = sub.add_parser("grid-las", help="grid LAS point elevations to a "
                        "floor-mean DEM GeoTIFF")
    gl.add_argument("--las", required=True, help="LAS file or glob")
    gl.add_argument("--out", required=True, help="output .tif path")
    gl.add_argument("--cell-size", type=int, default=500)
    gl.add_argument("--width", type=int, default=0)
    gl.add_argument("--height", type=int, default=0)

    cu = sub.add_parser("curate", help="corpus curation: token filter -> "
                        "normalize -> prefix-fp dedup -> split -> "
                        "hive-partitioned write")
    cu.add_argument("--input", required=True,
                    help="documents parquet file or directory")
    cu.add_argument("--out-dir", required=True)
    cu.add_argument("--min-tokens", type=int, default=30)
    cu.add_argument("--prefix-tokens", type=int, default=8)
    cu.add_argument("--near-dup", action="store_true",
                    help="also drop MinHash near-duplicates (keep min id)")

    args = p.parse_args(argv)
    _ray()

    from .config import DEFAULT

    if args.cmd == "build":
        from dataclasses import replace

        from .pipelines.build import build_index, compact_index

        cfg = DEFAULT
        if args.part_level is not None:
            cfg = replace(cfg, part_level=args.part_level)
        if args.batch_size is not None:
            cfg = replace(cfg, decode_batch_size=args.batch_size)
        stats = build_index(args.images_dir, args.output_dir, cfg,
                            resume=not args.no_resume)
        if args.compact:
            stats["compaction"] = compact_index(args.output_dir, DEFAULT)
        print(json.dumps(stats))
    elif args.cmd == "build-catchments":
        from dataclasses import replace

        import ray.data

        from .pipelines.build import build_catchments

        cfg = DEFAULT
        if args.h3_resolution is not None:
            cfg = replace(cfg, catchment_h3_res=args.h3_resolution)
        if args.simplify_tolerance is not None:
            cfg = replace(cfg, simplify_tol_m=args.simplify_tolerance)
        # native container ingest: .gpkg / .shp globs read through the
        # from-spec sources (reference input shape, load.py:41,131-143);
        # parquet keeps the prepared-table path
        from .sources.vector import read_vector_catchments
        raw = read_vector_catchments(args.input)
        ds = build_catchments(raw, cfg)
        if args.partition_by_cell:
            ds.write_parquet(args.output, partition_cols=["h3_index"])
        else:
            ds.write_parquet(args.output)
        print(json.dumps({"output": args.output,
                          "partitioned": bool(args.partition_by_cell)}))
    elif args.cmd == "compact":
        from .pipelines.build import compact_index

        print(json.dumps(compact_index(args.index_dir, DEFAULT)))
    elif args.cmd == "attach-sidecars":
        import pyarrow.parquet as pq

        from .pipelines.sidecar import attach_sidecars
        from .state import schemas

        out = attach_sidecars(args.root, args.catchments, out_dir=args.out_dir,
                              calb=args.calb)
        counts = {}
        for name in out:
            import os as _os

            tbl = pq.read_table(_os.path.join(args.out_dir, f"{name}.parquet"))
            schemas.validate_table(tbl, args.schema_version, name)
            counts[name] = tbl.num_rows
        print(json.dumps({"out_dir": args.out_dir, "calb": bool(args.calb),
                          "schema_version": args.schema_version, "rows": counts}))
    elif args.cmd == "query":
        from .pipelines.query import (attach_attributes, roi_query_catchments,
                                      write_per_group)
        from .sources.geojson import roi_ring_from_geojson

        ring = roi_ring_from_geojson(args.geojson)
        kept = roi_query_catchments(args.catchments, ring, args.threshold,
                                    DEFAULT).to_pandas()
        # apply the keep mask (non-stats path returns kept rows already)
        ids = sorted(set(kept["catchment_id"]))
        attrs = attach_attributes(ids, args.vector_dir)
        paths = write_per_group(attrs, args.outdir)
        print(json.dumps({"kept_catchments": len(ids), "files": len(paths)}))
    elif args.cmd == "validate":
        from .pipelines.query import export_validation_geojson, validate_roi
        from .sources.geojson import roi_ring_from_geojson

        ring = roi_ring_from_geojson(args.geojson)
        out = validate_roi(args.catchments, ring, args.threshold)
        out.pop("kept_ids")
        if args.geojson_out or args.html_out:
            import contextlib
            import tempfile

            with contextlib.ExitStack() as stack:
                if args.geojson_out:
                    gj_path = args.geojson_out
                else:  # intermediate only — cleaned up with the stack
                    tmpd = stack.enter_context(
                        tempfile.TemporaryDirectory(prefix="hixviz"))
                    gj_path = os.path.join(tmpd, "validation.geojson")
                gj = export_validation_geojson(
                    args.catchments, ring, gj_path, args.threshold)
                if args.geojson_out:
                    out["geojson"] = gj
                if args.html_out:
                    from .viz import render_validation_html_from_file

                    out["html"] = {"path": args.html_out,
                                   "sets": render_validation_html_from_file(
                                       gj_path, args.html_out)}
        print(json.dumps(out))
    elif args.cmd == "bbox":
        from .pipelines.query import bbox_scan

        ds = bbox_scan(args.index_dir, *args.bbox)
        if ds is None:
            print(json.dumps({"rows": 0}))
        elif args.out:
            ds.write_parquet(args.out)
            print(json.dumps({"rows": "written", "out": args.out}))
        else:
            print(json.dumps({"rows": ds.count()}))
    elif args.cmd == "knn":
        from .pipelines.query import knn_query

        df = knn_query(args.index_dir, args.lon, args.lat, args.k, DEFAULT)
        print(df.to_json(orient="records"))
    elif args.cmd == "zonal":
        from .pipelines.query import zonal_join

        ds = zonal_join(args.index_dir, args.catchments, DEFAULT)
        if args.out:
            ds.write_parquet(args.out)
            print(json.dumps({"out": args.out}))
        else:
            print(json.dumps({"pairs": ds.count()}))
    elif args.cmd == "pipeline":
        from .steps import Pipeline

        with open(args.spec) as f:
            spec = json.load(f)
        result = Pipeline.from_spec(spec).run()
        if isinstance(result, str):
            print(json.dumps({"sink": result}))
        else:
            print(json.dumps({"rows": result.count()}))
    elif args.cmd == "export-mvt":
        import ray.data

        from .pipelines.vector_tiles import export_mvt

        ds = ray.data.read_parquet(args.catchments)
        manifest = export_mvt(ds, args.out_dir, id_col=args.id_col,
                              grid=args.grid, extent=args.extent)
        print(json.dumps({"tiles": len(manifest),
                          "features": int(manifest.n_features.sum()),
                          "out_dir": args.out_dir}))
    elif args.cmd == "grid-las":
        from .pipelines.pointcloud import grid_las

        print(json.dumps(grid_las(args.las, args.out,
                                  cell_size=args.cell_size,
                                  width=args.width, height=args.height)))
    elif args.cmd == "curate":
        import ray.data

        from .pipelines.curate import curate_corpus, write_splits

        ds = ray.data.read_parquet(args.input)
        cur = curate_corpus(ds, min_tokens=args.min_tokens,
                            prefix_tokens=args.prefix_tokens,
                            near_dup=args.near_dup)
        counts = write_splits(cur, args.out_dir)
        print(json.dumps({"splits": counts, "rows": sum(counts.values())}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
