"""CLI entry point — the ``ray job submit`` surface.

Examples (local; on a cluster drop ``--local`` and let RAY_ADDRESS route):

    ray job submit -- python -m geomesa_ray.cli ingest \
        --input /data/pages --out /data/index
    ray job submit -- python -m geomesa_ray.cli scan \
        --index /data/index --bbox -10,40,30,60 --out /data/scan_out
    ray job submit -- python -m geomesa_ray.cli join \
        --index /data/index --polygons /data/polygons.parquet --out /data/pairs
    ray job submit -- python -m geomesa_ray.cli density \
        --index /data/index --width 256 --height 256 --out /data/tiles

The CLI owns the Ray session (guarded init, shutdown at exit) — the library
never calls ``ray.init``. Jobs are resumable: ingest skips manifest-complete
groups, and all writers emit partitioned output.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def _init(args) -> None:
    import ray

    if not ray.is_initialized():
        kwargs = {"include_dashboard": False, "logging_level": "ERROR"}
        if args.num_cpus:
            kwargs["num_cpus"] = args.num_cpus
        ray.init(address=args.address, **kwargs)


def cmd_ingest(args) -> dict:
    from geomesa_ray.pipelines.ingest import ingest_pages

    manifest = ingest_pages(
        args.input, args.out,
        n_groups=args.groups,
        target_rows_per_file=args.target_rows,
    )
    return {
        "groups": len(manifest),
        "rows_out": sum(e.rows_out for e in manifest.values()),
    }


def cmd_scan(args) -> dict:
    from geomesa_ray.pipelines.scan import Query, scan

    if getattr(args, "cql", None):
        # the reference's query syntax: parse the (E)CQL string and run it
        # through the planner (extents + exact residual)
        if args.bbox or args.interval:
            raise SystemExit("--cql is exclusive with --bbox/--interval")
        from geomesa_ray.pipelines.cql import parse_ecql
        from geomesa_ray.pipelines.filters import scan_with_filter

        ds = scan_with_filter(args.index, parse_ecql(args.cql))
        ds.write_parquet(args.out)
        return {"rows": ds.count()}
    bbox = tuple(float(v) for v in args.bbox.split(",")) if args.bbox else None
    interval = None
    if args.interval:
        lo, hi = args.interval.split("/")
        import numpy as np

        interval = (
            int(np.datetime64(lo).astype("datetime64[ms]").astype(np.int64)),
            int(np.datetime64(hi).astype("datetime64[ms]").astype(np.int64)),
        )
    if os.path.exists(os.path.join(args.index, "_meta", "hex.json")):
        # hex-prefix-partitioned layout (ingest_hex): route the bbox scan
        # through its partition pruning instead of the z planner
        if interval is not None or args.loose:
            raise SystemExit(
                "hex layouts support bbox scans only: --interval/--loose "
                "need a z-indexed layout (ingest)"
            )
        if bbox is None:
            raise SystemExit("scanning a hex layout requires --bbox")
        from geomesa_ray.stages.hexindex import hex_indexed_scan

        stats: dict = {}
        ds = hex_indexed_scan(args.index, bbox, stats=stats)
        ds.write_parquet(args.out)
        import glob as _glob

        import pyarrow.parquet as _pq

        # count from the written footers — ds.count() would re-read and
        # re-filter every pruned file a second time (cmd_convert pattern)
        rows = sum(
            _pq.ParquetFile(p).metadata.num_rows
            for p in _glob.glob(os.path.join(args.out, "*.parquet"))
        )
        return {"rows": rows, "layout": "hex",
                "files_read": stats["files_read"],
                "files_total": stats["files_total"]}
    ds = scan(args.index, Query(bbox=bbox, interval=interval, loose=args.loose))
    ds.write_parquet(args.out)
    return {"rows": ds.count()}


def cmd_join(args) -> dict:
    import glob

    import pyarrow.parquet as pq
    import ray.data

    from geomesa_ray.stages.join import pip_join_broadcast, pip_join_shuffle

    files = sorted(glob.glob(os.path.join(args.index, "group=*", "*.parquet")))
    # prune the layout-internal index key columns at the read — the join
    # re-derives its own shuffle cell; only data columns ride the shuffle
    internal = {"z2", "z3", "z3_bin", "bin", "cell", "shard"}
    names = pq.read_schema(files[0]).names
    points = ray.data.read_parquet(
        files, columns=[n for n in names if n not in internal]
    )
    polygons = pq.read_table(args.polygons)
    if args.strategy == "broadcast":
        out = pip_join_broadcast(points, polygons, predicate=args.predicate)
    else:
        out = pip_join_shuffle(points, polygons, predicate=args.predicate)
    out.write_parquet(args.out)
    return {"pairs": out.count()}


def cmd_density(args) -> dict:
    import glob

    import ray.data

    from geomesa_ray.stages.density import density

    files = sorted(glob.glob(os.path.join(args.index, "group=*", "*.parquet")))
    points = ray.data.read_parquet(files, columns=["lon", "lat"])
    tiles = density(points, width=args.width, height=args.height)
    tiles.write_parquet(args.out)
    return {"tiles": tiles.count()}


def cmd_compact(args) -> dict:
    from geomesa_ray.pipelines.compact import compact

    done = compact(args.index, target_rows_per_file=args.target_rows)
    return {"compacted_groups": done}


def cmd_convert(args) -> dict:
    """``geomesa convert`` analog: run a registered format converter over
    the input and land typed Parquet (the reference CLI's convert command
    streams any SimpleFeatureConverter into an export —
    geomesa-tools ConvertCommand behavior)."""
    import json as _json

    from geomesa_ray.registry import converter

    fn = converter(args.format)
    kwargs = _json.loads(args.options) if args.options else {}
    out = fn(args.input, **kwargs)
    ds = out[0] if isinstance(out, tuple) else out  # (ds, spec) readers
    if getattr(args, "derive", None):
        from geomesa_ray.functions.exprlang import derive_columns

        exprs = {}
        for item in args.derive:
            name, _, expr = item.partition("=")
            if not name or not expr:
                raise ValueError(f"--derive expects NAME=EXPR, got {item!r}")
            exprs[name.strip()] = expr
        ds = derive_columns(ds, exprs)  # expressions compile (and fail) here
    ds.write_parquet(args.out)
    # count from the written footers — ds.count() would re-execute the
    # whole lazy converter pipeline a second time
    import glob as _glob

    import pyarrow.parquet as _pq

    rows = sum(
        _pq.ParquetFile(p).metadata.num_rows
        for p in _glob.glob(os.path.join(args.out, "*.parquet"))
    )
    return {"rows": rows, "format": args.format}


def cmd_hexdensity(args) -> dict:
    """Hex-cell density over any parquet with lon/lat columns, exported
    as a GeoJSON FeatureCollection of hexagon polygons (the raster→vector
    visualization surface; reference analog: the density/heatmap process
    rendered on a hex grid)."""
    import ray

    from geomesa_ray.stages.hexindex import hex_density_geojson

    ds = ray.data.read_parquet(args.input,
                               columns=[args.lon_col, args.lat_col])
    n = hex_density_geojson(ds, res=args.res, path=args.out,
                            lon_col=args.lon_col, lat_col=args.lat_col)
    return {"features": n, "res": args.res, "out": args.out}


def cmd_sketch(args) -> dict:
    """Distributed stats sketches over a parquet table from a
    reference-style spec string (geomesa-tools stats-analyze analog,
    Stat.scala:134 syntax): e.g.
    ``sketch --table events --spec "MinMax(value);Count()"``."""
    import numpy as np
    import ray

    from geomesa_ray.stages.stats import compute_stats, parse_stat_specs

    specs = parse_stat_specs(args.spec)
    cols: set[str] = set()
    for s in specs:
        if s.column is not None:
            cols.update(s.column if isinstance(s.column, list) else [s.column])
        if s.group_by:
            cols.add(s.group_by)
    ds = ray.data.read_parquet(
        f"{args.sf_dir}/{args.table}.parquet",
        columns=sorted(cols) or None,
    )
    out = compute_stats(ds, specs)

    from geomesa_ray.stages.stats import Frequency, Z3Frequency

    def jsonable(v):
        if isinstance(v, Z3Frequency):
            return {"prefix_bits": v.prefix_bits, "freq": jsonable(v.freq)}
        if isinstance(v, Frequency):
            return {"depth": v.depth, "width": v.width, "seed": v.seed,
                    "table": v.table.tolist()}
        if isinstance(v, dict):
            return {str(k): jsonable(x) for k, x in v.items()}
        if isinstance(v, (list, tuple)):
            return [jsonable(x) for x in v]
        if isinstance(v, (np.integer, np.floating)):
            return v.item()
        if isinstance(v, (str, int, float, bool)) or v is None:
            return v
        return repr(v)

    return {"table": args.table, "stats": {k: jsonable(v) for k, v in out.items()}}


def cmd_stats(args) -> dict:
    """Run a registered driver query and surface Ray Data's per-stage
    execution stats — the ``ds.stats()`` feedback loop the scale tuning
    relies on, exposed as a first-class tool (reference analog: the
    stats/explain tooling in geomesa-tools). Prints the stage summary to
    stderr (human), returns machine fields in the JSON result."""
    from geomesa_ray.pipelines.queries import QUERIES

    if args.query not in QUERIES:
        raise SystemExit(
            f"unknown query {args.query!r}; available: {sorted(QUERIES)}"
        )
    res = QUERIES[args.query](args.sf_dir)
    out = {"query": args.query, "sf_dir": args.sf_dir}
    if hasattr(res, "stats"):  # ray.data.Dataset
        res = res.materialize()
        out["rows"] = res.count()
        stats = res.stats()
        print(stats, file=sys.stderr)
        # machine-usable: total wall per stage line ("Operator N ...: ...")
        out["stages"] = [
            ln.strip() for ln in stats.splitlines()
            if ln.strip().startswith("Operator ")
        ]
    else:  # pa.Table / DataFrame results have no execution stats
        out["rows"] = len(res)
        out["stages"] = []
    return out


def cmd_corpus(args) -> dict:
    """Training-data corpus operators over a documents parquet table:
    exact / MinHash near-dup dedup, quality scoring, PII redaction, text
    normalization, leakage-safe splits, benchmark decontamination."""
    import ray.data

    ds = ray.data.read_parquet(args.input)
    op = args.op
    if op == "exact-dedup":
        from geomesa_ray.stages.dedup import exact_dedup

        out = exact_dedup(ds, key_col=args.text_col, id_col=args.id_col)
    elif op == "minhash-dedup":
        from geomesa_ray.stages.dedup import (
            cluster_pairs_dataset, dedup_keep, minhash_lsh_pairs,
        )

        pairs = minhash_lsh_pairs(
            ds, text_col=args.text_col, id_col=args.id_col,
            threshold=args.threshold,
        )
        out = dedup_keep(ds, cluster_pairs_dataset(pairs), id_col=args.id_col)
    elif op == "quality":
        from geomesa_ray.stages.textstats import QualityScorer

        # pass the CLASS: Ray rejects tuple concurrency for plain callables
        out = ds.map_batches(
            QualityScorer,
            fn_constructor_kwargs={"text_col": args.text_col},
            batch_format="pyarrow",
            concurrency=(1, 8),
        )
    elif op == "redact-pii":
        from geomesa_ray.stages.corpus import redact_pii

        out = redact_pii(ds, text_col=args.text_col, id_col=args.id_col)
    elif op == "normalize":
        from geomesa_ray.stages.corpus import normalize_text

        out = normalize_text(ds, text_col=args.text_col, id_col=args.id_col)
    elif op == "split":
        from geomesa_ray.stages.corpus import split_assign

        out = split_assign(ds, id_col=args.id_col)
    elif op == "pack":
        from geomesa_ray.stages.corpus import pack_sequences

        out = pack_sequences(
            ds, ctx_len=args.ctx_len, id_col=args.id_col,
            text_col=args.text_col,
        )
    elif op == "chunk":
        from geomesa_ray.stages.corpus import chunk_corpus

        out = chunk_corpus(
            ds, ctx_len=args.ctx_len, id_col=args.id_col,
            text_col=args.text_col,
        )
    elif op == "decontaminate":
        if not args.bench:
            raise SystemExit("--bench (benchmark parquet) required")
        from geomesa_ray.stages.dedup import decontaminate

        bench = ray.data.read_parquet(args.bench)
        out = decontaminate(
            ds, bench, text_col=args.text_col, id_col=args.id_col,
        )
    else:  # pragma: no cover - argparse choices guard
        raise SystemExit(f"unknown op {op}")
    out.write_parquet(args.out)
    import glob as _glob

    import pyarrow.parquet as _pq

    rows = sum(
        _pq.ParquetFile(p).metadata.num_rows
        for p in _glob.glob(os.path.join(args.out, "*.parquet"))
    )
    return {"rows": rows, "op": op}


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="geomesa_ray")
    ap.add_argument("--address", default=os.environ.get("RAY_ADDRESS", "local"))
    ap.add_argument("--num-cpus", type=int, default=None)
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("ingest")
    p.add_argument("--input", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--groups", type=int, default=None)
    p.add_argument("--target-rows", type=int, default=1_000_000)
    p.set_defaults(fn=cmd_ingest)

    p = sub.add_parser("scan")
    p.add_argument("--index", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--bbox", default=None, help="xmin,ymin,xmax,ymax")
    p.add_argument("--interval", default=None, help="ISO/ISO")
    p.add_argument("--loose", action="store_true")
    p.add_argument("--cql", default=None,
                   help="(E)CQL filter string, e.g. \"BBOX(geom,-10,40,30,60)"
                        " AND event_type = 'click'\" (exclusive with"
                        " --bbox/--interval)")
    p.set_defaults(fn=cmd_scan)

    p = sub.add_parser("join")
    p.add_argument("--index", required=True)
    p.add_argument("--polygons", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--strategy", choices=["broadcast", "shuffle"], default="broadcast")
    p.add_argument("--predicate", default="intersects")
    p.set_defaults(fn=cmd_join)

    p = sub.add_parser("density")
    p.add_argument("--index", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--width", type=int, default=256)
    p.add_argument("--height", type=int, default=256)
    p.set_defaults(fn=cmd_density)

    p = sub.add_parser("compact")
    p.add_argument("--index", required=True)
    p.add_argument("--target-rows", type=int, default=1_000_000)
    p.set_defaults(fn=cmd_compact)

    p = sub.add_parser("convert")
    p.add_argument("--format", required=True,
                   help="registered converter name (geojson/delimited/"
                        "fixed-width/xml/shapefile/avro/jdbc/osm)")
    p.add_argument("--input", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--options", default=None,
                   help='JSON kwargs for the converter, e.g. \'{"table": "t"}\'')
    p.add_argument("--derive", action="append", default=[],
                   metavar="NAME=EXPR",
                   help="derived column via the transform-expression DSL, "
                        "e.g. tag=lowercase(concat($source,'-',$lang)); "
                        "repeatable")
    p.set_defaults(fn=cmd_convert)

    p = sub.add_parser("corpus")
    p.add_argument("--input", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--op", required=True,
                   choices=["exact-dedup", "minhash-dedup", "quality",
                            "redact-pii", "normalize", "split",
                            "decontaminate", "pack", "chunk"])
    p.add_argument("--text-col", default="text")
    p.add_argument("--id-col", default="doc_id")
    p.add_argument("--threshold", type=float, default=0.5)
    p.add_argument("--ctx-len", type=int, default=2048,
                   help="chunk length in tokens (pack / chunk)")
    p.add_argument("--bench", default=None,
                   help="benchmark parquet (decontaminate)")
    p.set_defaults(fn=cmd_corpus)

    p = sub.add_parser("hexdensity")
    p.add_argument("--input", required=True,
                   help="parquet file/dir with lon/lat columns")
    p.add_argument("--res", type=int, default=6)
    p.add_argument("--lon-col", default="lon")
    p.add_argument("--lat-col", default="lat")
    p.add_argument("--out", required=True, help="GeoJSON output path")
    p.set_defaults(fn=cmd_hexdensity)

    p = sub.add_parser("sketch")
    p.add_argument("--table", required=True, help="table name under --sf-dir")
    p.add_argument("--spec", required=True,
                   help='stat-spec string, e.g. "MinMax(value);Count()"')
    p.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    p.set_defaults(fn=cmd_sketch)

    p = sub.add_parser("stats")
    p.add_argument("--query", required=True,
                   help="registered driver query name (see pipelines.queries)")
    p.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    p.set_defaults(fn=cmd_stats)

    args = ap.parse_args(argv)
    _init(args)
    t0 = time.perf_counter()
    result = args.fn(args)
    result["wall_sec"] = round(time.perf_counter() - t0, 3)
    print(json.dumps(result))
    import ray

    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
