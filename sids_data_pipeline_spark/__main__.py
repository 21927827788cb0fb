"""Command-line front door: ``python -m sids_data_pipeline_spark``.

The reference ships each lifecycle as a container entry point
(``pipeline/processing/__main__.py:19-26`` and
``batch/processing/__main__.py:13-20``, both ``python3 -m processing``);
this module is the same UX over the Spark engine — one process, one
SparkSession, subcommand per lifecycle:

- ``pipeline``     — Entry-1: zonal stats + GeoJSONL + vector tiles for
                     every pending (vector, raster) pair.
- ``standardize``  — Entry-2: GeoTIFF → canonical clipped/compressed
                     raster store, ledger-gated.
- ``curate``       — the training-corpus twin: scrub → dedup → split →
                     shard-pack from a documents parquet.
- ``query``        — run any catalog query by name against an sf dir
                     (print a sample or write parquet).
- ``catalog``      — list every registered query name.

Each subcommand prints ONE JSON line (the job manifest / row count), so
shell pipelines and schedulers can consume results without scraping logs.
"""

from __future__ import annotations

import argparse
import json
import sys


def _build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="python -m sids_data_pipeline_spark",
        description="PySpark analytics engine — lifecycle entry points",
    )
    sub = p.add_subparsers(dest="cmd", required=True)

    pl = sub.add_parser("pipeline", help="Entry-1 zonal/tiles lifecycle")
    pl.add_argument("--vectors", required=True, help="comma-separated vector ids")
    pl.add_argument("--rasters", required=True, help="comma-separated raster ids")
    pl.add_argument("--out", required=True, help="output directory")
    pl.add_argument("--stats", default="mean", help="comma-separated stats")
    pl.add_argument("--max-zoom", type=int, default=6)

    st = sub.add_parser("standardize", help="Entry-2 raster standardization")
    st.add_argument("--input", required=True, help="GeoTIFF glob")
    st.add_argument("--out", required=True, help="canonical store directory")
    st.add_argument("--ledger", required=True, help="ledger parquet path")
    st.add_argument("--band", type=int, default=1)

    cu = sub.add_parser("curate", help="corpus curation lifecycle")
    cu.add_argument("--docs", required=True, help="documents parquet path")
    cu.add_argument("--out", required=True, help="output directory")
    cu.add_argument("--benchmark", default=None, help="benchmark parquet path")
    cu.add_argument("--shard-tokens", type=int, default=50_000)

    q = sub.add_parser("query", help="run one catalog query")
    q.add_argument("name", help="catalog query name (see `catalog`)")
    q.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    q.add_argument("--out", default=None, help="write result parquet here")
    q.add_argument("--show", type=int, default=0, help="print first N rows")

    sub.add_parser("catalog", help="list catalog query names")
    return p


def main(argv: list[str] | None = None) -> dict:
    args = _build_parser().parse_args(argv)

    from sids_data_pipeline_spark.plans.catalog import all_queries

    if args.cmd == "catalog":
        out = {"queries": sorted(all_queries())}
        print(json.dumps(out))
        return out

    if args.cmd == "query":
        # validate before paying SparkSession startup
        catalog = all_queries()
        if args.name not in catalog:
            print(json.dumps({"error": f"unknown query {args.name!r}"}))
            raise SystemExit(2)

    from sids_data_pipeline_spark.session import get_spark

    spark = get_spark(f"sids-cli-{args.cmd}")
    if args.cmd == "pipeline":
        from sids_data_pipeline_spark.jobs.pipeline import run_pipeline

        out = run_pipeline(
            spark,
            vector_ids=args.vectors.split(","),
            raster_ids=args.rasters.split(","),
            out_dir=args.out,
            stats=tuple(args.stats.split(",")),
            max_zoom=args.max_zoom,
        )
    elif args.cmd == "standardize":
        from sids_data_pipeline_spark.jobs.standardize import run_standardize_job

        out = run_standardize_job(
            spark, args.input, args.out, args.ledger, band=args.band
        )
    elif args.cmd == "curate":
        from sids_data_pipeline_spark.jobs.curation import run_curation_job

        docs = spark.read.parquet(args.docs)
        bench = spark.read.parquet(args.benchmark) if args.benchmark else None
        out = run_curation_job(
            spark, docs, args.out, benchmark=bench, shard_tokens=args.shard_tokens
        )
    else:  # query
        df = catalog[args.name].spark(spark, args.sf_dir)
        if args.out or args.show:
            # one execution feeds every action
            df = df.persist()
        if args.out:
            df.write.mode("overwrite").parquet(args.out)
        if args.show:
            df.show(args.show, truncate=False)
        out = {"query": args.name, "rows": df.count(), "sf_dir": args.sf_dir}
        df.unpersist()

    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main(sys.argv[1:])
