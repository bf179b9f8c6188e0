"""spark-submit entrypoint: build the transcripts index and/or run queries.

The north rule requires the pipeline to run "via spark-submit --py-files on
a multi-executor cluster".  Package the library and launch:

    cd /root/repo && zip -qr /tmp/tantivy_spark.zip tantivy_spark
    spark-submit --master local[8] \
        --py-files /tmp/tantivy_spark.zip \
        tools/submit_job.py build \
        --synthetic-convs 2000 --index-dir /tmp/ts_submit_idx --segments 8

    spark-submit --master local[8] --py-files /tmp/tantivy_spark.zip \
        tools/submit_job.py query \
        --index-dir /tmp/ts_submit_idx --query 'alpha AND beta' --k 10

On a real cluster replace --master with the cluster manager URL and size
the executors; nothing in the job references local paths except the
index/source locations, which on a cluster would be object-store/Iceberg
URIs.  The session factory respects the master supplied by spark-submit.

Subcommands:
  build  --index-dir DIR  [--source PARQUET | --synthetic-convs N]
         [--segments N] [--term-buckets N] [--positions] [--resume]
  query  --index-dir DIR  --query STRING  [--k N] [--mode daat|taat64]
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv: list[str]) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    sub = ap.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build", help="build the inverted index")
    b.add_argument("--index-dir", required=True)
    b.add_argument("--source", help="path (or catalog table, with "
                                    "--source-format iceberg) of the "
                                    "transcripts table")
    b.add_argument("--source-format", default="parquet",
                   help="any Spark DataSource: parquet (default), iceberg, "
                        "orc, delta, ... — 'iceberg' loads a catalog table "
                        "name via spark.read.format('iceberg'); needs the "
                        "iceberg-spark-runtime jar on the cluster (not "
                        "bundled in this sandbox)")
    b.add_argument("--synthetic-convs", type=int,
                   help="generate N deterministic synthetic conversations")
    b.add_argument("--segments", type=int, default=8)
    b.add_argument("--term-buckets", type=int, default=8)
    b.add_argument("--positions", action="store_true")
    b.add_argument("--assignment", default="auto",
                   choices=["auto", "input", "hash"],
                   help="segment assignment: auto/input = arrival-order "
                        "fused pass; hash = content-deterministic "
                        "(with --direct this runs the two-phase "
                        "file-shuffle build — same layout at any "
                        "cluster size)")
    b.add_argument("--direct", action="store_true",
                   help="use build_index_direct over --source (fused "
                        "single-pass, per-split resumable checkpoints — "
                        "the at-scale dataflow)")
    b.add_argument("--split-bytes", type=int, default=128 << 20,
                   help="row-group split target for --direct")
    b.add_argument("--resume", action="store_true",
                   help="resume from per-stage checkpoints")

    q = sub.add_parser("query", help="run a query-string search")
    q.add_argument("--index-dir", required=True)
    q.add_argument("--query", required=True)
    q.add_argument("--k", type=int, default=10)
    q.add_argument("--mode", default="daat", choices=["daat", "taat64"])

    args = ap.parse_args(argv)

    from tantivy_spark.session import get_spark

    spark = get_spark(app_name=f"tantivy_spark_{args.cmd}")
    spark.sparkContext.setLogLevel("WARN")

    if args.cmd == "build":
        from tantivy_spark.config import IndexConfig
        from tantivy_spark.operators.build import build_index

        if bool(args.source) == bool(args.synthetic_convs):
            ap.error("build needs exactly one of --source / --synthetic-convs")
        if args.direct and not args.source:
            ap.error("--direct reads parquet files directly: needs --source")
        if args.direct and args.source_format not in ("parquet", "iceberg"):
            ap.error("--direct plans parquet row-group splits (parquet or "
                     "iceberg sources); for other formats use the "
                     "DataFrame build (no --direct)")
        cfg = IndexConfig(
            n_segments=args.segments,
            n_term_buckets=args.term_buckets,
            positions=args.positions,
            segment_assignment=args.assignment,
        )
        t0 = time.time()
        if args.direct:
            from tantivy_spark.operators.build import build_index_direct

            manifest = build_index_direct(spark, args.source,
                                          args.index_dir, cfg,
                                          resume=args.resume,
                                          split_bytes=args.split_bytes)
        else:
            if args.source and args.source_format == "iceberg":
                # filesystem Iceberg tables resolve with the built-in
                # pure-Python reader (sources/iceberg.py — no runtime
                # jar needed); catalog-name sources still work via
                # spark.read.format("iceberg") when the cluster carries
                # the iceberg-spark-runtime jar
                import os as _os

                if _os.path.isdir(args.source):
                    from tantivy_spark.sources.iceberg import read_table

                    src = read_table(spark, args.source)
                else:
                    src = (spark.read.format("iceberg")
                           .load(args.source))
            elif args.source:
                # format-pluggable source: the engine consumes a DataFrame,
                # so any Spark DataSource works
                src = spark.read.format(args.source_format).load(args.source)
            else:
                from tantivy_spark.sources.transcripts import transcripts_df

                src = transcripts_df(spark, args.synthetic_convs)
            manifest = build_index(spark, src, args.index_dir, cfg,
                                   resume=args.resume)
        out = {
            "cmd": "build",
            "index_dir": args.index_dir,
            "wall_sec": round(time.time() - t0, 2),
            "num_docs": manifest["total_docs"],
            "segments": len(manifest["segments"]),
            "total_tokens": manifest["total_tokens"],
        }
        print(json.dumps(out))
        return 0

    from tantivy_spark.operators.search import Searcher
    from tantivy_spark.plans.parser import QueryParser

    searcher = Searcher(spark, args.index_dir)
    tree = QueryParser().parse(args.query)
    t0 = time.time()
    rows = searcher.search(tree, k=args.k, mode=args.mode).collect()
    out = {
        "cmd": "query",
        "query": args.query,
        "k": args.k,
        "wall_sec": round(time.time() - t0, 2),
        "hits": [
            {k: (str(v) if not isinstance(v, (int, float, str)) else v)
             for k, v in r.asDict().items()}
            for r in rows
        ],
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
