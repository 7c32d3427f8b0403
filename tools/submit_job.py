"""spark-submit entrypoint for the index pipeline.

Package and run (the north star's deployment shape):

    cd /root/repo && zip -qr /tmp/lss.zip lucene_solr_spark
    spark-submit --py-files /tmp/lss.zip tools/submit_job.py build \
        --corpus /data/pages_parquet --index /data/index --segments 1024
    spark-submit --py-files /tmp/lss.zip tools/submit_job.py merge \
        --index /data/index
    spark-submit --py-files /tmp/lss.zip tools/submit_job.py search \
        --index /data/index --query "web crawl index" --mode OR --k 10

On a cluster the SparkSession comes from spark-submit's conf (master,
executors, memory); in local runs it falls back to session.get_spark().
Build is resumable: re-submitting the same build continues from finished
segments and re-commits atomically.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

# local runs from the repo root: make the package importable the way
# --py-files would on a cluster
_repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _repo not in sys.path:
    sys.path.insert(0, _repo)


def _get_spark():
    from pyspark.sql import SparkSession

    active = SparkSession.getActiveSession()
    if active is not None:
        return active
    builder = SparkSession.builder.appName("lucene_solr_spark_job")
    try:
        return builder.getOrCreate()
    except Exception:
        from lucene_solr_spark.session import get_spark

        return get_spark("lucene_solr_spark_job")


def main(argv=None):
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build")
    b.add_argument("--corpus", required=True, help="parquet dir of (url, text, ...)")
    b.add_argument("--index", required=True)
    b.add_argument("--segments", type=int, default=None)
    b.add_argument("--build-id", default="b0")
    b.add_argument("--url-col", default="url")
    b.add_argument("--text-col", default="text")
    b.add_argument("--analyzer", default="standard",
                   help="analyzer registry entry (standard/english/folding/english_minimal)")
    b.add_argument("--extra-field", action="append", default=[],
                   metavar="FIELD=COL",
                   help="additional analyzed field (repeatable), e.g. title=title")

    m = sub.add_parser("merge")
    m.add_argument("--index", required=True)
    m.add_argument("--max-segments", type=int, default=None,
                   help="force-merge down to N (default: tiered policy)")

    s = sub.add_parser("search")
    s.add_argument("--index", required=True)
    s.add_argument("--query", required=True)
    s.add_argument("--mode", default="OR", choices=["OR", "AND"])
    s.add_argument("--k", type=int, default=10)
    s.add_argument("--resident", action="store_true",
                   help="embedded zero-Spark-job execution (warm serving)")
    s.add_argument("--qf", action="append", default=[], metavar="FIELD=BOOST",
                   help="edismax per-field boosts (repeatable)")

    args = ap.parse_args(argv)
    spark = _get_spark()

    if args.cmd == "build":
        from lucene_solr_spark.index.build import build_index

        corpus = spark.read.parquet(args.corpus)
        extra = dict(kv.split("=", 1) for kv in args.extra_field)
        man = build_index(
            spark, corpus, args.index,
            num_segments=args.segments, build_id=args.build_id,
            url_col=args.url_col, text_col=args.text_col,
            analyzer=args.analyzer, extra_fields=extra or None,
        )
        print(json.dumps({
            "generation": man["generation"],
            "total_docs": man["total_docs"],
            "segments": len(man["segments"]),
            "fieldstats": man["fieldstats"],
        }))
    elif args.cmd == "merge":
        from lucene_solr_spark.index.merge import force_merge, maybe_merge

        if args.max_segments:
            man = force_merge(spark, args.index, args.max_segments)
        else:
            man = maybe_merge(spark, args.index)
        print(json.dumps({"generation": man["generation"], "segments": len(man["segments"])}))
    elif args.cmd == "search":
        from lucene_solr_spark.search.engine import SparkSearcher

        searcher = SparkSearcher(spark, args.index)
        if args.qf:
            qf = {k: float(v) for k, v in
                  (kv.split("=", 1) for kv in args.qf)}
            for row in searcher.edismax(args.query, qf=qf, k=args.k).collect():
                print(json.dumps(row.asDict()))
        elif args.resident:
            pdf = searcher.search_resident(
                args.query, k=args.k, mode=args.mode, with_url=True
            )
            for _, row in pdf.iterrows():
                print(json.dumps({
                    "rank": int(row["rank"]), "docid": int(row["docid"]),
                    "url": row["url"], "score": float(row["score"]),
                }))
        else:
            res = searcher.search(args.query, k=args.k, mode=args.mode)
            for row in res.collect():
                print(json.dumps(row.asDict()))


if __name__ == "__main__":
    sys.exit(main())
