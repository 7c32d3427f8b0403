"""Merge-path microbench: build a 2-segment index over N docs, then time
force_merge(1) (which runs one _merge_group over both segments).

Usage: python tools/bench_merge.py [n_docs]     # default 400_000
Prints one JSON line {"n_docs":..., "build_sec":..., "merge_sec":...}.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 400_000

    from lucene_solr_spark.corpus import generate_pages
    from lucene_solr_spark.index.build import build_index
    from lucene_solr_spark.index.check import check_index
    from lucene_solr_spark.index.merge import force_merge
    from lucene_solr_spark.session import get_spark

    spark = get_spark("bench_merge", cores=8, shuffle_partitions=8)
    idx = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".cache", f"bench_merge_{n_docs}",
    )
    shutil.rmtree(idx, ignore_errors=True)

    t0 = time.time()
    pages = generate_pages(n_docs, seed=7)
    gen_sec = time.time() - t0

    t0 = time.time()
    sdf = spark.createDataFrame(pages[["url", "text"]])
    build_index(spark, sdf, idx, num_segments=2, build_id="bm")
    build_sec = time.time() - t0

    t0 = time.time()
    man = force_merge(spark, idx, max_segments=1)
    merge_sec = time.time() - t0
    assert len(man["segments"]) == 1
    check_index(idx, sample_terms=50)

    print(json.dumps({
        "n_docs": n_docs, "gen_sec": round(gen_sec, 2),
        "build_sec": round(build_sec, 2), "merge_sec": round(merge_sec, 2),
    }))


if __name__ == "__main__":
    main()
