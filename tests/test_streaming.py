"""NRT incremental indexing: stream batches in, manifest generations grow,
results equal a one-shot build over the union (batches arrive url-sorted so
docid assignment matches the lexicographic oracle)."""

import os
import shutil

import numpy as np

from tests.conftest import CACHE


def test_incremental_append_matches_oracle(spark, pages_small, oracle_small):
    from lucene_solr_spark.index import manifest as mf
    from lucene_solr_spark.search.engine import SparkSearcher
    from lucene_solr_spark.streaming.incremental import (
        append_batch,
        start_indexing_stream,
    )

    idx = os.path.join(CACHE, "idx_stream")
    src_dir = os.path.join(CACHE, "stream_src")
    ckpt = os.path.join(CACHE, "stream_ckpt")
    for d in (idx, src_dir, ckpt):
        shutil.rmtree(d, ignore_errors=True)
    os.makedirs(src_dir)

    # two url-sorted halves as arriving files
    pdf = pages_small[["url", "text"]].sort_values("url").reset_index(drop=True)
    half = len(pdf) // 2
    pdf.iloc[:half].to_parquet(os.path.join(src_dir, "part0.parquet"), index=False)

    schema = spark.createDataFrame(pdf.iloc[:1]).schema
    stream = spark.readStream.schema(schema).parquet(src_dir)
    q = start_indexing_stream(spark, stream, idx, ckpt, num_segments=2)
    q.awaitTermination(120)
    man1 = mf.read_current(idx)
    assert man1 is not None and man1["fieldstats"]["max_doc"] == half

    # second batch arrives
    pdf.iloc[half:].to_parquet(os.path.join(src_dir, "part1.parquet"), index=False)
    q = start_indexing_stream(spark, stream, idx, ckpt, num_segments=2)
    q.awaitTermination(120)
    man2 = mf.read_current(idx)
    assert man2["generation"] > man1["generation"]
    assert man2["fieldstats"]["max_doc"] == len(pdf)

    s = SparkSearcher(spark, idx)
    for query, mode in [("babe kala", "OR"), ("babe kala", "AND")]:
        res = s.search_pdf(query, k=10, mode=mode)
        exp = oracle_small.search(query, 10, mode)
        np.testing.assert_array_equal(res["docid"].to_numpy(), exp["docid"].to_numpy())
        np.testing.assert_array_equal(
            res["score"].to_numpy(np.float32), exp["score"].to_numpy(np.float32)
        )


def test_replayed_batch_is_idempotent(spark, pages_small):
    from lucene_solr_spark.index import manifest as mf
    from lucene_solr_spark.streaming.incremental import append_batch

    idx = os.path.join(CACHE, "idx_stream_idem")
    shutil.rmtree(idx, ignore_errors=True)
    sdf = spark.createDataFrame(pages_small[["url", "text"]].iloc[:200])
    append_batch(spark, sdf, idx, batch_id=0, num_segments=2)
    man1 = mf.read_current(idx)
    append_batch(spark, sdf, idx, batch_id=0, num_segments=2)  # replay
    man2 = mf.read_current(idx)
    assert man1["fieldstats"] == man2["fieldstats"]
    assert man1["generation"] == man2["generation"]
