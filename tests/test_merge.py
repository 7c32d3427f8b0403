"""Tiered merge: plan scoring, execution, and post-merge rank identity."""

import os
import shutil

import numpy as np

from tests.conftest import CACHE


def _build(spark, pages, idx, nseg):
    from lucene_solr_spark.index.build import build_index

    shutil.rmtree(idx, ignore_errors=True)
    sdf = spark.createDataFrame(pages[["url", "text"]])
    return build_index(spark, sdf, idx, num_segments=nseg, build_id="m0")


def test_plan_respects_budget_and_adjacency():
    from lucene_solr_spark.index.merge import plan_merges

    segs = [
        {"segment_id": f"s{i}", "doc_base": i * 100, "max_doc": 100,
         "postings_bytes": 50_000}
        for i in range(12)
    ]
    groups = plan_merges(segs, max_merge_at_once=4, segs_per_tier=2.0,
                         floor_bytes=4096)
    assert groups and 2 <= len(groups[0]) <= 4
    ids = [int(s[1:]) for s in groups[0]]
    assert ids == list(range(ids[0], ids[0] + len(ids)))  # adjacent

    # few segments -> no merge needed
    assert plan_merges(segs[:2], segs_per_tier=10.0) == []


def test_merge_preserves_results(spark, pages_small, oracle_small):
    from lucene_solr_spark.index import manifest as mf
    from lucene_solr_spark.index.merge import maybe_merge
    from lucene_solr_spark.search.engine import SparkSearcher

    idx = os.path.join(CACHE, "idx_merge")
    man0 = _build(spark, pages_small, idx, 12)
    assert len(man0["segments"]) == 12

    man1 = maybe_merge(
        spark, idx, max_merge_at_once=4, segs_per_tier=2.0, floor_bytes=4096
    )
    assert len(man1["segments"]) < 12
    assert man1["generation"] > man0["generation"]
    assert man1["fieldstats"] == man0["fieldstats"]
    # doc ranges stay a contiguous partition of [0, total)
    segs = sorted(man1["segments"], key=lambda s: s["doc_base"])
    acc = 0
    for s in segs:
        assert s["doc_base"] == acc
        acc += s["max_doc"]
    assert acc == man0["fieldstats"]["max_doc"]
    # merged lineage recorded
    assert any("merged_from" in s["lineage"] for s in man1["segments"])

    s = SparkSearcher(spark, idx)
    for q, mode in [("babe kala", "OR"), ("babe kala", "AND"), ("babe", "OR")]:
        res = s.search_pdf(q, k=10, mode=mode)
        exp = oracle_small.search(q, 10, mode)
        np.testing.assert_array_equal(res["docid"].to_numpy(), exp["docid"].to_numpy())
        np.testing.assert_array_equal(
            res["score"].to_numpy(np.float32), exp["score"].to_numpy(np.float32)
        )


def test_force_merge_to_n_segments(spark, pages_small, oracle_small):
    """forceMerge(N>1) must stop AT N segments, not over-merge below it
    (ADVICE r1: dead '* 0' term in the loop condition)."""
    from lucene_solr_spark.index.merge import force_merge
    from lucene_solr_spark.search.engine import SparkSearcher

    idx = os.path.join(CACHE, "idx_force_merge_n")
    _build(spark, pages_small, idx, 7)
    man = force_merge(spark, idx, max_segments=3)
    assert len(man["segments"]) == 3
    segs = sorted(man["segments"], key=lambda s: s["doc_base"])
    acc = 0
    for s in segs:
        assert s["doc_base"] == acc
        acc += s["max_doc"]
    res = SparkSearcher(spark, idx).search_pdf("babe roro", k=10)
    exp = oracle_small.search("babe roro", 10, "OR")
    np.testing.assert_array_equal(res["docid"].to_numpy(), exp["docid"].to_numpy())
    np.testing.assert_array_equal(
        res["score"].to_numpy(np.float32), exp["score"].to_numpy(np.float32)
    )


def test_force_merge_single_segment(spark, pages_small, oracle_small):
    from lucene_solr_spark.index.merge import force_merge
    from lucene_solr_spark.search.engine import SparkSearcher

    idx = os.path.join(CACHE, "idx_force_merge")
    _build(spark, pages_small, idx, 7)
    man = force_merge(spark, idx, max_segments=1)
    assert len(man["segments"]) == 1
    # full structural validation of the bulk-copied + stitched segment,
    # incl. the fragmentation guard (7 source chunks per head term)
    from lucene_solr_spark.index.check import check_index

    check_index(idx)
    res = SparkSearcher(spark, idx).search_pdf("babe kala roro", k=10)
    exp = oracle_small.search("babe kala roro", 10, "OR")
    np.testing.assert_array_equal(res["docid"].to_numpy(), exp["docid"].to_numpy())
    np.testing.assert_array_equal(
        res["score"].to_numpy(np.float32), exp["score"].to_numpy(np.float32)
    )


def test_plan_merges_multiple_disjoint_groups():
    """ConcurrentMergeScheduler analog: several DISJOINT windows per round,
    best score first, never overshooting the tier budget."""
    from lucene_solr_spark.index.merge import plan_merges

    segs = [
        {"segment_id": f"s{i}", "doc_base": i * 100, "max_doc": 100,
         "postings_bytes": 50_000}
        for i in range(16)
    ]
    groups = plan_merges(segs, max_merge_at_once=4, segs_per_tier=2.0,
                         floor_bytes=4096, max_concurrent=4)
    assert len(groups) >= 2
    flat = [s for g in groups for s in g]
    assert len(flat) == len(set(flat))  # disjoint
    for g in groups:
        ids = sorted(int(s[1:]) for s in g)
        assert ids == list(range(ids[0], ids[0] + len(ids)))  # adjacent


def test_time_travel_snapshot_reads(spark, pages_small, oracle_small):
    """A merge publishes a new generation; the PRE-merge generation stays
    readable and rank-identical (immutable segments, MVCC)."""
    from lucene_solr_spark.index import manifest as mf
    from lucene_solr_spark.index.merge import force_merge
    from lucene_solr_spark.search.engine import SparkSearcher

    idx = os.path.join(CACHE, "idx_time_travel")
    man0 = _build(spark, pages_small, idx, 6)
    g0 = man0["generation"]
    man1 = force_merge(spark, idx, max_segments=1)
    assert man1["generation"] > g0
    assert g0 in mf.generations(idx)

    old = SparkSearcher(spark, idx, generation=g0)
    new = SparkSearcher(spark, idx)
    assert len(old.man["segments"]) == 6
    assert len(new.man["segments"]) == 1
    exp = oracle_small.search("babe roro", 10, "OR")
    for s in (old, new):
        res = s.search_pdf("babe roro", k=10)
        np.testing.assert_array_equal(res["docid"].to_numpy(), exp["docid"].to_numpy())
        np.testing.assert_array_equal(
            res["score"].to_numpy(np.float32), exp["score"].to_numpy(np.float32)
        )


def test_replicate_index(spark, pages_small, oracle_small):
    """Replicator: full copy, rank-identical replica, incremental second
    pass copies nothing, NRT append then replicate copies only new segs."""
    from lucene_solr_spark.index.replicate import replicate
    from lucene_solr_spark.search.engine import SparkSearcher
    from lucene_solr_spark.streaming.incremental import append_batch

    src = os.path.join(CACHE, "idx_repl_src")
    dst = os.path.join(CACHE, "idx_repl_dst")
    shutil.rmtree(dst, ignore_errors=True)
    _build(spark, pages_small.iloc[:1500], src, 4)

    r1 = replicate(src, dst)
    assert len(r1["copied"]) == 4 and not r1["skipped"]
    exp = SparkSearcher(spark, src).search_pdf("babe roro", k=10)
    got = SparkSearcher(spark, dst).search_pdf("babe roro", k=10)
    np.testing.assert_array_equal(exp["docid"].to_numpy(), got["docid"].to_numpy())
    np.testing.assert_array_equal(
        exp["score"].to_numpy(np.float32), got["score"].to_numpy(np.float32)
    )

    r2 = replicate(src, dst)
    assert not r2["copied"] and len(r2["skipped"]) == 4  # incremental no-op

    # NRT append on the source -> only the new segments travel
    batch = pages_small.iloc[1500:1600]
    append_batch(spark, spark.createDataFrame(batch[["url", "text"]]), src, 1,
                 num_segments=1)
    r3 = replicate(src, dst)
    assert len(r3["copied"]) == 1 and len(r3["skipped"]) == 4
    s_src = SparkSearcher(spark, src)
    s_dst = SparkSearcher(spark, dst)
    assert s_src.max_doc == s_dst.max_doc == 1600
    a = s_src.search_pdf("babe", k=10)
    b = s_dst.search_pdf("babe", k=10)
    np.testing.assert_array_equal(a["docid"].to_numpy(), b["docid"].to_numpy())


def test_replicate_repairs_same_size_divergence(spark, pages_small, oracle_small):
    """A destination segment with a renamed file but identical total byte
    size must be repaired (reference revisions diff per-file name+size,
    not aggregate bytes — an aggregate-size check would skip it)."""
    import glob

    from lucene_solr_spark.index import manifest as mf
    from lucene_solr_spark.index.replicate import replicate

    src = os.path.join(CACHE, "idx_repl2_src")
    dst = os.path.join(CACHE, "idx_repl2_dst")
    shutil.rmtree(dst, ignore_errors=True)
    _build(spark, pages_small.iloc[:400], src, 2)
    replicate(src, dst)

    man = mf.read_current(dst)
    seg = man["segments"][0]
    segdir = os.path.join(dst, seg["path"])
    files = sorted(
        f for f in glob.glob(os.path.join(segdir, "**", "*"), recursive=True)
        if os.path.isfile(f)
    )
    f0 = files[0]
    os.rename(f0, f0 + ".x")  # same aggregate size, divergent content set

    r = replicate(src, dst)
    assert seg["segment_id"] in r["copied"]
    assert os.path.exists(f0) and not os.path.exists(f0 + ".x")
