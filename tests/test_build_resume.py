"""Resumability: kill after k partitions, re-run, identical snapshot
(BASELINE.md row 6; commit model SegmentInfos.java:52-114)."""

import json
import os
import shutil

import pytest

from tests.conftest import CACHE


def test_kill_and_resume_identical_manifest(spark, pages_small):
    from lucene_solr_spark.index.build import build_index
    from lucene_solr_spark.index import manifest as mf

    sdf = spark.createDataFrame(pages_small[["url", "text"]])

    idx_a = os.path.join(CACHE, "idx_resume_a")
    idx_b = os.path.join(CACHE, "idx_resume_b")
    shutil.rmtree(idx_a, ignore_errors=True)
    shutil.rmtree(idx_b, ignore_errors=True)

    # one-shot reference build
    man_a = build_index(spark, sdf, idx_a, num_segments=6, build_id="r0")

    # crashed build: only 3 partitions complete, no manifest committed
    with pytest.raises(RuntimeError, match="injected failure"):
        build_index(
            spark, sdf, idx_b, num_segments=6, build_id="r0", fail_after_partitions=3
        )
    assert mf.read_current(idx_b) is None  # atomic commit: nothing published

    # resume: completes remaining partitions, reuses finished segments
    man_b = build_index(spark, sdf, idx_b, num_segments=6, build_id="r0")
    resumed = [s["lineage"]["resumed"] for s in man_b["segments"]]
    assert sum(resumed) >= 1, "resume should reuse at least one staged segment"

    # snapshots equivalent: same doc ranges, same stats, same term counts
    key_a = [(s["doc_base"], s["max_doc"], s["sum_len"], s["term_count"]) for s in man_a["segments"]]
    key_b = [(s["doc_base"], s["max_doc"], s["sum_len"], s["term_count"]) for s in man_b["segments"]]
    assert key_a == key_b
    assert man_a["fieldstats"] == man_b["fieldstats"]

    # and queries over both give identical results
    from lucene_solr_spark.search.engine import SparkSearcher

    ra = SparkSearcher(spark, idx_a).search_pdf("babe kala", k=10)
    rb = SparkSearcher(spark, idx_b).search_pdf("babe kala", k=10)
    assert ra.equals(rb)


def test_lineage_rows_present(spark, small_index):
    _, man = small_index
    for s in man["segments"]:
        lin = s["lineage"]
        assert lin["doc_range"][1] - lin["doc_range"][0] + 1 == s["max_doc"]
        assert lin["wall_ms"] >= 0
        assert s["postings_bytes"] > 0
        assert s["term_count"] > 0


def test_sharded_manifest_roundtrip(tmp_path):
    """Past the shard threshold the root manifest names immutable shard
    files (Iceberg manifest-list shape); readers transparently reassemble
    the full segment list, and time travel still works per generation."""
    from lucene_solr_spark.index import manifest as mf

    idx = str(tmp_path / "sharded")
    segs = [
        {
            "segment_id": f"s{i:05d}", "path": f"segments/seg_s{i:05d}",
            "doc_base": i * 10, "max_doc": 10, "sum_len": 100,
            "term_count": 5, "postings_bytes": 123, "lineage": {},
        }
        for i in range(25)
    ]
    man = mf.commit(idx, segs, shard_threshold=7)
    assert len(man["segments"]) == 25  # caller sees the full list
    import json
    import os

    with open(os.path.join(idx, "manifest_1.json")) as f:
        root = json.load(f)
    assert "segments" not in root and len(root["segment_shards"]) > 1
    got = mf.read_current(idx)
    assert [s["segment_id"] for s in got["segments"]] == [
        s["segment_id"] for s in segs
    ]
    assert got["fieldstats"]["max_doc"] == 250

    # second (small) commit stays unsharded; generation 1 remains readable
    mf.commit(idx, segs[:3], shard_threshold=7_000)
    g1 = mf.read_generation(idx, 1)
    assert len(g1["segments"]) == 25
    assert len(mf.read_current(idx)["segments"]) == 3
