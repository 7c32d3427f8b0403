"""explain()==score() invariant (CheckHits), boosts, and the CheckIndex
integrity walker."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def searcher(spark, small_index):
    from lucene_solr_spark.search.engine import SparkSearcher

    idx, _ = small_index
    return SparkSearcher(spark, idx)


def test_boost_changes_ranking_identically(searcher, oracle_small):
    plain = oracle_small.search("babe roro", 10, "OR")
    boosted = oracle_small.search("babe roro^3", 10, "OR")
    assert not plain["docid"].equals(boosted["docid"]) or not np.array_equal(
        plain["score"], boosted["score"]
    )
    res = searcher.search_pdf("babe roro^3", k=10, mode="OR")
    np.testing.assert_array_equal(res["docid"].to_numpy(), boosted["docid"].to_numpy())
    np.testing.assert_array_equal(
        res["score"].to_numpy(np.float32), boosted["score"].to_numpy(np.float32)
    )
    # phrase boost
    a = oracle_small.search('"babe roro"^2 babe', 10, "OR")
    b = searcher.search_pdf('"babe roro"^2 babe', k=10, mode="OR")
    np.testing.assert_array_equal(b["docid"].to_numpy(), a["docid"].to_numpy())
    np.testing.assert_array_equal(
        b["score"].to_numpy(np.float32), a["score"].to_numpy(np.float32)
    )


def test_explain_equals_score(searcher, oracle_small):
    for query in ["babe roro", "babe^2 roro", '"babe roro" roro']:
        top = searcher.search_pdf(query, k=5, mode="OR")
        for _, row in top.iterrows():
            ex_e = searcher.explain(query, int(row["docid"]))
            ex_o = oracle_small.explain(query, int(row["docid"]))
            assert ex_e["matched"] and ex_o["matched"]
            # explain total == search score, bit-for-bit (float32)
            assert np.float32(ex_e["total"]) == np.float32(row["score"]), query
            assert ex_e["total"] == ex_o["total"]
            assert ex_e["details"] == ex_o["details"], query


def test_explain_unmatched_doc(searcher, oracle_small):
    hit = oracle_small.search("babe", 1, "OR")["docid"].iloc[0]
    miss_q = "nonexistentterm42"
    assert not searcher.explain(miss_q, int(hit))["matched"]
    assert not oracle_small.explain(miss_q, int(hit))["matched"]


def test_check_index_clean(small_index):
    from lucene_solr_spark.index.check import check_index

    idx, man = small_index
    report = check_index(idx)
    assert report["total_docs"] == man["fieldstats"]["max_doc"]
    assert len(report["segments"]) == len(man["segments"])


def test_check_index_detects_corruption(spark, pages_small, tmp_path):
    import shutil
    import pyarrow.parquet as pq
    import pyarrow as pa

    from lucene_solr_spark.index import manifest as mf
    from lucene_solr_spark.index.build import build_index
    from lucene_solr_spark.index.check import CheckIndexError, check_index

    idx = str(tmp_path / "idx")
    sdf = spark.createDataFrame(pages_small[["url", "text"]].iloc[:300])
    build_index(spark, sdf, idx, num_segments=2, build_id="c0")
    check_index(idx)  # clean

    # corrupt a norms blob (truncate one byte)
    man = mf.read_current(idx)
    seg = man["segments"][0]
    p = f"{idx}/{seg['path']}/norms.parquet"
    t = pq.read_table(p).to_pydict()
    t["norms"] = [t["norms"][0][:-1]]
    pq.write_table(pa.table(t), p)
    with pytest.raises(CheckIndexError, match="norms length"):
        check_index(idx)
