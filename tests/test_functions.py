"""Unit tests for the training-data-pipeline operators (numpy profiles +
Spark plumbing). The md5-profile variants are covered by tools/check_oracle
and the gate; here we test the production (vectorized) paths."""

import numpy as np
import pandas as pd
import pytest


@pytest.fixture(scope="module")
def docs_df(spark):
    pdf = pd.DataFrame(
        {
            "doc_id": range(6),
            "text": [
                "the quick brown fox jumps over the lazy dog",
                "the quick brown fox jumps over the lazy cat",   # near-dup of 0
                "completely different content about spark engines",
                "the quick brown fox jumps over the lazy dog",   # exact dup of 0
                "spark engines process completely different content",
                "tiny",
            ],
        }
    )
    return spark.createDataFrame(pdf)


def test_exact_dedup(spark, docs_df):
    from lucene_solr_spark.functions.dedup import exact_duplicate_groups

    g = exact_duplicate_groups(docs_df).toPandas()
    assert len(g) == 1
    assert g["cnt"].iloc[0] == 2 and g["keep_doc"].iloc[0] == 0


def test_minhash_np_similarity_ordering(spark, docs_df):
    from lucene_solr_spark.functions.dedup import minhash_signatures_np

    sig = minhash_signatures_np(docs_df, num_hashes=128, k=3).toPandas()
    sig = sig.set_index("doc_id")["sig"]
    est = lambda a, b: np.mean(np.array(sig[a]) == np.array(sig[b]))
    assert est(0, 3) == 1.0                    # exact dup -> identical signature
    assert est(0, 1) > est(0, 2)               # near-dup >> unrelated
    assert est(0, 1) > 0.4


def test_simhash64_hamming(spark, docs_df):
    from lucene_solr_spark.functions.dedup import simhash64

    sh = simhash64(docs_df).toPandas().set_index("doc_id")["simhash"]
    ham = lambda a, b: bin(int(sh[a]) ^ int(sh[b])).count("1")
    assert ham(0, 3) == 0
    assert ham(0, 1) < ham(0, 2)


def test_simhash64_deterministic(spark, docs_df):
    from lucene_solr_spark.functions.dedup import simhash64

    a = simhash64(docs_df).toPandas().sort_values("doc_id").reset_index(drop=True)
    b = simhash64(docs_df).toPandas().sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_lsh_bucket_groups_duplicates(spark):
    from lucene_solr_spark.functions.similarity import lsh_bucket_np

    rng = np.random.default_rng(1)  # seed with wide sign margins on all planes
    base = rng.standard_normal(32).astype(np.float32)
    rows = []
    for i in range(10):
        v = base + rng.standard_normal(32).astype(np.float32) * 0.01  # tight cluster
        rows.append((i, [float(x) for x in v]))
    for i in range(10, 20):
        v = rng.standard_normal(32).astype(np.float32)
        rows.append((i, [float(x) for x in v]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    b = lsh_bucket_np(emb, n_planes=8).toPandas().set_index("vec_id")["bucket"]
    assert b.loc[range(10)].nunique() == 1  # the cluster shares a bucket


def test_brute_vs_ivf_consistency(spark):
    from lucene_solr_spark.functions.similarity import brute_force_topk, ivf_topk

    rng = np.random.default_rng(1)
    rows = []
    for i in range(60):
        rows.append((i, [float(x) for x in rng.standard_normal(16)], i % 3))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    q = rows[5][1]
    brute = brute_force_topk(emb, q, k=5, exclude_id=5).toPandas()
    ivf_all = ivf_topk(emb, q, k=5, nprobe=3, exclude_id=5).toPandas()  # probe all cells
    pd.testing.assert_frame_equal(brute, ivf_all)


def test_multimodal_plumbing(spark):
    from lucene_solr_spark.functions.multimodal import (
        decode_image,
        extract_features,
        metadata_only_projection,
        sample_frames,
        synthesize_assets,
    )

    assets = synthesize_assets(spark, n=12)
    feats = extract_features(assets, dim=64).toPandas()
    assert len(feats) == 12 and all(len(f) == 64 for f in feats["feature"])
    # deterministic across runs
    feats2 = extract_features(assets, dim=64).toPandas()
    a0 = feats.sort_values("asset_id")["feature"].iloc[0]
    b0 = feats2.sort_values("asset_id")["feature"].iloc[0]
    np.testing.assert_array_equal(np.array(a0), np.array(b0))

    frames = sample_frames(assets, every_n_bytes=1024, dim=16).toPandas()
    assert frames.groupby("asset_id").size().min() >= 1

    meta = metadata_only_projection(assets)
    assert set(meta.columns) == {"asset_id", "width", "height"}
    # real decoder is stubbed
    with pytest.raises(NotImplementedError):
        decode_image(b"xxxx")


def test_components_facet_and_stats(spark, docs_df):
    from lucene_solr_spark.functions.components import facet_query, stats_component

    d = docs_df.withColumn("lang", docs_df.doc_id % 2 == 0).withColumn(
        "n_chars", __import__("pyspark.sql.functions", fromlist=["length"]).length("text")
    )
    fq = facet_query(d, {"short": "n_chars < 10", "all_rows": "1=1"}).toPandas()
    assert fq["short"].iloc[0] == 1 and fq["all_rows"].iloc[0] == 6
    st = stats_component(d, "n_chars", "lang").toPandas()
    assert st["cnt"].sum() == 6


def test_lsh_np_finds_near_duplicates(spark):
    import pandas as pd

    from lucene_solr_spark.functions import dedup as D

    base = "spark index merge segment postings block delta varint skip table"
    rows = []
    for i in range(40):
        rows.append({"doc_id": i, "text": f"unique doc {i} " + " ".join(
            f"w{i}_{j}" for j in range(12))})
    # two near-identical pairs
    rows.append({"doc_id": 100, "text": base})
    rows.append({"doc_id": 101, "text": base + " extra"})
    rows.append({"doc_id": 200, "text": base.replace("spark", "flink")})
    rows.append({"doc_id": 201, "text": base.replace("spark", "flink")})
    docs = spark.createDataFrame(pd.DataFrame(rows))
    pairs = D.lsh_candidate_pairs_np(docs, num_hashes=64, bands=16, k=3)
    got = {(r["doc_a"], r["doc_b"]) for r in pairs.collect()}
    assert (100, 101) in got
    assert (200, 201) in got
    # verified pipeline keeps only high-jaccard pairs
    ver = D.near_dup_pipeline(docs, min_jaccard_milli=500)
    vgot = {(r["doc_a"], r["doc_b"]) for r in ver.collect()}
    assert (200, 201) in vgot  # exact dup -> jaccard 1000
    assert all(a < b for a, b in vgot)


def test_lsh_np_bucket_cap(spark):
    import pandas as pd

    from lucene_solr_spark.functions import dedup as D

    # 30 identical docs: one degenerate bucket per band; cap excises it
    rows = [{"doc_id": i, "text": "same boilerplate text here repeated words"}
            for i in range(30)]
    docs = spark.createDataFrame(pd.DataFrame(rows))
    capped = D.lsh_candidate_pairs_np(docs, max_bucket=10).count()
    uncapped = D.lsh_candidate_pairs_np(docs, max_bucket=None).count()
    assert capped == 0
    assert uncapped == 30 * 29 // 2


def test_ivf_precomputed_centroids_equivalent(spark):
    import os

    from lucene_solr_spark.functions import similarity as S
    from tests.conftest import CACHE

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    qvec = [r["embedding"] for r in emb.where("vec_id = 7").collect()][0]
    inline = S.ivf_topk(emb, qvec, 10, 2, "label", 7).collect()
    cents = S.ivf_centroids(emb, "label")
    pre = S.ivf_topk(emb, qvec, 10, 2, "label", 7, centroids=cents).collect()
    assert [tuple(r) for r in inline] == [tuple(r) for r in pre]


def test_analyzed_snippets_english_conflation():
    from lucene_solr_spark.functions.components import analyzed_snippets

    texts = [
        "The Engines were MERGING the segments quickly",
        "no relevant words here at all",
        "merge once; then merged again and merges forever",
    ]
    out = analyzed_snippets(texts, {"merg"}, analyzer="english", window=8)
    # case-insensitive, inflection-insensitive match via the english chain
    assert "<em>MERGING</em>" in out[0]
    assert out[1] is None
    assert out[2].count("<em>") == 3
    # snippet is a real substring of the source once tags are removed
    assert out[2].replace("<em>", "").replace("</em>", "") in texts[2]


def test_block_join_parent_modes(spark):
    import pandas as pd

    from lucene_solr_spark.functions.components import block_join_parent_topk

    parents = spark.createDataFrame(pd.DataFrame({"pid": [1, 2, 3]}))
    children = spark.createDataFrame(pd.DataFrame({
        "pid": [1, 1, 2, 2, 3],
        "flag": [1, 1, 1, 0, 0],
        "val": [10.0, 30.0, 5.0, 99.0, 7.0],
    }))
    res = block_join_parent_topk(
        parents, children, "pid", "flag = 1", "val", "max", 10
    ).collect()
    got = {r["pid"]: (r["n_children"], r["score_cents"]) for r in res}
    # parent 3 has no matching children; parent 1 max=30, parent 2 max=5
    assert got == {1: (2, 3000), 2: (1, 500)}
    tot = block_join_parent_topk(
        parents, children, "pid", "flag = 1", "val", "total", 10
    ).collect()
    assert {r["pid"]: r["score_cents"] for r in tot} == {1: 4000, 2: 500}


def test_cosine_near_dup_lsh_vs_exact(spark):
    """LSH-bucketed near-dup recall vs the exact profile: planted
    near-identical vectors MUST collide; overall recall reported sane."""
    import pandas as pd

    from lucene_solr_spark.functions import similarity as S

    rng = np.random.default_rng(8)
    base = rng.standard_normal((40, 32)).astype(np.float32)
    rows = [{"vec_id": i, "embedding": base[i].tolist()} for i in range(40)]
    # planted near-dups: tiny perturbations of vectors 0 and 1
    for j, src in [(100, 0), (101, 0), (102, 1)]:
        v = base[src] + rng.standard_normal(32).astype(np.float32) * 0.01
        rows.append({"vec_id": j, "embedding": v.tolist()})
    emb = spark.createDataFrame(pd.DataFrame(rows))
    exact = {
        (r["id_a"], r["id_b"])
        for r in S.cosine_pairs_exact(emb, 990).collect()
    }
    assert {(0, 100), (0, 101), (1, 102), (100, 101)} <= exact
    lsh = {
        (r["id_a"], r["id_b"])
        for r in S.cosine_near_dup_pairs(emb, 990, n_planes=8).collect()
    }
    # high-cosine pairs (cos ~ 0.9999) collide with prob ~(1-theta/pi)^8 ~ 1
    assert lsh == exact
    # cos values agree with the exact profile where both report a pair
    assert lsh <= exact


def test_curation_pipeline_monotone(spark):
    from lucene_solr_spark.functions import curation as CU

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    strict = CU.curate_docids(docs, min_quality_milli=600).count()
    loose = CU.curate_docids(docs, min_quality_milli=300).count()
    assert 0 < strict <= loose <= docs.count()
    summ = CU.curation_summary(docs, 450, "en").toPandas()
    assert (summ["n_docs"] > 0).all()
    assert (summ["sum_tokens"] >= summ["n_docs"]).all()


def test_kmeans_ivf_end_to_end(spark):
    """Lloyd's iterations: inertia non-increasing; IVF over k-means cells
    reaches high recall vs brute force with modest nprobe."""
    from lucene_solr_spark.functions import similarity as S
    from pyspark.sql import functions as F

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    C, inertias = S.kmeans_centroids(emb, n_cells=8, iters=4, seed=7)
    assert all(
        b <= a * 1.0000001 for a, b in zip(inertias, inertias[1:])
    ), inertias
    assigned = emb.join(S.kmeans_assign(emb, C), "vec_id")
    # every cell non-degenerate
    sizes = assigned.groupBy("cell").count().toPandas()
    assert sizes["count"].min() >= 1

    qvec = [r["embedding"] for r in emb.where("vec_id = 7").collect()][0]
    brute = [r["vec_id"] for r in S.brute_force_topk(emb, qvec, 10, 7).collect()]
    cents = S.ivf_centroids(assigned, "cell")
    ivf = [
        r["vec_id"]
        for r in S.ivf_topk(assigned, qvec, 10, 4, "cell", 7, centroids=cents).collect()
    ]
    recall = len(set(brute) & set(ivf)) / 10.0
    assert recall >= 0.8, (recall, brute, ivf)


def test_geo_within_radius_correct_and_pruned(spark):
    import pandas as pd

    from lucene_solr_spark.functions.spatial import (
        geo_within_radius,
        grid_cell,
        haversine_km,
    )
    from pyspark.sql import functions as F

    pts = pd.DataFrame({
        "pid": range(6),
        "lat": [0.0, 0.0, 0.0, 52.5, 89.9, -33.9],
        "lon": [0.0, 1.0, 10.0, 13.4, 0.0, 151.2],
    })
    df = spark.createDataFrame(pts)
    # 1 deg of longitude at the equator ~ 111.19 km
    near = geo_within_radius(df, "lat", "lon", 0.0, 0.0, 150.0).collect()
    assert {r["pid"] for r in near} == {0, 1}
    assert near[0]["dist_km"] == 0.0
    assert abs(near[1]["dist_km"] - 111.19) < 0.5
    # bbox prefilter is conservative: result identical to exact-only filter
    exact = df.withColumn(
        "d", haversine_km(F.col("lat"), F.col("lon"), F.lit(0.0), F.lit(0.0))
    ).where("d <= 150.0").count()
    assert exact == len(near)
    # polar query must not lose points to a degenerate lon bbox
    polar = geo_within_radius(df, "lat", "lon", 89.0, 179.0, 500.0).collect()
    assert {r["pid"] for r in polar} == {4}
    # grid cells: same cell for nearby points, distinct for far ones
    cells = df.select("pid", grid_cell(F.col("lat"), F.col("lon"), 5.0).alias("c")).collect()
    by = {r["pid"]: r["c"] for r in cells}
    assert by[0] == by[1]
    assert by[0] != by[3]


def test_geo_antimeridian_wrap(spark):
    import pandas as pd

    from lucene_solr_spark.functions.spatial import geo_within_radius

    pts = pd.DataFrame({
        "pid": [0, 1, 2],
        "lat": [0.0, 0.0, 0.0],
        "lon": [179.5, -179.5, 170.0],
    })
    df = spark.createDataFrame(pts)
    # query at the antimeridian: both sides within ~111 km of (0, 180)
    hits = geo_within_radius(df, "lat", "lon", 0.0, 179.9, 150.0).collect()
    assert {r["pid"] for r in hits} == {0, 1}


def test_quality_stats_hand_case(spark):
    """QualityStats semantics on a hand-computed case (QualityStats.java:
    29-62): AP sums precision at each relevant retrieved rank / num_rel."""
    import pytest as _pt

    from lucene_solr_spark.functions.quality import quality_stats

    results = spark.createDataFrame(
        [("q1", d, r) for r, d in enumerate([10, 20, 30, 40], 1)]
        + [("q2", d, r) for r, d in enumerate([7, 8], 1)],
        "query_id string, doc_id long, rank int",
    )
    qrels = spark.createDataFrame(
        [("q1", 10), ("q1", 30), ("q1", 99), ("q2", 5)],
        "query_id string, doc_id long",
    )
    out = {r["query_id"]: r for r in quality_stats(results, qrels, k=2).collect()}
    # q1: rel ranks 1 and 3 -> AP = (1/1 + 2/3) / 3
    assert out["q1"]["num_rel"] == 3
    assert out["q1"]["hits_at_k"] == 1  # only rank 1 within k=2
    assert out["q1"]["p_at_k"] == _pt.approx(0.5)
    assert out["q1"]["recall_at_k"] == _pt.approx(1 / 3)
    assert out["q1"]["ap"] == _pt.approx((1.0 + 2 / 3) / 3)
    # q2: no relevant retrieved
    assert out["q2"]["ap"] == 0.0 and out["q2"]["hits_at_k"] == 0
