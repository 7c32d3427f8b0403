"""Similarity search over embedding columns (array<float>).

Baseline: brute-force cosine top-k — a single scan + TakeOrderedAndProject,
embarrassingly parallel (each partition scores its rows, merges k).
Scale path: IVF — restrict the scan to the nprobe closest coarse cells
(here the pre-assigned ``label`` plays the cluster id; production would
k-means its own). Both are pure DataFrame plans; the dot product is
F.aggregate/zip_with (JVM-side). An LSH (random hyperplane) bucketing is
provided as the numpy profile for streaming-scale candidate generation.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F, types as T


def _cosine_col(vec_col, qvec: list[float]):
    q = F.array(*[F.lit(float(x)) for x in qvec])
    dot = F.aggregate(
        F.zip_with(vec_col, q, lambda a, b: a.cast("double") * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    na = F.sqrt(
        F.aggregate(vec_col, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double"))
    )
    nq = float(np.sqrt(np.sum(np.asarray(qvec, dtype=np.float64) ** 2)))
    return dot / (na * F.lit(nq))


def brute_force_topk(
    emb: DataFrame, qvec: list[float], k: int = 10, exclude_id: int | None = None
) -> DataFrame:
    """Exact cosine top-k: scan + per-partition partial top-k + global merge
    (TakeOrderedAndProject)."""
    df = emb
    if exclude_id is not None:
        df = df.where(F.col("vec_id") != exclude_id)
    return (
        df.select(
            "vec_id",
            F.round(_cosine_col(F.col("embedding"), qvec) * 1000).cast("long").alias("cos_milli"),
        )
        .orderBy(F.desc("cos_milli"), F.asc("vec_id"))
        .limit(k)
    )


def ivf_centroids(emb: DataFrame, cluster_col: str = "label") -> DataFrame:
    """Per-cell centroid table — ONE aggregation over the corpus, meant to
    be computed at index-build time and PERSISTED (parquet partitioned /
    keyed by cell). At 100 TB recomputing this per query is a full scan —
    the round-1 plan audit's scale-killer — so queries must read the
    precomputed table instead."""
    exploded = emb.select(cluster_col, F.posexplode("embedding").alias("dim", "v"))
    return (
        exploded.groupBy(cluster_col, "dim")
        .agg(F.avg("v").alias("c"))
        .groupBy(cluster_col)
        .agg(F.array_sort(F.collect_list(F.struct("dim", "c"))).alias("dc"))
        .select(cluster_col, F.transform("dc", lambda s: s["c"]).alias("centroid"))
    )


def ivf_topk(
    emb: DataFrame,
    qvec: list[float],
    k: int = 10,
    nprobe: int = 2,
    cluster_col: str = "label",
    exclude_id: int | None = None,
    centroids: DataFrame | None = None,
) -> DataFrame:
    """IVF: centroid per cluster -> probe the nprobe nearest cells -> exact
    cosine within them. Coarse quantization prunes the scan by
    ~nprobe/n_clusters; at 100 TB the cells are the partition keys, so
    partition pruning skips the untouched cells entirely. Pass the
    PRECOMPUTED ``centroids`` table (ivf_centroids, persisted at build
    time); the inline fallback recomputes it and exists for small-scale
    convenience only."""
    if centroids is None:
        centroids = ivf_centroids(emb, cluster_col)
    probed = (
        centroids.select(
            cluster_col,
            _cosine_col(F.col("centroid"), qvec).alias("ccos"),
        )
        .orderBy(F.desc("ccos"), F.asc(cluster_col))
        .limit(nprobe)
        .select(cluster_col)
    )
    df = emb.join(F.broadcast(probed), cluster_col, "left_semi")
    if exclude_id is not None:
        df = df.where(F.col("vec_id") != exclude_id)
    return (
        df.select(
            "vec_id",
            F.round(_cosine_col(F.col("embedding"), qvec) * 1000).cast("long").alias("cos_milli"),
        )
        .orderBy(F.desc("cos_milli"), F.asc("vec_id"))
        .limit(k)
    )


def lsh_bucket_np(emb: DataFrame, n_planes: int = 16, seed: int = 3) -> DataFrame:
    """Random-hyperplane LSH bucket per vector (numpy profile): bucket =
    sign-bit pattern of n_planes projections. Candidate generation =
    one shuffle on the bucket key."""
    schema = T.StructType(
        [T.StructField("vec_id", T.LongType()), T.StructField("bucket", T.LongType())]
    )

    def run(it):
        planes = None
        for pdf in it:
            M = np.stack(pdf["embedding"].to_numpy())
            if planes is None:
                rng = np.random.default_rng(seed)
                planes = rng.standard_normal((M.shape[1], n_planes))
            bits = (M @ planes) > 0
            bucket = bits @ (1 << np.arange(n_planes, dtype=np.int64))
            yield pd.DataFrame({"vec_id": pdf["vec_id"].to_numpy(), "bucket": bucket})

    return emb.select("vec_id", "embedding").mapInPandas(run, schema)
