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


def kmeans_centroids(
    emb: DataFrame, n_cells: int = 16, iters: int = 5, seed: int = 7
) -> tuple[np.ndarray, list[float]]:
    """Lloyd's k-means for the IVF coarse quantizer, Spark-native.

    The centroid matrix is tiny (n_cells x dim) and lives driver-side;
    each iteration is ONE scan (mapInPandas partial sums per cell x dim)
    plus ONE small shuffle (groupBy(cell, dim), <= n_cells*dim rows per
    partition). At 100 TB that's iters x (scan + KB-scale shuffle) — the
    standard distributed Lloyd shape. Returns (centroids, inertia per
    iteration); init is the seeded first-k sample (k-means|| would slot in
    here unchanged).
    """
    import pandas as pd
    from pyspark.sql import types as T

    init = (
        emb.orderBy("vec_id").limit(n_cells).select("embedding").collect()
    )
    C = np.stack([np.asarray(r["embedding"], dtype=np.float64) for r in init])
    schema = T.StructType([
        T.StructField("cell", T.IntegerType()),
        T.StructField("dim", T.IntegerType()),
        T.StructField("s", T.DoubleType()),
        T.StructField("n", T.LongType()),
        T.StructField("inertia", T.DoubleType()),
    ])
    inertias: list[float] = []
    for _ in range(iters):
        Cb = C  # captured by value per iteration

        def partials(it):
            for pdf in it:
                M = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
                # squared distances via ||x||^2 - 2xC' + ||c||^2
                d2 = (
                    (M * M).sum(1)[:, None]
                    - 2.0 * (M @ Cb.T)
                    + (Cb * Cb).sum(1)[None, :]
                )
                cell = d2.argmin(1)
                inert = float(d2[np.arange(len(M)), cell].sum())
                rows = []
                for c in np.unique(cell):
                    m = cell == c
                    s = M[m].sum(0)
                    for dim in range(M.shape[1]):
                        rows.append((int(c), dim, float(s[dim]), int(m.sum()), 0.0))
                rows.append((-1, -1, 0.0, 0, inert))
                yield pd.DataFrame(rows, columns=["cell", "dim", "s", "n", "inertia"])

        agg = (
            emb.select("embedding")
            .mapInPandas(partials, schema)
            .groupBy("cell", "dim")
            .agg(F.sum("s").alias("s"), F.sum("n").alias("n"),
                 F.sum("inertia").alias("inertia"))
            .collect()
        )
        newC = C.copy()
        counts = np.zeros(n_cells)
        sums = np.zeros_like(C)
        total_inertia = 0.0
        for r in agg:
            if r["cell"] < 0:
                total_inertia += float(r["inertia"])
                continue
            sums[r["cell"], r["dim"]] = float(r["s"])
            counts[r["cell"]] = max(counts[r["cell"]], int(r["n"]))
        nz = counts > 0
        newC[nz] = sums[nz] / counts[nz, None]
        C = newC
        inertias.append(total_inertia)
    return C, inertias


def kmeans_assign(emb: DataFrame, centroids: np.ndarray) -> DataFrame:
    """Assign each vector its nearest k-means cell (the IVF partition key:
    write the corpus partitioned by this column and the probe semi-join
    becomes partition pruning)."""
    import pandas as pd
    from pyspark.sql import types as T

    Cb = np.asarray(centroids, dtype=np.float64)
    schema = T.StructType([
        T.StructField("vec_id", T.LongType()),
        T.StructField("cell", T.IntegerType()),
    ])

    def run(it):
        for pdf in it:
            M = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            d2 = (
                (M * M).sum(1)[:, None] - 2.0 * (M @ Cb.T)
                + (Cb * Cb).sum(1)[None, :]
            )
            yield pd.DataFrame({
                "vec_id": pdf["vec_id"].to_numpy(),
                "cell": d2.argmin(1).astype(np.int32),
            })

    return emb.select("vec_id", "embedding").mapInPandas(run, schema)


def _pair_cos(va, vb):
    """Cosine between two array columns, all JVM-side (zip_with/aggregate)."""
    dot = F.aggregate(
        F.zip_with(va, vb, lambda a, b: a.cast("double") * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    na = F.sqrt(
        F.aggregate(va, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double"))
    )
    nb = F.sqrt(
        F.aggregate(vb, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double"))
    )
    return dot / (na * nb)


def cosine_pairs_exact(
    emb: DataFrame, threshold_milli: int = 300, max_id: int | None = None
) -> DataFrame:
    """Exact embedding near-dup pairs: all (a < b) pairs with cosine >=
    threshold. All-pairs is O(n^2) — the ``max_id`` bound exists because
    this is the small-scale oracle profile; production uses
    cosine_near_dup_pairs (LSH-bucketed) below."""
    sub = emb
    if max_id is not None:
        sub = sub.where(F.col("vec_id") < max_id)
    a = sub.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("ea"))
    b = sub.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("eb"))
    cm = F.round(_pair_cos(F.col("ea"), F.col("eb")) * 1000).cast("long")
    return (
        a.crossJoin(b)
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", cm.alias("cos_milli"))
        .where(F.col("cos_milli") >= threshold_milli)
        .orderBy("id_a", "id_b")
    )


def cosine_near_dup_pairs(
    emb: DataFrame,
    threshold_milli: int = 900,
    n_planes: int = 12,
    seed: int = 3,
    max_bucket: int = 1024,
) -> DataFrame:
    """Embedding-cosine near-dup at scale: random-hyperplane LSH buckets ->
    exact cosine verify WITHIN buckets only (one shuffle on the bucket key,
    quadratic work bounded per bucket by ``max_bucket``). High-cosine pairs
    collide with probability (1 - theta/pi)^n_planes, so recall targets
    pick n_planes; missed pairs are the documented LSH trade."""
    from pyspark.sql import Window

    b = lsh_bucket_np(emb, n_planes, seed)
    w = Window.partitionBy("bucket")
    b = b.withColumn("bsz", F.count("*").over(w)).where(
        F.col("bsz") <= max_bucket
    ).drop("bsz")
    withv = b.join(emb.select("vec_id", "embedding"), "vec_id")
    a = withv.select(
        F.col("bucket"), F.col("vec_id").alias("id_a"), F.col("embedding").alias("ea")
    )
    bb = withv.select(
        F.col("bucket"), F.col("vec_id").alias("id_b"), F.col("embedding").alias("eb")
    )
    cm = F.round(_pair_cos(F.col("ea"), F.col("eb")) * 1000).cast("long")
    return (
        a.join(bb, "bucket")
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", cm.alias("cos_milli"))
        .where(F.col("cos_milli") >= threshold_milli)
        .distinct()
        .orderBy("id_a", "id_b")
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
