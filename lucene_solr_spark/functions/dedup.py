"""Deduplication operators for large-scale text pipelines.

Reference precedent: Solr's de-duplication update processor computes a
content signature per document and collapses on it
(solr/core/src/java/org/apache/solr/update/processor/SignatureUpdateProcessorFactory.java,
TextProfileSignature / Lookup3Signature). We generalize to the standard
web-scale menu: exact hash, MinHash+LSH banding, SimHash, n-gram Jaccard.

Scale design: every operator is shuffle-minimal —
  - exact/prefix dedup: one groupBy on a 128-bit signature (uniformly
    distributed -> no skew)
  - MinHash LSH: signatures computed scan-side, then ONE shuffle on the
    band-bucket key; candidate pairs come from within-bucket joins where
    buckets are tiny by construction. This is the classic shingle->minhash->
    band->bucket-join plan; band width tunes recall/cost.
  - SimHash: scan-side arithmetic only; near-dup = same 64-bit key or small
    hamming distance within buckets.
Two implementation profiles:
  - *_md5 variants use md5-string arithmetic so an ANSI-SQL oracle (DuckDB)
    reproduces them bit-for-bit — these back the correctness gate.
  - minhash_signatures/simhash64 are the fast numpy (Arrow-batched) path
    for production use; property-tested against sklearn-free references.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F, types as T

from .sqltext import tokens


# ---------------------------------------------------------------------------
# exact / prefix
# ---------------------------------------------------------------------------


def exact_duplicate_groups(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Exact dedup: md5(text) groups with >1 member."""
    return (
        docs.groupBy(F.md5(F.col(text_col)).alias("sig"))
        .agg(F.count("*").alias("cnt"), F.min("doc_id").alias("keep_doc"))
        .where(F.col("cnt") > 1)
        .orderBy("sig")
    )


def prefix_duplicate_groups(docs: DataFrame, n: int = 80, text_col: str = "text") -> DataFrame:
    """Near-exact dedup on a text prefix signature (cheap first pass)."""
    return (
        docs.groupBy(F.md5(F.substring(F.col(text_col), 1, n)).alias("sig"))
        .agg(F.count("*").alias("cnt"), F.min("doc_id").alias("keep_doc"))
        .where(F.col("cnt") > 1)
        .orderBy("sig")
    )


# ---------------------------------------------------------------------------
# shingles
# ---------------------------------------------------------------------------


def shingles(docs: DataFrame, k: int = 3) -> DataFrame:
    """(doc_id, shingle): k-token shingles from the token relation via a
    window lead — the ShingleFilter analog (lucene/analysis/common/.../shingle/)."""
    from pyspark.sql import Window

    t = tokens(docs)
    w = Window.partitionBy("doc_id").orderBy("pos")
    cols = [F.col("term")] + [F.lead("term", i).over(w) for i in range(1, k)]
    sh = (
        t.select(
            "doc_id",
            F.concat_ws(" ", *cols).alias("shingle"),
            F.lead("term", k - 1).over(w).alias("_last"),
        )
        .where(F.col("_last").isNotNull())
    )
    return sh.select("doc_id", "shingle").distinct()


# ---------------------------------------------------------------------------
# MinHash + LSH (md5-string profile, SQL-reproducible)
# ---------------------------------------------------------------------------


def minhash_signature_md5(docs: DataFrame, num_hashes: int = 8, k: int = 3) -> DataFrame:
    """(doc_id, h0..h{n-1}): minhash j = min over shingles of md5(j||shingle).

    min over *strings* of md5 hex — identical in any engine with md5().
    """
    sh = shingles(docs, k)
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{j}|"), F.col("shingle")))).alias(f"h{j}")
        for j in range(num_hashes)
    ]
    return sh.groupBy("doc_id").agg(*aggs)


def lsh_candidate_pairs_md5(
    docs: DataFrame,
    num_hashes: int = 8,
    bands: int = 4,
    k: int = 3,
) -> DataFrame:
    """Near-dup candidate pairs: band the signature, bucket-join.

    One shuffle on the bucket key; self-join within buckets produces
    (doc_a < doc_b) candidate pairs with the number of colliding bands.
    """
    rows_per_band = num_hashes // bands
    sig = minhash_signature_md5(docs, num_hashes, k)
    band_rows = []
    for b in range(bands):
        cols = [F.col(f"h{b * rows_per_band + r}") for r in range(rows_per_band)]
        band_rows.append(
            sig.select(
                "doc_id",
                F.lit(b).alias("band"),
                F.md5(F.concat_ws("|", *cols)).alias("bucket"),
            )
        )
    all_bands = band_rows[0]
    for br in band_rows[1:]:
        all_bands = all_bands.unionAll(br)
    a = all_bands.alias("a")
    bdf = all_bands.alias("b")
    pairs = (
        a.join(
            bdf,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count("*").alias("band_hits"))
        .orderBy("doc_a", "doc_b")
    )
    return pairs


def ngram_jaccard_pairs(
    docs: DataFrame, pairs: DataFrame, k: int = 3, min_milli: int = 0
) -> DataFrame:
    """Exact k-gram Jaccard verification for candidate pairs.

    jaccard_milli = round(1000 * |A∩B| / |A∪B|) over distinct k-shingles.
    """
    sh = shingles(docs, k)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    a = sh.alias("sa")
    b = sh.alias("sb")
    inter = (
        pairs.select("doc_a", "doc_b")
        .join(a, F.col("doc_a") == F.col("sa.doc_id"))
        .join(
            b,
            (F.col("doc_b") == F.col("sb.doc_id"))
            & (F.col("sa.shingle") == F.col("sb.shingle")),
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("inter"))
    )
    out = (
        inter.join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n_sh", "n_a"), "doc_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n_sh", "n_b"), "doc_b")
        .withColumn(
            "jaccard_milli",
            F.round(
                F.lit(1000.0) * F.col("inter") / (F.col("n_a") + F.col("n_b") - F.col("inter"))
            ).cast("long"),
        )
        .where(F.col("jaccard_milli") >= min_milli)
        .select("doc_a", "doc_b", "inter", "jaccard_milli")
        .orderBy("doc_a", "doc_b")
    )
    return out


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash16(docs: DataFrame) -> DataFrame:
    """16-bit SimHash from md5 hex digits — pure SQL arithmetic, so the gate
    oracle reproduces it exactly. bit b of token-hash = bit (b%4) of hex
    digit (b//4); simhash bit = majority vote weighted by tf."""
    t = tokens(docs).groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    t = t.withColumn("h", F.md5(F.col("term")))
    digit = [
        F.instr(F.lit("0123456789abcdef"), F.substring(F.col("h"), d + 1, 1)) - 1
        for d in range(4)
    ]
    bit_sums = []
    for b in range(16):
        d = b // 4
        j = b % 4
        bit = F.floor(digit[d] / (2 ** j)) % 2
        contrib = F.when(bit == 1, F.col("tf")).otherwise(-F.col("tf"))
        bit_sums.append(F.sum(contrib).alias(f"s{b}"))
    agg = t.groupBy("doc_id").agg(*bit_sums)
    expr = None
    for b in range(16):
        term_b = F.when(F.col(f"s{b}") > 0, 2 ** b).otherwise(0)
        expr = term_b if expr is None else expr + term_b
    return agg.select("doc_id", expr.cast("long").alias("simhash"))


_SIMHASH64_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("simhash", T.LongType()),
    ]
)


def simhash64(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """64-bit SimHash, numpy-vectorized (production profile).

    mapInPandas: per batch, tokenize, hash terms with a 64-bit
    polynomial hash, accumulate ±tf per bit via matrix ops.
    """
    from ..analysis import tokenize_series

    def run(it):
        for pdf in it:
            flat = tokenize_series(pdf[text_col])
            if len(flat) == 0:
                yield pd.DataFrame({"doc_id": pdf[id_col], "simhash": 0})
                continue
            terms = flat["term"]
            codes, uniq = pd.factorize(terms)
            # 64-bit FNV-1a per unique term (vectorized over characters)
            hashes = np.zeros(len(uniq), dtype=np.uint64)
            for i, u in enumerate(uniq):
                h = np.uint64(0xCBF29CE484222325)
                for ch in u.encode():
                    h = np.uint64((int(h) ^ ch) * 0x100000001B3 & 0xFFFFFFFFFFFFFFFF)
                hashes[i] = h
            tok_hash = hashes[codes]
            bits = ((tok_hash[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)).astype(np.int64)
            signs = bits * 2 - 1  # (n_tokens, 64)
            n_docs = len(pdf)
            acc = np.zeros((n_docs, 64), dtype=np.int64)
            np.add.at(acc, flat["doc_idx"].to_numpy(), signs)
            sim = (acc > 0).astype(np.uint64) @ (np.uint64(1) << np.arange(64, dtype=np.uint64))
            yield pd.DataFrame(
                {"doc_id": pdf[id_col].to_numpy(), "simhash": sim.astype(np.int64)}
            )

    return docs.select(F.col(id_col).alias(id_col), F.col(text_col)).mapInPandas(
        run, _SIMHASH64_SCHEMA
    )


# ---------------------------------------------------------------------------
# MinHash (numpy production profile)
# ---------------------------------------------------------------------------


def minhash_signatures_np(
    docs: DataFrame,
    num_hashes: int = 64,
    k: int = 3,
    seed: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, sig: array<long>) — vectorized universal-hash MinHash."""
    from ..analysis import tokenize_series

    rng = np.random.default_rng(seed)
    A = rng.integers(1, 1 << 62, size=num_hashes, dtype=np.int64).astype(np.uint64) | np.uint64(1)
    B = rng.integers(0, 1 << 62, size=num_hashes, dtype=np.int64).astype(np.uint64)
    MAXV = np.int64((1 << 62) - 1)

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("sig", T.ArrayType(T.LongType())),
        ]
    )

    def _fnv(terms) -> np.ndarray:
        out = np.zeros(len(terms), dtype=np.uint64)
        for i, u in enumerate(terms):
            h = 0xCBF29CE484222325
            for ch in u.encode():
                h = ((h ^ ch) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
            out[i] = h
        return out

    def run(it):
        for pdf in it:
            flat = tokenize_series(pdf[text_col])
            n_docs = len(pdf)
            out_sig = np.full((n_docs, num_hashes), MAXV, dtype=np.int64)
            if len(flat) >= k:
                codes, uniq = pd.factorize(flat["term"])
                tok_hash = _fnv(uniq)[codes]  # per-token 64-bit hash
                doc_idx = flat["doc_idx"].to_numpy().astype(np.int64)
                # rolling k-shingle hash, vectorized; valid only where the
                # whole window stays inside one doc
                C = np.uint64(0x9E3779B97F4A7C15)
                sh = tok_hash[: len(tok_hash) - k + 1].copy()
                for j in range(1, k):
                    sh = sh * C + tok_hash[j : len(tok_hash) - k + 1 + j]
                valid = doc_idx[: len(sh)] == doc_idx[k - 1 :]
                sd = doc_idx[: len(sh)][valid]
                hv = sh[valid]
                if len(hv):
                    # distinct shingles per doc
                    uniq_pairs = np.unique(
                        np.stack([sd.astype(np.uint64), hv], axis=1), axis=0
                    )
                    sd_u = uniq_pairs[:, 0].astype(np.int64)
                    hv_u = uniq_pairs[:, 1]
                    # universal hash family over 2^64, keep positive 62 bits
                    vals = (hv_u[:, None] * A[None, :] + B[None, :]) >> np.uint64(2)
                    np.minimum.at(out_sig, sd_u, vals.astype(np.int64))
            yield pd.DataFrame({"doc_id": pdf[id_col].to_numpy(), "sig": list(out_sig)})

    return docs.select(F.col(id_col), F.col(text_col)).mapInPandas(run, schema)


def lsh_candidate_pairs_np(
    docs: DataFrame,
    num_hashes: int = 64,
    bands: int = 16,
    k: int = 3,
    seed: int = 1,
    max_bucket: int | None = 256,
) -> DataFrame:
    """Production near-dup candidate pairs from the numpy signatures:
    band the 64-hash signature, ONE shuffle on (band, bucket), self-join
    within buckets.

    ``max_bucket`` caps degenerate buckets (e.g. empty/boilerplate docs
    sharing a signature): a bucket with more members is dropped before the
    self-join, bounding the worst case at max_bucket^2 pairs per bucket —
    without it one pathological bucket goes quadratic at 100 TB."""
    rows_per_band = num_hashes // bands
    sig = minhash_signatures_np(docs, num_hashes, k, seed)
    banded = sig.select(
        "doc_id",
        F.posexplode(
            F.array(*[
                F.xxhash64(*[
                    F.col("sig")[b * rows_per_band + r]
                    for r in range(rows_per_band)
                ])
                for b in range(bands)
            ])
        ).alias("band", "bucket"),
    )
    if max_bucket is not None:
        from pyspark.sql import Window

        w = Window.partitionBy("band", "bucket")
        banded = banded.withColumn("bsz", F.count("*").over(w)).where(
            F.col("bsz") <= max_bucket
        ).drop("bsz")
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("band_hits"))
    )


def near_dup_pipeline(
    docs: DataFrame,
    num_hashes: int = 64,
    bands: int = 16,
    k: int = 3,
    min_jaccard_milli: int = 500,
) -> DataFrame:
    """Flagship near-dup flow: numpy MinHash -> banded LSH candidates
    (bucket-capped) -> EXACT k-gram Jaccard verification restricted to the
    candidate pairs (never all-pairs). This is the shape that holds at
    100 TB: signatures are scan-side, one shuffle on the band bucket, and
    the quadratic step touches only LSH survivors."""
    cands = lsh_candidate_pairs_np(docs, num_hashes, bands, k)
    return ngram_jaccard_pairs(docs, cands, k, min_jaccard_milli)
