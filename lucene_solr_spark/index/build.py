"""Distributed index build: one Spark partition = one immutable segment.

Mirrors the reference build dataflow, not its thread machinery:
  - one DocumentsWriterPerThread = one private in-RAM segment, no cross-
    thread coordination until flush (index/DocumentsWriterPerThread.java:48,221)
    -> here: one range partition builds one segment inside a single
    mapInPandas pass, no shuffle during the build itself
  - in-RAM hash aggregation term -> postings with on-the-fly delta encode
    (index/TermsHashPerField.java:96-121, FreqProxTermsWriterPerField.java:110-147)
    -> numpy lexsort + run-length aggregation + block codec, fully vectorized
  - terms sorted before write (index/FreqProxTermsWriter.java:82-102)
    -> postings.parquet sorted by term (row-group min/max = the term index,
       playing BlockTree/FST's pruning role, codecs/blocktree/BlockTreeTermsWriter.java:163-207)
  - flush-by-RAM policy (index/FlushByRamOrCountsPolicy.java) -> partition
    sizing: choose num_segments so a partition's token frame fits an executor
  - norms: one byte per doc, SmallFloat-encoded field length
    (index/DefaultIndexingChain.java:188-206) -> norms blob per segment

Global docIDs are deterministic: docid = rank of url in lexicographic order
(range-partition by url + sort within partition + per-partition base offset),
which fixes the score-tie ordering (search/HitQueue.java:76-81) across any
cluster size.

Resumability: each segment directory is finalized with a _COMPLETE.json
carrying a content fingerprint; a re-run with the same build_id skips
finished partitions whose fingerprint matches, and the final manifest commit
is atomic (manifest.py). This is the Iceberg-snapshot checkpoint model of
the north star.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..analysis import tokenize_series
from ..search import bm25
from . import codec, manifest as manifest_mod

LINEAGE_SCHEMA = (
    "segment_id string, path string, partition_id int, doc_base long, "
    "max_doc long, sum_len long, term_count long, postings_bytes long, "
    "first_url string, last_url string, wall_ms long, resumed boolean"
)


def _fingerprint(doc_base: int, n: int, first_url: str, last_url: str) -> str:
    import hashlib

    h = hashlib.sha256(f"{doc_base}|{n}|{first_url}|{last_url}".encode()).hexdigest()
    return h[:16]


def _build_segment_pdf(
    urls: np.ndarray,
    texts: pd.Series,
    doc_base: int,
    with_positions: bool = True,
) -> dict:
    """Pure-pandas segment build: returns postings table + norms + stats."""
    n = len(urls)
    flat = tokenize_series(texts)
    lengths = flat.attrs["doc_lengths"]
    norm_bytes = bm25.encode_norm(lengths)

    term_codes, term_uniques = pd.factorize(flat["term"], sort=True)
    doc_idx = flat["doc_idx"].to_numpy().astype(np.int64)
    pos = flat["pos"].to_numpy().astype(np.int64)

    order = np.lexsort((doc_idx, term_codes))  # stable: keeps pos asc in groups
    ts = term_codes[order]
    ds = doc_idx[order]
    ps = pos[order]

    # run-length over (term, doc) -> per-posting tf
    if len(ts):
        new_grp = np.empty(len(ts), dtype=bool)
        new_grp[0] = True
        new_grp[1:] = (ts[1:] != ts[:-1]) | (ds[1:] != ds[:-1])
        grp_starts = np.flatnonzero(new_grp)
        grp_ends = np.append(grp_starts[1:], len(ts))
        tfs_all = (grp_ends - grp_starts).astype(np.int64)
        g_term = ts[grp_starts]
        g_doc = ds[grp_starts]
        # per-term slices over the (term,doc) groups
        new_term = np.empty(len(grp_starts), dtype=bool)
        new_term[0] = True
        new_term[1:] = g_term[1:] != g_term[:-1]
        t_starts = np.flatnonzero(new_term)
        t_ends = np.append(t_starts[1:], len(grp_starts))
    else:
        grp_starts = np.zeros(0, np.int64)
        tfs_all = np.zeros(0, np.int64)
        g_term = np.zeros(0, np.int64)
        g_doc = np.zeros(0, np.int64)
        t_starts = np.zeros(0, np.int64)
        t_ends = np.zeros(0, np.int64)

    rows = []
    for ti in range(len(t_starts)):
        a, b = t_starts[ti], t_ends[ti]
        docids_t = g_doc[a:b]
        tfs_t = tfs_all[a:b]
        # flat positions for this term: groups a..b are contiguous in ps
        p0 = grp_starts[a]
        p1 = grp_starts[b] if b < len(grp_starts) else len(ps)
        enc = codec.encode_term_postings(
            docids_t,
            tfs_t,
            norm_bytes,
            ps[p0:p1] if with_positions else None,
        )
        rows.append(
            (
                term_uniques[g_term[t_starts[ti]]],
                enc["df"],
                enc["ttf"],
                enc["blocks"],
                enc["positions"],
                enc["skip_last"].tolist(),
                enc["skip_off"].tolist(),
                enc["skip_pos_off"].tolist(),
                enc["skip_max_tf"].tolist(),
                enc["skip_max_norm"].tolist(),
            )
        )

    postings = pd.DataFrame(
        rows,
        columns=[
            "term",
            "df",
            "ttf",
            "blocks",
            "positions",
            "skip_last",
            "skip_off",
            "skip_pos_off",
            "skip_max_tf",
            "skip_max_norm",
        ],
    )
    return {
        "postings": postings,
        "norm_bytes": norm_bytes,
        "lengths": lengths,
        "sum_len": int(lengths.sum()),
        "term_count": len(postings),
    }


def _write_segment(seg_dir: str, built: dict, urls: np.ndarray, doc_base: int) -> int:
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(seg_dir, exist_ok=True)
    postings = built["postings"]
    schema = pa.schema(
        [
            ("term", pa.string()),
            ("df", pa.int64()),
            ("ttf", pa.int64()),
            ("blocks", pa.binary()),
            ("positions", pa.binary()),
            ("skip_last", pa.list_(pa.int64())),
            ("skip_off", pa.list_(pa.int64())),
            ("skip_pos_off", pa.list_(pa.int64())),
            ("skip_max_tf", pa.list_(pa.int32())),
            ("skip_max_norm", pa.list_(pa.int32())),
        ]
    )
    tbl = pa.Table.from_pandas(postings, schema=schema, preserve_index=False)
    pq.write_table(
        tbl,
        os.path.join(seg_dir, "postings.parquet"),
        compression="zstd",
        row_group_size=4096,  # term-sorted -> min/max stats prune like a term index
    )
    n = len(urls)
    norms_tbl = pa.table(
        {
            "doc_base": pa.array([doc_base], pa.int64()),
            "max_doc": pa.array([n], pa.int64()),
            "sum_len": pa.array([built["sum_len"]], pa.int64()),
            "norms": pa.array([built["norm_bytes"].tobytes()], pa.binary()),
        }
    )
    pq.write_table(norms_tbl, os.path.join(seg_dir, "norms.parquet"))
    docmap = pa.table(
        {
            "docid": pa.array(doc_base + np.arange(n), pa.int64()),
            "url": pa.array(urls, pa.string()),
        }
    )
    pq.write_table(docmap, os.path.join(seg_dir, "docmap.parquet"), compression="zstd")
    return os.path.getsize(os.path.join(seg_dir, "postings.parquet"))


def build_index(
    spark: SparkSession,
    corpus: DataFrame,
    index_dir: str,
    num_segments: int | None = None,
    url_col: str = "url",
    text_col: str = "text",
    build_id: str = "b0",
    fail_after_partitions: int | None = None,
) -> dict:
    """Build (or resume) an index over ``corpus`` and commit a manifest.

    ``fail_after_partitions`` injects a crash for resume tests: only that
    many partitions are built, then the driver raises before commit.
    """
    if num_segments is None:
        num_segments = spark.sparkContext.defaultParallelism

    df = (
        corpus.select(F.col(url_col).alias("url"), F.col(text_col).alias("text"))
        .repartitionByRange(num_segments, "url")
        .sortWithinPartitions("url")
        .persist()
    )
    try:
        counts = (
            df.select(F.spark_partition_id().alias("pid"))
            .groupBy("pid")
            .count()
            .collect()
        )
        by_pid = {r["pid"]: r["count"] for r in counts}
        bases: dict[int, int] = {}
        acc = 0
        for pid in range(num_segments):
            bases[pid] = acc
            acc += by_pid.get(pid, 0)
        total_docs = acc

        seg_root = os.path.join(index_dir, "segments")
        os.makedirs(seg_root, exist_ok=True)
        bases_bc = spark.sparkContext.broadcast(bases)

        def build_partitions(it):
            chunks = []
            pid = None
            for pdf in it:
                if len(pdf):
                    pid = int(pdf["pid"].iloc[0])
                chunks.append(pdf)
            if pid is None:
                return
            t0 = time.time()
            pdf = pd.concat(chunks, ignore_index=True)
            doc_base = bases_bc.value[pid]
            if fail_after_partitions is not None and pid >= fail_after_partitions:
                return  # simulated crash: this partition never completes
            urls = pdf["url"].to_numpy()
            n = len(urls)
            seg_id = f"{build_id}_{pid:05d}"
            seg_dir = os.path.join(seg_root, f"seg_{seg_id}")
            fp = _fingerprint(doc_base, n, urls[0], urls[-1])
            marker = os.path.join(seg_dir, "_COMPLETE.json")
            if os.path.exists(marker):
                with open(marker) as f:
                    meta = json.load(f)
                if meta.get("fingerprint") == fp:
                    meta["resumed"] = True
                    yield pd.DataFrame([meta])[
                        [c.split(" ")[0] for c in LINEAGE_SCHEMA.split(", ")]
                    ]
                    return
            built = _build_segment_pdf(urls, pdf["text"], doc_base)
            postings_bytes = _write_segment(seg_dir, built, urls, doc_base)
            meta = {
                "segment_id": seg_id,
                "path": os.path.relpath(seg_dir, index_dir),
                "partition_id": pid,
                "doc_base": doc_base,
                "max_doc": n,
                "sum_len": built["sum_len"],
                "term_count": built["term_count"],
                "postings_bytes": postings_bytes,
                "first_url": urls[0],
                "last_url": urls[-1],
                "wall_ms": int((time.time() - t0) * 1000),
                "resumed": False,
                "fingerprint": fp,
            }
            with open(marker + ".tmp", "w") as f:
                json.dump(meta, f)
            os.rename(marker + ".tmp", marker)
            out = dict(meta)
            out.pop("fingerprint")
            yield pd.DataFrame([out])

        lineage = (
            df.withColumn("pid", F.spark_partition_id())
            .mapInPandas(build_partitions, schema=LINEAGE_SCHEMA)
            .collect()
        )
    finally:
        df.unpersist()

    if fail_after_partitions is not None:
        raise RuntimeError(
            f"injected failure after {len(lineage)} partitions (resume test)"
        )
    if len(lineage) != len([p for p in range(num_segments) if by_pid.get(p, 0) > 0]):
        raise RuntimeError(
            f"segment build incomplete: {len(lineage)} lineage rows for "
            f"{num_segments} partitions"
        )

    segments = []
    for r in sorted(lineage, key=lambda r: r["doc_base"]):
        d = r.asDict()
        d["lineage"] = {
            "partition_id": d.pop("partition_id"),
            "doc_range": [d["doc_base"], d["doc_base"] + d["max_doc"] - 1],
            "first_url": d.pop("first_url"),
            "last_url": d.pop("last_url"),
            "wall_ms": d.pop("wall_ms"),
            "resumed": d.pop("resumed"),
        }
        segments.append(d)
    return manifest_mod.commit(
        index_dir,
        segments,
        extra={"build_id": build_id, "total_docs": total_docs},
    )
