"""Tiered segment merging: the TieredMergePolicy + merge-scheduler analog.

Planning reproduces the reference's budget/scoring logic
(lucene/core/src/java/org/apache/lucene/index/TieredMergePolicy.java):
  - defaults maxMergeAtOnce=10, segsPerTier=10, floor 2MB, max merged 5GB
    (TieredMergePolicy.java:81-88)
  - allowed segment budget: sum segsPerTier per exponential level,
    levelSize *= maxMergeAtOnce (:330-342)
  - candidate windows scored by skew * totAfterMergeBytes^0.05 (no deletes
    in an immutable corpus, so the reclaimDeletes term is 1) with
    skew = floorSize(largest)/totalFloored, lower is better (:449-491)
  - too-large segments (>= maxMergedBytes/2) are not merge inputs (:316-323)

Two deliberate departures, both scale-motivated:
  - merges pick *adjacent-by-doc-range* windows: our docIDs are global url
    ranks, so merging adjacent url-range segments keeps every segment's doc
    range contiguous (local id = global - doc_base stays dense) and docIDs
    never need remapping — unlike Lucene, which renumbers per merge.
  - execution: each merge group runs as ONE Spark task (a row in a
    mapInPandas job) that streams the term-sorted postings files of its
    inputs and re-encodes term-by-term with the vectorized codec. No
    shuffle at all — this is exactly ConcurrentMergeScheduler's
    "merges are background single-threaded jobs" model
    (index/ConcurrentMergeScheduler.java:45-73), with Spark scheduling the
    groups in parallel. For a pathological head term whose merged posting
    list would not fit one task, the codec's chained-delta blocks allow a
    salted (term, docid-range) split to be encoded independently and
    stitched; the planner keeps groups <= maxMergeAtOnce so inputs stay
    bounded (the mtree-merge fanout of
    solr/contrib/map-reduce/.../MapReduceIndexerTool.java:322-358,795-810).

`maybe_merge` loops plan->execute->commit until the tier budget is met
(IndexWriter.maybeMerge, index/IndexWriter.java:445); each round publishes
a new atomic manifest generation, and old segment dirs stay on disk so
prior snapshots remain readable (MVCC, SegmentInfos.java:52-114).
"""

from __future__ import annotations

import os
import time

import numpy as np
import pandas as pd

from pyspark.sql import SparkSession

from . import codec
from . import manifest as manifest_mod
from .build import write_segment_files

DEFAULT_MAX_MERGE_AT_ONCE = 10
DEFAULT_SEGS_PER_TIER = 10.0
DEFAULT_FLOOR_BYTES = 2 << 20
DEFAULT_MAX_MERGED_BYTES = 5 << 30


def _floored(sz: int, floor: int) -> int:
    return max(sz, floor)


def plan_merges(
    segments: list[dict],
    max_merge_at_once: int = DEFAULT_MAX_MERGE_AT_ONCE,
    segs_per_tier: float = DEFAULT_SEGS_PER_TIER,
    floor_bytes: int = DEFAULT_FLOOR_BYTES,
    max_merged_bytes: int = DEFAULT_MAX_MERGED_BYTES,
) -> list[list[str]]:
    """Return groups of segment_ids to merge (possibly empty).

    Adjacent-window variant of TieredMergePolicy.findMerges (:291-425).
    """
    segs = sorted(segments, key=lambda s: s["doc_base"])
    sizes = {s["segment_id"]: _floored(int(s["postings_bytes"]), floor_bytes) for s in segs}
    tot = sum(sizes.values())

    # allowed segment count budget (:330-342)
    allowed = 0.0
    level = float(floor_bytes)
    rem = float(tot)
    while True:
        count_at = rem / level
        if count_at < segs_per_tier:
            allowed += np.ceil(count_at)
            break
        allowed += segs_per_tier
        rem -= segs_per_tier * level
        level *= max_merge_at_once
    allowed = max(int(allowed), 1)

    eligible = [
        s for s in segs if sizes[s["segment_id"]] < max_merged_bytes / 2
    ]
    if len(segs) <= allowed or len(eligible) < 2:
        return []

    # scan adjacent windows, score, take best (:380-425,449-491)
    best, best_score = None, None
    n = len(eligible)
    for lo in range(n):
        acc = 0
        group = []
        for hi in range(lo, min(lo + max_merge_at_once, n)):
            # windows must be adjacent in the *full* segment list too
            if hi > lo:
                prev = eligible[hi - 1]
                cur = eligible[hi]
                if prev["doc_base"] + prev["max_doc"] != cur["doc_base"]:
                    break
            sz = sizes[eligible[hi]["segment_id"]]
            if acc + sz > max_merged_bytes:
                break
            acc += sz
            group.append(eligible[hi])
            if len(group) >= 2:
                szs = [sizes[g["segment_id"]] for g in group]
                skew = max(szs) / sum(szs)
                score = skew * (sum(szs) ** 0.05)
                if best_score is None or score < best_score:
                    best_score = score
                    best = [g["segment_id"] for g in group]
    return [best] if best else []


def _merge_group(index_dir: str, seg_metas: list[dict], out_seg_id: str) -> dict:
    """Single-task merge: K term-sorted postings tables -> one segment."""
    import pyarrow.parquet as pq

    t0 = time.time()
    seg_metas = sorted(seg_metas, key=lambda s: s["doc_base"])
    new_base = seg_metas[0]["doc_base"]
    tables, norms_list, urls_list, offs = [], [], [], []
    for s in seg_metas:
        d = os.path.join(index_dir, s["path"])
        tables.append(pq.read_table(os.path.join(d, "postings.parquet")).to_pandas())
        nt = pq.read_table(os.path.join(d, "norms.parquet"))
        norms_list.append(np.frombuffer(nt["norms"][0].as_py(), dtype=np.uint8))
        urls_list.append(
            pq.read_table(os.path.join(d, "docmap.parquet"))["url"].to_numpy()
        )
        offs.append(s["doc_base"] - new_base)

    merged_norms = np.concatenate(norms_list)
    merged_urls = np.concatenate(urls_list)

    # k-way term-sorted merge, vectorized: decode every source row into
    # flat (docid, tf, positions) arrays in (term, source) order, then
    # re-encode the whole merged segment in one encode_segment_postings
    # pass — same single-pass profile as the build, no per-term encode loop.
    frames = []
    for i, t in enumerate(tables):
        t = t[["term", "df", "blocks", "positions", "skip_off", "skip_last"]].copy()
        t["src"] = i
        frames.append(t)
    allp = pd.concat(frames, ignore_index=True)
    allp.sort_values(["term", "src"], kind="mergesort", inplace=True)

    id_parts: list[np.ndarray] = []
    tf_parts: list[np.ndarray] = []
    pos_parts: list[np.ndarray] = []
    row_terms = allp["term"].to_numpy()
    for r in allp.itertuples(index=False):
        d, tf = codec.decode_blocks(
            r.blocks,
            int(r.df),
            np.asarray(r.skip_off, dtype=np.int64),
            np.asarray(r.skip_last, dtype=np.int64),
        )
        id_parts.append(d + offs[r.src])
        tf_parts.append(tf)
        total_pos = int(tf.sum())
        if total_pos:
            pdeltas = codec.varint_decode(r.positions, count=total_pos)
            ends = np.cumsum(tf)
            starts = ends - tf
            reset = np.zeros(total_pos, dtype=bool)
            reset[starts] = True
            grp_id = np.cumsum(reset) - 1
            csum = np.cumsum(pdeltas)
            base = np.concatenate([[0], csum[ends[:-1] - 1]]) if len(ends) > 1 else np.array([0])
            pos_parts.append(csum - base[grp_id])
        else:
            pos_parts.append(np.zeros(0, np.int64))

    if len(allp):
        g_doc = np.concatenate(id_parts)
        tfs_all = np.concatenate(tf_parts)
        pos_flat = np.concatenate(pos_parts)
        row_dfs = allp["df"].to_numpy().astype(np.int64)
        row_ends = np.cumsum(row_dfs)
        row_starts = row_ends - row_dfs
        new_term_row = np.empty(len(allp), dtype=bool)
        new_term_row[0] = True
        new_term_row[1:] = row_terms[1:] != row_terms[:-1]
        t_starts = row_starts[new_term_row]
        t_ends = np.append(t_starts[1:], row_ends[-1])
        enc = codec.encode_segment_postings(
            g_doc, tfs_all, t_starts, t_ends, merged_norms, pos_flat
        )
        postings = pd.DataFrame(
            {
                "term": row_terms[new_term_row],
                "df": enc["df"],
                "ttf": enc["ttf"],
                "blocks": enc["blocks"],
                "positions": enc["positions"],
                "skip_last": [a.tolist() for a in enc["skip_last"]],
                "skip_off": [a.tolist() for a in enc["skip_off"]],
                "skip_pos_off": [a.tolist() for a in enc["skip_pos_off"]],
                "skip_max_tf": [a.tolist() for a in enc["skip_max_tf"]],
                "skip_max_norm": [a.tolist() for a in enc["skip_max_norm"]],
            }
        )
    else:
        postings = pd.DataFrame(
            columns=[
                "term", "df", "ttf", "blocks", "positions", "skip_last",
                "skip_off", "skip_pos_off", "skip_max_tf", "skip_max_norm",
            ]
        )
    built = {
        "postings": postings,
        "norm_bytes": merged_norms,
        "sum_len": int(sum(s["sum_len"] for s in seg_metas)),
        "term_count": len(postings),
    }
    seg_dir = os.path.join(index_dir, "segments", f"seg_{out_seg_id}")
    postings_bytes = write_segment_files(seg_dir, built, merged_urls)
    return {
        "segment_id": out_seg_id,
        "path": os.path.relpath(seg_dir, index_dir),
        "doc_base": int(new_base),
        "max_doc": int(len(merged_urls)),
        "sum_len": built["sum_len"],
        "term_count": built["term_count"],
        "postings_bytes": int(postings_bytes),
        "lineage": {
            "merged_from": [s["segment_id"] for s in seg_metas],
            "doc_range": [int(new_base), int(new_base + len(merged_urls) - 1)],
            "wall_ms": int((time.time() - t0) * 1000),
        },
    }


def execute_merges(
    spark: SparkSession, index_dir: str, groups: list[list[str]]
) -> dict:
    """Run merge groups as parallel single-row Spark tasks, commit snapshot."""
    man = manifest_mod.read_current(index_dir)
    by_id = {s["segment_id"]: s for s in man["segments"]}
    gen = man["generation"]

    jobs = [
        (i, [by_id[sid] for sid in g], f"m{gen}_{i:04d}") for i, g in enumerate(groups)
    ]
    sc = spark.sparkContext
    idx_dir = index_dir
    results = (
        sc.parallelize(jobs, len(jobs))
        .map(lambda j: _merge_group(idx_dir, j[1], j[2]))
        .collect()
    )

    merged_away = {sid for g in groups for sid in g}
    new_segments = [s for s in man["segments"] if s["segment_id"] not in merged_away]
    new_segments.extend(results)
    new_segments.sort(key=lambda s: s["doc_base"])
    return manifest_mod.commit(
        index_dir,
        new_segments,
        extra={"build_id": man.get("build_id"), "total_docs": man.get("total_docs")},
    )


def maybe_merge(
    spark: SparkSession,
    index_dir: str,
    max_merge_at_once: int = DEFAULT_MAX_MERGE_AT_ONCE,
    segs_per_tier: float = DEFAULT_SEGS_PER_TIER,
    floor_bytes: int = DEFAULT_FLOOR_BYTES,
    max_merged_bytes: int = DEFAULT_MAX_MERGED_BYTES,
    max_rounds: int = 20,
) -> dict:
    """Merge until the tier budget is satisfied (IndexWriter.maybeMerge loop)."""
    man = manifest_mod.read_current(index_dir)
    for _ in range(max_rounds):
        groups = plan_merges(
            man["segments"], max_merge_at_once, segs_per_tier, floor_bytes, max_merged_bytes
        )
        if not groups:
            break
        man = execute_merges(spark, index_dir, groups)
    return man


def force_merge(spark: SparkSession, index_dir: str, max_segments: int = 1) -> dict:
    """forceMerge(N): mtree-style fanout merges down to <= N segments
    (TieredMergePolicy.findForcedMerges:509+; TreeMergeOutputFormat.java:138-153)."""
    man = manifest_mod.read_current(index_dir)
    while len(man["segments"]) > max_segments:
        segs = sorted(man["segments"], key=lambda s: s["doc_base"])
        groups = []
        fanout = DEFAULT_MAX_MERGE_AT_ONCE
        remaining = len(segs)  # segment count after this round's merges
        i = 0
        while i < len(segs) and remaining > max_segments:
            # merging `take` adjacent segments into one reduces the count
            # by take-1; never take more than needed to land on the target
            take = min(fanout, len(segs) - i, remaining - max_segments + 1)
            if take < 2:
                break
            groups.append([s["segment_id"] for s in segs[i : i + take]])
            remaining -= take - 1
            i += take
        if not groups:
            break
        man = execute_merges(spark, index_dir, groups)
    return man
