"""Incremental (near-real-time) index maintenance via Structured Streaming.

The reference's NRT story: soft commits make freshly flushed segments
visible to reopened readers (index/DirectoryReader.java:122-135,
solr/core/.../update/DirectUpdateHandler2.java:72-137), with the
transaction log providing replay (update/UpdateLog.java:71-131). The
streaming restatement:

  - readStream over an arriving corpus -> foreachBatch
  - each micro-batch builds new immutable segments (same build path as the
    batch indexer, one bucket per batch partition) and commits a new
    manifest generation: the manifest swap IS the soft commit — readers
    that reopen (SparkSearcher on the new generation) see the new docs,
    readers on the old generation stay consistent (MVCC)
  - the streaming checkpoint plays the tlog's role: after a crash, Spark
    replays the unacknowledged batch; segment fingerprints make the replay
    idempotent (the resumed batch finds its finished segments and skips)

DocIDs: appended docs get ids starting at the current max (assignment
order), exactly like IndexWriter's monotonically growing docids. Query-time
statistics (df/avgdl) always come from the manifest generation being
searched, so scores reflect the whole visible index.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..index import manifest as manifest_mod
from ..index.build import build_index


def append_batch(
    spark: SparkSession,
    batch: DataFrame,
    index_dir: str,
    batch_id: int,
    num_segments: int = 2,
) -> dict:
    """Append one micro-batch as new segments + manifest generation."""
    man = manifest_mod.read_current(index_dir)
    if man is not None and man.get("last_batch_id", -1) >= batch_id:
        return man  # replayed batch already committed (tlog idempotency)
    doc_base_offset = man["fieldstats"]["max_doc"] if man else 0
    existing = man["segments"] if man else []

    # build the batch's segments in a scratch manifest dir, then splice;
    # the batch MUST analyze with the index's analyzer or appended docs
    # would carry a different vocabulary
    analyzer = (man or {}).get("analyzer", "standard")
    # multi-field indexes append multi-field batches: the manifest records
    # the ORIGINAL field->column mapping, and the batch must arrive with
    # the same corpus schema (the same contract as the initial build)
    extra_fields = (man or {}).get("extra_fields") or {}
    scratch = os.path.join(index_dir, f"_batch_{batch_id}")
    sub = build_index(
        spark,
        batch,
        scratch,
        num_segments=num_segments,
        build_id=f"nrt{batch_id}",
        analyzer=analyzer,
        extra_fields=extra_fields or None,
    )
    # segments store LOCAL docids: splicing is pure manifest arithmetic,
    # no file rewrites (the soft-commit stays cheap)
    new_segments = []
    for s in sub["segments"]:
        s = dict(s)
        s["doc_base"] = s["doc_base"] + doc_base_offset
        s["path"] = os.path.relpath(os.path.join(scratch, s["path"]), index_dir)
        s["lineage"] = dict(s["lineage"], batch_id=batch_id)
        new_segments.append(s)

    return manifest_mod.commit(
        index_dir,
        existing + new_segments,
        extra={"build_id": (man or {}).get("build_id", "nrt"),
               "last_batch_id": batch_id, "analyzer": analyzer,
               "extra_fields": extra_fields},
    )


def start_indexing_stream(
    spark: SparkSession,
    source: DataFrame,
    index_dir: str,
    checkpoint_dir: str,
    num_segments: int = 2,
    trigger_available_now: bool = True,
):
    """writeStream.foreachBatch appending segments per micro-batch."""

    def handle(batch_df: DataFrame, batch_id: int):
        if batch_df.isEmpty():
            return
        append_batch(spark, batch_df, index_dir, int(batch_id), num_segments)

    w = source.writeStream.foreachBatch(handle).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_available_now:
        w = w.trigger(availableNow=True)
    return w.start()
