"""Snapshot manifest: the engine's `segments_N` / Iceberg-snapshot analog.

The reference publishes an index as an atomically-swapped commit manifest
naming immutable segments (lucene/core/src/java/org/apache/lucene/index/
SegmentInfos.java:52-114, two-phase commit IndexWriter.java:255,935).
Here: each build stage writes immutable segment directories, then a single
driver-side atomic rename publishes ``manifest_{N}.json`` listing live
segments with per-segment lineage (input partition, doc ranges, term counts,
bytes, wall time) and collection stats. Readers open the largest N.

On a real deployment this maps 1:1 onto an Iceberg snapshot commit (the
sandbox has no Iceberg runtime jar; the abstraction is isolated here).
"""

from __future__ import annotations

import json
import os
import re
import time

_MANIFEST_RE = re.compile(r"^manifest_(\d+)\.json$")


def _generations(index_dir: str) -> list[int]:
    if not os.path.isdir(index_dir):
        return []
    gens = []
    for name in os.listdir(index_dir):
        m = _MANIFEST_RE.match(name)
        if m:
            gens.append(int(m.group(1)))
    return sorted(gens)


def _load_manifest(index_dir: str, path: str) -> dict:
    with open(path) as f:
        man = json.load(f)
    # sharded layout (the Iceberg manifest-list -> manifest-file shape for
    # the >10^5-segment regime): the root names immutable shard files,
    # each holding a slice of the segment list; reassemble transparently
    shards = man.pop("segment_shards", None)
    if shards is not None:
        segs: list[dict] = []
        for name in shards:
            with open(os.path.join(index_dir, name)) as f:
                segs.extend(json.load(f))
        man["segments"] = segs
    return man


def read_current(index_dir: str) -> dict | None:
    """Open the largest-generation manifest (MVCC snapshot read)."""
    gens = _generations(index_dir)
    if not gens:
        return None
    return _load_manifest(
        index_dir, os.path.join(index_dir, f"manifest_{gens[-1]}.json")
    )


def read_generation(index_dir: str, generation: int) -> dict | None:
    """Time travel: open a SPECIFIC snapshot generation. Valid because
    segment directories are immutable and never deleted by commits — any
    previously published manifest stays fully readable (the Iceberg
    snapshot-id read / Lucene SegmentInfos time-travel property)."""
    p = os.path.join(index_dir, f"manifest_{generation}.json")
    if not os.path.exists(p):
        return None
    return _load_manifest(index_dir, p)


def generations(index_dir: str) -> list[int]:
    """All published snapshot generations, ascending."""
    return _generations(index_dir)


# root manifests stay small past this many segments: the segment list is
# split into immutable shard files and the root only names them (Iceberg's
# manifest-list shape; a 10^6-segment index keeps an O(100) root)
SHARD_THRESHOLD = 10_000
SHARD_SIZE = 4_096


def commit(
    index_dir: str,
    segments: list[dict],
    extra: dict | None = None,
    shard_threshold: int | None = None,
) -> dict:
    """Atomically publish a new snapshot listing ``segments``.

    Each segment dict must carry: segment_id, path (relative to index_dir),
    doc_base, max_doc, sum_len, term_count, postings_bytes, lineage{...}.

    Beyond ``shard_threshold`` segments (default SHARD_THRESHOLD) the list
    is written as generation-named shard files first — invisible to
    readers until the root manifest's atomic rename publishes them — so
    the commit protocol stays a single rename at any segment count.
    """
    os.makedirs(index_dir, exist_ok=True)
    gens = _generations(index_dir)
    gen = (gens[-1] + 1) if gens else 1
    threshold = SHARD_THRESHOLD if shard_threshold is None else shard_threshold
    manifest = {
        "generation": gen,
        "committed_at_ms": int(time.time() * 1000),
        "fieldstats": {
            "max_doc": int(sum(s["max_doc"] for s in segments)),
            "sum_total_term_freq": int(sum(s["sum_len"] for s in segments)),
        },
        "segments": segments,
    }
    if extra:
        manifest.update(extra)
    result = dict(manifest)  # callers always see the full segment list
    if len(segments) > threshold:
        size = min(SHARD_SIZE, max(threshold, 1))
        shard_names = []
        for i in range(0, len(segments), size):
            name = f"manifest_{gen}.seg{i // size}.json"
            stmp = os.path.join(index_dir, "." + name + ".tmp")
            with open(stmp, "w") as f:
                json.dump(segments[i : i + size], f)
                f.flush()
                os.fsync(f.fileno())
            os.rename(stmp, os.path.join(index_dir, name))
            shard_names.append(name)
        manifest = dict(manifest)
        del manifest["segments"]
        manifest["segment_shards"] = shard_names
    tmp = os.path.join(index_dir, f".manifest_{gen}.json.tmp")
    dst = os.path.join(index_dir, f"manifest_{gen}.json")
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1)
        f.flush()
        os.fsync(f.fileno())
    os.rename(tmp, dst)  # the segments_N swap
    return result


# ---------------------------------------------------------------------------
# Iceberg projection (ICEBERG.md documents the field-by-field mapping)
# ---------------------------------------------------------------------------

# the postings table schema as Iceberg struct fields (ids are stable)
_ICEBERG_SCHEMA_FIELDS = [
    {"id": 1, "name": "segment_id", "required": True, "type": "string"},
    {"id": 2, "name": "term", "required": True, "type": "string"},
    {"id": 3, "name": "df", "required": True, "type": "long"},
    {"id": 4, "name": "ttf", "required": True, "type": "long"},
    {"id": 5, "name": "doc_blocks", "required": True, "type": "binary"},
    {"id": 6, "name": "freq_blocks", "required": True, "type": "binary"},
    {"id": 7, "name": "pos_blocks", "required": True, "type": "binary"},
]


def to_iceberg_metadata(index_dir: str) -> dict:
    """Project the manifest chain into Iceberg v2 TableMetadata JSON
    (iceberg spec §Table Metadata; no runtime jar exists in this sandbox,
    so this is the checkable statement of the claim "the manifest layer
    is Iceberg-shaped" — every commit/read primitive here has a 1:1
    Iceberg counterpart, see ICEBERG.md).

    generation        <-> snapshot-id / sequence-number (monotonic)
    committed_at_ms   <-> snapshot timestamp-ms
    manifest_{N}.json <-> vN.metadata.json + manifest list
    segment_shards    <-> manifest-list -> manifest-file indirection
    atomic rename     <-> atomic metadata pointer swap (catalog CAS)
    read_generation() <-> snapshot-id time travel
    """
    import uuid

    gens = _generations(index_dir)
    if not gens:
        raise FileNotFoundError(f"no manifests in {index_dir}")
    snaps, log = [], []
    by_gen = {}
    for g in gens:
        man = read_generation(index_dir, g)
        by_gen[g] = man
        n_files = len(man["segments"])
        snaps.append(
            {
                "snapshot-id": g,
                "sequence-number": g,
                "timestamp-ms": man["committed_at_ms"],
                "summary": {
                    "operation": "append",
                    "total-records": str(man["fieldstats"]["max_doc"]),
                    "total-data-files": str(n_files),
                },
                "manifest-list": f"manifest_{g}.json",
                "schema-id": 0,
            }
        )
        log.append({"snapshot-id": g, "timestamp-ms": man["committed_at_ms"]})
    cur = by_gen[gens[-1]]
    return {
        "format-version": 2,
        "table-uuid": str(
            uuid.uuid5(uuid.NAMESPACE_URL, os.path.abspath(index_dir))
        ),
        "location": os.path.abspath(index_dir),
        "last-sequence-number": gens[-1],
        "last-updated-ms": cur["committed_at_ms"],
        "last-column-id": _ICEBERG_SCHEMA_FIELDS[-1]["id"],
        "schemas": [
            {
                "schema-id": 0,
                "type": "struct",
                "fields": _ICEBERG_SCHEMA_FIELDS,
            }
        ],
        "current-schema-id": 0,
        "partition-specs": [
            {
                "spec-id": 0,
                "fields": [
                    {
                        "name": "segment_id",
                        "transform": "identity",
                        "source-id": 1,
                        "field-id": 1000,
                    }
                ],
            }
        ],
        "default-spec-id": 0,
        "sort-orders": [
            {
                "order-id": 1,
                "fields": [
                    {
                        "transform": "identity",
                        "source-id": 2,
                        "direction": "asc",
                        "null-order": "nulls-first",
                    }
                ],
            }
        ],
        "default-sort-order-id": 1,
        "properties": {"build-id": str(cur.get("build_id", ""))},
        "current-snapshot-id": gens[-1],
        "snapshots": snaps,
        "snapshot-log": log,
        "metadata-log": [],
    }


def iceberg_manifest_entries(index_dir: str, generation: int | None = None) -> list[dict]:
    """The snapshot's data-file manifest entries (iceberg spec §Manifests):
    one per immutable parquet file we can truthfully describe — postings
    (record-count = term rows, file-size = postings_bytes) and docmap
    (record-count = max_doc)."""
    man = (
        read_current(index_dir)
        if generation is None
        else read_generation(index_dir, generation)
    )
    if man is None:
        raise FileNotFoundError(f"no manifest in {index_dir}")
    gen = man["generation"]
    entries = []
    for s in man["segments"]:
        part = {"segment_id": s["segment_id"]}
        entries.append(
            {
                "status": 1,
                "snapshot-id": gen,
                "sequence-number": gen,
                "data-file": {
                    "content": 0,
                    "file-path": os.path.join(s["path"], "postings.parquet"),
                    "file-format": "PARQUET",
                    "partition": part,
                    "record-count": s["term_count"],
                    "file-size-in-bytes": s["postings_bytes"],
                },
            }
        )
        entries.append(
            {
                "status": 1,
                "snapshot-id": gen,
                "sequence-number": gen,
                "data-file": {
                    "content": 0,
                    "file-path": os.path.join(s["path"], "docmap.parquet"),
                    "file-format": "PARQUET",
                    "partition": part,
                    "record-count": s["max_doc"],
                },
            }
        )
    return entries
