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


def read_current(index_dir: str) -> dict | None:
    """Open the largest-generation manifest (MVCC snapshot read)."""
    gens = _generations(index_dir)
    if not gens:
        return None
    with open(os.path.join(index_dir, f"manifest_{gens[-1]}.json")) as f:
        return json.load(f)


def read_generation(index_dir: str, generation: int) -> dict | None:
    """Time travel: open a SPECIFIC snapshot generation. Valid because
    segment directories are immutable and never deleted by commits — any
    previously published manifest stays fully readable (the Iceberg
    snapshot-id read / Lucene SegmentInfos time-travel property)."""
    p = os.path.join(index_dir, f"manifest_{generation}.json")
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)


def generations(index_dir: str) -> list[int]:
    """All published snapshot generations, ascending."""
    return _generations(index_dir)


def commit(index_dir: str, segments: list[dict], extra: dict | None = None) -> dict:
    """Atomically publish a new snapshot listing ``segments``.

    Each segment dict must carry: segment_id, path (relative to index_dir),
    doc_base, max_doc, sum_len, term_count, postings_bytes, lineage{...}.
    """
    os.makedirs(index_dir, exist_ok=True)
    gens = _generations(index_dir)
    gen = (gens[-1] + 1) if gens else 1
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
    tmp = os.path.join(index_dir, f".manifest_{gen}.json.tmp")
    dst = os.path.join(index_dir, f"manifest_{gen}.json")
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1)
        f.flush()
        os.fsync(f.fileno())
    os.rename(tmp, dst)  # the segments_N swap
    return manifest
