"""Index replication — the lucene/replicator module restated.

The reference replicates an index by publishing a revision (the commit's
file list) and letting replicas copy the files they are missing
(lucene/replicator/src/java/org/apache/lucene/replicator/
IndexReplicationHandler.java; revisions diff by file name+size). Our
segments are immutable directories named by the manifest, so replication
is exactly that diff:

  - copy every segment directory the replica does not already have
    (immutable => name equality is content equality, checked by byte size)
  - then atomically publish the source's manifest generation

Incremental by construction: a second replicate() after an NRT append or
merge copies only the new segment dirs. The destination stays readable
throughout (its old manifest remains the live snapshot until the final
atomic manifest write — the same MVCC swap the engine itself uses).
"""

from __future__ import annotations

import json
import os
import shutil

from . import manifest as manifest_mod


def _dir_size(p: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(p):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total


def _dir_filespec(p: str) -> set:
    """Per-file (relative name, size) set — the reference's revision diff
    compares files by name+size, not an aggregate byte count, so a
    same-total-size but divergent destination is repaired, not skipped."""
    spec = set()
    for root, _dirs, files in os.walk(p):
        for f in files:
            full = os.path.join(root, f)
            spec.add((os.path.relpath(full, p), os.path.getsize(full)))
    return spec


def replicate(src_index: str, dst_index: str) -> dict:
    """Bring ``dst_index`` up to ``src_index``'s current snapshot.

    Returns {"copied": [...], "skipped": [...], "generation": N}.
    """
    man = manifest_mod.read_current(src_index)
    if man is None:
        raise FileNotFoundError(f"no manifest in {src_index}")
    os.makedirs(dst_index, exist_ok=True)
    copied, skipped = [], []
    for seg in man["segments"]:
        src = os.path.join(src_index, seg["path"])
        dst = os.path.join(dst_index, seg["path"])
        if os.path.isdir(dst) and _dir_filespec(dst) == _dir_filespec(src):
            skipped.append(seg["segment_id"])
            continue
        tmp = dst + ".reptmp"
        shutil.rmtree(tmp, ignore_errors=True)
        shutil.copytree(src, tmp)
        shutil.rmtree(dst, ignore_errors=True)
        os.rename(tmp, dst)
        copied.append(seg["segment_id"])
    # publish the source manifest at the SAME generation number (replicas
    # mirror the primary's revision history; a replica-local commit would
    # fork it, which the reference also forbids)
    gen = man["generation"]
    tmp = os.path.join(dst_index, f".manifest_{gen}.json.tmp")
    dstm = os.path.join(dst_index, f"manifest_{gen}.json")
    with open(tmp, "w") as f:
        json.dump(man, f, indent=1)
        f.flush()
        os.fsync(f.fileno())
    os.rename(tmp, dstm)
    return {"copied": copied, "skipped": skipped, "generation": gen}
