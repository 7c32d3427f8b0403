"""Compatibility test for the manifest ↔ Iceberg projection (ICEBERG.md):
to_iceberg_metadata() must emit structurally valid Iceberg v2 TableMetadata
from a real multi-snapshot index, and iceberg_manifest_entries() must cover
every segment's files with truthful counts. Pure JSON — no Spark session."""

import pytest

from lucene_solr_spark.index import manifest as mf

# required top-level keys of an Iceberg v2 table metadata file (spec
# §Table Metadata, required-field table)
V2_REQUIRED = [
    "format-version", "table-uuid", "location", "last-sequence-number",
    "last-updated-ms", "last-column-id", "schemas", "current-schema-id",
    "partition-specs", "default-spec-id", "sort-orders",
    "default-sort-order-id",
]


def _segment(i, docs=100, base=0):
    return {
        "segment_id": f"s_{i:05d}",
        "path": f"segments/seg_{i:05d}",
        "doc_base": base,
        "max_doc": docs,
        "sum_len": docs * 10,
        "term_count": 29,
        "postings_bytes": 1000 + i,
        "lineage": {"partition_id": i},
    }


@pytest.fixture()
def index_dir(tmp_path):
    d = str(tmp_path / "idx")
    mf.commit(d, [_segment(0)], extra={"build_id": "t1"})
    mf.commit(d, [_segment(0), _segment(1, docs=50, base=100)],
              extra={"build_id": "t2"})
    return d


def test_metadata_required_fields_and_snapshots(index_dir):
    md = mf.to_iceberg_metadata(index_dir)
    for k in V2_REQUIRED:
        assert k in md, k
    assert md["format-version"] == 2
    # one snapshot per published generation, monotonic ids == generations
    assert [s["snapshot-id"] for s in md["snapshots"]] == [1, 2]
    assert [s["sequence-number"] for s in md["snapshots"]] == [1, 2]
    assert md["current-snapshot-id"] == 2
    assert md["last-sequence-number"] == 2
    # snapshot-log mirrors the commit history
    assert [e["snapshot-id"] for e in md["snapshot-log"]] == [1, 2]
    # summary counts come from fieldstats
    assert md["snapshots"][-1]["summary"]["total-records"] == "150"
    assert md["snapshots"][-1]["summary"]["total-data-files"] == "2"
    # schema ids are consistent
    ids = [f["id"] for f in md["schemas"][0]["fields"]]
    assert ids == sorted(ids) and md["last-column-id"] == ids[-1]
    # partition spec: identity on segment_id (source must be a schema field)
    spec = md["partition-specs"][0]["fields"][0]
    assert spec["transform"] == "identity" and spec["source-id"] in ids


def test_metadata_deterministic_uuid(index_dir):
    a = mf.to_iceberg_metadata(index_dir)
    b = mf.to_iceberg_metadata(index_dir)
    assert a["table-uuid"] == b["table-uuid"]


def test_manifest_entries_cover_segments(index_dir):
    ents = mf.iceberg_manifest_entries(index_dir)
    # 2 segments x (postings + docmap)
    assert len(ents) == 4
    assert all(e["status"] == 1 and e["snapshot-id"] == 2 for e in ents)
    paths = {e["data-file"]["file-path"] for e in ents}
    assert "segments/seg_00000/postings.parquet" in paths
    assert "segments/seg_00001/docmap.parquet" in paths
    # truthful counts: docmap record-counts sum to total-records
    dm = [e for e in ents if "docmap" in e["data-file"]["file-path"]]
    assert sum(e["data-file"]["record-count"] for e in dm) == 150
    pq = [e for e in ents if "postings" in e["data-file"]["file-path"]]
    assert all("file-size-in-bytes" in e["data-file"] for e in pq)


def test_time_travel_entries(index_dir):
    ents1 = mf.iceberg_manifest_entries(index_dir, generation=1)
    assert len(ents1) == 2 and all(e["snapshot-id"] == 1 for e in ents1)


def test_sharded_manifest_projects_identically(tmp_path):
    # past the shard threshold the root holds segment_shards (the
    # manifest-list shape); the projection must see the full file set
    d = str(tmp_path / "big")
    segs = [_segment(i, docs=10, base=10 * i) for i in range(25)]
    mf.commit(d, segs, shard_threshold=10)
    md = mf.to_iceberg_metadata(d)
    assert md["snapshots"][-1]["summary"]["total-data-files"] == "25"
    assert len(mf.iceberg_manifest_entries(d)) == 50
