"""Iceberg-style snapshot table contract (sources/icetable.py): atomic
commits, crash safety, optimistic concurrency, time travel, manifest
stats pruning."""

import json
import os

import pytest
from pyspark.sql import functions as F

from stanza_spark.sources.icetable import CommitConflictError, IceTable


def _df(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"),
        F.concat(F.lit("v"), F.col("id")).alias("val"))


def test_create_append_overwrite_and_time_travel(spark, tmp_path):
    t = IceTable(spark, str(tmp_path / "t"))
    v1 = t.create(_df(spark, 0, 100).repartition(2))
    v2 = t.append(_df(spark, 100, 150).repartition(1))
    v3 = t.overwrite(_df(spark, 0, 10))
    assert (v1, v2, v3) == (1, 2, 3)
    assert t.read().count() == 10                     # current = overwrite
    assert t.read(version=2).count() == 150           # time travel
    assert t.read(version=1).count() == 100
    ops = [h["operation"] for h in t.history()]
    assert ops == ["overwrite", "append", "overwrite"]
    assert [h["rows"] for h in t.history()] == [100, 150, 10]


def test_readers_never_see_uncommitted_or_orphan_files(spark, tmp_path):
    t = IceTable(spark, str(tmp_path / "t"))
    t.create(_df(spark, 0, 50))
    # simulate a crashed writer: data files landed, metadata never committed
    _df(spark, 1000, 2000).write.parquet(str(tmp_path / "orphan"))
    for f in os.listdir(str(tmp_path / "orphan")):
        if f.endswith(".parquet"):
            os.replace(str(tmp_path / "orphan" / f),
                       os.path.join(t.data_dir, f"crashed-{f}"))
    assert t.read().count() == 50                     # orphans invisible
    assert t.current_version() == 1


def test_concurrent_commit_conflict(spark, tmp_path):
    """Two writers racing from the same base version (optimistic CAS):
    exactly one wins the os.link; the loser gets CommitConflictError and
    succeeds on retry after re-reading the new base."""
    path = str(tmp_path / "t")
    a, b = IceTable(spark, path), IceTable(spark, path)
    a.create(_df(spark, 0, 10))
    stale_base = a.current_version()                  # a reads base=1 ...
    b.append(_df(spark, 10, 20))                      # ... b commits v2 first
    with pytest.raises(CommitConflictError):
        a._commit(_df(spark, 20, 30), "append", expected_base=stale_base)
    # retry with a fresh read succeeds on the next version
    v = a.append(_df(spark, 20, 30))
    assert v == 3
    assert a.read().count() == 30                     # 10 + 10 + 10


def test_crashed_pointer_flip_does_not_lose_or_wedge_commits(spark, tmp_path):
    """A crash AFTER the v2 metadata link but BEFORE the pointer flip:
    the commit point is the link, so readers PROBE past the stale hint
    and see v2, and the next writer targets v3 — no livelock (review
    finding r4)."""
    t = IceTable(spark, str(tmp_path / "t"))
    t.create(_df(spark, 0, 5))
    t.append(_df(spark, 5, 10))
    # simulate the crash: rewind the pointer hint to v1 (the link for v2
    # already happened — exactly the post-crash on-disk state)
    with open(os.path.join(t.meta_dir, "_rewind"), "w") as f:
        f.write("1")
    os.rename(os.path.join(t.meta_dir, "_rewind"), t._pointer())
    assert t.current_version() == 2                   # probed past the hint
    assert t.read().count() == 10
    v = t.append(_df(spark, 10, 15))                  # no CommitConflict loop
    assert v == 3
    assert t.read().count() == 15


def test_append_schema_mismatch_rejected(spark, tmp_path):
    """append() must refuse a DataFrame whose schema differs from the
    committed table schema (silent manifest mixing was review finding
    r4); overwrite() is the schema-evolution path."""
    t = IceTable(spark, str(tmp_path / "t"))
    t.create(_df(spark, 0, 5))
    with pytest.raises(ValueError, match="schema mismatch"):
        t.append(_df(spark, 5, 10).withColumn("extra", F.lit(1)))
    with pytest.raises(ValueError, match="schema mismatch"):
        t.append(_df(spark, 5, 10).select("val", "k"))   # order matters
    v = t.overwrite(_df(spark, 0, 5).withColumn("extra", F.lit(1)))
    assert v == 2
    assert t.read().columns == ["k", "val", "extra"]


def test_manifest_stats_pruning(spark, tmp_path):
    """scan(col, lo, hi) must open only files whose footer [min, max]
    intersects the range — file-level pruning from the manifest alone."""
    t = IceTable(spark, str(tmp_path / "t"))
    # 4 disjoint key ranges -> 4 data files with disjoint min/max
    t.create(_df(spark, 0, 100).repartitionByRange(4, "k")
             .sortWithinPartitions("k"))
    read, total = t.pruned_file_count("k", lo=10, hi=20)
    assert total == 4
    assert read < total                               # pruning happened
    got = t.scan("k", lo=10, hi=20).filter("k BETWEEN 10 AND 20")
    assert got.count() == 11
    # no-stat or full-range scans read everything, never lose rows
    assert t.scan("k").count() == 100


def test_schema_recorded_per_snapshot(spark, tmp_path):
    t = IceTable(spark, str(tmp_path / "t"))
    t.create(_df(spark, 0, 5))
    t.overwrite(_df(spark, 0, 5).withColumn("extra", F.lit(1)))
    s1 = t._snapshot(1)["schema"]["fields"]
    s2 = t._snapshot(2)["schema"]["fields"]
    assert [f["name"] for f in s1] == ["k", "val"]
    assert [f["name"] for f in s2] == ["k", "val", "extra"]
    # time-travel read uses the old files (and so the old schema)
    assert t.read(version=1).columns == ["k", "val"]


def test_compact_and_expire_snapshots(spark, tmp_path):
    """Maintenance ops: compact rewrites the current snapshot into fewer
    files as a NEW snapshot (old versions untouched); expire_snapshots
    drops old versions and physically deletes data files no retained
    snapshot references."""
    t = IceTable(spark, str(tmp_path / "t"))
    t.create(_df(spark, 0, 40).repartition(4))
    t.append(_df(spark, 40, 80).repartition(4))
    assert t._snapshot(2)["n_files"] == 8
    v = t.compact(target_partitions=1)
    assert v == 3
    assert t._snapshot(3)["n_files"] == 1
    assert t.read().count() == 80
    assert t.read(version=2).count() == 80            # old snapshot intact

    n_data_before = len(os.listdir(t.data_dir))
    out = t.expire_snapshots(keep_last=1)
    assert out["expired_versions"] == 2
    assert out["deleted_files"] == n_data_before - 1  # only the compacted file lives
    assert len(os.listdir(t.data_dir)) == 1
    assert t.current_version() == 3
    assert t.read().count() == 80                     # current unaffected
    assert t.history()[0]["version"] == 3             # no dangling parent
    # and the table keeps working after expiry (hint loss tolerated too)
    os.remove(t._pointer())
    assert t.current_version() == 3
    assert t.append(_df(spark, 80, 90)) == 4
    assert t.read().count() == 90


def test_compact_races_conflict_not_silent_loss(spark, tmp_path):
    """compact() commits with CAS on the version it read: an append that
    lands in between raises CommitConflictError instead of silently
    vanishing from the compacted snapshot (review finding r4b)."""
    path = str(tmp_path / "t")
    a, b = IceTable(spark, path), IceTable(spark, path)
    a.create(_df(spark, 0, 20).repartition(2))
    base = a.current_version()
    df_compacted = a.read(version=base).repartition(1)
    b.append(_df(spark, 20, 30))                      # lands as v2
    with pytest.raises(CommitConflictError):
        a._commit(df_compacted, "compact", expected_base=base)
    assert a.read().count() == 30                     # b's rows intact
    v = a.compact()                                   # retry reads fresh
    assert v == 3 and a.read().count() == 30


def test_expire_never_touches_unreferenced_inflight_files(spark, tmp_path):
    """Files referenced by NO snapshot (a concurrent writer between data
    write and metadata link) must survive expire_snapshots — only files
    of EXPIRED snapshots are eligible (review finding r4b)."""
    t = IceTable(spark, str(tmp_path / "t"))
    t.create(_df(spark, 0, 10))
    t.overwrite(_df(spark, 0, 5))
    inflight = t._write_data_files(_df(spark, 100, 110), "inflight-writer")
    t.expire_snapshots(keep_last=1)
    for f in inflight:
        assert os.path.exists(os.path.join(t.data_dir, f))
    assert t.read().count() == 5


def test_expire_with_version_gaps(spark, tmp_path):
    """Raising retention after lowering it must not crash on already-
    expired versions (review finding r4b)."""
    t = IceTable(spark, str(tmp_path / "t"))
    t.create(_df(spark, 0, 5))
    t.overwrite(_df(spark, 0, 6))
    t.overwrite(_df(spark, 0, 7))
    t.expire_snapshots(keep_last=1)                   # v1, v2 gone
    t.overwrite(_df(spark, 0, 8))                     # v4
    out = t.expire_snapshots(keep_last=3)             # keep window covers v2
    assert out["expired_versions"] == 0               # nothing left to expire
    assert t.read().count() == 8


def test_fully_pruned_scan_returns_empty_not_crash(spark, tmp_path):
    """A predicate that prunes every file yields a 0-row DataFrame with
    the snapshot's stored schema (review finding r4b)."""
    t = IceTable(spark, str(tmp_path / "t"))
    t.create(_df(spark, 0, 100).repartitionByRange(4, "k")
             .sortWithinPartitions("k"))
    got = t.scan("k", lo=500, hi=600)
    assert got.count() == 0
    assert got.columns == ["k", "val"]


def test_lost_race_cleans_up_its_data_files(spark, tmp_path):
    """A losing commit must unlink the data files it just moved into
    data/ — lost races must not leak storage (review finding r4b)."""
    path = str(tmp_path / "t")
    a, b = IceTable(spark, path), IceTable(spark, path)
    a.create(_df(spark, 0, 10))
    stale = a.current_version()
    b.append(_df(spark, 10, 20))
    n_before = len(os.listdir(a.data_dir))
    with pytest.raises(CommitConflictError):
        a._commit(_df(spark, 20, 30), "append", expected_base=stale)
    assert len(os.listdir(a.data_dir)) == n_before    # no leaked files


def test_iceberg_metadata_shape(spark, tmp_path):
    """history() serializes to Apache-Iceberg-v2-shaped table metadata
    JSON: required keys, sequential field ids, snapshot chain + log in
    commit order, string-map summaries — the lossless pure-Python half
    of wire compatibility (differences documented on the method)."""
    t = IceTable(spark, str(tmp_path / "t"))
    t.create(_df(spark, 0, 50))
    t.append(_df(spark, 50, 80))
    md = t.iceberg_metadata()
    # machine-readable and self-consistent
    md2 = json.loads(json.dumps(md))
    assert md2 == md
    for key in ("format-version", "table-uuid", "location",
                "last-sequence-number", "last-updated-ms",
                "last-column-id", "schemas", "current-schema-id",
                "partition-specs", "default-spec-id", "sort-orders",
                "default-sort-order-id", "snapshots",
                "current-snapshot-id", "snapshot-log"):
        assert key in md, key
    assert md["format-version"] == 2
    assert md["current-snapshot-id"] == 2
    schema = md["schemas"][0]
    assert [f["id"] for f in schema["fields"]] == [1, 2]
    assert [f["type"] for f in schema["fields"]] == ["long", "string"]
    snaps = md["snapshots"]
    assert [s["snapshot-id"] for s in snaps] == [1, 2]
    assert snaps[1]["parent-snapshot-id"] == 1
    assert "parent-snapshot-id" not in snaps[0]
    for s in snaps:
        assert s["summary"]["operation"] in ("append", "overwrite")
        assert all(isinstance(v, str) for v in s["summary"].values())
        # round 6: every fresh commit carries a real Avro manifest list
        assert s["manifest-list"] == f"metadata/snap-v{s['snapshot-id']}.avro"
    log = md["snapshot-log"]
    assert [e["snapshot-id"] for e in log] == [1, 2]
    assert log[0]["timestamp-ms"] <= log[1]["timestamp-ms"]
    # deterministic uuid: same path -> same uuid
    assert md["table-uuid"] == IceTable(
        spark, str(tmp_path / "t")).iceberg_metadata()["table-uuid"]


def test_iceberg_metadata_timestamps_are_utc(spark, tmp_path):
    """timestamp-ms must treat committed_at ('...Z') as UTC regardless of
    the host timezone — mktime() would skew it by the local UTC offset
    (the r5 advisor verified a 5h skew under TZ=America/New_York)."""
    import calendar
    import os
    import time as _time

    t = IceTable(spark, str(tmp_path / "tz"))
    t.create(_df(spark, 0, 10))
    committed = t._snapshot(1)["committed_at"]
    expect = calendar.timegm(
        _time.strptime(committed, "%Y-%m-%dT%H:%M:%SZ")) * 1000
    old_tz = os.environ.get("TZ")
    try:
        for tz in ("America/New_York", "Asia/Tokyo", "UTC"):
            os.environ["TZ"] = tz
            _time.tzset()
            md = t.iceberg_metadata()
            assert md["snapshots"][0]["timestamp-ms"] == expect, tz
    finally:
        if old_tz is None:
            os.environ.pop("TZ", None)
        else:
            os.environ["TZ"] = old_tz
        _time.tzset()


def test_iceberg_metadata_rejects_nested_types(spark, tmp_path):
    t = IceTable(spark, str(tmp_path / "nested"))
    t.create(spark.range(3).select(
        F.col("id").alias("k"), F.array(F.col("id")).alias("arr")))
    with pytest.raises(ValueError, match="unsupported column type"):
        t.iceberg_metadata()
