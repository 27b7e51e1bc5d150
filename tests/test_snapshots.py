"""Snapshot store (sources/snapshots.py): isolation, time travel,
dynamic partition overwrite, vacuum, crash-invisibility."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from multi_task_offensive_language_detection_spark.sources.snapshots import (
    SnapshotStore,
)


@pytest.fixture()
def store(tmp_path):
    return SnapshotStore(str(tmp_path / "tbl"), "lang")


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, lang string, text string")


def test_append_and_overwrite_are_snapshot_isolated(spark, store):
    s1 = store.append(_df(spark, [(1, "en", "a"), (2, "de", "b")]))
    s2 = store.append(_df(spark, [(3, "en", "c")]))
    s3 = store.overwrite_partitions(_df(spark, [(9, "en", "Z")]))

    def ids(as_of):
        return sorted(
            r["doc_id"] for r in store.read(spark, as_of=as_of).collect()
        )

    assert ids(s1) == [1, 2]
    assert ids(s2) == [1, 2, 3]          # append kept everything
    assert ids(s3) == [2, 9]             # en replaced wholesale, de carried over
    assert ids(None) == [2, 9]           # latest
    # a reader pinned to s2 is untouched by the later overwrite
    assert ids(s2) == [1, 2, 3]


def test_partition_column_survives_and_prunes(spark, store):
    store.append(_df(spark, [(1, "en", "a"), (2, "de", "b"), (3, "de", "c")]))
    df = store.read(spark)
    assert set(df.columns) == {"doc_id", "lang", "text"}
    got = df.filter(F.col("lang") == "de").select("doc_id").collect()
    assert sorted(r["doc_id"] for r in got) == [2, 3]


def test_vacuum_deletes_unreferenced_and_breaks_old_time_travel(spark, store):
    s1 = store.append(_df(spark, [(1, "en", "a")]))
    s2 = store.overwrite_partitions(_df(spark, [(2, "en", "b")]))
    removed = store.vacuum(keep_last=1)
    assert removed, "the superseded snapshot-1 file must be deleted"
    assert sorted(r["doc_id"] for r in store.read(spark).collect()) == [2]
    with pytest.raises(ValueError, match="vacuumed or never committed"):
        store.read(spark, as_of=s1)
    # retained snapshot still reads fine
    assert store.read(spark, as_of=s2).count() == 1


def test_crashed_stage_is_invisible_and_vacuumable(spark, store):
    store.append(_df(spark, [(1, "en", "a")]))
    before = store.current_snapshot_id()
    # simulate a crash AFTER data files landed but BEFORE the journal
    # commit: stage files directly without committing
    sid = before + 1
    store._stage_files(_df(spark, [(99, "en", "ghost")]), sid)
    # the ghost file exists on disk but no snapshot references it
    assert store.current_snapshot_id() == before
    assert sorted(r["doc_id"] for r in store.read(spark).collect()) == [1]
    removed = store.vacuum(keep_last=1)
    assert any(f"snap-{sid:06d}" in r for r in removed)
    assert sorted(r["doc_id"] for r in store.read(spark).collect()) == [1]


def test_empty_table_and_missing_snapshot_raise(spark, store):
    with pytest.raises(ValueError, match="empty table"):
        store.read(spark)
    store.append(_df(spark, [(1, "en", "a")]))
    with pytest.raises(ValueError, match="not found"):
        store.read(spark, as_of=42)


def test_compact_rewrites_fragmented_partitions_identically(spark, store):
    # three appends fragment 'en' into 3 files; 'de' stays single-file
    store.append(_df(spark, [(1, "en", "a"), (10, "de", "x")]))
    store.append(_df(spark, [(2, "en", "b")]))
    s3 = store.append(_df(spark, [(3, "en", "c")]))
    before = sorted(
        (r["doc_id"], r["lang"], r["text"]) for r in store.read(spark).collect()
    )
    snap = store._resolve(None)
    assert len(snap["files"]["en"]) == 3 and len(snap["files"]["de"]) == 1
    sid = store.compact(spark)
    assert sid is not None
    after_map = store._resolve(None)["files"]
    assert len(after_map["en"]) == 1
    assert after_map["de"] == snap["files"]["de"]  # untouched partition kept as-is
    after = sorted(
        (r["doc_id"], r["lang"], r["text"]) for r in store.read(spark).collect()
    )
    assert after == before  # rows identical, only layout changed
    # the pre-compaction snapshot still time-travels to the same rows
    assert sorted(
        (r["doc_id"], r["lang"], r["text"])
        for r in store.read(spark, as_of=s3).collect()
    ) == before
    # nothing fragmented now -> no-op
    assert store.compact(spark) is None


def test_schema_evolution_reads_merged(spark, store):
    """Additive schema evolution, Iceberg-style: later snapshots may add
    columns; a merged-schema read null-fills old files."""
    store.append(_df(spark, [(1, "en", "a")]))
    wider = spark.createDataFrame(
        [(2, "en", "b", 0.9)], "doc_id long, lang string, text string, score double"
    )
    store.append(wider)
    got = {
        r["doc_id"]: r for r in store.read(spark, merge_schema=True).collect()
    }
    assert got[1]["score"] is None and got[2]["score"] == 0.9


def test_vacuum_commits_journal_before_deleting_files(spark, store, monkeypatch):
    """r5 crash-ordering fix: the truncated journal must land (atomic
    replace) BEFORE any data file is removed. A crash mid-deletion then
    leaves re-vacuumable orphans and CLEAN ValueError time travel — the
    old delete-first order left the journal referencing missing files
    (a confusing Spark read error instead)."""
    import os as _os

    s1 = store.append(_df(spark, [(1, "en", "a")]))
    s2 = store.overwrite_partitions(_df(spark, [(2, "en", "b")]))

    real_remove = _os.remove
    calls = {"n": 0}

    def crashing_remove(path):
        calls["n"] += 1
        raise OSError("injected crash before any file deletion")

    monkeypatch.setattr(
        "multi_task_offensive_language_detection_spark.sources.snapshots.os.remove",
        crashing_remove,
    )
    with pytest.raises(OSError, match="injected"):
        store.vacuum(keep_last=1)
    monkeypatch.undo()
    assert calls["n"] == 1  # the crash hit the FIRST deletion attempt

    # journal already truncated: vacuumed snapshot raises the documented
    # clean error, NOT a Spark missing-file failure
    with pytest.raises(ValueError, match="vacuumed or never committed"):
        store.read(spark, as_of=s1)
    # the surviving snapshot still reads fine (its files were never touched)
    assert [r["doc_id"] for r in store.read(spark, as_of=s2).collect()] == [2]
    # and a re-run finishes the cleanup
    removed = store.vacuum(keep_last=1)
    assert removed, "orphaned files from the crashed vacuum get collected"
