"""Streaming surface (SURVEY.md §2.9): batch/stream parity, availableNow
incremental ingest, stateful dedup."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from multi_task_offensive_language_detection_spark.streaming import jobs


@pytest.fixture(scope="module")
def events_path():
    return "/root/testdata/sf0.001/events.parquet"


def _events_schema(spark, events_path):
    return spark.read.parquet(events_path).schema


def test_tumbling_batch_stream_parity(spark, events_path, tmp_path):
    """The same transformation over readStream equals the batch run —
    the watermark is the only streaming-specific piece and no rows are
    late in a replay, so results must match exactly."""
    batch = {
        (r["bucket_start_s"], r["event_type"]): r["n"]
        for r in jobs.tumbling_counts(spark.read.parquet(events_path)).collect()
    }
    # the file stream source needs a DIRECTORY; testdata is a single file
    import shutil

    src_dir = str(tmp_path / "events_dir")
    os.makedirs(src_dir, exist_ok=True)
    shutil.copy(events_path, os.path.join(src_dir, "part-0.parquet"))
    raw = spark.readStream.schema(_events_schema(spark, events_path)).parquet(src_dir)
    # Spark 4 infers parquet timestamps as NTZ; watermarks require LTZ
    stream = jobs.with_watermark_tumbling(raw.withColumn("ts", F.col("ts").cast("timestamp")))
    out = str(tmp_path / "out")
    q = (
        stream.writeStream.format("memory")
        .queryName("tumbling_test")
        .outputMode("complete")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination()
    got = {
        (r["bucket_start_s"], r["event_type"]): r["n"]
        for r in spark.sql("select * from tumbling_test").collect()
    }
    assert got == batch


def test_available_now_ingest_is_incremental(spark, tmp_path):
    """T1 — second availableNow run processes only newly-landed files."""
    src = str(tmp_path / "src")
    out = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    df1 = spark.range(100).select(F.col("id"), F.lit("a").alias("tag"))
    df1.write.mode("overwrite").parquet(src)
    schema = spark.read.parquet(src).schema

    jobs.run_available_now(
        spark.readStream.schema(schema).parquet(src), ckpt, out
    )
    assert spark.read.parquet(out).count() == 100

    spark.range(100, 150).select(F.col("id"), F.lit("b").alias("tag")).write.mode(
        "append"
    ).parquet(src)
    jobs.run_available_now(
        spark.readStream.schema(schema).parquet(src), ckpt, out
    )
    got = spark.read.parquet(out)
    assert got.count() == 150  # no reprocessing duplicates
    assert got.filter(F.col("tag") == "b").count() == 50


def test_stream_dedup_drops_duplicates(spark, tmp_path):
    src = str(tmp_path / "dsrc")
    rows = [(i % 10, f"2024-01-01 00:{i:02d}:00") for i in range(40)]
    df = spark.createDataFrame(rows, "k long, ts_s string").select(
        "k", F.col("ts_s").cast("timestamp").alias("ts")
    )
    df.write.mode("overwrite").parquet(src)
    schema = spark.read.parquet(src).schema
    out = str(tmp_path / "dout")
    deduped = jobs.stream_dedup(
        spark.readStream.schema(schema).parquet(src), ["k"], delay="10 minutes"
    )
    jobs.run_available_now(deduped, str(tmp_path / "dckpt"), out)
    got = spark.read.parquet(out)
    assert got.select("k").distinct().count() == 10


def test_stream_filter_clips_incremental(spark, artifacts, tmp_path):
    """New clip files landing between runs are scored exactly once and
    decisions match the batch pipeline."""
    import shutil

    from tests.fixtures.clips_gen import write_clips_parquet

    base = tmp_path / "sfc"
    clips_dir, golden = write_clips_parquet(str(base), n_rows=200)
    # flatten hive parts into a plain landing dir (file-arrival semantics)
    land = str(tmp_path / "landing")
    os.makedirs(land, exist_ok=True)
    batch1 = spark.read.parquet(clips_dir).withColumn("part_id", F.lit(0))
    batch1.filter(F.col("clip_id") < "clip_000000000100").write.mode("overwrite").parquet(land)

    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    jobs.stream_filter_clips(spark, land, out, ckpt)
    n1 = spark.read.parquet(out).count()
    assert n1 == 100

    batch1.filter(F.col("clip_id") >= "clip_000000000100").write.mode("append").parquet(land)
    jobs.stream_filter_clips(spark, land, out, ckpt)
    got = spark.read.parquet(out)
    assert got.count() == 200
    assert got.select("clip_id").distinct().count() == 200  # exactly-once

    # decisions identical to the batch golden
    g = spark.read.parquet(golden).select("clip_id", F.col("keep").alias("keep_gold"))
    j = got.join(g, "clip_id")
    assert j.filter(F.col("keep") != F.col("keep_gold")).count() == 0


def test_stateful_session_stats_emits_on_timeout(spark, tmp_path):
    """T6 — applyInPandasWithState custom sessions: state accumulates
    across a run, sessions emit only when the event-time watermark
    passes last_event + gap (driven here by a later second batch), and
    emitted stats are exact."""
    src = str(tmp_path / "ssrc")
    os.makedirs(src, exist_ok=True)

    def write(rows, name):
        spark.createDataFrame(rows, "user_id long, ts_s string, value double").select(
            "user_id", F.col("ts_s").cast("timestamp").alias("ts"), "value"
        ).coalesce(1).write.mode("append").parquet(src)

    write(
        [
            (1, "2024-01-01 00:00:00", 1.0),
            (1, "2024-01-01 00:05:00", 2.0),
            (1, "2024-01-01 00:10:00", 3.0),
            (2, "2024-01-01 00:05:00", 10.0),
        ],
        "b1",
    )
    schema = spark.read.parquet(src).schema
    out, ckpt = str(tmp_path / "sout"), str(tmp_path / "sckpt")

    def run():
        stream = jobs.stateful_session_stats(
            spark.readStream.schema(schema).parquet(src).withColumn(
                "ts", F.col("ts").cast("timestamp")
            ),
            gap_minutes=30,
        )
        jobs.run_available_now(stream, ckpt, out)

    run()
    # watermark after batch 1 = 00:10; no session is 30 min stale yet
    assert spark.read.parquet(out).count() == 0

    # a much later event advances the watermark past both open sessions
    write([(3, "2024-01-01 02:00:00", 0.5)], "b2")
    run()
    got = {r["user_id"]: r for r in spark.read.parquet(out).collect()}
    assert sorted(got) == [1, 2]
    r1 = got[1]
    assert r1["n_events"] == 3 and r1["sum_value"] == 6.0
    assert r1["session_end_s"] - r1["session_start_s"] == 600
    assert got[2]["n_events"] == 1 and got[2]["sum_value"] == 10.0
    # user 3's session is still open — held in state, not emitted


def test_stream_to_snapshot_store_is_exactly_once(spark, tmp_path):
    """T1 + snapshot store: each micro-batch commits one snapshot keyed
    by (query, batch_id); a replayed batch (foreachBatch is
    at-least-once) is skipped, so table rows never duplicate."""
    from multi_task_offensive_language_detection_spark.sources.snapshots import (
        SnapshotStore,
    )
    from multi_task_offensive_language_detection_spark.streaming.jobs import (
        run_stream_to_snapshots,
        stream_append_to_snapshots,
    )

    src_dir = str(tmp_path / "src")
    os.makedirs(src_dir, exist_ok=True)

    def land(rows):
        spark.createDataFrame(rows, "id long, lang string").coalesce(1).write.mode(
            "append"
        ).parquet(src_dir)

    land([(1, "en"), (2, "de")])
    schema = spark.read.parquet(src_dir).schema
    store = SnapshotStore(str(tmp_path / "tbl"), "lang")
    ckpt = str(tmp_path / "ckpt")

    def stream():
        return spark.readStream.schema(schema).parquet(src_dir)

    run_stream_to_snapshots(stream(), store, "q1", ckpt)
    assert sorted(r["id"] for r in store.read(spark).collect()) == [1, 2]

    land([(3, "en")])
    run_stream_to_snapshots(stream(), store, "q1", ckpt)
    assert sorted(r["id"] for r in store.read(spark).collect()) == [1, 2, 3]

    # simulate the crash-replay: re-deliver batch 1's data with its id
    replay = stream_append_to_snapshots(store, "q1")
    replay(spark.createDataFrame([(3, "en")], schema), 1)
    assert sorted(r["id"] for r in store.read(spark).collect()) == [1, 2, 3]
    # a genuinely new batch id still lands
    replay(spark.createDataFrame([(4, "fr")], schema), 2)
    assert sorted(r["id"] for r in store.read(spark).collect()) == [1, 2, 3, 4]


def test_stream_stream_interval_join_parity(spark, events_path, tmp_path):
    """T7 — stream-stream interval join over two file streams equals the
    identical batch join (no late data in a replay). The interval bound
    + watermark is what makes buffered join state expirable."""
    batch_events = spark.read.parquet(events_path).withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    # split into two event streams: clicks (left) and purchases (right)
    left_b = batch_events.filter(F.col("event_id") % 2 == 0)
    right_b = batch_events.filter(F.col("event_id") % 2 == 1)
    expected = {
        (r["user_id"], r["left_event_id"], r["right_event_id"])
        for r in jobs.stream_stream_interval_join(left_b, right_b).collect()
    }
    assert expected, "fixture must produce at least one interval pair"

    import shutil

    schema = _events_schema(spark, events_path)
    dirs = {}
    for side, part in (("l", left_b), ("r", right_b)):
        d = str(tmp_path / f"src_{side}")
        part.write.mode("overwrite").parquet(d)
        dirs[side] = d
    ls = spark.readStream.schema(schema).parquet(dirs["l"]).withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    rs = spark.readStream.schema(schema).parquet(dirs["r"]).withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    q = (
        jobs.stream_stream_interval_join(ls, rs)
        .writeStream.format("memory")
        .queryName("ssj_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt_ssj"))
        .start()
    )
    q.awaitTermination()
    got = {
        (r["user_id"], r["left_event_id"], r["right_event_id"])
        for r in spark.sql("select * from ssj_test").collect()
    }
    assert got == expected
