"""Structured Streaming: file-source streams driven with availableNow
triggers into memory sinks; streaming results must match the batch twins."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from sdc_mapreduce_spark.catalog import load_table
from sdc_mapreduce_spark.streaming import (
    enrich_with_dimension,
    incremental_rollup,
    read_events_stream,
    session_aggregate,
    stateful_user_totals,
    stream_stream_error_purchase_join,
    streaming_dedup,
    tumbling_counts,
)


@pytest.fixture(scope="module")
def events_json_dir(spark, sf_dir, tmp_path_factory):
    """Materialize the events fixture as json files (a replayable stream)."""
    out = str(tmp_path_factory.mktemp("events_stream"))
    ev = load_table(spark, sf_dir, "events")
    ev.select(
        "event_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("ts"),
        "user_id",
        "event_type",
        "value",
        "props",
    ).repartition(4).write.mode("overwrite").json(out)
    return out


def _run_to_memory(df, name: str, output_mode: str = "append"):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return q


def test_tumbling_counts_match_batch(spark, sf_dir, events_json_dir):
    stream = read_events_stream(spark, events_json_dir)
    assert stream.isStreaming
    _run_to_memory(tumbling_counts(stream), "tumbling_out", "append")
    got = {
        (r["window_start"], r["event_type"]): (r["cnt"], round(r["sum_value"], 6))
        for r in spark.sql("select * from tumbling_out").collect()
    }
    ev = load_table(spark, sf_dir, "events")
    batch = (
        ev.groupBy(F.window("ts", "5 minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("cnt"), F.sum("value").alias("sum_value"))
        .select(F.col("w.start").alias("ws"), "event_type", "cnt", "sum_value")
    )
    expected = {
        (r["ws"], r["event_type"]): (r["cnt"], round(r["sum_value"], 6))
        for r in batch.collect()
    }
    # append mode only emits windows the watermark has passed; every emitted
    # window must match the batch result, and most windows must be emitted
    # (only the trailing watermark horizon may be withheld).
    assert got
    for key, val in got.items():
        assert expected[key] == val
    assert len(got) >= len(expected) * 0.9


def test_streaming_dedup_drops_duplicates(spark, events_json_dir, tmp_path):
    # double the stream: copy the json files so every event appears twice
    dup_dir = str(tmp_path / "dup")
    os.makedirs(dup_dir)
    n = 0
    for fname in os.listdir(events_json_dir):
        if not fname.endswith(".json"):
            continue
        src = os.path.join(events_json_dir, fname)
        for copy in ("a", "b"):
            with open(src) as fh, open(
                os.path.join(dup_dir, f"{copy}_{fname}"), "w"
            ) as out:
                out.write(fh.read())
        n += 1
    assert n > 0
    stream = read_events_stream(spark, dup_dir)
    _run_to_memory(streaming_dedup(stream), "dedup_out", "append")
    rows = spark.sql("select event_id, count(*) c from dedup_out group by 1").collect()
    assert rows, "dedup emitted nothing"
    assert all(r["c"] == 1 for r in rows), "duplicates survived streaming dedup"


def test_session_aggregate_runs(spark, events_json_dir):
    stream = read_events_stream(spark, events_json_dir)
    _run_to_memory(session_aggregate(stream), "sessions_out", "append")
    rows = spark.sql("select * from sessions_out").collect()
    assert rows
    assert all(r["session_end"] >= r["session_start"] for r in rows)
    assert all(r["n_events"] >= 1 for r in rows)


def test_stateful_user_totals_match_batch(spark, sf_dir, events_json_dir):
    """The applyInPandasWithState accumulator's final emission per user must
    equal the batch groupBy — state survives across micro-batches."""
    stream = read_events_stream(spark, events_json_dir)
    _run_to_memory(stateful_user_totals(stream), "user_totals_out", "update")
    # update mode re-emits a row per state change; the LAST row per user is
    # the lifetime total. Memory sink preserves emission order per batch, so
    # take max(n_events) — the accumulator is monotone.
    got = {
        r["user_id"]: (r["n_events"], round(r["total_value"], 6))
        for r in spark.sql(
            """
            select user_id, n_events, total_value from (
              select *, row_number() over (partition by user_id
                        order by n_events desc) rn from user_totals_out) t
            where rn = 1
            """
        ).collect()
    }
    ev = load_table(spark, sf_dir, "events")
    expected = {
        r["user_id"]: (r["n"], round(r["total"], 6))
        for r in ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total"))
        .collect()
    }
    assert got == expected


def test_stream_stream_join_matches_batch(spark, sf_dir, events_json_dir):
    """Every pair the stream-stream join emits must exist in the batch
    range-join result, and it must emit the vast majority of them (pairs in
    the trailing watermark horizon may be withheld at end-of-stream)."""
    stream = read_events_stream(spark, events_json_dir)
    _run_to_memory(
        stream_stream_error_purchase_join(stream), "ss_join_out", "append"
    )
    got = {
        (r["error_event_id"], r["purchase_event_id"])
        for r in spark.sql("select * from ss_join_out").collect()
    }
    from sdc_mapreduce_spark.queries.events_queries import events_range_join

    expected = {
        (r["error_event_id"], r["purchase_event_id"])
        for r in events_range_join(spark, sf_dir).collect()
    }
    assert got <= expected, f"stream emitted pairs batch lacks: {got - expected}"
    assert len(got) >= 0.9 * len(expected), (len(got), len(expected))


def test_checkpoint_restart_is_exactly_once(spark, events_json_dir, tmp_path):
    """Restarting a checkpointed query over an unchanged source must add
    nothing: the checkpoint records consumed files, so the second run
    commits zero new batches (file-sink exactly-once)."""
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")

    def run_once():
        q = (
            tumbling_counts(read_events_stream(spark, events_json_dir))
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()
    first = spark.read.parquet(out).count()
    assert first > 0
    run_once()
    assert spark.read.parquet(out).count() == first, "restart duplicated rows"


def test_foreach_batch_custom_sink(spark, sf_dir, events_json_dir, tmp_path):
    """foreachBatch: each micro-batch lands through arbitrary batch-writer
    code (here: appended parquet) — the escape hatch for sinks Structured
    Streaming lacks natively. Total delivered rows must equal the source."""
    out = str(tmp_path / "fb_out")

    def write_batch(batch_df, batch_id: int):
        batch_df.withColumn("batch_id", F.lit(batch_id)).write.mode(
            "append"
        ).parquet(out)

    q = (
        read_events_stream(spark, events_json_dir, max_files_per_trigger=2)
        .writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", str(tmp_path / "fb_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    delivered = spark.read.parquet(out)
    expected = load_table(spark, sf_dir, "events").count()
    assert delivered.count() == expected
    # maxFilesPerTrigger=2 over 4 source files → at least 2 micro-batches
    assert delivered.select("batch_id").distinct().count() >= 2


def test_stream_static_enrichment(spark, sf_dir, events_json_dir):
    """Stream-static join: every streamed event picks up its dimension row
    (broadcast per micro-batch, no state store); left join keeps events with
    no dimension match."""
    dim = (
        load_table(spark, sf_dir, "events")
        .select("user_id")
        .distinct()
        .withColumn("segment", (F.col("user_id") % 3).cast("int"))
    )
    stream = read_events_stream(spark, events_json_dir)
    _run_to_memory(
        enrich_with_dimension(stream, dim).select("event_id", "user_id", "segment"),
        "enriched_out",
    )
    rows = spark.sql("select * from enriched_out").collect()
    assert len(rows) == load_table(spark, sf_dir, "events").count()
    assert all(r["segment"] == r["user_id"] % 3 for r in rows)


def _write_events_json(path: str, rows: list[tuple[int, str, int]]) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as fh:
        for event_id, ts, user_id in rows:
            fh.write(
                json.dumps(
                    {
                        "event_id": event_id,
                        "ts": ts,
                        "user_id": user_id,
                        "event_type": "click",
                        "value": 1.0,
                        "props": "{}",
                    }
                )
                + "\n"
            )


def test_watermark_drops_late_rows(spark, tmp_path):
    """Late-data policy end-to-end: a row older than the watermark when it
    arrives is DROPPED — the already-emitted window is final (append mode)
    and never re-emitted with the late row counted. The watermark survives
    the restart via the checkpoint."""
    src = str(tmp_path / "late_src")
    ckpt = str(tmp_path / "late_ckpt")
    out = str(tmp_path / "late_out")

    def run(_name):
        # file sink: the one sink that recovers watermark + progress from
        # the checkpoint across restarts (memory sink cannot)
        q = (
            tumbling_counts(read_events_stream(spark, src))
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    # run 1: two rows in the 12:00 window, one at 12:31 to advance the
    # watermark (10 min delay) to 12:21 > 12:05 → the 12:00 window emits
    _write_events_json(
        os.path.join(src, "batch1.json"),
        [
            (1, "2024-06-01 12:00:01", 1),
            (2, "2024-06-01 12:04:00", 2),
            (3, "2024-06-01 12:31:00", 3),
        ],
    )
    run("late_run1")
    first = {
        r["window_start"]: r["cnt"] for r in spark.read.parquet(out).collect()
    }
    assert any(ws.minute == 0 for ws in first) and all(
        cnt == 2 for ws, cnt in first.items() if ws.minute == 0
    )

    # run 2: one LATE row for the closed 12:00 window (12:01 < watermark
    # 12:21 → dropped) plus a fresh 12:50 row that pushes the watermark to
    # 12:40, emitting the 12:30 window with cnt=1 — never a corrected
    # 12:00 window
    _write_events_json(
        os.path.join(src, "batch2.json"),
        [(4, "2024-06-01 12:01:00", 4), (5, "2024-06-01 12:50:00", 5)],
    )
    run("late_run2")
    both = [
        (r["window_start"], r["cnt"]) for r in spark.read.parquet(out).collect()
    ]
    second = [kv for kv in both if kv[0] not in first]
    assert all(
        ws.minute != 0 for ws, _ in second
    ), "late row re-opened a closed window"
    assert [(ws.minute, cnt) for ws, cnt in second] == [(30, 1)]
    # and the closed 12:00 window was emitted exactly once, still cnt=2
    assert sum(1 for ws, _ in both if ws.minute == 0) == 1


def test_watermark_append_emission_boundary_is_inclusive(spark, tmp_path):
    """Pins the append-mode finalization boundary the watermark
    certification's oracle encodes: with max event time 10:00:00 and a
    10-minute delay the watermark lands EXACTLY on the 09:45–09:50 window
    end, and that window IS emitted (window_end <= watermark, inclusive)
    while the still-open 10:00 window is withheld."""
    src = str(tmp_path / "bnd_src")
    ckpt = str(tmp_path / "bnd_ckpt")
    os.makedirs(src)
    with open(os.path.join(src, "a.json"), "w") as f:
        f.write(
            '{"k":"x","ts":"2024-06-01 09:46:00.000000"}\n'
            '{"k":"x","ts":"2024-06-01 10:00:00.000000"}\n'
        )
    stream = (
        spark.readStream.schema("k string, ts timestamp")
        .format("json")
        .option("timestampFormat", "yyyy-MM-dd HH:mm:ss.SSSSSS")
        .load(src)
    )
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "5 minutes").alias("w"), "k")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            F.col("w.start").cast("timestamp_ntz").alias("ws"), "k", "cnt"
        )
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("wm_boundary")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = [
        (r["ws"].strftime("%H:%M"), r["cnt"])
        for r in spark.table("wm_boundary").orderBy("ws").collect()
    ]
    assert rows == [("09:45", 1)]


def test_incremental_rollup_snapshot_matches_batch(
    spark, sf_dir, events_json_dir, tmp_path
):
    """Drive the continuously-maintained rollup in small micro-batches
    (update mode → the same window is upserted repeatedly); the final
    snapshot must equal the one-shot batch aggregate, proving the per-batch
    merge neither drops sibling rows nor double-counts."""
    snap = str(tmp_path / "rollup_snapshot")
    ckpt = str(tmp_path / "rollup_ckpt")
    # time-sliced source files (a real stream arrives roughly time-ordered;
    # random slices would put whole slices behind the watermark)
    src = str(tmp_path / "rollup_src")
    os.makedirs(src)
    ev_rows = (
        load_table(spark, sf_dir, "events")
        .select(
            "event_id",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("ts"),
            "user_id",
            "event_type",
            "value",
            "props",
        )
        .orderBy("ts")
        .collect()
    )
    slice_size = (len(ev_rows) + 3) // 4
    for i in range(4):
        with open(os.path.join(src, f"slice{i}.json"), "w") as fh:
            for r in ev_rows[i * slice_size : (i + 1) * slice_size]:
                fh.write(json.dumps(r.asDict()) + "\n")
    q = incremental_rollup(
        read_events_stream(spark, src, max_files_per_trigger=1),
        snapshot_dir=snap,
        checkpoint_dir=ckpt,
    )
    q.awaitTermination(180)

    got = {
        (r["window_start"], r["event_type"]): (r["cnt"], round(r["sum_value"], 6))
        for r in spark.read.parquet(snap).collect()
    }
    ev = load_table(spark, sf_dir, "events")
    batch = (
        ev.groupBy(F.window("ts", "5 minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("cnt"), F.sum("value").alias("sum_value"))
        .select(F.col("w.start").alias("ws"), "event_type", "cnt", "sum_value")
    )
    expected = {
        (r["ws"], r["event_type"]): (r["cnt"], round(r["sum_value"], 6))
        for r in batch.collect()
    }
    assert got == expected


def test_json_roundtrip_preserves_schema(spark, events_json_dir):
    stream = read_events_stream(spark, events_json_dir)
    assert dict(stream.dtypes)["ts"] == "timestamp"
    assert dict(stream.dtypes)["value"] == "double"


def test_kvtext_kill_and_resume_mid_stream_exactly_once(spark, tmp_path):
    """Kill-and-resume for the kvtext stream source under a CONTINUOUS
    trigger: a running query ingests blob 1 and is stopped mid-stream (not
    at an availableNow boundary); more blobs arrive while it is down; a new
    query on the same checkpoint must ingest exactly the missed files —
    no re-read of committed offsets (file-set offset, datasource.py
    KVTextStreamReader), no loss, across two kill/resume cycles."""
    import time as _t

    from sdc_mapreduce_spark.datasource import register_kvtext

    d = tmp_path / "incoming"
    d.mkdir()
    (d / "blob1.txt").write_text("a 1\nb 2\n")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    register_kvtext(spark)

    def start_continuous():
        return (
            spark.readStream.format("kvtext")
            .option("path", str(d))
            .option("shard_size", 4)
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(processingTime="100 milliseconds")
            .start()
        )

    def sink_rows():
        try:
            return sorted(
                (r["key"], r["value"]) for r in spark.read.parquet(out).collect()
            )
        except Exception:  # sink dir not created yet
            return []

    def wait_for(expected, timeout=120):
        deadline = _t.time() + timeout
        while _t.time() < deadline:
            if sink_rows() == expected:
                return True
            _t.sleep(0.2)
        return False

    q = start_continuous()
    try:
        assert wait_for([("a", 1), ("b", 2)]), f"first batch missing: {sink_rows()}"
    finally:
        q.stop()  # kill mid-stream, between processingTime ticks

    # data arrives while the query is down
    (d / "blob2.txt").write_text("c 3\n")
    (d / "blob3.txt").write_text("a 4\nd 5\n")

    q = start_continuous()
    try:
        assert wait_for(
            [("a", 1), ("a", 4), ("b", 2), ("c", 3), ("d", 5)]
        ), f"resume lost/duplicated rows: {sink_rows()}"
        # keep it running a few ticks: committed files must never re-ingest
        _t.sleep(1.0)
        assert sink_rows() == [("a", 1), ("a", 4), ("b", 2), ("c", 3), ("d", 5)]
    finally:
        q.stop()

    # second kill/resume cycle with one more late blob
    (d / "blob4.txt").write_text("e 6\n")
    q = start_continuous()
    try:
        assert wait_for(
            [("a", 1), ("a", 4), ("b", 2), ("c", 3), ("d", 5), ("e", 6)]
        ), f"second resume wrong: {sink_rows()}"
    finally:
        q.stop()


def test_tumbling_throughput_floor(spark, sf_dir, tmp_path):
    """Throughput canary: the tumbling-window pipeline must stay JVM-side.
    Replicates the fixture stream ~30x (so per-row work dominates fixed
    micro-batch overhead) and asserts a deliberately generous events/sec
    floor — a row-at-a-time Python regression in streaming/events.py is
    ~2 orders of magnitude off this pace and trips it; normal CI noise
    does not."""
    import time

    out = str(tmp_path / "events_big")
    ev = load_table(spark, sf_dir, "events")
    reps = spark.range(30).select(F.col("id").alias("__rep"))
    big = (
        ev.crossJoin(reps)
        .withColumn("event_id", F.col("event_id") + F.col("__rep") * 10_000_000)
        .drop("__rep")
    )
    n_events = big.count()
    big.select(
        "event_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("ts"),
        "user_id",
        "event_type",
        "value",
        "props",
    ).repartition(8).write.mode("overwrite").json(out)

    stream = read_events_stream(spark, out)
    t0 = time.monotonic()
    _run_to_memory(tumbling_counts(stream), "tumbling_floor_out", "append")
    elapsed = time.monotonic() - t0
    assert spark.sql("select count(*) from tumbling_floor_out").collect()[0][0] > 0
    rate = n_events / elapsed
    # floor chosen ~50x below the JVM-side rate and ~50x above a
    # row-at-a-time Python pace, so contention noise can't trip it but a
    # real regression can't hide
    assert rate >= 1000, f"streaming throughput regressed: {rate:.0f} ev/s ({elapsed:.1f}s for {n_events})"


def test_dedup_ingest_across_deliveries(spark, tmp_path):
    """Continuous dedup ingestion (streaming/events.dedup_ingest): two
    deliveries with in-batch and cross-batch duplicates; the accepted
    corpus must equal the batch-mode incremental plan's answer."""
    import json as _json
    import os

    from sdc_mapreduce_spark.streaming.events import dedup_ingest

    src = tmp_path / "docs_in"
    src.mkdir()
    index_dir = str(tmp_path / "fp_index")
    accepted_dir = str(tmp_path / "accepted")
    ckpt = str(tmp_path / "ckpt")
    schema = "doc_id long, text string"

    def deliver(name, rows):
        with open(src / name, "w") as f:
            for r in rows:
                f.write(_json.dumps({"doc_id": r[0], "text": r[1]}) + "\n")

    def run():
        stream = spark.readStream.schema(schema).json(str(src))
        q = dedup_ingest(stream, index_dir, accepted_dir, ckpt)
        q.awaitTermination(120)

    deliver("d1.json", [(1, "alpha"), (2, "beta"), (3, "alpha")])  # 3 dups 1
    run()
    deliver("d2.json", [(4, "beta"), (5, "gamma"), (6, "gamma"), (7, "alpha")])
    run()

    got = {
        (r["doc_id"], r["text"])
        for r in spark.read.parquet(accepted_dir).collect()
    }
    # batch semantics: 1 alpha, 2 beta survive delivery 1; delivery 2 keeps
    # only 5 gamma (4 beta and 7 alpha are corpus dups, 6 loses in-batch)
    assert got == {(1, "alpha"), (2, "beta"), (5, "gamma")}
    # index holds exactly the distinct fingerprints
    assert spark.read.parquet(index_dir).select("__fp").distinct().count() == 3


def test_cdc_upsert_supersession_and_replay_idempotent(spark, tmp_path):
    """Cross-batch CDC semantics: a later delivery supersedes an earlier
    version, a tombstone hides the key, a post-tombstone change revives it,
    and replaying a landed batch (foreachBatch redelivery) leaves the
    snapshot bit-identical instead of double-counting."""
    import datetime as dt

    from pyspark.sql import functions as F

    from sdc_mapreduce_spark.streaming.events import read_cdc_snapshot

    snap = str(tmp_path / "snap")

    def land(rows, batch_id):
        df = spark.createDataFrame(
            rows, "event_id long, ts timestamp_ntz, user_id long, "
            "event_type string, value double"
        )
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        delta = (
            df.groupBy("user_id")
            .agg(
                F.count(F.lit(1)).alias("n_changes"),
                F.max(F.struct("ts", "event_id", "event_type", "value")).alias(
                    "__last"
                ),
            )
            .withColumn("__batch", F.lit(batch_id))
        )
        delta.write.mode("overwrite").partitionBy("__batch").parquet(snap)

    t = lambda m: dt.datetime(2024, 1, 1, 10, m)
    land([(0, t(0), 1, "view", 1.0), (1, t(1), 2, "click", 2.0)], 0)
    # user 1 tombstoned, user 2 superseded
    land([(2, t(2), 1, "error", 0.0), (3, t(3), 2, "purchase", 9.0)], 1)
    # user 1 revived after the tombstone
    land([(4, t(4), 1, "click", 7.0)], 2)

    def state():
        return sorted(map(tuple, read_cdc_snapshot(spark, snap).collect()))

    first = state()
    assert first == [
        (1, 4, "click", 7.0, 3),
        (2, 3, "purchase", 9.0, 2),
    ]
    # replay batch 1 (redelivery after failure): identical snapshot
    land([(2, t(2), 1, "error", 0.0), (3, t(3), 2, "purchase", 9.0)], 1)
    assert state() == first


def test_streaming_session_window_matches_batch_sessionize(spark, sf_dir):
    """The streaming session_window certification (round 7): run through
    REAL micro-batches (maxFilesPerTrigger=1) in complete mode, the merged
    session set must equal the batch lag→flag→running-count sessionize —
    session state merging across batches is the property under test."""
    from sdc_mapreduce_spark.operators.skew import sessionize_plain
    from sdc_mapreduce_spark.queries.events_queries import (
        events_streaming_session_certified,
    )

    got = sorted(
        map(tuple, events_streaming_session_certified(spark, sf_dir).collect())
    )
    ev = load_table(spark, sf_dir, "events")
    want = sorted(
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in sessionize_plain(ev).collect()
    )
    assert got == want and len(got) > 0


def test_streaming_embedding_screen_matches_batch_index(spark, sf_dir):
    """The streaming ingestion-screen certification (round 8): the
    new-vector feed replayed through REAL micro-batches
    (maxFilesPerTrigger=1), each probing the persisted SRP bucket index
    via foreachBatch, must emit exactly the one-shot batch screen's reject
    list — per-delivery index probing with no lost/duplicated micro-batch
    is the property under test."""
    from sdc_mapreduce_spark.queries.dedup_queries import (
        dedup_incremental_embedding_index,
        dedup_streaming_embedding_certified,
    )

    got = sorted(
        map(tuple, dedup_streaming_embedding_certified(spark, sf_dir).collect())
    )
    want = sorted(
        map(tuple, dedup_incremental_embedding_index(spark, sf_dir).collect())
    )
    assert got == want and len(got) > 0


def test_streaming_cert_spark_version_pin():
    """Version tripwire (VERDICT r9 ask #7): the watermark-cert oracles
    (EVENTS_STREAMING_WATERMARK_SQL / EVENTS_STREAMING_RESTART_SQL) encode
    availableNow late-data behavior OBSERVED on Spark 4.1.x — upstream
    documents late dropping only as "may or may not", so a minor/major
    bump is allowed to change it legally. This assertion fails on any
    version change so the upgrade consciously re-runs the behavior pins
    (test_watermark_drops_late_rows,
    test_watermark_append_emission_boundary_is_inclusive) and re-derives
    the oracle counting rules if the engine moved."""
    import pyspark

    assert pyspark.__version__.startswith("4.1."), (
        f"Spark version is now {pyspark.__version__}: re-verify the "
        "availableNow watermark behavior pinned by "
        "test_watermark_drops_late_rows / "
        "test_watermark_append_emission_boundary_is_inclusive and "
        "re-derive the EVENTS_STREAMING_{WATERMARK,RESTART}_SQL counting "
        "rules in queries/events_queries.py before trusting the certs"
    )
