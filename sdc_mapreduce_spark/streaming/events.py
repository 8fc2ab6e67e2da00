"""Streaming operators over the events schema (FIXTURES.md Group B).

Batch and stream share one logical plan in Structured Streaming, so each
operator here takes whatever DataFrame it is given — the tests drive them
both from a file stream (``availableNow`` trigger) and from batch frames.

Watermark policy (ours to define — the reference has no streaming at all):
event-time = ``ts``; late rows older than the watermark delay are dropped;
windowed aggregates emit in append mode once the watermark passes window
end. State stores stay bounded because every stateful operator below is
keyed by (window | user) x watermark — the requirement for unbounded-input
deployments.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Watermarks require TIMESTAMP (with local time zone); the session pins
# spark.sql.session.timeZone=UTC so wall-clock values agree with the
# TIMESTAMP_NTZ batch twins read from parquet.
EVENTS_DDL = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def read_events_stream(
    spark: SparkSession, source_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-based stream over json event batches (the replayable analog of a
    Kafka topic; swapping in ``format('kafka')`` changes only this reader)."""
    reader = (
        spark.readStream.schema(EVENTS_DDL)
        .format("json")
    )
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.load(source_dir)


def tumbling_counts(
    events: DataFrame, window: str = "5 minutes", watermark: str = "10 minutes"
) -> DataFrame:
    """Tumbling event-time window: count + value sum per (window, type)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("cnt"), F.sum("value").alias("sum_value"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "cnt",
            "sum_value",
        )
    )


def sliding_counts(
    events: DataFrame,
    window: str = "10 minutes",
    slide: str = "5 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Sliding event-time window (overlapping assignment)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(F.col("w.start").alias("window_start"), "event_type", "cnt")
    )


def session_aggregate(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "30 minutes"
) -> DataFrame:
    """Session windows: dynamic-length windows that close after ``gap`` of
    per-user inactivity (``F.session_window`` — state bounded by watermark)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("session_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "session_value",
        )
    )


def stream_stream_error_purchase_join(
    events: DataFrame,
    horizon: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream inner join: each error event paired with the same
    user's purchases in the following ``horizon`` (the streaming twin of the
    batch events_range_join query).

    Both sides carry watermarks and the join condition time-bounds the match
    window, so the state store retains each side only for
    watermark + horizon — the requirements for bounded-state stream-stream
    joins. One input stream, filtered two ways, joins against itself the
    same way two topics would."""
    errors = events.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_event_id"),
        F.col("user_id"),
        F.col("ts").alias("error_ts"),
    ).withWatermark("error_ts", watermark)
    purchases = events.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_event_id"),
        F.col("user_id").alias("p_user_id"),
        F.col("ts").alias("purchase_ts"),
    ).withWatermark("purchase_ts", watermark)
    return errors.join(
        purchases,
        (F.col("user_id") == F.col("p_user_id"))
        & (F.col("purchase_ts") >= F.col("error_ts"))
        & (F.col("purchase_ts") <= F.col("error_ts") + F.expr(f"INTERVAL {horizon}")),
    ).select("error_event_id", "purchase_event_id", "user_id")


def stateful_user_totals(events: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """Custom stateful operator via ``applyInPandasWithState``: per-user
    lifetime totals (event count + value sum), re-emitted on every update.

    This is the arbitrary-state escape hatch for operators the built-in
    windowed aggregations can't express (per-key accumulators, custom
    eviction, decaying counters). State is one tiny tuple per user — bounded
    by cardinality, not stream length; the per-batch work is Arrow-batched
    pandas, not row-at-a-time Python."""
    import pandas as pd  # noqa: PLC0415 — executor-side import
    from pyspark.sql.streaming.state import GroupStateTimeout

    def update(key, pdfs, state):
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
        )

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType="user_id long, n_events long, total_value double",
            stateStructType="n long, total double",
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def enrich_with_dimension(
    events: DataFrame, dim: DataFrame, on: str = "user_id"
) -> DataFrame:
    """Stream-static join: enrich each streaming event with a static
    dimension (broadcast per micro-batch, no state store involved) — the
    standard lookup-table pattern. The static side is re-resolved every
    trigger, so a refreshed dimension table is picked up without restarting
    the query."""
    return events.join(F.broadcast(dim), on, "left")


def incremental_rollup(
    events: DataFrame,
    snapshot_dir: str,
    checkpoint_dir: str,
    window: str = "5 minutes",
    watermark: str = "10 minutes",
):
    """Continuously-maintained rollup table (the 'hypertable rollup'
    pattern): a windowed aggregate in UPDATE mode, merged into a
    date-partitioned parquet snapshot via ``foreachBatch`` — the MERGE-INTO
    upsert expressed without a table format. Each micro-batch:

    1. collects the (bounded) set of window dates it touched,
    2. reads ONLY those snapshot partitions (partition pruning),
    3. anti-joins out the rows being replaced, unions the fresh aggregates,
    4. rewrites just those date partitions (dynamic partition overwrite).

    Maintenance cost is proportional to the update footprint, never the
    snapshot size — the property that matters when the snapshot is years of
    history. Replaying a failed batch rewrites the same partitions to the
    same content (idempotent), so the checkpoint gives end-to-end
    exactly-once.

    Returns the started StreamingQuery; the snapshot at ``snapshot_dir`` is
    readable with ``spark.read.parquet`` at any time.
    """

    agg = (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("cnt"), F.sum("value").alias("sum_value"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "cnt",
            "sum_value",
            F.to_date(F.col("w.start")).alias("window_date"),
        )
    )

    def land(batch_df: DataFrame, _batch_id: int) -> None:
        spark = batch_df.sparkSession
        batch_df = batch_df.persist()
        try:
            # touched dates: bounded by the batch's window footprint, not
            # data volume — a safe driver-side collect
            dates = [
                r["window_date"]
                for r in batch_df.select("window_date").distinct().collect()
            ]
            if not dates:
                return
            try:  # schema resolution is eager: missing path raises here
                existing = spark.read.parquet(snapshot_dir).filter(
                    F.col("window_date").isin(dates)
                )
            except Exception:  # first batch: snapshot does not exist yet
                existing = None
            if existing is None:
                merged = batch_df
            else:
                keys = batch_df.select("window_start", "event_type").distinct()
                kept = existing.join(
                    keys, ["window_start", "event_type"], "left_anti"
                )
                # materialize before the write: the plan reads the same
                # partitions the overwrite is about to delete
                merged = kept.unionByName(batch_df).localCheckpoint(eager=True)
            (
                # dynamic overwrite scoped to THIS write (DataFrameWriter
                # option, not session conf): a session-wide conf.set here
                # would silently change overwrite semantics for every later
                # partitioned write on the shared session
                merged.write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("window_date")
                .parquet(snapshot_dir)
            )
        finally:
            batch_df.unpersist()

    return (
        agg.writeStream.foreachBatch(land)
        .outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def streaming_dedup(
    events: DataFrame, keys: list[str] | None = None, watermark: str = "10 minutes"
) -> DataFrame:
    """Streaming exact dedup on event id within the watermark horizon —
    ``dropDuplicatesWithinWatermark`` keeps state only for the watermark
    window, the bounded-state form of streaming dedup."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        keys or ["event_id"]
    )


def dedup_ingest(
    docs_stream: DataFrame,
    index_dir: str,
    accepted_dir: str,
    checkpoint_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Continuous dedup ingestion — the streaming form of
    functions.dedup.incremental_dedup: every micro-batch fingerprints its
    documents, dedups within the batch (lowest id survives), anti-joins the
    PERSISTED fingerprint index accumulated by all prior batches, then
    lands the survivors and appends their fingerprints to the index.

    Exactly-once across restarts without a transactional table format:
    both sinks write into a ``batch=<id>`` subdirectory with overwrite, so
    a replayed micro-batch rewrites identical content instead of
    double-appending; the checkpoint guarantees batch ids are stable.

    Scale shape per delivery: the index side is fingerprints only (32
    bytes/doc, bucketable — see
    test_incremental_dedup_fingerprint_index_bucket_join_no_shuffle), the
    batch is the small side of the anti-join, and the index grows by one
    append per batch — cost tracks the delivery, never the corpus.

    Returns the started StreamingQuery; read ``accepted_dir`` with
    ``spark.read.parquet`` at any time for the deduped corpus.
    """

    def land(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        fps = batch_df.select(
            F.col(id_col), F.col(text_col), F.md5(F.col(text_col)).alias("__fp")
        ).persist()
        try:
            winners = fps.groupBy("__fp").agg(F.min(id_col).alias(id_col))
            in_batch = fps.join(winners, ["__fp", id_col])
            try:
                # exclude THIS batch's own partition: on replay the index
                # already holds our fingerprints and an unfiltered
                # anti-join would drop the whole batch (breaking the
                # rewrite-identical-content idempotence)
                existing = (
                    spark.read.parquet(index_dir)
                    .filter(F.col("batch") != batch_id)
                    .select("__fp")
                    .distinct()
                )
                fresh = in_batch.join(existing, "__fp", "left_anti")
            except Exception:
                fresh = in_batch  # first batch: no index yet
            fresh = fresh.persist()
            try:
                fresh.drop("__fp").write.mode("overwrite").parquet(
                    f"{accepted_dir}/batch={batch_id}"
                )
                fresh.select("__fp").write.mode("overwrite").parquet(
                    f"{index_dir}/batch={batch_id}"
                )
            finally:
                fresh.unpersist()
        finally:
            fps.unpersist()

    return (
        docs_stream.writeStream.foreachBatch(land)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def cdc_upsert_stream(
    changes: DataFrame,
    snapshot_dir: str,
    checkpoint_dir: str,
):
    """Streaming CDC apply — the change-feed twin of the batch
    ``events_cdc_apply``: every change row is an upsert of its key's state
    ('error' rows are delete tombstones) and the applied table is
    latest-version-wins per key, maintained continuously across
    micro-batches.

    Exactly-once discipline: each micro-batch reduces to per-key
    (n_changes, max-version struct) — the same order-agnostic max-struct as
    the batch operator — and lands it as a DELTA partition keyed by
    batch_id with dynamic partition overwrite, so a replayed batch rewrites
    ITS OWN partition to identical content instead of double-counting
    (foreachBatch may re-deliver a batch after a failure; an accumulate-
    in-place merge would not be idempotent). :func:`read_cdc_snapshot`
    compacts the deltas with ONE partial-aggregable groupBy and filters
    tombstoned keys. At scale the delta set is folded periodically with the
    same compaction writer the engine already ships
    (sources.compact_small_files); per-batch delta size is O(keys touched
    in the batch), never history size.

    Tombstones are RETAINED in the snapshot: a tombstone is its key's
    latest state and must win over earlier-version redeliveries; only the
    reader hides it.
    """

    def land(batch_df: DataFrame, batch_id: int) -> None:
        delta = (
            batch_df.groupBy("user_id")
            .agg(
                F.count(F.lit(1)).alias("n_changes"),
                F.max(
                    F.struct("ts", "event_id", "event_type", "value")
                ).alias("__last"),
            )
            .withColumn("__batch", F.lit(batch_id))
        )
        (
            # per-write dynamic overwrite (no session conf mutation — see
            # the snapshot writer above for why)
            delta.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("__batch")
            .parquet(snapshot_dir)
        )

    return (
        changes.writeStream.foreachBatch(land)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def read_cdc_snapshot(spark, snapshot_dir: str) -> DataFrame:
    """Compact the CDC delta partitions into the applied table: one
    map-side-combinable groupBy folds every batch's per-key aggregate
    (counts add; the max-version struct is associative), then tombstoned
    keys are hidden."""
    deltas = spark.read.parquet(snapshot_dir)
    agg = deltas.groupBy("user_id").agg(
        F.sum("n_changes").alias("n_changes"),
        F.max("__last").alias("__last"),
    )
    return agg.filter(F.col("__last.event_type") != "error").select(
        "user_id",
        F.col("__last.event_id").alias("last_event_id"),
        F.col("__last.event_type").alias("last_event_type"),
        F.col("__last.value").alias("last_value"),
        "n_changes",
    )
