"""Structured-Streaming execution of the extraction pipeline.

The reference is strictly batch per workbook (SURVEY.md §2.10); our
streaming form runs the SAME fused extraction transform over an
incrementally-discovered source with ``Trigger.AvailableNow`` — the
Iceberg-incremental-read pattern: each trigger drains all files not yet
recorded in the stream checkpoint, so a crawl that keeps landing new
page files is processed exactly once per file with no recomputation
(complementing the bucket-level ``ExtractionJob`` resume).

Extraction is stateless per row, so no watermarks/state stores are
needed; late data is N/A under snapshot/file semantics.

``stream_sessionize`` adds the CUSTOM STATEFUL operator form
(``applyInPandasWithState``): gap-based sessionization whose per-user
state (last event time, session count) survives across micro-batches —
the streaming twin of the batch ``events_sessions`` query, and the
pattern any bespoke stateful operator on this engine follows (Arrow
batches in/out; state is a small typed tuple, never per-row Python).
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from exstruct_spark.config import ExtractOptions
from exstruct_spark.engine import extract_stage
from exstruct_spark.pages import PAGES_SCHEMA_DDL

EVENTS_SCHEMA_DDL = (
    "event_id bigint, user_id bigint, event_type string, "
    "ts timestamp, value double"
)

SESSION_OUTPUT_DDL = "user_id bigint, n_sessions bigint, n_events bigint"
SESSION_STATE_DDL = "last_ts_us bigint, n_sessions bigint, n_events bigint"


def stream_windowed_counts(
    spark: SparkSession,
    events_dir: str,
    input_schema,
    window_duration: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked event-time tumbling-window aggregation — the built-in
    late-data form (vs ``stream_sessionize``'s custom-state form): counts
    + exact-decimal value sums per (window, event_type).  The watermark
    bounds state: windows older than max(event_time) - watermark are
    finalized and dropped from the store, so state size is O(active
    windows), not O(history) — the property that keeps this runnable
    against an unbounded crawl-event stream.  Returns an unstarted
    streaming DataFrame.
    """
    events = spark.readStream.schema(input_schema).parquet(events_dir)
    # testdata timestamps read as TIMESTAMP_NTZ; watermarks require an
    # instant-typed event-time column (session TZ is pinned to UTC, so
    # the cast is deterministic)
    events = events.withColumn("ts", F.col("ts").cast("timestamp"))
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window_duration), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum(F.col("value").cast("decimal(27,2)")), 2)
            .cast("double")
            .alias("sum_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def stream_sessionize(
    spark: SparkSession,
    events_dir: str,
    gap_minutes: int = 30,
    input_schema: str = EVENTS_SCHEMA_DDL,
) -> DataFrame:
    """Streaming gap-sessionization: returns an UNSTARTED streaming
    DataFrame of running per-user (n_sessions, n_events) counts.

    Semantics: a new session starts when the gap to the previous event
    exceeds ``gap_minutes`` (strict >, integer microseconds — the same
    tie-free arithmetic the batch/oracle pair uses).  State per user is a
    3-tuple; each micro-batch sorts its own slice by (ts, event_id) and
    folds it into the state, so a user's history never needs re-reading.

    Ordering contract: results equal the batch ``events_sessions`` query
    when each user's events arrive in event-time order ACROSS micro-
    batches (the append-only event-log case; within a batch any order is
    fine — the batch is sorted here).  A LATE event (ts <= the state's
    last seen time) cannot be re-sequenced without buffering the user's
    history, so it is merged into the current session deterministically:
    it increments n_events, never opens a session, and never moves
    last_ts backwards (monotonic state).  True late-data re-sequencing
    belongs to a watermark + event-time window formulation instead.
    """
    import pandas as pd  # noqa: F401 (executor-side)
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_us = gap_minutes * 60 * 1_000_000

    def fn(key, pdfs: Iterator, state: GroupState) -> Iterator:
        import pandas as pd

        last_ts, n_sessions, n_events = (
            state.get if state.exists else (None, 0, 0)
        )
        batch = pd.concat(list(pdfs))
        batch = batch.sort_values(["ts", "event_id"])
        for ts in batch["ts"]:
            t_us = ts.value // 1000  # pandas ns -> us
            if last_ts is None or t_us - last_ts > gap_us:
                n_sessions += 1
            # monotonic: a late event joins the current session and must
            # not drag last_ts backwards (see ordering contract above)
            last_ts = t_us if last_ts is None else max(last_ts, t_us)
            n_events += 1
        state.update((last_ts, int(n_sessions), int(n_events)))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_sessions": [int(n_sessions)],
                "n_events": [int(n_events)],
            }
        )

    events = spark.readStream.schema(input_schema).parquet(events_dir)
    return events.groupBy("user_id").applyInPandasWithState(
        fn,
        SESSION_OUTPUT_DDL,
        SESSION_STATE_DDL,
        "update",
        GroupStateTimeout.NoTimeout,
    )


def stream_extract_available_now(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    opts: ExtractOptions = ExtractOptions(),
    input_schema: str = PAGES_SCHEMA_DDL,
) -> None:
    """Drain all currently-available page files through the extraction
    stage, exactly once per file, then stop.  Blocking."""
    pages = (
        spark.readStream.schema(input_schema).parquet(input_dir)
    )
    extracted = extract_stage(pages, opts)
    q = (
        extracted.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def stream_media_meta_available_now(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    mode: str = "fake",
    feature_dim: int = 8,
    input_schema: str = "url string, blob binary",
) -> None:
    """Streaming twin of the multimodal metadata stage: drain all
    currently-available blob files through ``media_meta_stage``
    (mapInPandas over Arrow batches — stateless per row, so the same
    exactly-once-per-file AvailableNow semantics as extraction apply),
    then stop.  Blocking.

    This makes the media path's ingestion shape identical to the text
    path's: landed binary files -> incremental drain -> typed metadata +
    feature columns, ready for the bucketed similarity operators."""
    from exstruct_spark.media import media_meta_stage

    blobs = spark.readStream.schema(input_schema).parquet(input_dir)
    meta = media_meta_stage(blobs, mode=mode, feature_dim=feature_dim)
    q = (
        meta.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
