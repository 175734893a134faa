"""Structured Streaming over the events table: watermarked windowed
aggregation and a custom stateful sessionizer.

Two engine-side streaming surfaces the batch analytics queries
(:mod:`ner_spark.plans.analytics` ``events_hourly`` /
``events_sessions``) get for free in a production landing zone:

- :func:`stream_events_hourly` — tumbling 1-hour counts with a
  watermark: late rows inside the lateness bound still land in their
  window; rows later than the bound are dropped; a window is emitted
  exactly once, when the watermark passes its end (append mode).
- :func:`stream_user_sessions` — gap-based sessionization as a custom
  stateful operator (``applyInPandasWithState``): the open session per
  user is the state; an event-time timeout (last event + gap) closes
  and emits it when the watermark passes.  This is the engine's
  template for stateful operators Spark lacks natively.

Both use the parquet file source/sink pair (exactly-once via the sink's
``_spark_metadata`` log + source checkpoint, same as
:mod:`ner_spark.streaming.ingest`).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

HOURLY_SCHEMA = ("hour string, event_type string, n_events long, "
                 "sum_value double")
SESSIONS_SCHEMA = ("user_id long, session_start timestamp, "
                   "session_end timestamp, n_events long")
_SESSION_STATE_SCHEMA = "start long, last long, n long"


def _event_stream(spark: SparkSession, input_dir: str, max_files: int):
    # file source needs an explicit schema: take it from the landed
    # parquet footers (one driver-side read, no data scan)
    schema = spark.read.parquet(input_dir).schema
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files)
        .parquet(input_dir)
        # event-time column: watermarks need TIMESTAMP (tz-aware); the
        # testdata ships TIMESTAMP_NTZ, cast under the UTC session tz
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )


def stream_events_hourly(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    lateness: str = "2 hours",
    max_files_per_trigger: int = 8,
    available_now: bool = True,
) -> StreamingQuery:
    """Tumbling 1-hour per-type aggregate with late-data handling.

    Append mode: a (window, event_type) row is written exactly once,
    after the watermark (max event time − ``lateness``) passes the
    window end — the streaming twin of ``analytics.events_hourly``.
    """
    agg = (
        _event_stream(spark, input_dir, max_files_per_trigger)
        .withWatermark("ts", lateness)
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count("*").alias("n_events"),
             F.sum("value").alias("sum_value"))
        .select(
            F.date_format("window.start", "yyyy-MM-dd HH").alias("hour"),
            "event_type", "n_events", "sum_value",
        )
    )
    writer = (
        agg.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_user_sessions(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    gap_minutes: int = 30,
    lateness: str = "0 seconds",
    max_files_per_trigger: int = 8,
    available_now: bool = True,
) -> StreamingQuery:
    """Gap-based sessionization via ``applyInPandasWithState``.

    State per user = the open session (start, last, count), all epoch
    seconds.  Within a micro-batch, gaps > ``gap_minutes`` close and
    emit sessions immediately; the trailing session stays in state with
    an event-time timeout at ``last + gap``, so it is emitted exactly
    once when the watermark passes it (or merged if more events
    arrive first).  Batch twin: ``analytics.events_sessions``.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap = gap_minutes * 60

    def sessionize(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        out: list[tuple[int, int, int, int]] = []  # (uid, start, last, n)

        if state.hasTimedOut:
            start, last, n = state.get
            out.append((user_id, start, last, n))
            state.remove()
        else:
            ts: list[int] = []
            for pdf in pdfs:
                ts.extend(
                    int(v) for v in
                    (pdf["ts"].astype("int64") // 1_000_000_000).tolist()
                )
            ts.sort()
            if state.exists:
                start, last, n = state.get
            else:
                start, last, n = ts[0], ts[0], 0
            # with lateness > 0 events may arrive out of order relative
            # to the open session — three cases per (sorted) event:
            # earlier than start-gap → a separate, already-closed
            # earlier session; inside [start-gap, last] → absorbed
            # (possibly extending start downward); after last → the
            # usual extend-or-split walk.
            pre = [t for t in ts if t < start - gap]
            if pre:
                p_start = p_last = pre[0]
                p_n = 0
                for t in pre:
                    if t - p_last > gap:
                        out.append((user_id, p_start, p_last, p_n))
                        p_start, p_n = t, 0
                    p_last = t
                    p_n += 1
                out.append((user_id, p_start, p_last, p_n))
            for t in ts[len(pre):]:
                if t <= last:
                    start = min(start, t)
                    n += 1
                elif t - last > gap:
                    out.append((user_id, start, last, n))
                    start, last, n = t, t, 1
                else:
                    last = t
                    n += 1
            state.update((start, last, n))
            state.setTimeoutTimestamp((last + gap) * 1000)

        if out:
            yield pd.DataFrame(
                {
                    "user_id": [r[0] for r in out],
                    "session_start": pd.to_datetime(
                        [r[1] for r in out], unit="s"),
                    "session_end": pd.to_datetime(
                        [r[2] for r in out], unit="s"),
                    "n_events": [r[3] for r in out],
                }
            )

    sessions = (
        _event_stream(spark, input_dir, max_files_per_trigger)
        .withWatermark("ts", lateness)
        .groupBy("user_id")
        .applyInPandasWithState(
            sessionize,
            outputStructType=SESSIONS_SCHEMA,
            stateStructType=_SESSION_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
    writer = (
        sessions.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
