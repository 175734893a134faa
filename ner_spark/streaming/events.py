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
# per-user state: ALL sessions the watermark has not yet sealed,
# column-wise (starts[i], lasts[i], ns[i]) sorted by start.
# State-schema v2 (arrays; v1 held one scalar session) — Spark's state
# store rejects a scalar->array change, so a checkpointLocation written
# by the v1 build cannot be resumed by this one: restart the query with
# a fresh checkpoint dir (unsealed v1 sessions are re-derived from the
# replayed file source, which this exactly-once source/sink pair keeps).
_SESSION_STATE_SCHEMA = ("starts array<long>, lasts array<long>, "
                         "ns array<long>")


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

    State per user = EVERY session the watermark has not yet sealed
    (column-wise arrays of (start, last, n), epoch seconds) — not just
    the open one.  Each invocation interval-merges the stored sessions
    with the batch's events (events are singleton intervals; intervals
    whose boundary gap is ≤ ``gap_minutes`` coalesce), which is exactly
    the batch twin's transitive gap rule — so a late event arriving in
    a later micro-batch can still extend, bridge, or be absorbed by any
    unsealed session.  A session is emitted exactly once, when the
    watermark passes ``last + gap`` (it is then immutable: every
    not-yet-dropped future event starts a new session); the event-time
    timeout re-fires this seal check when no new events arrive.
    Batch twin: ``analytics.events_sessions``.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap = gap_minutes * 60

    def sessionize(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        wm_s = state.getCurrentWatermarkMs() // 1000

        if state.hasTimedOut:
            starts, lasts, ns = state.get
            sessions = [tuple(map(int, s)) for s in zip(starts, lasts, ns)]
        else:
            ts: list[int] = []
            for pdf in pdfs:
                ts.extend(
                    int(v) for v in
                    (pdf["ts"].astype("int64") // 1_000_000_000).tolist()
                )
            stored = []
            if state.exists:
                starts, lasts, ns = state.get
                stored = [tuple(map(int, s)) for s in zip(starts, lasts, ns)]
            sessions = []
            for s in sorted(stored + [(t, t, 1) for t in ts]):
                if sessions and s[0] - sessions[-1][1] <= gap:
                    p = sessions[-1]
                    sessions[-1] = (p[0], max(p[1], s[1]), p[2] + s[2])
                else:
                    sessions.append(s)

        # seal: watermark past last+gap ⇒ no remaining event can join
        # (rows at exactly last+gap still pass the watermark filter and
        # would extend, hence the strict <)
        out = [(user_id, s, e, n) for s, e, n in sessions if e + gap < wm_s]
        keep = [x for x in sessions if x[1] + gap >= wm_s]
        if keep:
            state.update((
                [x[0] for x in keep],
                [x[1] for x in keep],
                [x[2] for x in keep],
            ))
            # +1s: the seal is strict, and setTimeoutTimestamp must be
            # strictly beyond the current watermark
            state.setTimeoutTimestamp((min(x[1] for x in keep) + gap) * 1000 + 1000)
        elif state.exists:
            state.remove()

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
