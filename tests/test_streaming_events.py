"""Watermarked windowed aggregation + stateful sessionization over a
streaming events landing zone (append-mode exactly-once semantics)."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from ner_spark.streaming.events import (  # noqa: E402
    stream_events_hourly,
    stream_user_sessions,
)

EVENTS_DDL = "ts timestamp, user_id long, event_type string, value double"


def _land(spark, in_dir, rows):
    df = spark.createDataFrame(rows, EVENTS_DDL)
    df.coalesce(1).write.mode("append").parquet(in_dir)


def _drain(fn, spark, tmp, name):
    q = fn(spark, f"{tmp}/in_{name}", f"{tmp}/out_{name}", f"{tmp}/ckpt_{name}")
    q.awaitTermination(120)


def test_hourly_window_with_late_data(spark, tmp_path):
    import datetime as dt

    tmp = str(tmp_path)
    t = lambda h, m: dt.datetime(2024, 1, 1, h, m)  # noqa: E731

    # batch 1: two events in the 10:00 window, one in 11:00
    _land(spark, f"{tmp}/in_h", [
        (t(10, 5), 1, "a", 1.0),
        (t(10, 20), 1, "a", 2.0),
        (t(11, 10), 2, "a", 4.0),
    ])
    _drain(stream_events_hourly, spark, tmp, "h")
    # watermark 09:10 — nothing finalized yet

    # batch 2: a LATE event for the 10:00 window (within the 2h bound,
    # so it still counts) plus an event at 14:00 that advances the
    # watermark to 12:00, finalizing the 10:00 and 11:00 windows
    _land(spark, f"{tmp}/in_h", [
        (t(10, 40), 3, "a", 8.0),
        (t(14, 0), 1, "a", 16.0),
    ])
    _drain(stream_events_hourly, spark, tmp, "h")

    got = {
        (r.hour, r.event_type): (r.n_events, r.sum_value)
        for r in spark.read.parquet(f"{tmp}/out_h").collect()
    }
    assert got == {
        ("2024-01-01 10", "a"): (3, 11.0),  # late 10:40 row included
        ("2024-01-01 11", "a"): (1, 4.0),
    }


def test_stateful_sessionization(spark, tmp_path):
    import datetime as dt

    tmp = str(tmp_path)
    t = lambda h, m: dt.datetime(2024, 1, 1, h, m)  # noqa: E731

    # run 1: open sessions for users 1 and 2
    _land(spark, f"{tmp}/in_s", [
        (t(10, 0), 1, "x", 0.0),
        (t(10, 10), 1, "x", 0.0),
        (t(10, 0), 2, "x", 0.0),
    ])
    _drain(stream_user_sessions, spark, tmp, "s")

    # run 2: user 1 returns after > 30 min → first session closes
    # in-batch; watermark advances to 12:00
    _land(spark, f"{tmp}/in_s", [(t(12, 0), 1, "x", 0.0)])
    _drain(stream_user_sessions, spark, tmp, "s")

    # run 3: watermark (12:00) has passed user 2's timeout (10:30) →
    # the event-time timeout emits their session
    _land(spark, f"{tmp}/in_s", [(t(15, 0), 3, "x", 0.0)])
    _drain(stream_user_sessions, spark, tmp, "s")

    # run 4: watermark (15:00) has passed user 1's second timeout
    # (12:30) → that session emits too; user 3's stays open
    _land(spark, f"{tmp}/in_s", [(t(15, 5), 3, "x", 0.0)])
    _drain(stream_user_sessions, spark, tmp, "s")

    got = {
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in spark.read.parquet(f"{tmp}/out_s").collect()
    }
    assert got == {
        (1, t(10, 0), t(10, 10), 2),
        (2, t(10, 0), t(10, 0), 1),
        (1, t(12, 0), t(12, 0), 1),
    }


def test_sessionization_absorbs_late_events(spark, tmp_path):
    """With a lateness bound, an out-of-order event inside the open
    session's span must be absorbed (counted, start extended) — not
    regress the session end or split it."""
    import datetime as dt
    from functools import partial

    from ner_spark.streaming.events import stream_user_sessions

    fn = partial(stream_user_sessions, lateness="2 hours")
    tmp = str(tmp_path)
    t = lambda h, m: dt.datetime(2024, 1, 1, h, m)  # noqa: E731

    _land(spark, f"{tmp}/in_l", [
        (t(10, 0), 1, "x", 0.0),
        (t(10, 20), 1, "x", 0.0),
    ])
    _drain(fn, spark, tmp, "l")
    # late arrivals: one inside the open session's span, one slightly
    # before its start but within the gap (start extends downward)
    _land(spark, f"{tmp}/in_l", [
        (t(10, 10), 1, "x", 0.0),
        (t(9, 50), 1, "x", 0.0),
    ])
    _drain(fn, spark, tmp, "l")
    # close the session by a > gap jump, then advance the watermark far
    # enough (lateness 2h + gap) for the event-time timeout to fire
    _land(spark, f"{tmp}/in_l", [(t(14, 0), 1, "x", 0.0)])
    _drain(fn, spark, tmp, "l")
    _land(spark, f"{tmp}/in_l", [(t(20, 0), 2, "x", 0.0)])
    _drain(fn, spark, tmp, "l")

    got = {
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in spark.read.parquet(f"{tmp}/out_l").collect()
    }
    assert (1, t(9, 50), t(10, 20), 4) in got


def test_cross_batch_late_events_merge(spark, tmp_path):
    """Two late events within gap of each other, arriving in DIFFERENT
    micro-batches and both earlier than the open session's start-gap,
    must still merge into one session (the batch twin's semantics) —
    not emit as two singleton rows."""
    import datetime as dt
    from functools import partial

    from ner_spark.streaming.events import stream_user_sessions

    fn = partial(stream_user_sessions, lateness="2 hours")
    tmp = str(tmp_path)
    t = lambda h, m: dt.datetime(2024, 1, 1, h, m)  # noqa: E731

    # open session at 12:00 (watermark after this run: 10:00)
    _land(spark, f"{tmp}/in_x", [(t(12, 0), 1, "x", 0.0)])
    _drain(fn, spark, tmp, "x")
    # two late events < start-gap (11:30), in separate batches, 20min
    # apart (≤ gap) — the old single-session state emitted each
    # immediately as its own closed "pre" session
    _land(spark, f"{tmp}/in_x", [(t(10, 30), 1, "x", 0.0)])
    _drain(fn, spark, tmp, "x")
    _land(spark, f"{tmp}/in_x", [(t(10, 50), 1, "x", 0.0)])
    _drain(fn, spark, tmp, "x")
    # advance the watermark past 10:50 + gap (11:20): 14:00 − 2h = 12:00
    _land(spark, f"{tmp}/in_x", [(t(14, 0), 1, "x", 0.0)])
    _drain(fn, spark, tmp, "x")
    # one more batch so the event-time timeout runs under wm 12:00
    _land(spark, f"{tmp}/in_x", [(t(20, 0), 2, "x", 0.0)])
    _drain(fn, spark, tmp, "x")

    got = {
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in spark.read.parquet(f"{tmp}/out_x").collect()
    }
    assert (1, t(10, 30), t(10, 50), 2) in got
    assert (1, t(10, 30), t(10, 30), 1) not in got
    assert (1, t(10, 50), t(10, 50), 1) not in got


def test_sessionizer_randomized_differential(spark, tmp_path):
    """Property test: for a random event set arriving in random order
    across random micro-batch splits, the streaming sessionizer (with a
    lateness bound covering all the disorder) must emit exactly the
    sessions of the batch transitive gap rule — same starts, ends and
    event counts, no session split or double-emitted by the cross-batch
    state merge."""
    import datetime as dt
    import random
    from functools import partial

    from ner_spark.streaming.events import stream_user_sessions

    rng = random.Random(20260817)
    base = dt.datetime(2024, 1, 1)
    gap_min = 30

    events = []
    for user in (1, 2, 3, 4):
        for _ in range(rng.randint(10, 30)):
            # minute-granularity over 12h: dense enough to force merges,
            # sparse enough to force multiple sessions per user
            events.append(
                (base + dt.timedelta(minutes=rng.randint(0, 720)),
                 user, "x", 0.0)
            )

    # independent reference model: per-user sort + interval gap-merge
    # (the transitive rule the batch lag-window query implements)
    expected = set()
    for user in (1, 2, 3, 4):
        ts = sorted(t for t, u, _, _ in events if u == user)
        sessions = []
        for t in ts:
            if sessions and (t - sessions[-1][1]) <= dt.timedelta(
                    minutes=gap_min):
                s, _, n = sessions[-1]
                sessions[-1] = (s, t, n + 1)
            else:
                sessions.append((t, t, 1))
        expected |= {(user, s, e, n) for s, e, n in sessions}

    # arrival order is unrelated to event time; random micro-batches
    rng.shuffle(events)
    cuts = sorted(rng.sample(range(1, len(events)), 4))
    batches = [events[a:b]
               for a, b in zip([0] + cuts, cuts + [len(events)])]

    # lateness covers the full 12h disorder window → nothing dropped,
    # so streaming must equal batch exactly
    fn = partial(stream_user_sessions, gap_minutes=gap_min,
                 lateness="26 hours")
    for batch in batches:
        _land(spark, f"{tmp_path}/in_r", batch)
        _drain(fn, spark, str(tmp_path), "r")

    # sentinel user advances the watermark past every real session's
    # seal point (base+3d − 26h ≫ base+12h+gap); second sentinel batch
    # runs the event-time timeouts under that watermark
    _land(spark, f"{tmp_path}/in_r",
          [(base + dt.timedelta(days=3), 99, "x", 0.0)])
    _drain(fn, spark, str(tmp_path), "r")
    _land(spark, f"{tmp_path}/in_r",
          [(base + dt.timedelta(days=3, hours=1), 99, "x", 0.0)])
    _drain(fn, spark, str(tmp_path), "r")

    got = {
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in spark.read.parquet(f"{tmp_path}/out_r").collect()
        if r.user_id != 99
    }
    assert got == expected
