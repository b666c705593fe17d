"""Custom stateful streaming operator: gap sessionization across
micro-batches with applyInPandasWithState + event-time timeout."""

import datetime as dt

import pytest

from image_pdf_ocr_suite_spark.streaming.sessionize import sessionize_stream

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _write(spark, path, rows):
    spark.createDataFrame(rows, "user_id long, ts timestamp") \
        .coalesce(1).write.mode("append").parquet(path)


def test_sessions_close_across_batches(spark, tmp_path):
    input_dir = str(tmp_path / "in")
    ckpt = str(tmp_path / "ckpt")
    m = dt.timedelta(minutes=1)
    # burst 1: 3 events within 10 min; burst 2: 2 events an hour later
    _write(spark, input_dir, [(1, T0), (1, T0 + 5 * m), (1, T0 + 10 * m),
                              (1, T0 + 70 * m), (1, T0 + 75 * m)])
    # two more files -> later batches that advance the watermark and fire
    # the event-time timeout for user 1's open session
    _write(spark, input_dir, [(2, T0 + dt.timedelta(hours=5))])
    _write(spark, input_dir, [(3, T0 + dt.timedelta(hours=6))])

    stream = (spark.readStream.schema("user_id long, ts timestamp")
              .option("maxFilesPerTrigger", "1").parquet(input_dir))
    q = (sessionize_stream(stream, gap_minutes=30, watermark="1 hour")
         .writeStream.format("memory").queryName("sessions")
         .outputMode("append").trigger(availableNow=True)
         .option("checkpointLocation", ckpt).start())
    q.awaitTermination(180)

    rows = spark.sql("select * from sessions").collect()
    u1 = sorted([(r["session_start"], r["session_end"], r["n_events"])
                 for r in rows if r["user_id"] == 1])
    assert u1 == [
        (T0, T0 + 10 * m, 3),                       # burst 1: closed by gap
        (T0 + 70 * m, T0 + 75 * m, 2),              # burst 2: closed by timeout
    ]
    # users 2/3's sessions are still open (watermark never passed them)
    assert not [r for r in rows if r["user_id"] in (2, 3)]


def test_out_of_order_merge_keeps_session_bounds(spark, tmp_path):
    """An out-of-order event (within the watermark) earlier than the stored
    session boundary must not move session_end backwards: merging uses
    last=max(last,t), start=min(start,t)."""
    input_dir = str(tmp_path / "in")
    ckpt = str(tmp_path / "ckpt")
    m = dt.timedelta(minutes=1)
    # batch 1: events at T0 and T0+10m; batch 2: LATE event at T0+5m
    _write(spark, input_dir, [(1, T0), (1, T0 + 10 * m)])
    _write(spark, input_dir, [(1, T0 + 5 * m)])
    # later batches advance the watermark so user 1's session times out
    _write(spark, input_dir, [(2, T0 + dt.timedelta(hours=5))])
    _write(spark, input_dir, [(3, T0 + dt.timedelta(hours=6))])

    stream = (spark.readStream.schema("user_id long, ts timestamp")
              .option("maxFilesPerTrigger", "1").parquet(input_dir))
    q = (sessionize_stream(stream, gap_minutes=30, watermark="1 hour")
         .writeStream.format("memory").queryName("sessions_ooo")
         .outputMode("append").trigger(availableNow=True)
         .option("checkpointLocation", ckpt).start())
    q.awaitTermination(180)

    rows = spark.sql("select * from sessions_ooo").collect()
    u1 = [(r["session_start"], r["session_end"], r["n_events"])
          for r in rows if r["user_id"] == 1]
    # one session spanning [T0, T0+10m] with all 3 events — session_end
    # stays at the latest event even though the last arrival was earlier
    assert u1 == [(T0, T0 + 10 * m, 3)]


def test_late_event_beyond_gap_forms_own_session(spark, tmp_path):
    """A late event more than gap_minutes BEFORE the stored session start
    must become its own (closed) session — the split batch sessionization
    produces — not be merged into the newer session."""
    input_dir = str(tmp_path / "in")
    ckpt = str(tmp_path / "ckpt")
    m = dt.timedelta(minutes=1)
    _write(spark, input_dir, [(1, T0 + 60 * m)])       # session at 11:00
    _write(spark, input_dir, [(1, T0 + 5 * m)])        # late event at 10:05
    _write(spark, input_dir, [(2, T0 + dt.timedelta(hours=6))])
    _write(spark, input_dir, [(3, T0 + dt.timedelta(hours=7))])

    stream = (spark.readStream.schema("user_id long, ts timestamp")
              .option("maxFilesPerTrigger", "1").parquet(input_dir))
    q = (sessionize_stream(stream, gap_minutes=30, watermark="2 hours")
         .writeStream.format("memory").queryName("sessions_lategap")
         .outputMode("append").trigger(availableNow=True)
         .option("checkpointLocation", ckpt).start())
    q.awaitTermination(180)

    rows = spark.sql("select * from sessions_lategap").collect()
    u1 = sorted([(r["session_start"], r["session_end"], r["n_events"])
                 for r in rows if r["user_id"] == 1])
    assert u1 == [
        (T0 + 5 * m, T0 + 5 * m, 1),        # late event: own closed session
        (T0 + 60 * m, T0 + 60 * m, 1),      # original session, by timeout
    ]


def _batch_sessions(events, gap_us):
    """Ground truth: sort ALL events per user, gap-split — the batch
    semantics the streaming operator must reproduce for closed sessions."""
    from collections import defaultdict
    per_user = defaultdict(list)
    for uid, ts in events:
        per_user[uid].append(int(ts.timestamp() * 1_000_000))
    out = {}
    for uid, us in per_user.items():
        us.sort()
        sessions, start, last, n = [], us[0], us[0], 1
        for t in us[1:]:
            if t - last > gap_us:
                sessions.append((start, last, n))
                start, last, n = t, t, 1
            else:
                last, n = t, n + 1
        sessions.append((start, last, n))
        out[uid] = sessions
    return out


def test_streaming_matches_batch_on_random_streams(spark, tmp_path):
    """Seeded random event streams with bounded disorder (< watermark):
    every CLOSED streaming session must equal the batch ground truth."""
    import random

    rng = random.Random(1234)
    gap_min, watermark_min = 30, 120
    events = []
    t = T0
    for uid in (1, 2, 3):
        t = T0
        for _burst in range(rng.randint(2, 4)):
            # burst of events within the gap
            for _ in range(rng.randint(1, 5)):
                t += dt.timedelta(minutes=rng.randint(0, gap_min - 1))
                events.append((uid, t))
            # then a gap that closes the session
            t += dt.timedelta(minutes=gap_min + rng.randint(1, 60))
    # shuffle within a bounded window: reorder adjacent events only
    # (disorder stays far below the 2h watermark)
    events.sort(key=lambda e: e[1])
    for i in range(0, len(events) - 1, 2):
        if rng.random() < 0.5:
            events[i], events[i + 1] = events[i + 1], events[i]
    # sentinel user far in the future forces every real session to time out
    closer = [(99, max(e[1] for e in events) + dt.timedelta(hours=12))]

    input_dir = str(tmp_path / "in")
    ckpt = str(tmp_path / "ckpt")
    chunk = max(1, len(events) // 5)
    for i in range(0, len(events), chunk):
        _write(spark, input_dir, events[i:i + chunk])
    _write(spark, input_dir, closer)
    _write(spark, input_dir, [(98, closer[0][1] + dt.timedelta(hours=1))])

    stream = (spark.readStream.schema("user_id long, ts timestamp")
              .option("maxFilesPerTrigger", "1").parquet(input_dir))
    q = (sessionize_stream(stream, gap_minutes=gap_min,
                           watermark=f"{watermark_min} minutes")
         .writeStream.format("memory").queryName("sessions_rand")
         .outputMode("append").trigger(availableNow=True)
         .option("checkpointLocation", ckpt).start())
    q.awaitTermination(300)

    got = {}
    for r in spark.sql("select * from sessions_rand").collect():
        got.setdefault(r["user_id"], []).append(
            (int(r["session_start"].timestamp() * 1_000_000),
             int(r["session_end"].timestamp() * 1_000_000),
             r["n_events"]))
    expected = _batch_sessions(events, gap_min * 60 * 1_000_000)
    for uid in (1, 2, 3):
        assert sorted(got.get(uid, [])) == sorted(expected[uid]), uid
