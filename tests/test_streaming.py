"""Streaming-vs-batch reconciliation (SURVEY.md §5.2.5): replayed
streaming results must equal their batch twins.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from nipd_spark.catalog import load
from nipd_spark.streaming.harness import events_stream, run_to_completion


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_stream_tumbling_equals_batch(spark, sf_dir):
    from nipd_spark.queries.streaming_live import t4_stream_tumbling_watermark
    from nipd_spark.queries.streaming_twins import t1_tumbling_hourly

    cols = ["window_start", "event_type", "n", "total_value"]
    assert _rows(t4_stream_tumbling_watermark(spark, sf_dir), cols) == _rows(
        t1_tumbling_hourly(spark, sf_dir), cols
    )


def test_stream_dedup_equals_batch_counts(spark, sf_dir):
    from nipd_spark.queries.streaming_live import t5_stream_dedup

    batch = {
        (r.event_type, r.n)
        for r in load(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    stream = {(r.event_type, r.n) for r in t5_stream_dedup(spark, sf_dir).collect()}
    assert stream == batch


def test_stream_sessions_match_batch_sessionization(spark, sf_dir):
    """session_window (streaming) and lag-gap-cumsum (batch) must carve
    identical sessions: same count, same per-session event totals."""
    from nipd_spark.queries.streaming_live import t7_stream_session_window
    from nipd_spark.queries.streaming_twins import t3_session_window

    live = t7_stream_session_window(spark, sf_dir).collect()
    batch = t3_session_window(spark, sf_dir).collect()
    assert len(live) == len(batch)
    live_set = sorted((r.user_id, r.session_start, r.n_events) for r in live)
    batch_set = sorted((r.user_id, r.session_start, r.n_events) for r in batch)
    assert live_set == batch_set


def test_stateful_tracker_equals_batch_agg(spark, sf_dir):
    from nipd_spark.queries.streaming_live import t8_stateful_user_tracker

    got = _rows(
        t8_stateful_user_tracker(spark, sf_dir),
        ["user_id", "n_seen", "max_value", "n_purchase"],
    )
    want = _rows(
        load(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_seen"),
            F.max("value").alias("max_value"),
            F.count_if(F.col("event_type") == "purchase").alias("n_purchase"),
        ),
        ["user_id", "n_seen", "max_value", "n_purchase"],
    )
    assert got == want


def test_append_mode_emits_only_closed_windows(spark, sf_dir):
    """Watermark semantics: append mode emits a subset of complete mode
    (open windows are withheld until the watermark passes them)."""
    agg = (
        events_stream(spark, sf_dir)
        .withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour"))
        .agg(F.count("*").alias("n"))
        .select(F.col("window.start").alias("ws"), "n")
    )
    appended = {(r.ws, r.n) for r in run_to_completion(agg, "append").collect()}
    complete = {
        (r.ws, r.n)
        for r in run_to_completion(
            events_stream(spark, sf_dir)
            .withWatermark("ts", "10 minutes")
            .groupBy(F.window("ts", "1 hour"))
            .agg(F.count("*").alias("n"))
            .select(F.col("window.start").alias("ws"), "n"),
            "complete",
        ).collect()
    }
    assert appended <= complete
    assert len(complete) - len(appended) <= 2  # at most the tail window(s) open


def test_stream_stream_join_equals_batch_selfjoin(spark, sf_dir):
    """Every (click, purchase ≤1h later, same user) pair emitted by the
    watermarked stream-stream join must equal the batch self-join twin."""
    from nipd_spark.queries.streaming_live import t7b_stream_stream_join

    got = {
        (r.click_id, r.purchase_id)
        for r in t7b_stream_stream_join(spark, sf_dir).collect()
    }
    ev = load(spark, sf_dir, "events")
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("cu"), F.col("ts").alias("cts"),
        F.col("event_id").alias("cid"),
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("pu"), F.col("ts").alias("pts"),
        F.col("event_id").alias("pid"),
    )
    want = {
        (r.cid, r.pid)
        for r in c.join(
            p,
            (F.col("cu") == F.col("pu"))
            & (F.col("pts") >= F.col("cts"))
            & (F.col("pts") <= F.col("cts") + F.expr("INTERVAL 1 HOUR")),
        ).collect()
    }
    assert got == want
    assert len(want) > 0
