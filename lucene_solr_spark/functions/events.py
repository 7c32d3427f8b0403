"""Event-stream analytics (batch profiles, shared with the gate).

The reference has no event-time semantics (soft-commit latency is its only
notion of time, SURVEY.md §2.11); these operators are the Spark-native
extensions a Common-Crawl-scale pipeline needs next to the index: tumbling
window aggregation (the facet.range analog over event time) and gap-based
sessionization. Streaming variants with watermarks/state live in
streaming/windows.py; these batch forms are their exact-equality oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def _norm_ts(events: DataFrame) -> DataFrame:
    # testdata timestamps are TIMESTAMP_NTZ; normalize (session tz is UTC)
    return events.withColumn("ts", F.col("ts").cast("timestamp"))


def tumbling_window_counts(events: DataFrame, minutes: int = 60) -> DataFrame:
    """Tumbling event-time windows: count + value sum per (window, type)."""
    events = _norm_ts(events)
    w = F.window("ts", f"{minutes} minutes")
    return (
        events.groupBy(w.alias("win"), "event_type")
        .agg(
            F.count("*").alias("cnt"),
            F.round(F.sum("value") * 1000).cast("long").alias("sum_milli"),
        )
        .select(
            F.col("win.start").cast("string").alias("win_start"),
            "event_type",
            "cnt",
            "sum_milli",
        )
        .orderBy("win_start", "event_type")
    )


def sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Gap-based sessionization per user: a new session starts when the gap
    to the previous event exceeds ``gap_minutes``. Output: per-user session
    count, event count, and total session span (seconds).

    Pure window-function plan (lag -> gap flag -> running session id), the
    batch-exact twin of the applyInPandasWithState streaming version.
    """
    events = _norm_ts(events)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w)
    new_sess = F.when(gap.isNull() | (gap > gap_minutes * 60), 1).otherwise(0)
    sess = (
        events.withColumn("new_sess", new_sess)
        .withColumn("sess_id", F.sum("new_sess").over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ))
    )
    per_session = sess.groupBy("user_id", "sess_id").agg(
        F.count("*").alias("n_events"),
        (F.max(F.col("ts").cast("long")) - F.min(F.col("ts").cast("long"))).alias("span_s"),
    )
    return (
        per_session.groupBy("user_id")
        .agg(
            F.count("*").alias("n_sessions"),
            F.sum("n_events").alias("n_events"),
            F.sum("span_s").alias("total_span_s"),
        )
        .orderBy("user_id")
    )


def running_value_sum(events: DataFrame, k: int = 50) -> DataFrame:
    """Running per-user cumulative value (deterministic frame order)."""
    events = _norm_ts(events)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return (
        events.select(
            "event_id",
            "user_id",
            F.round(F.sum("value").over(w) * 1000).cast("long").alias("running_milli"),
        )
        .orderBy("event_id")
        .limit(k)
    )
