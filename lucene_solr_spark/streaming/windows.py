"""Structured-Streaming operators: watermarked tumbling windows and a
custom stateful sessionizer.

The batch twins in functions/events.py define the exact expected output
(tests assert equality after an availableNow run drains the source).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def streaming_tumbling_counts(
    stream: DataFrame, minutes: int = 60, watermark: str = "2 hours"
) -> DataFrame:
    """Watermarked tumbling-window counts: late events beyond the watermark
    are dropped; with availableNow over a static source the result equals
    the batch tumbling_window_counts."""
    w = F.window("ts", f"{minutes} minutes")
    stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(w.alias("win"), "event_type")
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
    )


_SESSION_SCHEMA = (
    "user_id long, n_sessions long, n_events long, total_span_s long"
)
_STATE_SCHEMA = "n_sessions long, n_events long, total_span_s long, last_ts long, sess_start long"


def stateful_sessionize(stream: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Custom stateful operator via applyInPandasWithState: per-user
    gap-based sessions accumulated across micro-batches (the
    UpdateLog/soft-commit-era state machinery restated as managed
    streaming state)."""
    gap_s = gap_minutes * 60
    stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))

    def update(key, pdfs, state: GroupState):
        if state.exists:
            n_sessions, n_events, total_span, last_ts, sess_start = state.get
        else:
            n_sessions = n_events = total_span = 0
            last_ts = sess_start = None
        chunks = [pdf for pdf in pdfs]
        if chunks:
            pdf = pd.concat(chunks, ignore_index=True).sort_values(["ts", "event_id"])
            for ts in pdf["ts"].astype("int64") // 10**9:
                ts = int(ts)
                if last_ts is None or ts - last_ts > gap_s:
                    if last_ts is not None:
                        total_span += last_ts - sess_start
                    n_sessions += 1
                    sess_start = ts
                last_ts = ts
                n_events += 1
        # close the running session for reporting (state keeps it open)
        report_span = total_span + ((last_ts - sess_start) if last_ts is not None else 0)
        state.update((n_sessions, n_events, total_span, last_ts, sess_start))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_sessions": [n_sessions],
                "n_events": [n_events],
                "total_span_s": [report_span],
            }
        )

    return stream.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=_SESSION_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
