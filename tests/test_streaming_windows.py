"""Streaming tumbling windows + stateful sessionization: availableNow run
over a static source must equal the batch twins exactly."""

import os
import shutil

import pandas as pd
import pytest

from tests.conftest import CACHE


@pytest.fixture(scope="module")
def events_stream_src(spark):
    import glob

    src = os.path.join(CACHE, "events_stream_src")
    shutil.rmtree(src, ignore_errors=True)
    os.makedirs(src)
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    cutoff = ev.approxQuantile("event_id", [0.5], 0.0)[0]
    # write via Spark so the parquet timestamp annotation matches the schema
    for i, half in enumerate(
        [ev.where(ev.event_id <= cutoff), ev.where(ev.event_id > cutoff)]
    ):
        tmp = os.path.join(CACHE, f"events_stream_tmp{i}")
        shutil.rmtree(tmp, ignore_errors=True)
        half.coalesce(1).write.parquet(tmp)
        part = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
        shutil.copy(part, os.path.join(src, f"p{i}.parquet"))
    return src, ev.schema


def _drain(spark, df, name):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete" if name == "tumble" else "update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.table(name).toPandas()


def test_streaming_tumbling_equals_batch(spark, events_stream_src):
    from lucene_solr_spark.functions.events import tumbling_window_counts
    from lucene_solr_spark.streaming.windows import streaming_tumbling_counts

    src, schema = events_stream_src
    stream = spark.readStream.schema(schema).parquet(src)
    got = _drain(spark, streaming_tumbling_counts(stream, 60), "tumble")
    got = got.sort_values(["win_start", "event_type"]).reset_index(drop=True)
    exp = (
        tumbling_window_counts(
            spark.read.parquet("/root/testdata/sf0.001/events.parquet"), 60
        )
        .toPandas()
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_stateful_sessionize_equals_batch(spark, events_stream_src):
    from lucene_solr_spark.functions.events import sessionize
    from lucene_solr_spark.streaming.windows import stateful_sessionize

    src, schema = events_stream_src
    stream = spark.readStream.schema(schema).parquet(src)
    got = _drain(spark, stateful_sessionize(stream, 30), "sessionize")
    # update mode emits one row per user per batch touching it: keep last
    got = got.groupby("user_id").last().reset_index()
    got = got.sort_values("user_id").reset_index(drop=True)
    exp = (
        sessionize(spark.read.parquet("/root/testdata/sf0.001/events.parquet"), 30)
        .toPandas()
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
