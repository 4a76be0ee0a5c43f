"""Structured Streaming tests: the streaming window agg must equal the
batch twin (one correctness definition), and the stateful sessionizer
must match the batch lag+cumsum sessionization."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from dask_recommender_system_spark.data import load_table
from dask_recommender_system_spark.registry import REGISTRY, load_all_operators
from dask_recommender_system_spark.streaming.stateful import apply_sessionization
from dask_recommender_system_spark.streaming.windows import read_events_stream

load_all_operators()


def test_stream_matches_batch_tumbling(spark, sf_dir):
    batch = {
        (r["window_start"], r["event_type"]): (r["n"], r["sum_value"])
        for r in REGISTRY["window_events_tumbling"].fn(spark, sf_dir).collect()
    }
    stream = {
        (r["window_start"], r["event_type"]): (r["n"], r["sum_value"])
        for r in REGISTRY["stream_window_tumbling"].fn(spark, sf_dir).collect()
    }
    assert batch == stream


@pytest.mark.slow
def test_stateful_sessionization_matches_batch(spark, sf_dir):
    stream = read_events_stream(spark, sf_dir).select(
        "user_id", F.unix_timestamp("ts").alias("ts_s")
    )
    out = apply_sessionization(stream)
    name = "sess_out"
    qh = (
        out.writeStream.outputMode("append").format("memory").queryName(name).start()
    )
    try:
        qh.processAllAvailable()
    finally:
        qh.stop()
    got = spark.table(name)

    # batch truth: closed sessions = all sessions except each user's last
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    batch = REGISTRY["sessionize"].fn(spark, sf_dir)
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", F.unix_timestamp("ts").alias("ts_s")
    )
    sess = (
        batch.join(ev, "event_id")
        .groupBy("user_id", "session_id")
        .agg(F.count("*").alias("n_events"), F.min("ts_s").alias("start_s"),
             F.max("ts_s").alias("end_s"))
    )
    last = sess.groupBy("user_id").agg(F.max("session_id").alias("last_id"))
    closed = sess.join(last, "user_id").filter(
        F.col("session_id") < F.col("last_id")
    )

    got_set = {
        (r["user_id"], r["session_id"], r["n_events"], r["start_s"], r["end_s"])
        for r in got.collect()
    }
    want_set = {
        (r["user_id"], r["session_id"], r["n_events"], r["start_s"], r["end_s"])
        for r in closed.collect()
    }
    assert got_set == want_set
