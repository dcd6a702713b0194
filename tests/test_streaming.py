"""Structured Streaming: the streaming gate must agree with the batch
gate, and windowed metrics must aggregate with a watermark."""

import datetime

from pyspark.sql import functions as F

from texting_robots_spark.operators.gate import RulesBroadcast, build_rules, gate
from texting_robots_spark.streaming.stream_gate import (
    stream_gate,
    windowed_fetch_metrics,
)


def _rules(spark):
    raw = spark.createDataFrame(
        [
            ("a.example", bytearray(b"User-agent: *\nDisallow: /private\nCrawl-delay: 2")),
            ("b.example", bytearray(b"User-agent: *\nDisallow: /\nAllow: /ok")),
        ],
        "host string, body binary",
    )
    return RulesBroadcast(spark, build_rules(raw, "TRSBot"))


def test_stream_gate_matches_batch_gate(spark, tmp_path):
    src = str(tmp_path / "candidates")
    out = str(tmp_path / "gated")
    ckpt = str(tmp_path / "ckpt")
    rows = [
        ("a.example", "https://a.example/private/x"),
        ("a.example", "https://a.example/pub"),
        ("b.example", "https://b.example/ok/page"),
        ("b.example", "https://b.example/nope"),
        ("c.example", "https://c.example/anything"),
    ]
    cand = spark.createDataFrame(rows, "host string, url string")
    cand.write.parquet(src)

    rules = _rules(spark)
    q = (
        stream_gate(spark, src, rules)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    streamed = {
        (r["host"], r["url"]): (r["allowed"], r["crawl_delay"])
        for r in spark.read.parquet(out).collect()
    }
    batch = {
        (r["host"], r["url"]): (r["allowed"], r["crawl_delay"])
        for r in gate(cand, rules).collect()
    }
    assert streamed == batch
    assert streamed[("a.example", "https://a.example/private/x")][0] is False
    assert streamed[("b.example", "https://b.example/ok/page")] == (True, None)
    assert streamed[("a.example", "https://a.example/pub")] == (True, 2.0)


def test_windowed_fetch_metrics_with_watermark(spark, tmp_path):
    src = str(tmp_path / "fetches")
    t0 = datetime.datetime(2026, 1, 1, 0, 0, 0)
    rows = [
        ("a.example", t0 + datetime.timedelta(seconds=s)) for s in (1, 5, 59, 61)
    ] + [("b.example", t0 + datetime.timedelta(seconds=30))]
    spark.createDataFrame(rows, "host string, fetch_ts timestamp").write.parquet(src)

    stream = spark.readStream.schema("host string, fetch_ts timestamp").parquet(src)
    metrics = windowed_fetch_metrics(stream, window="1 minute")
    # complete mode: append would hold windows until the watermark passes
    # their end, which never happens within a single availableNow batch
    q = (
        metrics.writeStream.format("memory")
        .queryName("fetch_metrics")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["host"], r["window_start"].second + r["window_start"].minute * 60): r["n_fetched"]
        for r in spark.sql("select * from fetch_metrics").collect()
    }
    assert got[("a.example", 0)] == 3
    assert got[("a.example", 60)] == 1
    assert got[("b.example", 0)] == 1
