"""Structured Streaming surface for the engine.

The frontier loop itself is iterated batch with checkpointed snapshots
(SURVEY.md §2.B: politeness needs a global per-host rank per superstep,
which streaming cannot express without per-host state funnels). What
streams well is the *stationary* part of the pipeline, provided here:

- ``stream_gate``: a continuous robots gate — candidate URLs arrive as
  files (or any streaming source), are gated against the broadcast rules
  table, and land in an append sink. The gate UDF is the same vectorized
  pandas UDF as the batch path; Structured Streaming just changes the
  source/sink.
- ``windowed_fetch_metrics``: event-time windowed per-host fetch counts
  with a watermark for late data — the streaming version of the metrics
  table.

Both are exactly-once under checkpointing (file source + file sink).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.gate import RulesBroadcast, gate

__all__ = ["stream_gate", "windowed_fetch_metrics"]

CANDIDATE_DDL = "host string, url string"


def stream_gate(
    spark: SparkSession,
    source_dir: str,
    rules: RulesBroadcast,
    on_parse_error: str = "disallow",
) -> DataFrame:
    """Streaming robots gate over a file source of candidate URLs.

    Returns the gated streaming DataFrame; callers attach a sink, e.g.::

        q = (stream_gate(spark, dir, rules)
             .writeStream.format("parquet")
             .option("path", out).option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
    """
    candidates = (
        spark.readStream.schema(CANDIDATE_DDL).parquet(source_dir)
    )
    return gate(candidates, rules, with_delay=True, on_parse_error=on_parse_error)


def windowed_fetch_metrics(
    fetches: DataFrame,
    window: str = "1 minute",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Event-time windowed per-host fetch counts with late-data watermark.

    ``fetches`` is a streaming DataFrame with (host string, fetch_ts
    timestamp). Late rows beyond the watermark are dropped; state is
    bounded by the watermark horizon.
    """
    return (
        fetches.withWatermark("fetch_ts", watermark)
        .groupBy(F.window("fetch_ts", window).alias("w"), "host")
        .agg(F.count("*").alias("n_fetched"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "host",
            "n_fetched",
        )
    )
