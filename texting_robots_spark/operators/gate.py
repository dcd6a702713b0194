"""Robots gate operator: build per-host rules, broadcast, gate candidates.

Dataflow (SURVEY.md §3.4):

    robots_raw(host, body)
        --parse_robots UDF-->  rules_df(host, rules, delay, sitemaps, parse_error)
        --collect+broadcast--> RulesBroadcast
    candidates(host, url, ...)
        --robots_allowed UDF-> + allowed boolean     (narrow, no shuffle)
        --broadcast join-----> + crawl_delay float   (native, no UDF)

The rules table is tiny relative to the frontier (one row per host), so
it is broadcast to every executor once per rules version; the gate stage
is shuffle-free.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.udfs import make_allowed_udf, make_parse_robots_udf

__all__ = ["build_rules", "build_rules_per_agent", "RulesBroadcast", "gate"]


def build_rules(robots_raw: DataFrame, agent: str) -> DataFrame:
    """robots_raw(host, body binary) -> rules table for ``agent``.

    Output: (host, rules array<struct<pattern,is_allow>>, delay float,
    sitemaps array<string>, parse_error boolean); rules precedence-sorted.
    """
    parse = make_parse_robots_udf(agent)
    return robots_raw.select(
        "host", parse(F.col("body")).alias("_r")
    ).select("host", "_r.rules", "_r.delay", "_r.sitemaps", "_r.parse_error")


def build_rules_per_agent(robots_raw: DataFrame) -> DataFrame:
    """robots_raw(host, body binary, agent string) -> rules table with a
    per-row agent — one job for many (host, agent) combinations."""
    parse = make_parse_robots_udf(None)
    return robots_raw.select(
        "host", "agent", parse(F.col("body"), F.col("agent")).alias("_r")
    ).select("host", "agent", "_r.rules", "_r.delay", "_r.sitemaps", "_r.parse_error")


class RulesBroadcast:
    """Driver-collected, cluster-broadcast per-host rules table.

    ``value`` maps host -> (rules tuple, delay, parse_error). Collecting
    to the driver is deliberate: a rules row is O(robots.txt size) and
    there is one per *host*, orders of magnitude smaller than the
    frontier; a torch-broadcast dict gives the gate UDF O(1) lookup with
    zero join shuffle. For rules tables too big for one broadcast, shard
    by host-hash and gate per shard (same interface).
    """

    def __init__(self, spark: SparkSession, rules_df: DataFrame):
        rows = rules_df.select("host", "rules", "delay", "parse_error").collect()
        table = {
            r["host"]: (
                tuple((x["pattern"], x["is_allow"]) for x in (r["rules"] or ())),
                r["delay"],
                bool(r["parse_error"]),
            )
            for r in rows
        }
        self._spark = spark
        self.broadcast = spark.sparkContext.broadcast(table)
        self.n_hosts = len(table)

    def delay_df(self) -> DataFrame:
        """Small (host, crawl_delay) DataFrame for native broadcast joins."""
        rows = [
            (h, float(d) if d is not None else None)
            for h, (_, d, _) in self.broadcast.value.items()
        ]
        return self._spark.createDataFrame(rows, "host string, crawl_delay double")

    def unpersist(self) -> None:
        self.broadcast.unpersist()


def gate(
    candidates: DataFrame,
    rules: RulesBroadcast,
    url_col: str = "url",
    host_col: str = "host",
    with_delay: bool = True,
    on_parse_error: str = "disallow",
    default_delay: Optional[float] = None,
) -> DataFrame:
    """Annotate candidates with ``allowed`` (and ``crawl_delay``).

    One narrow stage: the allowed UDF reads broadcast rules (no shuffle);
    the delay column comes from an explicitly-broadcast tiny join.
    """
    allowed = make_allowed_udf(rules.broadcast, on_parse_error=on_parse_error)
    out = candidates.withColumn("allowed", allowed(F.col(host_col), F.col(url_col)))
    if with_delay:
        delays = rules.delay_df()
        if host_col != "host":
            delays = delays.withColumnRenamed("host", host_col)
        out = out.join(F.broadcast(delays), on=host_col, how="left")
        if default_delay is not None:
            out = out.withColumn(
                "crawl_delay", F.coalesce("crawl_delay", F.lit(float(default_delay)))
            )
    return out
