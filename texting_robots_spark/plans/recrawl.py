"""Re-crawl + frontier compaction — where the cuckoo filter earns its keep.

At 10^10 URLs the frontier cannot keep every fetched row hot forever:
``compact`` archives non-queued rows out of the working frontier and
hands seen-ness to the per-partition filters. After compaction the
filter is the ONLY record that a URL was seen — so scheduling a
re-crawl requires *deleting* from the seen filter, which bloom bits
cannot do. The cuckoo path (operators.cuckoo) supports exact-key
deletion with no false negatives for the remaining keys.

Flow:
    compact(store)            frontier rows state != 'queued' -> archive/
                              seen-set = cuckoo filters (built from ALL keys)
    schedule_recrawl(urls)    delete url hashes from the cuckoo filters and
                              insert fresh 'queued' rows -> next superstep
                              fetches them again, politeness intact
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.udfs import canonicalize_udf
from ..operators.cuckoo import CuckooConfig, build_cuckoo, delete_cuckoo, probe_cuckoo
from ..sources.frontier_store import FrontierStore

__all__ = [
    "compact_frontier",
    "stale_archived",
    "schedule_recrawl",
    "dedup_candidates_cuckoo",
]

import os


def _archive_dir(store: FrontierStore) -> str:
    return os.path.join(store.root, "archive")


def compact_frontier(
    spark: SparkSession, store: FrontierStore, cfg: CuckooConfig
) -> dict:
    """Archive non-queued rows; seen-ness moves to cuckoo filters.

    Writes: archive parquet (append), new snapshot whose frontier holds
    only queued rows, and cuckoo filters covering EVERY url_hash ever
    seen (queued + archived). Returns counts.
    """
    # The reconstructed frontier (merge-on-read: base + delta chain +
    # latest-wins window) has FIVE consumers below — the cuckoo build,
    # the archive write, both counts, and the queued-only snapshot.
    # Cache it so the reconstruction runs once instead of once per
    # consumer (round 7: the uncached shape recomputed the union+window
    # five times and dominated the recrawl cycle's wall time).
    frontier = store.read_frontier(spark).cache()
    queued = frontier.where(F.col("state") == "queued")
    done = frontier.where(F.col("state") != "queued")
    # Build + CHECK the filters BEFORE any destructive write: a dropped
    # key would be a silent false negative on every later probe (a seen
    # URL re-entering the frontier), and a retry after a partial compact
    # would rebuild filters from the already-compacted (queued-only)
    # frontier, permanently losing the archived keys' seen-ness. Failing
    # here leaves the old snapshot, archive, and filters intact so the
    # caller can resize CuckooConfig and simply call again.
    filters = build_cuckoo(frontier.select("url_hash"), cfg).cache()
    try:
        n_dropped = filters.agg(F.sum("n_dropped")).collect()[0][0] or 0
        if n_dropped:
            raise ValueError(
                f"cuckoo filter over capacity: {n_dropped} keys dropped — "
                f"increase CuckooConfig.n_buckets or n_partitions"
            )
        done.write.mode("append").option("compression", store.codec).parquet(
            _archive_dir(store)
        )
        n_q, n_a = queued.count(), done.count()
        store.write_snapshot(
            queued, filters=None, meta={**store.meta(), "compacted": True}
        )
        # cuckoo filters live beside the snapshot's bloom slot
        filters.write.mode("overwrite").option("compression", store.codec).parquet(
            os.path.join(store.root, "cuckoo_filters")
        )
    finally:
        filters.unpersist()
        frontier.unpersist()
    return {"queued": n_q, "archived": n_a, "dropped": int(n_dropped)}


def _read_cuckoo(spark: SparkSession, store: FrontierStore) -> DataFrame:
    from ..operators.cuckoo import CUCKOO_DDL

    return spark.read.schema(CUCKOO_DDL).parquet(
        os.path.join(store.root, "cuckoo_filters")
    )


def dedup_candidates_cuckoo(
    spark: SparkSession,
    store: FrontierStore,
    candidates: DataFrame,
    cfg: CuckooConfig,
) -> DataFrame:
    """Post-compaction seen-check: cuckoo probe replaces the bloom +
    frontier anti-join (the frontier no longer holds archived keys)."""
    filters = _read_cuckoo(spark, store)
    probed = probe_cuckoo(candidates, filters, cfg)
    return probed.where(~F.col("maybe_seen")).drop("maybe_seen")


def stale_archived(
    spark: SparkSession, store: FrontierStore, older_than: float
) -> DataFrame:
    """URLs whose last fetch is stale: archived 'fetched' rows with
    ``not_before <= older_than`` (not_before records fetch_time +
    crawl_delay, so it IS the per-URL recency clock). The standard
    recrawl driver — "re-fetch everything older than the TTL" — as a
    column-pruned archive scan, no driver data. Feed the result
    straight to ``schedule_recrawl`` (it accepts the DataFrame)."""
    if not os.path.exists(_archive_dir(store)):
        return spark.createDataFrame([], "url string")
    return (
        spark.read.parquet(_archive_dir(store))
        .where(
            (F.col("state") == "fetched")
            & (F.col("not_before") <= F.lit(float(older_than)))
        )
        .select("url")
    )


def schedule_recrawl(
    spark: SparkSession,
    store: FrontierStore,
    urls,  # list[str] | single-column DataFrame of raw URLs
    cfg: CuckooConfig,
    priority: float = 2.0,
) -> int:
    """Make previously-fetched URLs crawlable again.

    Deletes their hashes from the cuckoo seen-set and MERGEs fresh
    'queued' rows into the frontier (upsert on url_hash, so rows still
    present in the hot frontier are reset rather than duplicated).

    ``urls`` is a list[str] (small operator-supplied sets) OR a
    single-column DataFrame of raw URLs — the distributed form: a
    TTL-driven recrawl of 10^8 stale URLs (``stale_archived``) must
    never round-trip through a driver-side Python list. Both paths
    produce identical rows (pinned in tests/test_recrawl.py).
    """
    if isinstance(urls, DataFrame):
        raw = urls.select(F.col(urls.columns[0]).alias("raw"))
    else:
        raw = spark.createDataFrame([(u,) for u in urls], "raw string")
    # three consumers below (known-inserted screen, MERGE, return count):
    # cache so the canonicalize UDF + dedup aggregate run once (round 7)
    rows = (
        raw.withColumn("url", canonicalize_udf("raw"))
        .where(F.col("url").isNotNull())
        .withColumn("url_hash", F.xxhash64("url"))
        .withColumn(
            "host", F.regexp_extract("url", r"^[a-zA-Z][a-zA-Z0-9+.\-]*://([^/?#]+)", 1)
        )
        .select(
            "url_hash",
            "url",
            "host",
            F.lit(float(priority)).alias("priority"),
            F.lit(0).alias("depth"),
            F.lit("queued").alias("state"),
            F.lit(0.0).alias("not_before"),
        )
        .groupBy("url_hash")
        .agg(
            *[
                F.min(c).alias(c)
                for c in ("url", "host", "priority", "depth", "state", "not_before")
            ]
        )
    ).cache()
    filters = _read_cuckoo(spark, store)
    # Screen before deleting. Deleting a never-inserted hash can evict
    # another URL's entry on a fingerprint collision (violating
    # delete_cuckoo's contract), so arbitrary user URLs are narrowed two
    # ways: (1) a semi-join against the set of hashes KNOWN to have been
    # inserted (frontier + archive — the filter was built from exactly
    # these), and (2) a probe, which skips hashes already deleted by an
    # earlier recrawl. The probe alone would not suffice — its false
    # positives (fingerprint collisions) still pass — but combined with
    # the known-inserted join only genuinely-inserted keys reach
    # delete_cuckoo; the residual risk is a same-fingerprint collision
    # BETWEEN two inserted keys, which delete handles by removing one
    # copy per insert.
    known = store.read_frontier(spark).select("url_hash")
    if os.path.exists(_archive_dir(store)):
        known = known.unionByName(
            spark.read.schema("url_hash long").parquet(_archive_dir(store))
        )
    # no distinct on the semi-join's right side: semi-join semantics
    # dedup it for free, and the distinct was a whole extra shuffle of
    # the frontier+archive key set (round 7)
    inserted = rows.select("url_hash").join(known, "url_hash", "left_semi")
    present = (
        probe_cuckoo(inserted, filters, cfg)
        .where(F.col("maybe_seen"))
        .select("url_hash")
    )
    updated = delete_cuckoo(filters, present, cfg)
    updated.write.mode("overwrite").option("compression", store.codec).parquet(
        os.path.join(store.root, "cuckoo_filters_next")
    )
    # atomic-ish swap via rename (same idea as the manifest commit)
    import shutil

    shutil.rmtree(os.path.join(store.root, "cuckoo_filters"))
    os.replace(
        os.path.join(store.root, "cuckoo_filters_next"),
        os.path.join(store.root, "cuckoo_filters"),
    )
    try:
        frontier = store.read_frontier(spark)
        merged = FrontierStore.merge_frontier(frontier, rows)
        store.write_snapshot(merged, filters=None, meta=store.meta())
        return rows.count()
    finally:
        rows.unpersist()
