"""Cuckoo-filter seen-set: insert/probe/delete semantics — the deletable
fallback the bloom path cannot provide (re-crawl scheduling)."""

from pyspark.sql import functions as F

from texting_robots_spark.operators.cuckoo import (
    CuckooConfig,
    build_cuckoo,
    delete_cuckoo,
    probe_cuckoo,
)

CFG = CuckooConfig(n_partitions=4, n_buckets=1 << 12, slots_per_bucket=4)


def _hashed(spark, urls):
    return spark.createDataFrame([(u,) for u in urls], "url string").withColumn(
        "url_hash", F.xxhash64("url")
    )


def test_cuckoo_no_false_negatives_and_low_fpr(spark):
    seen = _hashed(spark, [f"https://h{i % 40}.example/p/{i}" for i in range(4000)])
    filters = build_cuckoo(seen, CFG).cache()
    assert probe_cuckoo(seen, filters, CFG).where(~F.col("maybe_seen")).count() == 0

    fresh = _hashed(spark, [f"https://new{i}.example/x/{i}" for i in range(4000)])
    fp = probe_cuckoo(fresh, filters, CFG).where(F.col("maybe_seen")).count()
    assert fp / 4000 < 0.01, f"cuckoo FPR too high: {fp}/4000"


def test_cuckoo_delete_enables_recrawl(spark):
    urls = [f"https://h{i % 10}.example/p/{i}" for i in range(2000)]
    seen = _hashed(spark, urls)
    filters = build_cuckoo(seen, CFG).cache()

    # delete a deterministic slice -> those URLs probe as unseen again
    recrawl = _hashed(spark, urls[:500])
    updated = delete_cuckoo(filters, recrawl, CFG).cache()

    gone = probe_cuckoo(recrawl, updated, CFG)
    # deleted keys may still collide with other keys' fingerprints, but
    # the overwhelming majority must now be unseen
    still = gone.where(F.col("maybe_seen")).count()
    assert still / 500 < 0.02, f"deletions not visible: {still}/500"

    # the NOT-deleted remainder must all still be present (no false negs)
    kept = _hashed(spark, urls[500:])
    assert probe_cuckoo(kept, updated, CFG).where(~F.col("maybe_seen")).count() == 0
