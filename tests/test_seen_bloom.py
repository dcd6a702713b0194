"""Partitioned bloom seen-set: no false negatives, bounded false
positives, merge correctness, and end-to-end dedup equivalence with a
plain anti-join."""

from pyspark.sql import functions as F

from texting_robots_spark.operators.seen import (
    BloomConfig,
    build_bloom,
    merge_bloom,
    probe_bloom,
)

CFG = BloomConfig(n_partitions=8, n_bits=1 << 16, n_hashes=4)


def _hashed(spark, urls):
    return spark.createDataFrame([(u,) for u in urls], "url string").withColumn(
        "url_hash", F.xxhash64("url")
    )


def test_bloom_no_false_negatives_and_low_fpr(spark):
    seen = _hashed(spark, [f"https://h{i % 50}.example/p/{i}" for i in range(5000)])
    filters = build_bloom(seen, CFG).cache()
    assert filters.count() <= CFG.n_partitions

    # every inserted key must probe maybe_seen=True
    probed = probe_bloom(seen, filters, CFG)
    assert probed.where(~F.col("maybe_seen")).count() == 0

    # unseen keys: false-positive rate stays small
    fresh = _hashed(spark, [f"https://new{i}.example/x/{i}" for i in range(5000)])
    fp = probe_bloom(fresh, filters, CFG).where(F.col("maybe_seen")).count()
    assert fp / 5000 < 0.02, f"FPR too high: {fp}/5000"


def test_bloom_merge(spark):
    a = _hashed(spark, [f"https://a.example/{i}" for i in range(500)])
    b = _hashed(spark, [f"https://b.example/{i}" for i in range(500)])
    merged = merge_bloom(build_bloom(a, CFG), build_bloom(b, CFG)).cache()
    both = a.unionByName(b)
    assert probe_bloom(both, merged, CFG).where(~F.col("maybe_seen")).count() == 0
    assert merged.groupBy("partition_id").count().where(F.col("count") > 1).count() == 0


def test_bloom_plus_antijoin_equals_plain_antijoin(spark):
    seen = _hashed(spark, [f"https://h{i % 20}.example/p/{i}" for i in range(3000)])
    cand = _hashed(
        spark,
        [f"https://h{i % 20}.example/p/{i}" for i in range(1500, 4500)],
    )
    filters = build_bloom(seen, CFG)

    probed = probe_bloom(cand, filters, CFG)
    definite_new = probed.where(~F.col("maybe_seen")).drop("maybe_seen")
    confirmed = (
        probed.where(F.col("maybe_seen"))
        .drop("maybe_seen")
        .join(seen.select("url_hash"), "url_hash", "left_anti")
    )
    fast_path = definite_new.unionByName(confirmed)

    plain = cand.join(seen.select("url_hash"), "url_hash", "left_anti")
    assert sorted(r["url"] for r in fast_path.collect()) == sorted(
        r["url"] for r in plain.collect()
    )
