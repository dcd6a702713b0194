#!/usr/bin/env python
"""Round-7 optimization instrument (bench.py stays FROZEN for the
driver; this file is the builder's measurement harness per guide §1).

Per-line isolation with the noop sink (times the computation, not the
sink/driver collect), `.explain("formatted")` capture into
plans/r07/<name>_{before,after}.txt, and job descriptions so the UI /
event log attribute stages.

Usage:
    python bench_extra.py [--plans before|after|none] [--reps N] [line ...]

Lines: any of  minhash_lsh_pairs dedup_resolve similarity_topk
host_topk train_data_prep simhash_fingerprints q1 window_sessions
explode_token_freq dedup_exact anti_join broadcast_join quality
(default: the heavy ones).

The crawl and recrawl lines are imperative pipelines (many actions);
they are timed by bench.py's own phase tracer — use
SPARK_GRAFT_TRACE=1 python bench.py for those.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HERE = os.path.dirname(os.path.abspath(__file__))
PLANS_DIR = os.path.join(HERE, "plans", "r07")


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    args = sys.argv[1:]
    plans_tag = "none"
    reps = 3
    lines = []
    i = 0
    while i < len(args):
        if args[i] == "--plans":
            plans_tag = args[i + 1]
            i += 2
        elif args[i] == "--reps":
            reps = int(args[i + 1])
            i += 2
        else:
            lines.append(args[i])
            i += 1
    if not lines:
        lines = [
            "minhash_lsh_pairs",
            "dedup_resolve",
            "similarity_topk",
            "host_topk",
            "train_data_prep",
            "simhash_fingerprints",
        ]

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("trs-bench-extra")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod

    from texting_robots_spark.operators.dedup import (
        minhash_lsh_candidates,
        resolve_duplicates,
        simhash,
        tokenize,
    )
    from texting_robots_spark.operators.sampling import (
        hash_split,
        host_quality_filter,
        pack_shards,
    )

    # same warmup as bench.py so the first measured rep is steady-state
    from pyspark.sql import types as T

    @F.pandas_udf(T.LongType())
    def _warm(x):
        return x

    spark.range(cpus * 4, numPartitions=cpus).select(F.sum(_warm(F.col("id")))).collect()

    qfns = entrymod.queries()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        F.col("doc_id").cast("string").alias("doc_id"), "text"
    )
    docs_t = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        F.col("doc_id").cast("string").alias("doc_id"), "source", "text"
    )
    toks = tokenize(F.col("text"))
    scored = docs_t.withColumn(
        "score",
        F.size(F.array_distinct(toks)).cast("double")
        / F.greatest(F.size(toks), F.lit(1)),
    ).withColumn("host", F.col("source"))

    def train_prep_df():
        prepped = hash_split(
            host_quality_filter(scored, min_mean_score=0.4, min_docs=2),
            "doc_id",
            [("train", 0.9), ("holdout", 0.1)],
        ).where(F.col("split") == "train")
        return (
            pack_shards(prepped, token_budget=2048, n_buckets=cpus)
            .groupBy("bucket", "shard")
            .count()
        )

    builders = {
        "minhash_lsh_pairs": lambda: minhash_lsh_candidates(
            docs, n_hashes=4, band_size=2
        ),
        "dedup_resolve": None,  # imperative: CC loop inside, timed below
        "similarity_topk": lambda: qfns["similarity_topk"](spark, sf_dir),
        "host_topk": lambda: qfns["host_topk"](spark, sf_dir),
        "q1": lambda: qfns["q1_pricing_summary"](spark, sf_dir),
        "window_sessions": lambda: qfns["window_sessions"](spark, sf_dir),
        "explode_token_freq": lambda: qfns["explode_token_freq"](spark, sf_dir),
        "dedup_exact": lambda: qfns["dedup_exact"](spark, sf_dir),
        "anti_join": lambda: qfns["anti_join_unseen"](spark, sf_dir),
        "broadcast_join": lambda: qfns["broadcast_join_revenue"](spark, sf_dir),
        "quality": lambda: qfns["quality_features"](spark, sf_dir),
        "train_data_prep": train_prep_df,
        "simhash_fingerprints": lambda: simhash(docs).select("doc_id", "simhash"),
    }

    out = {}
    for name in lines:
        if name == "dedup_resolve":
            # the CC loop runs actions internally; time end-to-end with
            # the same terminal action as bench.py
            def run():
                pairs = minhash_lsh_candidates(docs, n_hashes=4, band_size=2)
                resolve_duplicates(docs.select("doc_id"), pairs).where(
                    F.col("is_survivor")
                ).count()

            plan_df = None
        else:
            builder = builders[name]

            def run(builder=builder):
                noop(builder())

            plan_df = builders[name]()
        if plans_tag in ("before", "after") and plan_df is not None:
            os.makedirs(PLANS_DIR, exist_ok=True)
            import contextlib
            import io

            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                plan_df.explain("formatted")
            with open(
                os.path.join(PLANS_DIR, f"{name}_{plans_tag}.txt"), "w"
            ) as f:
                f.write(buf.getvalue())
        ts = []
        for r in range(reps):
            spark.sparkContext.setJobDescription(f"{name} rep{r}")
            t0 = time.time()
            run()
            ts.append(round(time.time() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        out[name] = {"best": min(ts), "spread": ts}
        print(json.dumps({name: out[name]}), flush=True)

    print(json.dumps({"sf_dir": sf_dir, "results": out}))
    spark.stop()


if __name__ == "__main__":
    main()
