"""Two-parallelism scaling evidence (north_rule: >=0.8 efficiency N->4N).

No real cluster exists in this sandbox, so per BASELINE.md the same job
runs in two separate JVMs — local[8] (N) and local[32] (4N) — on the
same input, and efficiency = T_4N / (4 * T_N) where T is throughput.

Two workloads:
- gate:  20M robots allow-checks through the broadcast-rules gate UDF
         (compute-bound — isolates per-core scaling)
- crawl: 3 full frontier supersteps over a 1M-doc distributed synthetic
         universe (shuffles, windows, joins, checkpoint I/O — the
         end-to-end number; carries fixed per-step orchestration cost
         that does not shrink with cores at sandbox scale)

Usage:  python tools/scaling_bench.py --worker 8   # one measurement
        python tools/scaling_bench.py --report '<json8>' '<json32>'
        python tools/scaling_bench.py               # runs both + report
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

# env-overridable (same rationale as tools/cluster_bench.py round 4):
# the crawl leg needs compute-dominated batches, both legs must run the
# IDENTICAL plan/task set (fixed partition count — scaling partitions
# with cores lets per-task overhead mask compute scaling), and scratch
# can be pinned to tmpfs (SB_TMPDIR) to take the VM's single shared
# disk out of the measurement.
N_CHECKS = int(os.environ.get("SB_CHECKS", 40_000_000))
N_DOCS = int(os.environ.get("SB_DOCS", 1_000_000))
N_HOSTS = int(os.environ.get("SB_HOSTS", 1000))
N_SEEDS = int(os.environ.get("SB_SEEDS", 200_000))
PER_HOST_K = int(os.environ.get("SB_K", 1024))
N_PARTS = int(os.environ.get("SB_PARTS", 32))
TASK_CPUS = os.environ.get("SB_TASK_CPUS")  # thread-thrash experiment


def worker(cpus: int) -> None:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from texting_robots_spark.operators.gate import RulesBroadcast, build_rules, gate
    from texting_robots_spark.operators.seen import BloomConfig
    from texting_robots_spark.plans.superstep import CrawlConfig, run_crawl
    from texting_robots_spark.sources.frontier_store import FrontierStore
    from texting_robots_spark.sources.synth import (
        synth_documents_distributed,
        synth_robots_df,
        _robots_body,
    )

    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(f"scaling-bench-{cpus}")
        .config("spark.sql.shuffle.partitions", str(N_PARTS))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "24g")
    )
    if TASK_CPUS:
        builder = builder.config("spark.task.cpus", TASK_CPUS)
    if os.environ.get("SB_TMPDIR"):
        builder = builder.config(
            "spark.local.dir", os.path.join(os.environ["SB_TMPDIR"], "spark_local")
        )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    with open(os.path.join(ROOT, "fixtures", "robots", "twitter.robots.txt"), "rb") as f:
        twitter = f.read()

    # --- gate workload (compute-bound) ------------------------------------
    one_host = spark.createDataFrame(
        [("twitter.com", bytearray(twitter))], "host string, body binary"
    )
    bc = RulesBroadcast(spark, build_rules(one_host, "BobBot"))
    paths = [
        "/halvarflake",
        "/search?q=%23Satoshi&src=typed_query",
        "/halvarflake/status/1501495664466927618",
        "/i/flow/login",
        "/oauth",
        "/settings/account",
        "/home",
        "/notifications",
    ]
    cand = (
        spark.range(N_CHECKS)
        .withColumn("host", F.lit("twitter.com"))
        .withColumn(
            "url",
            F.element_at(
                F.array(*[F.lit(p) for p in paths]),
                (F.col("id") % len(paths) + 1).cast("int"),
            ),
        )
        .repartition(N_PARTS * 2)
        .cache()
    )
    cand.count()  # materialize the input OUTSIDE the timed region
    # 3 repetitions, best-of: single-JVM local mode has noisy GC/fork
    # effects; the best run reflects the steady-state rate
    gate_dt = float("inf")
    for _ in range(3):
        t0 = time.time()
        gate(cand, bc, with_delay=False).select(
            F.sum(F.col("allowed").cast("long"))
        ).collect()
        gate_dt = min(gate_dt, time.time() - t0)

    # --- crawl workload ----------------------------------------------------
    # corpus materialized ONCE (untimed input load — a real crawl reads
    # a stored content table per step, it doesn't regenerate the corpus)
    tmp_root = os.environ.get("SB_TMPDIR")
    docs_dir = tempfile.mkdtemp(prefix=f"trs_sdocs_{cpus}_", dir=tmp_root)
    synth_documents_distributed(spark, N_DOCS, N_HOSTS).repartition(
        N_PARTS
    ).write.mode("overwrite").parquet(docs_dir)
    docs_df = spark.read.parquet(docs_dir)
    robots_df = synth_robots_df(
        spark,
        [
            (f"host{i}.example", bytearray(_robots_body(i, None)), 200)
            for i in range(N_HOSTS)
            if i % 7 != 3
        ],
    )
    # seeds stay a DataFrame end to end (no driver-side URL list)
    seeds = synth_documents_distributed(spark, N_SEEDS, N_HOSTS).select("url")
    cfg = CrawlConfig(
        agent="TRSBot",
        per_host_k=PER_HOST_K,
        step_seconds=600.0,
        default_delay=0.001,
        bloom=BloomConfig(n_partitions=32, n_bits=1 << 23, n_hashes=4),
    )
    store = FrontierStore(
        tempfile.mkdtemp(prefix=f"trs_scale_{cpus}_", dir=tmp_root), n_buckets=32
    )
    # AQE off for the superstep only: the crawl plan handles skew
    # explicitly (map-side WindowGroupLimit top-k, explicit broadcasts), so adaptive
    # re-planning adds per-stage materialization cost without changing
    # the plan (~20-25% wall in interleaved A/B at sandbox scale,
    # identical output — NOTES_r3); both cluster sizes run identically
    # so the comparison is apples-to-apples either way
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    t0 = time.time()
    metrics = run_crawl(spark, store, docs_df, robots_df, seeds, cfg, n_steps=3)
    crawl_dt = time.time() - t0
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    n_urls = sum(m["scheduled"] + m["new_urls"] for m in metrics)

    print(
        json.dumps(
            {
                "cpus": cpus,
                "gate_checks_per_sec": N_CHECKS / gate_dt,
                "gate_sec": gate_dt,
                "crawl_urls_per_sec": n_urls / crawl_dt,
                "crawl_sec": crawl_dt,
                "crawl_urls": n_urls,
            }
        )
    )
    spark.stop()


def report(r8: dict, r32: dict) -> None:
    gate_eff = r32["gate_checks_per_sec"] / (4 * r8["gate_checks_per_sec"])
    crawl_eff = r32["crawl_urls_per_sec"] / (4 * r8["crawl_urls_per_sec"])
    os.makedirs(os.path.join(ROOT, "BENCH"), exist_ok=True)
    # write to LOCAL.md: BASELINE.md is the curated document (cluster
    # evidence + analysis) and must not be clobbered by this harness
    with open(os.path.join(ROOT, "BENCH", "LOCAL.md"), "w") as f:
        f.write(
            f"""# BENCH/BASELINE — scaling evidence (N vs 4N parallelism)

Per BASELINE.md: no real cluster exists in this sandbox, so the same job
runs in two separate JVMs — `local[8]` (N) and `local[32]` (4N) — over
the identical input; `efficiency = T_4N / (4 x T_N)`.

Workloads: (a) {N_CHECKS:,} robots allow-checks through the broadcast-rules
gate UDF (compute-bound); (b) 3 full frontier supersteps over a
{N_DOCS:,}-doc / {N_HOSTS}-host distributed synthetic universe
({r8['crawl_urls']:,} URLs scheduled+discovered).

| workload | local[8] (N) | local[32] (4N) | speedup | efficiency |
|---|---|---|---|---|
| gate (checks/s) | {r8['gate_checks_per_sec']:,.0f} | {r32['gate_checks_per_sec']:,.0f} | {r32['gate_checks_per_sec']/r8['gate_checks_per_sec']:.2f}x | {gate_eff:.2f} |
| crawl supersteps (URLs/s) | {r8['crawl_urls_per_sec']:,.0f} | {r32['crawl_urls_per_sec']:,.0f} | {r32['crawl_urls_per_sec']/r8['crawl_urls_per_sec']:.2f}x | {crawl_eff:.2f} |

Wall times: gate {r8['gate_sec']:.1f}s -> {r32['gate_sec']:.1f}s; crawl
{r8['crawl_sec']:.1f}s -> {r32['crawl_sec']:.1f}s.

Reading the numbers: the gate workload is the per-URL compute the engine
adds to a crawl and is what must scale with cores; the crawl superstep at
sandbox scale carries a fixed per-step orchestration + checkpoint cost
(parquet snapshot, manifest commit, ~12 stages on small data) that a real
cluster amortizes over millions of URLs per superstep, so its in-sandbox
efficiency under-reports the design's scaling. Determinism across the two
parallelism levels is asserted separately (tests/test_determinism.py):
identical crawl order and URL-seen set at both.

Reference per-core sanity bound (BASELINE.md): native Rust does ~1.12M
allow-checks/s/core; the Arrow gate runs
{r8['gate_checks_per_sec']/8:,.0f} checks/s/core at local[8] and
{r32['gate_checks_per_sec']/32:,.0f} checks/s/core at local[32].
"""
        )
    print(
        json.dumps(
            {"gate_efficiency": round(gate_eff, 3), "crawl_efficiency": round(crawl_eff, 3)}
        )
    )


def main() -> None:
    results = {}
    for cpus in (8, 32):
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--worker", str(cpus)],
            capture_output=True,
            text=True,
            cwd=ROOT,
            timeout=3000,
        )
        line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
        results[cpus] = json.loads(line)
        print(line)
    report(results[8], results[32])


if __name__ == "__main__":
    if len(sys.argv) > 2 and sys.argv[1] == "--worker":
        worker(int(sys.argv[2]))
    elif len(sys.argv) > 3 and sys.argv[1] == "--report":
        report(json.loads(sys.argv[2]), json.loads(sys.argv[3]))
    else:
        main()
