"""The self-feeding streaming crawl (streaming/loop.py) must DISCOVER
URLs — not replay pre-computed eligible sets — and still reproduce the
batch crawl exactly: same (url_hash, fetch_time) fetch set across both
steps AND the same discovered-URL set (NOTES_r2 caveat 5 closed)."""

import pytest

from pyspark.sql import functions as F

from texting_robots_spark.operators.gate import (
    RulesBroadcast,
    RulesTable,
    build_rules,
)
from texting_robots_spark.operators.seen import BloomConfig
from texting_robots_spark.plans.superstep import CrawlConfig, run_crawl
from texting_robots_spark.sources.frontier_store import FrontierStore
from texting_robots_spark.sources.synth import (
    synth_documents_df,
    synth_robots_df,
    synth_universe,
)
from texting_robots_spark.streaming.loop import run_stream_crawl


@pytest.mark.parametrize("gate_mode", ["broadcast", "sharded"])
def test_stream_crawl_loop_matches_batch_crawl(spark, tmp_path, gate_mode):
    """Both gate modes (round-5 verdict: the streaming path used to be
    broadcast-only): the sharded RulesTable cogroup gate must reproduce
    the batch crawl bit-for-bit exactly like the broadcast gate."""
    documents, robots, seeds = synth_universe(
        n_hosts=10, n_docs=200, n_seeds=16, seed=7
    )
    docs_df = synth_documents_df(spark, documents).cache()
    robots_df = synth_robots_df(spark, robots)
    cfg = CrawlConfig(
        agent="TRSBot",
        per_host_k=3,
        step_seconds=10.0,
        default_delay=2.0,
        bloom=BloomConfig(n_partitions=4, n_bits=1 << 20, n_hashes=4),
    )
    rules = RulesBroadcast(spark, build_rules(robots_df, cfg.agent))

    # --- batch reference: 2 supersteps ---------------------------------
    store = FrontierStore(str(tmp_path / "crawl"), n_buckets=4)
    run_crawl(spark, store, docs_df, robots_df, seeds, cfg, n_steps=2, rules=rules)
    frontier = store.read_frontier(spark).cache()
    delays = rules.delay_df()
    batch_fetch = {
        (r["url_hash"], round(r["not_before"] - r["crawl_delay"], 6))
        for r in (
            frontier.where(F.col("state") == "fetched")
            .join(F.broadcast(delays), "host", "left")
            .withColumn(
                "crawl_delay", F.coalesce("crawl_delay", F.lit(cfg.default_delay))
            )
            .select("url_hash", "not_before", "crawl_delay")
            .collect()
        )
    }
    batch_urls = {r["url_hash"] for r in frontier.select("url_hash").collect()}
    assert len(batch_fetch) > 5 and len(batch_urls) > len(batch_fetch)

    # --- streaming loop: seeds in, URLs discovered by feedback ----------
    stream_rules = (
        rules
        if gate_mode == "broadcast"
        else RulesTable(build_rules(robots_df, cfg.agent))
    )
    res = run_stream_crawl(
        spark, docs_df, stream_rules, seeds, cfg, n_steps=2,
        workdir=str(tmp_path / "loop"),
    )
    assert res["steps"] == 2
    out = spark.read.parquet(res["out"])
    got_fetch = {
        (r["url_hash"], round(r["fetch_time"], 6)) for r in out.collect()
    }
    assert got_fetch == batch_fetch
    # discovered set: seeds + every fed-back candidate (incl. the final
    # step's, which lands in discovered/) == every url_hash the batch
    # frontier ever inserted
    discovered = {
        r["url_hash"]
        for r in spark.read.schema(
            "url_hash long, url string, host string, priority double, "
            "depth int, step int"
        ).parquet(res["src"], res["discovered"]).collect()
    }
    assert discovered == batch_urls


def test_stream_crawl_exact_backstop_survives_tiny_bloom(spark, tmp_path):
    """Adversarial bloom sizing: 256 bits per partition over hundreds of
    URLs guarantees heavy false-positive rates. Drop-mode streaming
    would lose discoveries; the annotate-mode filter + exact anti-join
    backstop (streaming/loop.py seen/ table) must still reproduce the
    batch crawl's fetch set and discovered set bit-for-bit (the batch
    path has its own exact backstop, so it is ground truth at ANY
    bloom size)."""
    documents, robots, seeds = synth_universe(
        n_hosts=10, n_docs=200, n_seeds=16, seed=11
    )
    docs_df = synth_documents_df(spark, documents).cache()
    robots_df = synth_robots_df(spark, robots)
    cfg = CrawlConfig(
        agent="TRSBot",
        per_host_k=3,
        step_seconds=10.0,
        default_delay=2.0,
        bloom=BloomConfig(n_partitions=4, n_bits=1 << 8, n_hashes=4),
    )
    rules = RulesBroadcast(spark, build_rules(robots_df, cfg.agent))

    store = FrontierStore(str(tmp_path / "crawl"), n_buckets=4)
    run_crawl(spark, store, docs_df, robots_df, seeds, cfg, n_steps=2, rules=rules)
    frontier = store.read_frontier(spark).cache()
    batch_fetched = {
        r["url_hash"]
        for r in frontier.where(F.col("state") == "fetched")
        .select("url_hash")
        .collect()
    }
    batch_urls = {r["url_hash"] for r in frontier.select("url_hash").collect()}

    res = run_stream_crawl(
        spark, docs_df, rules, seeds, cfg, n_steps=2,
        workdir=str(tmp_path / "loop"),
    )
    assert res["steps"] == 2
    got_fetched = {
        r["url_hash"] for r in spark.read.parquet(res["out"]).collect()
    }
    assert got_fetched == batch_fetched
    discovered = {
        r["url_hash"]
        for r in spark.read.schema(
            "url_hash long, url string, host string, priority double, "
            "depth int, step int"
        ).parquet(res["src"], res["discovered"]).collect()
    }
    assert discovered == batch_urls


def test_stream_crawl_restart_resumes_from_checkpoint(spark, tmp_path):
    """Driver-restart resume (north rule: resumable from checkpoint):
    run ONE step of a 3-step crawl, stop the query, then start a NEW
    query on the same checkpoint + workdir. The resumed query's batch
    ids continue from the checkpoint (not from 0) and the politeness
    clock rides the batch id, so the completed crawl must equal a
    straight 3-step batch crawl — fetch times included. The round-4
    shape fails this: its in-memory step counter reset to 0 on restart
    while batch ids resumed, rewinding t0 and double-scheduling
    blocked hosts."""
    documents, robots, seeds = synth_universe(
        n_hosts=10, n_docs=200, n_seeds=16, seed=13
    )
    docs_df = synth_documents_df(spark, documents).cache()
    robots_df = synth_robots_df(spark, robots)
    cfg = CrawlConfig(
        agent="TRSBot",
        per_host_k=3,
        step_seconds=10.0,
        default_delay=2.0,
        bloom=BloomConfig(n_partitions=4, n_bits=1 << 20, n_hashes=4),
    )
    rules = RulesBroadcast(spark, build_rules(robots_df, cfg.agent))

    store = FrontierStore(str(tmp_path / "crawl"), n_buckets=4)
    run_crawl(spark, store, docs_df, robots_df, seeds, cfg, n_steps=3, rules=rules)
    frontier = store.read_frontier(spark).cache()
    delays = rules.delay_df()
    batch_fetch = {
        (r["url_hash"], round(r["not_before"] - r["crawl_delay"], 6))
        for r in (
            frontier.where(F.col("state") == "fetched")
            .join(F.broadcast(delays), "host", "left")
            .withColumn(
                "crawl_delay", F.coalesce("crawl_delay", F.lit(cfg.default_delay))
            )
            .select("url_hash", "not_before", "crawl_delay")
            .collect()
        )
    }

    wd = str(tmp_path / "loop")
    first = run_stream_crawl(
        spark, docs_df, rules, seeds, cfg, n_steps=3, workdir=wd, stop_after=1
    )
    assert first["steps"] == 1  # stopped mid-crawl
    # explicit generous stream timeout: under full-suite load this
    # resumed query has flaked past the 300s default (observed once in
    # a 476-test sweep); the assertion is about RESUME semantics, not
    # the VM's worst-case scheduling latency
    resumed = run_stream_crawl(
        spark, docs_df, rules, seeds, cfg, n_steps=3, workdir=wd,
        timeout_sec=600.0,
    )
    assert resumed["steps"] == 3  # batch ids continued 1, 2 — not 0
    got = [
        (r["url_hash"], round(r["fetch_time"], 6))
        for r in spark.read.parquet(resumed["out"]).collect()
    ]
    assert len(got) == len(batch_fetch)
    assert set(got) == batch_fetch

    # round-5 ADVICE: a resume whose target is ALREADY met must return
    # immediately from the durable epoch markers — no stream start, no
    # timeout_sec wait (the old shape blocked the full timeout because
    # no batch was left to fire the completion sentinel)
    import time as _time

    t_start = _time.time()
    again = run_stream_crawl(
        spark, docs_df, rules, seeds, cfg, n_steps=3, workdir=wd,
        timeout_sec=60.0,
    )
    assert again["steps"] == 3
    # far below the 60s timeout it must NOT block on; >5s has been seen
    # for plain driver-side calls under full-suite load
    assert _time.time() - t_start < 20.0


@pytest.mark.parametrize("gate_mode", ["broadcast", "sharded"])
def test_crash_replay_mid_commit_reproduces_batch_crawl(spark, tmp_path, gate_mode):
    """Crash-injection proof of full-batch idempotence (round-4 ADVICE +
    VERDICT r5 item: the epoch redesign must be DEMONSTRATED, not
    reasoned). Drives the real foreachBatch function directly via
    make_batch_processor and kills it mid-commit twice:

    - batch 0 crashes AFTER the seen + out writes but BEFORE feedback/
      pending/host_state (the exact round-4 hazard window: 'between the
      seen append and the pending swap');
    - batch 1 crashes AFTER its pending write but BEFORE host_state —
      so its replay must ignore its own half-committed epoch=1 pending
      dir and re-read epoch=0.

    Each crash is followed by a replay under the SAME batch_id (what
    foreachBatch does), and the final out/ + discovered sets must equal
    the batch crawl's EXACTLY — including row COUNTS, which the round-4
    shape fails (append-mode out/ duplicates the crashed attempt's
    fetched rows). Candidates enter with maybe_seen=True for every row
    (a degenerate bloom with FPR 1.0): admission then rides entirely on
    the epoch-partitioned exact backstop, the surface under test.
    Parametrized over both gate modes: the sharded cogroup gate's
    replay behavior must match the broadcast gate's."""
    import os

    import pytest

    from texting_robots_spark.plans.superstep import seed_frontier
    from texting_robots_spark.streaming.loop import (
        CAND_DDL,
        _write_one_file,
        make_batch_processor,
    )

    documents, robots, seeds = synth_universe(
        n_hosts=10, n_docs=200, n_seeds=16, seed=7
    )
    docs_df = synth_documents_df(spark, documents).cache()
    robots_df = synth_robots_df(spark, robots)
    cfg = CrawlConfig(
        agent="TRSBot",
        per_host_k=3,
        step_seconds=10.0,
        default_delay=2.0,
        bloom=BloomConfig(n_partitions=4, n_bits=1 << 20, n_hashes=4),
    )
    rules = RulesBroadcast(spark, build_rules(robots_df, cfg.agent))

    # batch reference
    store = FrontierStore(str(tmp_path / "crawl"), n_buckets=4)
    run_crawl(spark, store, docs_df, robots_df, seeds, cfg, n_steps=2, rules=rules)
    frontier = store.read_frontier(spark).cache()
    delays = rules.delay_df()
    batch_fetch = {
        (r["url_hash"], round(r["not_before"] - r["crawl_delay"], 6))
        for r in (
            frontier.where(F.col("state") == "fetched")
            .join(F.broadcast(delays), "host", "left")
            .withColumn(
                "crawl_delay", F.coalesce("crawl_delay", F.lit(cfg.default_delay))
            )
            .select("url_hash", "not_before", "crawl_delay")
            .collect()
        )
    }
    batch_urls = {r["url_hash"] for r in frontier.select("url_hash").collect()}

    # manual loop with injected crashes + same-id replays
    workdir = str(tmp_path / "loop")
    for d in ("src", "out", "discovered"):
        os.makedirs(os.path.join(workdir, d), exist_ok=True)
    seed_df = seed_frontier(spark, seeds, cfg).select(
        "url_hash", "url", "host", "priority", "depth", F.lit(0).alias("step")
    )
    _write_one_file(
        seed_df,
        os.path.join(workdir, "stage_seed"),
        os.path.join(workdir, "src", "step0.parquet"),
    )
    state: dict = {}

    stream_rules = (
        rules
        if gate_mode == "broadcast"
        else RulesTable(build_rules(robots_df, cfg.agent))
    )

    def proc(fail_after=None):
        return make_batch_processor(
            spark, docs_df, stream_rules, cfg, workdir, n_steps=2,
            state=state, fail_after=fail_after,
        )

    def load(step):
        return (
            spark.read.schema(CAND_DDL)
            .parquet(os.path.join(workdir, "src", f"step{step}.parquet"))
            .withColumn("maybe_seen", F.lit(True))
        )

    b0 = load(0)
    with pytest.raises(RuntimeError, match="injected crash after out"):
        proc(fail_after="out")(b0, 0)
    proc()(b0, 0)  # foreachBatch replay: same batch_id
    b1 = load(1)
    with pytest.raises(RuntimeError, match="injected crash after pending"):
        proc(fail_after="pending")(b1, 1)
    proc()(b1, 1)
    assert state["done"] == 2

    out = spark.read.parquet(os.path.join(workdir, "out"))
    got = [(r["url_hash"], round(r["fetch_time"], 6)) for r in out.collect()]
    # COUNT equality kills duplicate-append; SET equality kills drops
    assert len(got) == len(batch_fetch)
    assert set(got) == batch_fetch
    discovered = {
        r["url_hash"]
        for r in spark.read.schema(CAND_DDL)
        .parquet(
            os.path.join(workdir, "src"), os.path.join(workdir, "discovered")
        )
        .collect()
    }
    assert discovered == batch_urls


def test_prior_epoch_paths_exclude_own_and_later_epochs(spark, tmp_path):
    """Crash-replay safety of the seen log (round-3 ADVICE, medium): a
    replayed micro-batch runs under the SAME batchId, so the anti-join
    read set must exclude its own epoch partition (its possibly-half-
    committed rows) — otherwise the replay drops its own URLs forever.
    Completeness is keyed on the _COMMITTED marker (round-5 ADVICE —
    part-file presence only worked for empty frames via SPARK-23271's
    schema-only file): a dir with parquet but no marker (crash between
    the write and the marker) and an empty dir (crash between mkdir and
    any commit) are both skipped, and re-writing an epoch is idempotent
    overwrite."""
    import os

    from texting_robots_spark.streaming.loop import (
        _mark_committed,
        _prior_epoch_paths,
    )

    seen = str(tmp_path / "seen")
    df = spark.range(5).select(F.col("id").alias("url_hash"))
    for epoch in (0, 1, 3):
        d = os.path.join(seen, f"epoch={epoch}")
        df.write.mode("overwrite").parquet(d)
        _mark_committed(d)
    os.makedirs(os.path.join(seen, "epoch=2"))  # crashed before commit
    # crashed AFTER the parquet write but BEFORE the marker: incomplete
    df.write.mode("overwrite").parquet(os.path.join(seen, "epoch=4"))

    # batch 5 replaying: must see ONLY epochs 0, 1, 3 — not the empty
    # dir (2), not the unmarked dir (4)
    got = _prior_epoch_paths(seen, 5)
    assert [os.path.basename(p) for p in got] == ["epoch=0", "epoch=1", "epoch=3"]
    # batch 3 replaying: its own epoch is excluded even though marked
    got = _prior_epoch_paths(seen, 3)
    assert [os.path.basename(p) for p in got] == ["epoch=0", "epoch=1"]
    # first batch: nothing prior
    assert _prior_epoch_paths(seen, 0) == []
    # epoch overwrite is idempotent: same rows after a double write
    # (and the overwrite drops the stale marker until re-marked)
    d1 = os.path.join(seen, "epoch=1")
    df.write.mode("overwrite").parquet(d1)
    assert _prior_epoch_paths(seen, 2) == [os.path.join(seen, "epoch=0")]
    _mark_committed(d1)
    rows = spark.read.parquet(*_prior_epoch_paths(seen, 2)).count()
    assert rows == 10  # epochs 0+1, 5 rows each — no append duplication
