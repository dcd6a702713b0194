"""Versioned frontier storage with MERGE-style upserts and checkpoints.

The design target is an Iceberg table driven by ``MERGE INTO`` with
snapshot-id checkpointing (north_rule). This sandbox has no Iceberg jars,
so the same interface is backed by snapshot-versioned Parquet +- an
atomically renamed JSON manifest: every superstep produces a new
immutable snapshot directory, the manifest points at the current version,
and resume = read the manifest. Swapping in Iceberg replaces ``merge``'s
read-modify-write with a real MERGE INTO and the manifest with the
catalog — no caller changes.

Layout under ``root/``:
    manifest.json                  {"current": N, "meta": {...}}
    snapshots/v000N/frontier/      parquet, bucketed by pmod(url_hash, P)
    snapshots/v000N/filters/       bloom filter bits (FILTERS_DDL)
    metrics/                       append-only per-step metrics parquet
    lineage/                       append-only per-partition lineage
"""

from __future__ import annotations

import json
import os
import tempfile
from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["FrontierStore", "FRONTIER_DDL"]

FRONTIER_DDL = (
    "url_hash long, url string, host string, priority double, depth int, "
    "state string, not_before double, partition_salt int"
)
# delta commits carry the frontier columns minus the bucketing salt
DELTA_DDL = FRONTIER_DDL.rsplit(", ", 1)[0]
HOST_STATE_DDL = "host string, next_allowed double"
# Store reads pass these schemas explicitly (spark.read.schema(...)):
# the store owns its layout, so per-read parquet schema inference — a
# driver-side footer read on every file of every snapshot table, paid
# three tables x every superstep — is pure overhead (guide §6/§7.3).


class FrontierStore:
    """``compact_every`` controls the delta-snapshot cadence: a superstep
    commits only its UPDATED rows as a delta; after that many deltas the
    reconstructed frontier is rewritten as a new full base. This is the
    parquet equivalent of Iceberg's merge-on-read with periodic
    compaction — per-step write cost is O(batch), not O(frontier).

    Bloom filter increments are DEFERRED to the compaction cadence (r6):
    the base snapshot's filters cover base keys only, readers anti-join
    the delta chain's key columns for the uncovered slice
    (read_keys(deltas_only=True)), and the commit that triggers
    compaction carries one catch-up increment. A per-step increment
    would cost a python bloom-build stage plus a filter write on every
    commit; deferral makes that one stage per compact_every steps and
    cuts per-step write amplification."""

    def __init__(
        self,
        root: str,
        n_buckets: int = 32,
        compact_every: int = 4,
        codec: str = "zstd",
    ):
        # zstd by default: the crawl is measured byte-bound (BENCH/
        # BASELINE.md host-ceiling analysis) and every store write is on
        # the step's critical path — zstd deltas measured ~6% off the
        # bench crawl line vs snappy, and the gap widens wherever
        # storage bandwidth is the scarcer resource.
        self.root = root
        self.n_buckets = n_buckets
        self.compact_every = compact_every
        self.codec = codec
        os.makedirs(os.path.join(root, "snapshots"), exist_ok=True)

    # -- manifest ---------------------------------------------------------
    @property
    def _manifest_path(self) -> str:
        return os.path.join(self.root, "manifest.json")

    def _read_manifest(self) -> dict:
        if not os.path.exists(self._manifest_path):
            return {"current": -1, "meta": {}}
        with open(self._manifest_path) as f:
            return json.load(f)

    def _write_manifest(self, manifest: dict) -> None:
        # atomic: write temp + rename, so a crashed step never corrupts
        # the checkpoint (resume always sees the previous snapshot)
        fd, tmp = tempfile.mkstemp(dir=self.root, suffix=".manifest")
        with os.fdopen(fd, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, self._manifest_path)

    def current_version(self) -> int:
        return self._read_manifest()["current"]

    def pending_deltas(self) -> int:
        """Number of deltas committed since the last full base — the
        length of the merge-on-read chain. ``pending_deltas() + 1 >=
        compact_every`` means the NEXT commit_step will compact."""
        return len(self._read_manifest().get("deltas", []))

    def meta(self) -> dict:
        return self._read_manifest().get("meta", {})

    def _snap_dir(self, version: int, what: str) -> str:
        return os.path.join(self.root, "snapshots", f"v{version:06d}", what)

    # -- snapshots --------------------------------------------------------
    def write_snapshot(
        self,
        frontier: DataFrame,
        filters: Optional[DataFrame] = None,
        meta: Optional[dict] = None,
        host_state: Optional[DataFrame] = None,
    ) -> int:
        """Write the next snapshot and commit the manifest (checkpoint)."""
        version = self.current_version() + 1

        # bucket the frontier by url_hash so seen-checks and merges are
        # co-partitioned across supersteps (stable partitioning = no
        # avoidable shuffle on the next read)
        def _frontier_write():
            (
                frontier.withColumn(
                    "partition_salt",
                    F.pmod(F.col("url_hash"), F.lit(self.n_buckets)).cast("int"),
                )
                .repartition(self.n_buckets, "partition_salt")
                .write.mode("overwrite")
                .option("compression", self.codec)
                .parquet(self._snap_dir(version, "frontier"))
            )

        # politeness token-bucket (host_state): one row per ACTIVE host
        # — a real table, not manifest JSON, so 10^7-host crawls
        # checkpoint without a driver-side blob. The three tables land
        # in independent directories under an uncommitted version, so
        # their writes run concurrently from driver threads (same
        # overlap as commit_step's delta+host_state pair); the manifest
        # commit below happens only after ALL succeed.
        side_writes = []
        if filters is not None:
            side_writes.append(
                lambda: filters.write.mode("overwrite")
                .option("compression", self.codec)
                .parquet(self._snap_dir(version, "filters"))
            )
        if host_state is not None:
            side_writes.append(
                lambda: host_state.write.mode("overwrite")
                .option("compression", self.codec)
                .parquet(self._snap_dir(version, "host_state"))
            )
        if side_writes:
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(1 + len(side_writes)) as pool:
                futures = [pool.submit(_frontier_write)] + [
                    pool.submit(w) for w in side_writes
                ]
                for f in futures:
                    f.result()
        else:
            _frontier_write()
        manifest = self._read_manifest()
        manifest["current"] = version
        manifest["base"] = version  # full snapshot resets the delta chain
        manifest["deltas"] = []
        if meta is not None:
            manifest["meta"] = meta
        self._write_manifest(manifest)
        return version

    # -- delta commits ------------------------------------------------------
    def commit_step(
        self,
        spark: SparkSession,
        updates: DataFrame,
        filters_increment=None,
        meta: Optional[dict] = None,
        host_state: Optional[DataFrame] = None,
    ) -> int:
        """Commit one superstep as a DELTA: only the updated/new frontier
        rows and the bloom increment are written. Reads reconstruct
        base + deltas; every ``compact_every`` deltas the reconstruction
        is rewritten as a new full base (amortized O(batch) per step).

        ``filters_increment`` may be a DataFrame or a zero-arg callable
        resolved AFTER the delta write — so callers can consult
        Observation counters collected by that write (e.g. skip the bloom
        increment entirely when the step discovered no new URLs).

        INVARIANT: ``updates`` must hold each url_hash at most once (the
        superstep's update set is groupBy(url_hash)-deduped by
        construction). The merge-on-read window relies on it for
        latest-wins to be well defined; a violating delta degrades to
        the deterministic column tiebreak in read_frontier, which keeps
        reads stable but silently drops the losing duplicate."""
        from ..plans.superstep import _tracer  # local import, no cycle

        _mark = _tracer()
        manifest = self._read_manifest()
        version = manifest["current"] + 1
        # the delta and host_state writes are independent jobs over data
        # the caller already cached (the superstep materializes the step
        # caches before committing) — run them concurrently from two
        # driver threads so the commit pays one write latency, not two.
        # Only the filters increment must WAIT for the delta write: its
        # callable may consult Observation counters that action fires.
        def _delta_write():
            updates.write.mode("overwrite").option(
                "compression", self.codec
            ).parquet(self._snap_dir(version, "delta"))

        if host_state is not None:
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(2) as pool:
                d = pool.submit(_delta_write)
                h = pool.submit(
                    lambda: host_state.write.mode("overwrite").option(
                        "compression", self.codec
                    ).parquet(self._snap_dir(version, "host_state"))
                )
                d.result()
                _mark("delta write")
                h.result()
        else:
            _delta_write()
            _mark("delta write")
        if callable(filters_increment):
            filters_increment = filters_increment()
        if filters_increment is not None:
            filters_increment.write.mode("overwrite").option(
                "compression", self.codec
            ).parquet(self._snap_dir(version, "filters"))
        _mark("side writes (filters/host_state)")
        manifest["current"] = version
        manifest.setdefault("base", -1)
        manifest.setdefault("deltas", []).append(version)
        if meta is not None:
            manifest["meta"] = meta
        self._write_manifest(manifest)
        if len(manifest["deltas"]) >= self.compact_every:
            # compaction: materialize and rewrite as a full base; the
            # filters are OR-merged into one row per partition
            from ..operators.seen import merge_bloom  # local import, no cycle

            full = self.read_frontier(spark)
            filters = self.read_filters(spark)
            if filters is not None:
                filters = merge_bloom(
                    filters, filters.limit(0)
                )  # one row per partition
            self.write_snapshot(
                full, filters, meta=manifest.get("meta"), host_state=self.read_host_state(spark)
            )
            _mark("compaction")
        return version

    def read_frontier(self, spark: SparkSession, version: Optional[int] = None) -> DataFrame:
        manifest = self._read_manifest()
        v = manifest["current"] if version is None else version
        if v < 0:
            return spark.createDataFrame([], FRONTIER_DDL)
        base = manifest.get("base", v)
        deltas = [d for d in manifest.get("deltas", []) if d <= v]
        if version is not None and version == base:
            deltas = []
        if base < 0:
            full = spark.createDataFrame([], FRONTIER_DDL)
        else:
            full = spark.read.schema(FRONTIER_DDL).parquet(
                self._snap_dir(base, "frontier")
            )
        if not deltas:
            return full
        # merge-on-read, latest-wins: ONE union + window over (url_hash,
        # version desc) replaces the chained per-delta anti-joins — k
        # deltas cost one shuffle and one window pass instead of k
        # anti-join shuffles and a k-deep plan (driver planning time and
        # stage count per superstep stay flat as the delta chain grows).
        # INVARIANT (see commit_step): each snapshot/delta holds a
        # url_hash at most once, so (version) is a total order per key.
        # The extra ordering columns are a deterministic tiebreak in
        # case an EXTERNALLY written delta ever violates that invariant
        # — the surviving row is then still the same on every read (the
        # zero-delta path returns the base verbatim, duplicates and
        # all; this path must not pick nondeterministically either).
        from pyspark.sql.window import Window

        cols = [f.name for f in full.schema.fields if f.name != "partition_salt"]
        parts = [full.select(*cols).withColumn("_v", F.lit(base))]
        for d in sorted(deltas):
            parts.append(
                spark.read.schema(DELTA_DDL)
                .parquet(self._snap_dir(d, "delta"))
                .select(*cols)
                .withColumn("_v", F.lit(d))
            )
        merged = parts[0]
        for p in parts[1:]:
            merged = merged.unionByName(p)
        w = Window.partitionBy("url_hash").orderBy(
            F.desc("_v"), F.asc("state"), F.asc("url"), F.asc("not_before")
        )
        return (
            merged.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .drop("_rn", "_v")
        )

    def read_keys(self, spark: SparkSession, deltas_only: bool = False) -> DataFrame:
        """All url_hash keys present in the frontier (base + deltas).

        Membership-only view for seen-checks: deltas UPSERT rows and
        never delete keys (recrawl compaction rewrites the BASE), so the
        key set is the plain union of the base's and every delta's
        url_hash column — no merge-on-read join chain. The scan is
        column-pruned to url_hash (at scale: one parquet column instead
        of k anti-joins over full rows). May contain duplicates; fine
        for anti-join/semi-join probes.

        ``deltas_only=True`` returns just the keys the delta chain added
        since the base — the slice the base bloom filters do NOT cover
        under the deferred-increment policy (see commit_step): the
        superstep anti-joins its bloom-negative candidates against this
        small set, and compaction builds one catch-up bloom increment
        from it. O(compact_every x batch) rows by construction."""
        manifest = self._read_manifest()
        base = manifest.get("base", manifest["current"])
        paths = (
            []
            if deltas_only or base < 0
            else [self._snap_dir(base, "frontier")]
        )
        paths += [self._snap_dir(d, "delta") for d in manifest.get("deltas", [])]
        if not paths:
            return spark.createDataFrame([], "url_hash long")
        # single multi-path scan, column-pruned to url_hash by the
        # explicit schema (parquet reads by name, so the base's extra
        # partition_salt column never has to line up with the deltas)
        return spark.read.schema("url_hash long").parquet(*paths)

    def read_filters(self, spark: SparkSession) -> Optional[DataFrame]:
        """Base filters plus all delta increments (union of rows; the
        bloom probe ORs multiple rows per partition, so increments need
        no eager merge — compaction collapses them)."""
        manifest = self._read_manifest()
        base = manifest.get("base", manifest["current"])
        versions = ([base] if base >= 0 else []) + manifest.get("deltas", [])
        paths = [
            self._snap_dir(v, "filters")
            for v in versions
            if os.path.exists(self._snap_dir(v, "filters"))
        ]
        if not paths:
            return None
        from ..operators.seen import FILTERS_DDL

        return spark.read.schema(FILTERS_DDL).parquet(*paths)

    def read_host_state(self, spark: SparkSession) -> Optional[DataFrame]:
        """The most recent snapshot/delta that carries a host_state table
        (each commit writes the FULL small table)."""
        manifest = self._read_manifest()
        for v in range(manifest["current"], -1, -1):
            path = self._snap_dir(v, "host_state")
            if os.path.exists(path):
                return spark.read.schema(HOST_STATE_DDL).parquet(path)
        return None

    # -- MERGE ------------------------------------------------------------
    @staticmethod
    def merge_frontier(current: DataFrame, updates: DataFrame) -> DataFrame:
        """MERGE semantics on url_hash: update-or-insert ``updates`` rows.

        Equivalent SQL (the Iceberg path):
            MERGE INTO frontier t USING updates s ON t.url_hash = s.url_hash
            WHEN MATCHED THEN UPDATE SET *  WHEN NOT MATCHED THEN INSERT *
        """
        cols = [f.name for f in current.schema.fields if f.name != "partition_salt"]
        return (
            current.select(*cols)
            .join(updates.select("url_hash"), "url_hash", "left_anti")
            .unionByName(updates.select(*cols))
        )

    # -- append-only side tables -------------------------------------------
    def append_metrics(self, metrics: DataFrame) -> None:
        metrics.write.mode("append").parquet(os.path.join(self.root, "metrics"))

    def append_lineage(self, lineage: DataFrame) -> None:
        lineage.write.mode("append").parquet(os.path.join(self.root, "lineage"))

    def _append_local(self, dirname: str, table) -> None:
        """Driver-side parquet append for tiny per-step side rows (a
        handful of already-collected counters): one pyarrow file write
        instead of a whole Spark job. Readable by spark.read.parquet
        alongside Spark-written files."""
        import uuid

        import pyarrow.parquet as pq

        d = os.path.join(self.root, dirname)
        os.makedirs(d, exist_ok=True)
        pq.write_table(table, os.path.join(d, f"part-{uuid.uuid4().hex}.parquet"))

    def append_metrics_rows(self, rows) -> None:
        """rows: (step, scheduled, fetched, disallowed, new_urls) ints —
        values already on the driver (Observation counters)."""
        import pyarrow as pa

        self._append_local(
            "metrics",
            pa.table(
                {
                    "step": pa.array([r[0] for r in rows], pa.int32()),
                    "scheduled": pa.array([r[1] for r in rows], pa.int64()),
                    "fetched": pa.array([r[2] for r in rows], pa.int64()),
                    "disallowed": pa.array([r[3] for r in rows], pa.int64()),
                    "new_urls": pa.array([r[4] for r in rows], pa.int64()),
                }
            ),
        )

    def append_lineage_rows(self, rows) -> None:
        """rows: (partition_id, n_scheduled, n_allowed, step) ints."""
        import pyarrow as pa

        self._append_local(
            "lineage",
            pa.table(
                {
                    "partition_id": pa.array([r[0] for r in rows], pa.int32()),
                    "n_scheduled": pa.array([r[1] for r in rows], pa.int64()),
                    "n_allowed": pa.array([r[2] for r in rows], pa.int64()),
                    "step": pa.array([r[3] for r in rows], pa.int32()),
                }
            ),
        )

    def read_metrics(self, spark: SparkSession) -> Optional[DataFrame]:
        path = os.path.join(self.root, "metrics")
        return spark.read.parquet(path) if os.path.exists(path) else None

    def read_lineage(self, spark: SparkSession) -> Optional[DataFrame]:
        path = os.path.join(self.root, "lineage")
        return spark.read.parquet(path) if os.path.exists(path) else None
