#!/usr/bin/env python
"""Event-log stage attribution for a crawl run — where the superstep's
single big action (the delta write executes the whole step plan)
actually spends its task time.

Usage:
    1. run any crawl with spark.eventLog.enabled=true,
       spark.eventLog.dir=file:///some/dir
    2. python tools/step_profile.py /some/dir

Prints two tables: task-core-seconds by call site, and by the stage's
operator signature (RDD scope names — Exchange / ArrowEvalPython /
WindowGroupLimit / WriteFiles / ...). ArrowEvalPython marks the pandas
UDF stages (gate + canonicalize); WriteFiles the parquet encodes;
parallelize a driver-side createDataFrame. Round-5 findings from this
tool: the pandas-UDF stages dominate step compute (consistent with the
kernel-vs-wall probe: ~2/3 Arrow/IPC), and RulesBroadcast.delay_df was
re-parallelized every step (now cached).
"""

from __future__ import annotations

import collections
import glob
import io
import json
import os
import subprocess
import sys


def _open_log(path: str):
    if os.path.isdir(path):
        cands = sorted(
            glob.glob(os.path.join(path, "eventlog_v2_*", "events_*"))
            + glob.glob(os.path.join(path, "app-*"))
            + glob.glob(os.path.join(path, "local-*"))
        )
        if not cands:
            raise SystemExit(f"no event logs under {path}")
        path = cands[-1]
    if path.endswith(".zstd"):
        out = subprocess.run(["zstd", "-dc", path], capture_output=True)
        if out.returncode != 0:
            raise SystemExit("zstd decode failed: " + out.stderr.decode()[:200])
        return io.StringIO(out.stdout.decode())
    return open(path)


def main() -> None:
    stream = _open_log(sys.argv[1] if len(sys.argv) > 1 else "/tmp/trs_evt")
    names, sigs, ntasks = {}, {}, {}
    core_s = collections.Counter()
    shuf_w = collections.Counter()
    shuf_r = collections.Counter()
    for line in stream:
        try:
            e = json.loads(line)
        except ValueError:
            continue
        t = e.get("Event")
        if t == "SparkListenerStageCompleted":
            si = e["Stage Info"]
            sid = si["Stage ID"]
            names[sid] = si["Stage Name"]
            ntasks[sid] = si.get("Number of Tasks", 0)
            ops, seen = [], set()
            for r in si.get("RDD Info", []):
                sc = r.get("Scope")
                if sc:
                    try:
                        n = json.loads(sc).get("name", "")
                    except ValueError:
                        continue
                    if n and n not in seen:
                        seen.add(n)
                        ops.append(n)
            sigs[sid] = ",".join(ops)
        elif t == "SparkListenerTaskEnd":
            sid = e["Stage ID"]
            tm = e.get("Task Metrics") or {}
            core_s[sid] += tm.get("Executor Run Time", 0) / 1000.0
            shuf_w[sid] += (tm.get("Shuffle Write Metrics") or {}).get(
                "Shuffle Bytes Written", 0
            )
            sr = tm.get("Shuffle Read Metrics") or {}
            shuf_r[sid] += sr.get("Remote Bytes Read", 0) + sr.get(
                "Local Bytes Read", 0
            )

    def table(keyfn, title, width):
        agg = collections.Counter()
        w = collections.Counter()
        r = collections.Counter()
        n = collections.Counter()
        for sid, ct in core_s.items():
            k = keyfn(sid)
            agg[k] += ct
            w[k] += shuf_w[sid]
            r[k] += shuf_r[sid]
            n[k] += 1
        print(f"\n== {title} ==")
        print(f"{'key':{width}s} {'n':>3s} {'core-s':>8s} {'shW MB':>8s} {'shR MB':>8s}")
        for k, ct in agg.most_common(20):
            print(
                f"{k[:width]:{width}s} {n[k]:3d} {ct:8.1f} "
                f"{w[k]/1e6:8.1f} {r[k]/1e6:8.1f}"
            )

    table(lambda s: names.get(s, "?"), "by call site", 60)
    table(lambda s: sigs.get(s, "?")[:88], "by operator signature", 88)
    print(f"\ntotal task-core-seconds: {sum(core_s.values()):.1f}")


if __name__ == "__main__":
    main()
