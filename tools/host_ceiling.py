"""Host-ceiling controls for the scaling evidence (BENCH/BASELINE.md).

The north rule's efficiency criterion assumes the two cluster sizes
differ only in ENGINE resources. On a single VM they also share one
memory bus and one disk, so workloads whose cost is dominated by bytes
moved (shuffle writes, tmpfs I/O, Arrow transfers) hit the HOST's
aggregate-bandwidth ceiling before the engine's dataflow limits. This
probe measures that ceiling directly, the same way the crawl uses it:

- cpu:    N concurrent pure-Python xxhash-style integer loops — the
          compute ceiling (should scale ~linearly to physical cores).
- memcpy: N concurrent 256 MiB numpy buffer copies — the memory-
          bandwidth ceiling (saturates once a few cores can fill the
          bus; extra cores add little).

Usage: python tools/host_ceiling.py            # prints one JSON line
"""

from __future__ import annotations

import json
import multiprocessing as mp
import time


def _cpu_worker(n_iter: int, out):
    t0 = time.time()
    x = 0x9E3779B97F4A7C15
    for i in range(n_iter):
        x = (x * 0xBF58476D1CE4E5B9 + i) & 0xFFFFFFFFFFFFFFFF
    out.put((n_iter, time.time() - t0, x & 1))


def _memcpy_worker(n_copies: int, mb: int, out):
    import numpy as np

    src = np.random.default_rng(0).integers(0, 255, mb << 20, dtype=np.uint8)
    dst = np.empty_like(src)
    t0 = time.time()
    for _ in range(n_copies):
        np.copyto(dst, src)
        src, dst = dst, src
    out.put((n_copies * mb, time.time() - t0, int(src[0])))


def measure(worker, args, n_procs: int) -> float:
    """Aggregate units/sec across n_procs concurrent processes."""
    q = mp.Queue()
    procs = [
        mp.Process(target=worker, args=(*args, q)) for _ in range(n_procs)
    ]
    t0 = time.time()
    for p in procs:
        p.start()
    results = [q.get() for _ in procs]
    for p in procs:
        p.join()
    wall = time.time() - t0
    total_units = sum(r[0] for r in results)
    return total_units / wall


def main():
    out = {}
    for n in (2, 8):
        out[f"cpu_{n}"] = measure(_cpu_worker, (20_000_000,), n)
    for n in (2, 8):
        out[f"memcpy_{n}"] = measure(_memcpy_worker, (40, 256), n)
    res = {
        "cpu_ops_per_sec": {"2": round(out["cpu_2"]), "8": round(out["cpu_8"])},
        "cpu_2to8_efficiency": round(out["cpu_8"] / (4 * out["cpu_2"]), 3),
        "memcpy_mb_per_sec": {
            "2": round(out["memcpy_2"]),
            "8": round(out["memcpy_8"]),
        },
        "memcpy_2to8_efficiency": round(
            out["memcpy_8"] / (4 * out["memcpy_2"]), 3
        ),
    }
    print(json.dumps(res))


if __name__ == "__main__":
    main()
