"""Local replica of the driver's correctness gate: run every queries()
entry through Spark AND its oracle_sql() through DuckDB at a given SF,
compare row count, column names, and an order-insensitive value hash.

Usage: python tools/check_oracle.py [sf_dir] [only_query ...]
"""

from __future__ import annotations

import hashlib
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def _norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return f"{v:.9g}"
    try:
        import decimal

        if isinstance(v, decimal.Decimal):
            f = float(v)
            if f == int(f) and abs(f) < 1e15:
                return str(int(f))
            return f"{f:.9g}"
    except ImportError:
        pass
    return str(v)


def value_hash(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    lines = sorted(
        "\x01".join(_norm_cell(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    # oracles that replay trained literals (ann_ivf_topk) read the same
    # SF the queries run at
    os.environ["SPARK_GRAFT_ORACLE_SF"] = sf_dir

    import duckdb
    from pyspark.sql import SparkSession

    import __spark_entry__ as entrymod

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("oracle-check")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    con = duckdb.connect()
    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.time()
        sdf = fn(spark, sf_dir)
        srows = sdf.collect()
        scols = sdf.columns
        took = time.time() - t0
        if name not in oracles:
            print(f"  {name:32s} rows-only: {len(srows):7d} rows  ({took:.1f}s)")
            if len(srows) == 0:
                failures.append((name, "zero rows (rows-only)"))
            continue
        ores = con.execute(oracles[name])
        ocols = [d[0] for d in ores.description]
        orows = ores.fetchall()
        ok_count = len(srows) == len(orows)
        ok_cols = sorted(scols) == sorted(ocols)
        sh = value_hash([tuple(r) for r in srows], scols)
        oh = value_hash(orows, ocols)
        ok_hash = sh == oh
        status = "OK " if (ok_count and ok_cols and ok_hash) else "FAIL"
        print(
            f"  {name:32s} {status} rows {len(srows)}/{len(orows)} "
            f"cols={'ok' if ok_cols else sorted(scols)} hash={'ok' if ok_hash else 'MISMATCH'}  ({took:.1f}s)"
        )
        if status == "FAIL":
            failures.append((name, f"count={ok_count} cols={ok_cols} hash={ok_hash}"))
            if not ok_hash and ok_count and ok_cols:
                order = sorted(range(len(scols)), key=lambda i: scols[i])
                s_set = sorted("\x01".join(_norm_cell(r[i]) for i in order) for r in [tuple(x) for x in srows])
                o_order = sorted(range(len(ocols)), key=lambda i: ocols[i])
                o_set = sorted("\x01".join(_norm_cell(r[i]) for i in o_order) for r in orows)
                diff = [(a, b) for a, b in zip(s_set, o_set) if a != b][:3]
                for a, b in diff:
                    print(f"      spark: {a[:140]}")
                    print(f"      duck : {b[:140]}")
    print()
    if failures:
        print("FAILURES:", failures)
        sys.exit(1)
    print("all queries match")


if __name__ == "__main__":
    main()
