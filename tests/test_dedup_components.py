"""Connected components + duplicate resolution (operators/dedup.py:
connected_components, resolve_duplicates) — the step that turns dedup
candidate PAIRS into GROUPS. The driver oracle (dedup_components)
pins the full LSH->components pipeline against a DuckDB recursive-CTE
closure; these tests pin the operator semantics directly: agreement
with union-find ground truth, O(log n)-round chain convergence, input
normalization, and determinism under repartitioning."""

import random

from pyspark.sql import functions as F

from texting_robots_spark.operators.dedup import (
    connected_components,
    resolve_duplicates,
)


def _union_find_expected(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    groups = {}
    for n in parent:
        groups.setdefault(find(n), []).append(n)
    out = {}
    for members in groups.values():
        m = min(members)
        for n in members:
            if n != m:
                out[n] = m
    return out


def test_connected_components_two_groups(spark):
    pairs = spark.createDataFrame(
        [("d2", "d1"), ("d2", "d3"), ("d4", "d3"), ("d5", "d4"), ("d8", "d9")],
        "id_a string, id_b string",
    )
    got = {r["node"]: r["component"] for r in connected_components(pairs).collect()}
    # transitive closure: d4/d5 reach d1 through the chain
    assert got == {"d2": "d1", "d3": "d1", "d4": "d1", "d5": "d1", "d9": "d8"}


def test_connected_components_long_chain(spark):
    """A 201-node path (worst case for naive min-label propagation —
    diameter 200) must resolve to ONE component within the default
    max_iter=25: star contraction is O(log n) rounds, so a chain like
    consecutive-crawl-snapshot near-dups cannot run away."""
    chain = spark.createDataFrame(
        [(f"n{i:04d}", f"n{i+1:04d}") for i in range(200)],
        "id_a string, id_b string",
    )
    out = connected_components(chain).collect()
    assert len(out) == 200
    assert {r["component"] for r in out} == {"n0000"}


def test_connected_components_matches_union_find(spark):
    rnd = random.Random(11)
    edges = [
        (f"x{rnd.randrange(300):03d}", f"x{rnd.randrange(300):03d}")
        for _ in range(250)
    ]
    edges = [(a, b) for a, b in edges if a != b]
    df = spark.createDataFrame(edges, "id_a string, id_b string")
    got = {r["node"]: r["component"] for r in connected_components(df).collect()}
    assert got == _union_find_expected(edges)


def test_connected_components_normalizes_input(spark):
    """Duplicate pairs, reversed pairs, and self-loops must not change
    the result (LSH emits (a,b) per band — the same pair arrives many
    times; the capped path can emit star edges both ways)."""
    messy = spark.createDataFrame(
        [("b", "a"), ("a", "b"), ("a", "a"), ("b", "c"), ("c", "b"), ("b", "c")],
        "id_a string, id_b string",
    )
    got = {r["node"]: r["component"] for r in connected_components(messy).collect()}
    assert got == {"b": "a", "c": "a"}


def test_resolve_duplicates_survivors(spark):
    docs = spark.createDataFrame(
        [(f"d{i}",) for i in (1, 2, 3, 7, 8, 9)], "doc_id string"
    )
    pairs = spark.createDataFrame(
        [("d2", "d1"), ("d2", "d3"), ("d8", "d9")], "id_a string, id_b string"
    )
    out = resolve_duplicates(docs, pairs)
    rows = {r["doc_id"]: (r["component"], r["is_survivor"]) for r in out.collect()}
    assert rows == {
        "d1": ("d1", True),
        "d2": ("d1", False),
        "d3": ("d1", False),
        "d7": ("d7", True),  # isolated doc survives as its own group
        "d8": ("d8", True),
        "d9": ("d8", False),
    }
    # exactly one survivor per component; survivors form the deduped corpus
    per_comp = (
        out.groupBy("component")
        .agg(F.sum(F.col("is_survivor").cast("int")).alias("k"))
        .collect()
    )
    assert all(r["k"] == 1 for r in per_comp)


def test_connected_components_deterministic_under_repartition(spark):
    rnd = random.Random(3)
    edges = [
        (f"y{rnd.randrange(150):03d}", f"y{rnd.randrange(150):03d}")
        for _ in range(120)
    ]
    edges = [(a, b) for a, b in edges if a != b]
    df = spark.createDataFrame(edges, "id_a string, id_b string")
    first = {r["node"]: r["component"] for r in connected_components(df).collect()}
    again = {
        r["node"]: r["component"]
        for r in connected_components(df.repartition(13)).collect()
    }
    assert first == again
