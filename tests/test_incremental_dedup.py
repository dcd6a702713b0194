"""Incremental LSH dedup (operators/dedup.py:lsh_band_index,
incremental_lsh_candidates): a new crawl batch dedups against itself
plus the archive's PERSISTED band index — never re-shingling archive
text. The driver oracle (incremental_dedup) pins the md5-twin replay;
these tests pin the semantic contract: exact equivalence with the
full-corpus LSH restricted to new-touching pairs, and the archive
hot-bucket collapse."""

from pyspark.sql import functions as F

from texting_robots_spark.operators.dedup import (
    incremental_lsh_candidates,
    lsh_band_index,
    minhash_lsh_candidates,
    minhash_signature,
)


def _corpus(spark):
    """Doc clusters that straddle the old/new boundary: near-dup text
    shared inside groups, unique filler elsewhere."""
    rows = []
    for g in range(6):
        body = " ".join(f"w{g}t{i}" for i in range(30))
        for m in range(4):
            # ids interleave old (odd) and new (even) within a group
            rows.append((f"{g * 10 + m}", body + f" tail{m}"))
    for i in range(20):
        rows.append((f"9{i:02d}", " ".join(f"u{i}x{j}" for j in range(25))))
    return spark.createDataFrame(rows, "doc_id string, text string")


def test_incremental_equals_full_lsh_restriction(spark):
    docs = _corpus(spark)
    is_new = F.col("doc_id").cast("long") % 2 == 0
    base_index = lsh_band_index(
        minhash_signature(docs.where(~is_new), "text", 4), n_hashes=4, band_size=2
    )
    inc = incremental_lsh_candidates(docs.where(is_new), base_index)
    got = {(r["id_a"], r["id_b"], r["against"]) for r in inc.collect()}
    assert all(int(a) % 2 == 0 for a, _, _ in got)

    full = minhash_lsh_candidates(docs)
    expected = set()
    for r in full.collect():
        a, b = r["id_a"], r["id_b"]
        na, nb = int(a) % 2 == 0, int(b) % 2 == 0
        if na and nb:
            expected.add((min(a, b), max(a, b), "new"))
        elif na:
            expected.add((a, b, "base"))
        elif nb:
            expected.add((b, a, "base"))
    assert got == expected
    assert any(t == "base" for _, _, t in got)  # cross-boundary pairs exist
    assert any(t == "new" for _, _, t in got)


def test_incremental_archive_hot_bucket_collapses(spark):
    """An archive bucket saturated with near-identical docs must cost
    O(new) rows, not O(new x archive): with the cap, every new doc
    pairs only with the bucket's min-id representative."""
    body = " ".join(f"b{i}" for i in range(40))
    old = [(f"{2 * i + 1}", body) for i in range(10)]  # 10 identical, odd ids
    new = [("100", body), ("102", body)]
    docs = spark.createDataFrame(old + new, "doc_id string, text string")
    is_new = F.col("doc_id").cast("long") % 2 == 0
    base_index = lsh_band_index(
        minhash_signature(docs.where(~is_new), "text", 4), n_hashes=4, band_size=2
    )
    inc = incremental_lsh_candidates(
        docs.where(is_new), base_index, max_bucket_size=3
    )
    vs_base = [r for r in inc.collect() if r["against"] == "base"]
    # 2 new docs x 1 representative (min odd id = "1"), not 2 x 10
    assert {(r["id_a"], r["id_b"]) for r in vs_base} == {("100", "1"), ("102", "1")}
    assert all(r["via_representative"] for r in vs_base)
    # the new-new pair is still found pairwise (bucket of 2 <= cap)
    nn = [r for r in inc.collect() if r["against"] == "new"]
    assert {(r["id_a"], r["id_b"]) for r in nn} == {("100", "102")}
    assert not nn[0]["via_representative"]
