"""Hot-bucket safety valve for LSH candidate generation (VERDICT r5 #1:
the band self-join's per-bucket m^2/2 output was the one remaining plan
that dies at 100x — boilerplate corpora put 10^5-10^6 near-identical
docs into ONE bucket). These tests drive the adversarial shape the
verdict demanded: 10^4 IDENTICAL documents landing in a single band
bucket must complete with BOUNDED output (star edges to a
representative, or nothing in drop mode), candidates found through an
unsaturated bucket stay pairwise, and a cap that never binds is
bit-identical to the un-capped operator."""

from pyspark.sql import functions as F

from texting_robots_spark.operators.dedup import (
    minhash_lsh_candidates,
    simhash_near_dups,
)

N_DUP = 10_000


def _dup_corpus(spark, n_distinct=6):
    """10^4 identical docs + a few genuinely distinct docs (each pair of
    distinct docs shares no shingle, so cross-bucket noise is minimal)."""
    dups = spark.range(N_DUP).select(
        F.format_string("dup%05d", F.col("id")).alias("doc_id"),
        F.lit("the same boilerplate page body repeated across hosts").alias(
            "text"
        ),
    )
    texts = [
        "alpha bravo charlie delta echo foxtrot golf",
        "hotel india juliet kilo lima mike november",
        "oscar papa quebec romeo sierra tango uniform",
        "victor whiskey xray yankee zulu one two",
        "three four five six seven eight nine",
        "ten eleven twelve thirteen fourteen fifteen sixteen",
    ][:n_distinct]
    distinct = spark.createDataFrame(
        [(f"uniq{i}", t) for i, t in enumerate(texts)], "doc_id string, text string"
    )
    return dups.unionByName(distinct)


def test_minhash_hot_bucket_collapse_bounds_output(spark):
    docs = _dup_corpus(spark)
    out = minhash_lsh_candidates(docs, max_bucket_size=100).cache()
    try:
        # 10^4 identical docs uncapped would emit ~5*10^7 pairs; the
        # collapse emits exactly m-1 star edges on the min-id rep
        stars = out.where(F.col("via_representative"))
        star_rows = stars.collect()
        assert len(star_rows) == N_DUP - 1
        assert all(r["id_a"] == "dup00000" for r in star_rows)
        assert {r["id_b"] for r in star_rows} == {
            f"dup{i:05d}" for i in range(1, N_DUP)
        }
        # total output stays O(m), nowhere near the m^2/2 blowup, and
        # every member remains connected to the representative (the
        # component the dedup grouping consumes is preserved)
        assert out.count() < N_DUP + 100
    finally:
        out.unpersist()


def test_minhash_hot_bucket_drop_mode(spark):
    docs = _dup_corpus(spark)
    out = minhash_lsh_candidates(
        docs, max_bucket_size=100, on_oversize="drop"
    ).cache()
    try:
        # saturated buckets emit nothing; no dup id appears at all
        assert out.where(F.col("id_a").startswith("dup")).count() == 0
        assert out.where(F.col("via_representative")).count() == 0
    finally:
        out.unpersist()


def test_minhash_cap_that_never_binds_is_identical(spark):
    """No-silent-semantics-change guard: with every bucket under the
    cap, the capped operator returns the exact un-capped pair set and
    marks nothing as via_representative."""
    docs = spark.createDataFrame(
        [
            ("a", "quick brown fox jumps over the lazy dog today"),
            ("b", "quick brown fox jumps over the lazy dog tonight"),
            ("c", "completely different text with other words here"),
            ("d", "quick brown fox jumps over the lazy dog today"),
        ],
        "doc_id string, text string",
    )
    plain = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_candidates(docs).collect()
    }
    capped = minhash_lsh_candidates(docs, max_bucket_size=1000).collect()
    assert {(r["id_a"], r["id_b"]) for r in capped} == plain
    assert all(not r["via_representative"] for r in capped)
    assert len(plain) >= 1  # a/b/d collide somewhere


def test_simhash_hot_bucket_collapse_verifies_hamming(spark):
    docs = _dup_corpus(spark, n_distinct=2)
    out = simhash_near_dups(docs, max_hamming=3, max_bucket_size=100).cache()
    try:
        stars = out.where(F.col("via_representative")).collect()
        # identical docs: hamming 0 to the representative, all kept
        assert len(stars) == N_DUP - 1
        assert all(r["hamming"] == 0 for r in stars)
        assert all(r["id_a"] == "dup00000" for r in stars)
        assert out.count() < N_DUP + 100
    finally:
        out.unpersist()


def test_simhash_pairwise_evidence_beats_representative(spark):
    """A pair found pairwise in ANY unsaturated band keeps
    via_representative=false even if another of its bands is saturated
    — the marker means 'this edge exists ONLY via collapse'."""
    docs = spark.createDataFrame(
        [("x1", "alpha beta gamma delta"), ("x2", "alpha beta gamma delta")],
        "doc_id string, text string",
    )
    out = simhash_near_dups(docs, max_hamming=3, max_bucket_size=100).collect()
    assert len(out) == 1
    assert out[0]["via_representative"] is False
    assert out[0]["hamming"] == 0


def test_embedding_lsh_hot_bucket_drop_and_collapse(spark):
    """Hyperplane-LSH near-dup candidates under a saturated bucket:
    10^3 identical embeddings saturate every table's bucket. Drop mode
    (the default for embeddings — a saturated hyperplane bucket is
    low-information) completes with zero dup edges; collapse mode emits
    the m-1 star edges, each exact-cosine verified at 1.0."""
    from texting_robots_spark.operators.similarity import embedding_near_dups

    n = 1000
    dim = 8
    vec = [float(i % 3 - 1) or 0.5 for i in range(dim)]
    emb = spark.range(n).select(
        F.format_string("v%04d", F.col("id")).alias("vec_id"),
        F.array(*[F.lit(v) for v in vec]).alias("embedding"),
    )
    dropped = embedding_near_dups(
        emb, threshold=0.9, method="lsh", dim=dim, n_tables=2,
        max_bucket_size=50,
    )
    assert dropped.count() == 0
    collapsed = embedding_near_dups(
        emb, threshold=0.9, method="lsh", dim=dim, n_tables=2,
        max_bucket_size=50, on_oversize="collapse",
    ).cache()
    try:
        rows = collapsed.collect()
        assert len(rows) == n - 1
        assert all(r["via_representative"] for r in rows)
        assert all(abs(r["cos_sim"] - 1.0) < 1e-6 for r in rows)
        assert all(r["id_a"] == "v0000" for r in rows)
    finally:
        collapsed.unpersist()


def test_embedding_ivf_hot_bucket_cap(spark):
    """IVF-cell candidate generation honors the same valve: one
    saturated cell of identical vectors completes with bounded output."""
    from texting_robots_spark.operators.similarity import embedding_near_dups

    n = 500
    dim = 4
    emb = spark.range(n).select(
        F.format_string("v%04d", F.col("id")).alias("vec_id"),
        F.array(F.lit(1.0), F.lit(0.5), F.lit(-0.5), F.lit(0.25)).alias(
            "embedding"
        ),
    )
    out = embedding_near_dups(
        emb, threshold=0.9, method="ivf", n_cells=4,
        max_bucket_size=20, on_oversize="collapse",
    )
    rows = out.collect()
    assert len(rows) == n - 1
    assert all(r["via_representative"] for r in rows)
