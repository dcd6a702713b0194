"""Span-sequence invariant tests (input_hint: per-row invariant is exact
(kind, text, media_ref, order) equality through any transformation)."""

from pyspark.sql import functions as F

from texting_robots_spark.operators.links import (
    explode_spans,
    extract_links,
    reassemble_spans,
    span_signature,
)
from texting_robots_spark.sources.synth import synth_documents_df, synth_universe


def _docs(spark, n_docs=120):
    documents, _, _ = synth_universe(n_hosts=8, n_docs=n_docs, seed=42)
    return synth_documents_df(spark, documents)


def test_explode_reassemble_roundtrip_preserves_span_order(spark):
    docs = _docs(spark)
    # force a shuffle between explode and reassemble to prove order is
    # restored from pos, not from luck
    exploded = explode_spans(docs).repartition(7, "pos")
    back = reassemble_spans(exploded)
    orig = docs.select("doc_id", span_signature("spans").alias("sig"))
    rebuilt = back.select("doc_id", span_signature("spans").alias("sig"))
    diff = (
        orig.alias("o")
        .join(rebuilt.alias("r"), "doc_id")
        .where(F.col("o.sig") != F.col("r.sig"))
    )
    assert diff.count() == 0
    assert back.count() == docs.count()


def test_extract_links_only_link_spans_in_document_order(spark):
    docs = _docs(spark)
    links = extract_links(docs).collect()
    rows = {r["doc_id"]: r["spans"] for r in docs.collect()}
    expected = {}
    for doc_id, spans in rows.items():
        expected[doc_id] = [
            (i, s["text"]) for i, s in enumerate(spans) if s["kind"] == "link"
        ]
    got = {}
    for r in links:
        got.setdefault(r["doc_id"], []).append((r["pos"], r["url"]))
    for doc_id in got:
        got[doc_id].sort()
    assert got == {k: v for k, v in expected.items() if v}


def test_extract_links_output_schema(spark):
    docs = _docs(spark)
    assert [f.name for f in extract_links(docs).schema.fields] == ["doc_id", "pos", "url"]


def test_distributed_synth_closed_world(spark):
    """Every link in the distributed synthetic universe must resolve to a
    generated doc URL, and generation must be deterministic."""
    from texting_robots_spark.sources.synth import synth_documents_distributed

    docs = synth_documents_distributed(spark, 2000, n_hosts=50).cache()
    assert docs.count() == 2000
    urls = {r["url"] for r in docs.select("url").collect()}
    links = extract_links(docs)
    targets = {
        r["url"].split("#")[0] for r in links.select("url").distinct().collect()
    }
    assert targets <= urls, f"dangling links: {list(targets - urls)[:3]}"
    # deterministic across invocations
    a = sorted(r["url"] for r in docs.collect())
    b = sorted(
        r["url"] for r in synth_documents_distributed(spark, 2000, n_hosts=50).collect()
    )
    assert a == b
    # Zipf skew: the most popular host should hold a large share
    top = (
        docs.groupBy("host").count().orderBy(F.desc("count")).limit(1).collect()[0]
    )
    assert top["count"] > 2000 * 0.05
