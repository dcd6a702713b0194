"""Span operators over interleaved text+media documents (input_hint shape).

Per-row invariant vs the reference data model: span-sequence equality —
any pipeline must preserve the exact ordered (kind, text, media_ref)
list per doc. Arrays are order-preserving in Spark, but ``collect_list``
after a shuffle is NOT, so reassembly always sorts on the carried
``pos`` (SURVEY.md §2.C).

All operators here are pure native Spark expressions (posexplode /
transform / array_sort) — zero Python in the row path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["extract_links", "span_signature", "explode_spans", "reassemble_spans"]


def explode_spans(docs: DataFrame, passthrough: tuple = ()) -> DataFrame:
    """documents(doc_id, spans) -> (doc_id, pos, span) rows, order carried
    explicitly in ``pos``. ``passthrough`` columns ride along (explicit,
    not implicit — the documents table's own ``url`` column would collide
    with downstream link aliases)."""
    return docs.select(
        "doc_id", *passthrough, F.posexplode("spans").alias("pos", "span")
    )


def extract_links(docs: DataFrame, passthrough: tuple = ()) -> DataFrame:
    """Outgoing links, one row per link span, document order preserved via
    ``pos``. Links live in the span's ``text`` field (FIXTURES.md §3).

    ``passthrough`` lets callers carry per-doc columns (e.g. crawl depth)
    through the explode instead of re-joining them on doc_id afterwards —
    one shuffle less in the superstep's hot path."""
    return (
        explode_spans(docs, passthrough)
        .where(F.col("span.kind") == "link")
        .select(
            "doc_id",
            *passthrough,
            "pos",
            F.col("span.text").alias("url"),
        )
    )


def span_signature(spans_col: str = "spans") -> Column:
    """Order-preserving (kind, text, media_ref) signature column used by
    the span-sequence-equality invariant checks."""
    return F.transform(
        spans_col,
        lambda s: F.struct(
            s["kind"].alias("kind"),
            s["text"].alias("text"),
            s["media_ref"].alias("media_ref"),
        ),
    )


def reassemble_spans(exploded: DataFrame) -> DataFrame:
    """(doc_id, pos, span) -> (doc_id, spans), restoring exact order.

    collect_list order is nondeterministic after a shuffle, so sort the
    (pos, span) structs before projecting the spans back out.
    """
    return (
        exploded.groupBy("doc_id")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "span"))).alias("ps"))
        .select("doc_id", F.transform("ps", lambda x: x["span"]).alias("spans"))
    )
