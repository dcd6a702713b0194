"""Deterministic synthetic crawl universe (seed-fixed, no external data).

Produces the input_hint-shaped interleaved documents table plus per-host
robots.txt and a seed URL list:

- documents(doc_id string, url string, host string,
            spans array<struct<kind,text,media_ref,offset>>)
- robots_raw(host string, body binary, status int)
- seeds: list[str]

Host popularity is Zipf-skewed and link targets follow it, so per-host
skew (the frontier's main physical hazard, SURVEY.md §4.3) is exercised
even at test scale. Every link URL maps back to a generated document
(url = https://{host}/page/{k}), closing the crawl loop without a
network. 10^10 URLs is the design scale; ``n_docs`` is the knob.
"""

from __future__ import annotations

import random
from typing import List, Tuple

from pyspark.sql import DataFrame, SparkSession

__all__ = ["SPANS_DDL", "synth_universe", "doc_url", "synth_documents_df", "synth_robots_df"]

SPANS_DDL = "array<struct<kind:string,text:string,media_ref:string,offset:int>>"

DOCS_DDL = f"doc_id string, url string, host string, spans {SPANS_DDL}"

_WORDS = (
    "spark frontier crawl robots gate politeness shuffle broadcast bloom "
    "partition salt skew window rank merge snapshot lineage metric span media"
).split()


def doc_url(host: str, k: int) -> str:
    return f"https://{host}/page/{k}"


def _robots_body(i: int, rng: random.Random) -> bytes:
    """Deterministic robots.txt flavor per host index — exercises every
    matcher tier (prefix / starred / $-regex), group selection, delays."""
    flavor = i % 6
    if flavor == 0:
        # wide open, with a sitemap
        return (
            f"User-agent: *\nAllow: /\nSitemap: https://host{i}.example/sitemap.xml\n"
        ).encode()
    if flavor == 1:
        delay = round(0.5 + (i % 4) * 0.5, 1)
        return (
            f"User-agent: *\nDisallow: /private\nDisallow: /tmp/*\n"
            f"Crawl-delay: {delay}\n"
        ).encode()
    if flavor == 2:
        # agent-specific group + global group
        return (
            "User-agent: TRSBot\nAllow: /page/\nDisallow: /\n"
            "User-agent: *\nDisallow: /\n"
        ).encode()
    if flavor == 3:
        # $-anchored and starred rules
        return (
            "User-agent: *\nDisallow: /*.bin$\nDisallow: /page/*7\nAllow: /page/\n"
            "Disallow: /\n"
        ).encode()
    if flavor == 4:
        # preamble crawl-delay + misspellings + junk lines (forgiveness)
        return (
            f"Crawl-delay: {1 + i % 3}\n# junk\nfoo: bar\n"
            "User-agent: *\ndissallow: /blocked\nAllow: /\n"
        ).encode()
    # flavor 5: disallow a slice of pages via wildcard
    return ("User-agent: *\nDisallow: /page/1*\n").encode()


def synth_universe(
    n_hosts: int = 20,
    n_docs: int = 500,
    links_per_doc: int = 4,
    n_seeds: int = 30,
    seed: int = 42,
) -> Tuple[List[tuple], List[tuple], List[str]]:
    """Build (documents_rows, robots_rows, seeds) as plain Python data.

    Deterministic in (args, seed) — safe for cross-parallelism
    determinism tests and the DuckDB oracle.
    """
    rng = random.Random(seed)
    hosts = [f"host{i}.example" for i in range(n_hosts)]
    # Zipf weights over hosts
    weights = [1.0 / (i + 1) for i in range(n_hosts)]

    # docs are assigned to hosts Zipf-skewed, deterministic
    doc_hosts = rng.choices(range(n_hosts), weights=weights, k=n_docs)
    per_host_counter = [0] * n_hosts
    docs_meta = []  # (doc_id, host, k)
    for d in range(n_docs):
        hi = doc_hosts[d]
        k = per_host_counter[hi]
        per_host_counter[hi] += 1
        docs_meta.append((f"{hosts[hi]}/{k}", hosts[hi], k))

    documents = []
    for d, (doc_id, host, k) in enumerate(docs_meta):
        spans = []
        offset = 0
        n_spans = 3 + rng.randrange(5)
        n_links = 0
        for s in range(n_spans):
            kind_roll = rng.random()
            if kind_roll < 0.5 or (s == n_spans - 1 and n_links == 0):
                # link span -> another doc, Zipf-skewed host choice
                ti = rng.choices(range(n_docs), k=1)[0]
                t_id, t_host, t_k = docs_meta[ti]
                url = doc_url(t_host, t_k)
                deco = rng.random()
                if deco < 0.2:
                    url += "#frag"  # canonicalization strips this
                elif deco < 0.3:
                    url += "?b=2&a=1"  # sorted at canonicalization
                spans.append(("link", url, None, offset))
                n_links += 1
            elif kind_roll < 0.8:
                text = " ".join(rng.choices(_WORDS, k=5 + rng.randrange(10)))
                spans.append(("text", text, None, offset))
            else:
                spans.append(
                    ("media", None, f"media://{host}/{k}/{s}.bin", offset)
                )
            offset += 1 + rng.randrange(100)
        documents.append((doc_id, doc_url(host, k), host, spans))

    robots = []
    for i, host in enumerate(hosts):
        if i % 7 == 3:
            continue  # host without robots.txt -> everything allowed
        robots.append((host, bytearray(_robots_body(i, rng)), 200))

    # seeds: spread across hosts, deterministic
    seeds = []
    for d in range(0, n_docs, max(1, n_docs // n_seeds)):
        doc_id, host, k = docs_meta[d]
        seeds.append(doc_url(host, k))
        if len(seeds) >= n_seeds:
            break
    return documents, robots, seeds


def synth_documents_df(spark: SparkSession, documents: List[tuple]) -> DataFrame:
    return spark.createDataFrame(documents, DOCS_DDL)


def synth_documents_distributed(
    spark: SparkSession, n_docs: int, n_hosts: int = 200, links_per_doc: int = 3
) -> DataFrame:
    """Distributed synthetic interleaved documents — pure native
    expressions over ``spark.range``, so the universe generates at any
    scale without a driver-side list (the list-based ``synth_universe``
    stays for the small deterministic pytest fixtures).

    Host assignment is Zipf-ish (cube of a uniform hash), link targets
    are a deterministic function of doc id, and every link resolves to a
    generated doc's URL — the same closed-world contract as
    synth_universe. Deterministic in (n_docs, n_hosts).
    """
    from pyspark.sql import functions as F

    def host_of(doc_id):
        # r in [0,1) from a hash; r^3 concentrates mass on low host ids
        r = F.pmod(F.xxhash64(F.concat(F.lit("h"), doc_id)), F.lit(4096)) / 4096.0
        return F.floor(r * r * r * n_hosts).cast("long")

    def url_of(doc_id):
        return F.concat(
            F.lit("https://host"),
            host_of(doc_id),
            F.lit(".example/page/"),
            doc_id,
        )

    df = spark.range(n_docs).withColumnRenamed("id", "num")
    spans = []
    offset = 0
    for j in range(links_per_doc):
        target = F.pmod(
            F.col("num") * F.lit(2654435761) + F.lit(40503 * (2 * j + 1)), F.lit(n_docs)
        )
        deco = F.when(
            F.pmod(F.xxhash64(F.concat(F.lit(f"d{j}"), F.col("num"))), F.lit(10)) < 2,
            F.lit("#frag"),
        ).otherwise(F.lit(""))
        spans.append(
            F.struct(
                F.lit("link").alias("kind"),
                F.concat(url_of(target), deco).alias("text"),
                F.lit(None).cast("string").alias("media_ref"),
                F.lit(offset).alias("offset"),
            )
        )
        offset += 7
        spans.append(
            F.struct(
                F.lit("text").alias("kind"),
                F.concat(F.lit("synthetic text for doc "), F.col("num")).alias("text"),
                F.lit(None).cast("string").alias("media_ref"),
                F.lit(offset).alias("offset"),
            )
        )
        offset += 11
    spans.append(
        F.struct(
            F.lit("media").alias("kind"),
            F.lit(None).cast("string").alias("text"),
            F.concat(F.lit("media://doc/"), F.col("num")).alias("media_ref"),
            F.lit(offset).alias("offset"),
        )
    )
    return df.select(
        F.concat(F.lit("doc"), F.col("num")).alias("doc_id"),
        url_of(F.col("num")).alias("url"),
        F.concat(F.lit("host"), host_of(F.col("num")), F.lit(".example")).alias("host"),
        F.array(*spans).alias("spans"),
    )


def synth_robots_df(spark: SparkSession, robots: List[tuple]) -> DataFrame:
    return spark.createDataFrame(robots, "host string, body binary, status int")
