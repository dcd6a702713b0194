"""Similarity search over an embedding column (array<float>).

Two paths:

- ``cosine_topk``: exact brute-force top-k for a (small, broadcast) query
  set — dot products as native F.aggregate/zip_with expressions, ranks
  via a window. The baseline and the verifier for the ANN path.
- ``lsh_topk``: random-hyperplane LSH buckets (sign of dot product with
  deterministic pseudo-random planes) so each query only scores its own
  bucket's rows — the scale path: candidate generation is a bucket join,
  not a cross join. Recall is tested against the exact path.

All float math is done in double with left-to-right accumulation and
rounded before ranking so results are reproducible across engines and
partitionings.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["with_unit_norm", "cosine_topk", "lsh_topk"]


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def with_unit_norm(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    n = _norm(F.col(vec_col))
    return df.withColumn(
        "_unit",
        F.transform(F.col(vec_col), lambda x: x.cast("double") / n),
    )


def cosine_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 4,
) -> DataFrame:
    """Exact top-k cosine neighbors of each query vector.

    queries is expected to be small (it is broadcast); the corpus side
    streams — one narrow pass, no shuffle until the final per-query
    window over k*|queries| rows.

    Output: (query_id, neighbor_id, cos_sim, rank), self-matches excluded.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    c = embeddings.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")
    )
    sim = F.round(
        _dot(F.col("q_vec"), F.col("c_vec"))
        / (_norm(F.col("q_vec")) * _norm(F.col("c_vec"))),
        round_digits,
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    return (
        c.join(F.broadcast(q))
        .where(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cos_sim", sim)
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )


def _plane(dim: int, plane_idx: int) -> list:
    """Deterministic pseudo-random hyperplane via splitmix64 -> [-1, 1)."""
    out = []
    x = (plane_idx + 1) * 0x9E3779B97F4A7C15 & (2**64 - 1)
    for _ in range(dim):
        x = (x + 0x9E3779B97F4A7C15) & (2**64 - 1)
        z = x
        z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & (2**64 - 1)
        z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & (2**64 - 1)
        z = z ^ (z >> 31)
        out.append((z / 2**63) - 1.0)
    return out


def lsh_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    dim: int = 64,
    n_planes: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    multiprobe: int = 1,
) -> DataFrame:
    """Approximate top-k: random-hyperplane bucket join, then exact
    cosine within buckets. 2^n_planes buckets; queries multi-probe their
    own bucket plus every bucket at Hamming distance <= ``multiprobe``
    (bit flips), trading a small candidate-set increase for much better
    recall. Still a bucket join — never a cross join."""
    planes = [_plane(dim, p) for p in range(n_planes)]

    def bucket_of(vec):
        bits = []
        for p_i, plane in enumerate(planes):
            d = _dot(vec, F.array(*[F.lit(v) for v in plane]))
            bits.append(F.when(d >= 0, F.lit(1 << p_i)).otherwise(F.lit(0)))
        out = bits[0]
        for b in bits[1:]:
            out = out + b
        return out

    c = embeddings.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        bucket_of(F.col(vec_col)).alias("bucket"),
    )
    own = bucket_of(F.col(vec_col))
    probes = [own]
    if multiprobe >= 1:
        probes += [own.bitwiseXOR(F.lit(1 << p)) for p in range(n_planes)]
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        F.explode(F.array(*probes)).alias("bucket"),
    )
    sim = F.round(
        _dot(F.col("q_vec"), F.col("c_vec"))
        / (_norm(F.col("q_vec")) * _norm(F.col("c_vec"))),
        4,
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        c.join(F.broadcast(q), "bucket")
        .where(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cos_sim", sim)
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )
