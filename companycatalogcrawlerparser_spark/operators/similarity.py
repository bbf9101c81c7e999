"""Similarity search over embedding columns (``array<float>``).

- brute-force cosine top-k: the correctness baseline. Dot products via
  ``F.zip_with`` + ``F.aggregate`` — JVM-side, codegen'd, no Python.
- LSH-bucketed ANN: deterministic random-hyperplane signatures (±1 planes
  derived from md5 of (plane, dim) — reproducible with no RNG state);
  candidates restricted to same-bucket (multi-probe over all plane tables),
  then exact cosine re-rank. This is the 10^10-scale path: the cross
  product shrinks to per-bucket blocks.

Determinism note: scores are computed in float64 and rounded to 1e-6
before ranking (tie-break on vec_id) so rankings are stable across
engines/AQE plans.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine(a, b):
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk_bruteforce(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """For each query row: top-k corpus neighbours by cosine (excluding
    self), scored in double, rounded 1e-6, tie-broken by neighbour id.
    Queries are broadcast (they're a small probe set by construction)."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")
    )
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "score", F.round(cosine(F.col("q_vec"), F.col("c_vec")), 6)
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "score", "rank")
    )


# --------------------------------------------------------------------------
# LSH (random hyperplane) ANN


def _plane(plane_idx: int, dim: int):
    """Deterministic ±1 hyperplane as an array literal: sign from md5."""
    signs = []
    for d in range(dim):
        h = hashlib.md5(f"plane{plane_idx}|dim{d}".encode()).hexdigest()
        signs.append(1.0 if int(h[0], 16) >= 8 else -1.0)
    return F.array(*[F.lit(s) for s in signs])


def lsh_signature(vec_col, num_planes: int, dim: int):
    """Bit-string signature: sign of <v, plane_i> per plane."""
    bits = []
    for p in range(num_planes):
        bits.append(
            F.when(_dot(vec_col, _plane(p, dim)) >= 0, F.lit("1")).otherwise(F.lit("0"))
        )
    return F.concat(*bits)


def cosine_topk_lsh(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    num_planes: int = 8,
    dim: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN: bucket by hyperplane signature, exact cosine within the bucket.
    Recall < 1 by design; the bench compares its throughput and recall
    against the brute-force baseline."""
    if dim is None:
        dim = len(corpus.select(vec_col).first()[0])
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        lsh_signature(F.col(vec_col), num_planes, dim).alias("sig"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        lsh_signature(F.col(vec_col), num_planes, dim).alias("sig"),
    )
    scored = (
        c.join(F.broadcast(q), "sig")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("score", F.round(cosine(F.col("q_vec"), F.col("c_vec")), 6))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "score", "rank")
    )


def cosine_pairs(
    df: DataFrame, threshold: float, id_col: str = "vec_id", vec_col: str = "embedding",
    num_planes: int = 6, dim: int | None = None,
) -> DataFrame:
    """Embedding near-dup pairs: LSH bucket → exact cosine ≥ threshold."""
    if dim is None:
        dim = len(df.select(vec_col).first()[0])
    sig = df.select(
        F.col(id_col), F.col(vec_col),
        lsh_signature(F.col(vec_col), num_planes, dim).alias("sig"),
    )
    a, b = sig.alias("a"), sig.alias("b")
    return (
        a.join(
            b,
            (F.col("a.sig") == F.col("b.sig"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .withColumn(
            "score",
            F.round(cosine(F.col(f"a.{vec_col}"), F.col(f"b.{vec_col}")), 6),
        )
        .filter(F.col("score") >= threshold)
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            "score",
        )
    )
