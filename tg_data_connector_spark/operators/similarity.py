"""Similarity search over embedding columns (array<float>).

Two tiers, same contract:
  * brute-force cosine top-k — exact baseline; the dot product is a sequential
    expression fold (zip_with + aggregate with a DOUBLE accumulator), fully
    codegen'd. O(Q x N) — correct at any scale, affordable when Q is small or
    N is pre-filtered.
  * LSH-bucketed ANN (random hyperplanes) — the scale path: each vector maps to
    a signature of sign-bits against deterministic hyperplanes; candidates are
    bucket collisions, then exact cosine re-ranks inside buckets. Shuffle is
    O(N x tables), never O(N^2). (An IVF variant would swap the bucketer for
    k-means cells; the plumbing is identical.)

Hyperplanes derive from md5-based hash32 values — deterministic, no RNG state,
re-derivable by an external oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import hash32


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2norm(a) * l2norm(b))


def brute_force_topk(
    vectors: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query row (query_id, embedding).
    Broadcast the query side (small by contract); rank ties break by neighbor
    id so results are deterministic."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv")
    )
    cand = vectors.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_nv")
    )
    scored = cand.crossJoin(F.broadcast(q)).where(
        F.col("query_id") != F.col("neighbor_id")
    ).select(
        "query_id",
        "neighbor_id",
        F.round(cosine(F.col("_qv"), F.col("_nv")), 6).alias("cos"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
    )


def hyperplane_signature(
    vec: Column, dim: int, n_planes: int = 16, seed: int = 11
) -> Column:
    """Sign-bit signature against n_planes pseudo-random hyperplanes. Plane
    component (p, d) = hash32("p_d_seed") mapped to [-1, 1) — deterministic,
    engine-independent."""
    bits = []
    for p in range(n_planes):
        comp = F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda d: (
                hash32(F.concat_ws("_", F.lit(p), d, F.lit(seed))) / F.lit(2147483648.0)
            )
            - F.lit(1.0),
        )
        proj = F.aggregate(
            F.zip_with(vec, comp, lambda x, c: x.cast("double") * c),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bits.append(F.when(proj >= 0, F.lit(1)).otherwise(F.lit(0)) * F.lit(2**p))
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out.cast("int")


def lsh_ann_topk(
    vectors: DataFrame,
    queries: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    n_planes: int = 12,
    seed: int = 11,
) -> DataFrame:
    """Approximate top-k: candidates share the full hyperplane bucket with the
    query; exact cosine re-rank inside the bucket. Recall grows with fewer
    planes / more tables; one table here, parameterizable."""
    sig = hyperplane_signature(F.col(vec_col), dim, n_planes, seed)
    cand = vectors.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_nv"), sig.alias("_sig")
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv"), sig.alias("_sig")
    )
    scored = cand.join(F.broadcast(q), "_sig").where(
        F.col("query_id") != F.col("neighbor_id")
    ).select(
        "query_id",
        "neighbor_id",
        F.round(cosine(F.col("_qv"), F.col("_nv")), 6).alias("cos"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
    )
