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


def _spread(df: DataFrame, key: str) -> DataFrame:
    """Fan vectors across the cluster before expression-heavy math — a small
    embeddings table is one input split, serializing every projection/cosine
    pass onto one task without this (explicit count so AQE cannot coalesce
    the tiny input back to one partition)."""
    sc = df.sparkSession.sparkContext
    return df.repartition(sc.defaultParallelism, F.col(key))


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
    cand = _spread(vectors, id_col).select(
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


def plane_components(n_planes: int, dim: int, seed: int = 11) -> list[list[int]]:
    """Hyperplane component (p, d) = md5-hash32("p_d_seed") - 2^31, an integer
    in [-2^31, 2^31). Computed once driver-side (hyperplanes are constants —
    hashing them per row would be pure waste) and inlined as literals; an
    external SQL oracle re-derives the identical list from the same formula."""
    import hashlib

    return [
        [
            int(hashlib.md5(f"{p}_{d}_{seed}".encode()).hexdigest()[:8], 16) - 2**31
            for d in range(dim)
        ]
        for p in range(n_planes)
    ]


def hyperplane_signature(
    qvec: Column, dim: int, n_planes: int = 16, seed: int = 11
) -> Column:
    """Sign-bit signature of an integer-quantized vector against n_planes
    deterministic hyperplanes. All-bigint math: quantized components (|q| <~
    10^6) x 2^31-scale plane components x dim stay far under 2^63, so the
    projection — and therefore the bucket id — is EXACT and portable (no
    float-sum sign flips near zero)."""
    bits = []
    for p, row in enumerate(plane_components(n_planes, dim, seed)):
        comp = F.array(*[F.lit(c).cast("bigint") for c in row])
        proj = F.aggregate(
            F.zip_with(qvec, comp, lambda x, c: x.cast("bigint") * c),
            F.lit(0).cast("bigint"),
            lambda acc, v: acc + v,
        )
        bits.append(F.when(proj >= 0, F.lit(2**p)).otherwise(F.lit(0)))
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out.cast("int")


def quantize(vec: Column, scale: int = 1000) -> Column:
    """array<float> -> array<bigint> by round(x * scale): the integer twin an
    external oracle can reproduce bit-for-bit."""
    return F.transform(vec, lambda x: F.round(x.cast("double") * scale).cast("bigint"))


def embedding_near_dup_pairs(
    vectors: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    n_planes: int = 8,
    seed: int = 11,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (a < b, cos >= threshold) — the
    vector twin of MinHash text dedup. Candidates are hyperplane-bucket
    collisions (O(N x planes) shuffle, never all-pairs: two vectors at
    cos >= 0.95 disagree on a random hyperplane with prob ~= acos(0.95)/pi ~=
    0.10, so with 8 planes recall of a true near-dup bucket match is
    ~(1-0.1)^8 ~= 0.43 per table — production stacks more tables; plumbing is
    identical). Exact integer-quantized cosine re-checks each candidate."""
    qv = quantize(F.col(vec_col))
    sig = hyperplane_signature(qv, dim, n_planes, seed)
    side = _spread(vectors, id_col).select(
        F.col(id_col).alias("_id"), qv.alias("_v"), sig.alias("_sig")
    )
    a = side.select(F.col("_id").alias("a"), F.col("_v").alias("_va"), "_sig")
    b = side.select(F.col("_id").alias("b"), F.col("_v").alias("_vb"), "_sig")
    # each vector carries exactly ONE signature, so the self-join already
    # yields unique pairs — no distinct (and no extra shuffle) needed
    return (
        a.join(b, "_sig")
        .where(F.col("a") < F.col("b"))
        .select(
            "a", "b", F.round(cosine(F.col("_va"), F.col("_vb")), 6).alias("cos")
        )
        .where(F.col("cos") >= threshold)
    )


def ivf_ann_topk(
    vectors: DataFrame,
    queries: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    n_cells: int = 16,
    n_probe: int = 4,
    centroid_stride: int = 97,
) -> DataFrame:
    """IVF-style ANN: vectors partition into cells by nearest centroid; a
    query probes its n_probe nearest cells and re-ranks exactly inside them.

    Centroids here are a deterministic strided sample of the vector set
    (id % stride == 0, first n_cells) rather than k-means means — the
    assignment/probe/re-rank plumbing (the part that must scale: cell
    partitioning, bounded probe fan-out, per-cell exact math) is identical,
    and determinism makes the whole operator reproducible by an external SQL
    oracle. Swapping in trained centroids is a drop-in (they arrive as just
    another small table).

    Scale shape: assignment is a broadcast of n_cells centroids (tiny) +
    argmin over them per vector — no shuffle; candidate generation joins on
    cell id, O(N x n_probe / n_cells) expected fan-in per query."""
    qv = quantize(F.col(vec_col))
    cents = (
        vectors.where((F.col(id_col) % centroid_stride) == 0)
        .orderBy(id_col)
        .limit(n_cells)
        .select(F.col(id_col).alias("cent_id"), qv.alias("cv"))
    )
    cent_rows = cents.collect()  # n_cells rows — bounded, by construction

    def nearest_cells(v, n: int):
        """ids of the n nearest centroids by exact quantized cosine,
        tie-broken by centroid id (deterministic)."""
        scored = F.array(
            *[
                F.struct(
                    F.round(
                        cosine(v, F.array(*[F.lit(int(x)) for x in r["cv"]])), 6
                    ).alias("c"),
                    F.lit(-int(r["cent_id"])).alias("nid"),
                )
                for r in cent_rows
            ]
        )
        top = F.slice(F.reverse(F.array_sort(scored)), 1, n)
        return F.transform(top, lambda s: -s["nid"])

    cand = _spread(vectors, id_col).select(
        F.col(id_col).alias("neighbor_id"),
        qv.alias("_nv"),
        nearest_cells(qv, 1)[0].alias("cell"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        qv.alias("_qv"),
        F.explode(nearest_cells(qv, n_probe)).alias("cell"),
    )
    # a vector lives in exactly ONE cell, so (query, neighbor) pairs are
    # already unique across the probe fan-out — no distinct needed
    scored = (
        cand.join(F.broadcast(q), "cell")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("_qv"), F.col("_nv")), 6).alias("cos"),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
    )


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
    planes / more tables; one table here, parameterizable. Embeddings are
    integer-quantized (round(x*1000)) so both the bucket assignment and the
    re-rank score are engine-exact."""
    qv = quantize(F.col(vec_col))
    sig = hyperplane_signature(qv, dim, n_planes, seed)
    cand = _spread(vectors, id_col).select(
        F.col(id_col).alias("neighbor_id"), qv.alias("_nv"), sig.alias("_sig")
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), qv.alias("_qv"), sig.alias("_sig")
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
