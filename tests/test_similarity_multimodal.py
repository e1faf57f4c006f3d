import math

import pytest
from pyspark.sql import functions as F

from tg_data_connector_spark.operators.multimodal import (
    decode_and_featurize,
    media_metadata,
)
from tg_data_connector_spark.operators.similarity import (
    brute_force_topk,
    cosine,
    lsh_ann_topk,
)


def _vecs(spark, rows):
    return spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")


def test_cosine_expression(spark):
    df = _vecs(spark, [(0, [1.0, 0.0]), (1, [0.0, 2.0]), (2, [3.0, 0.0])])
    a = df.alias("a").crossJoin(df.alias("b")).select(
        F.col("a.vec_id").alias("x"),
        F.col("b.vec_id").alias("y"),
        F.round(cosine(F.col("a.embedding"), F.col("b.embedding")), 6).alias("c"),
    )
    vals = {(r["x"], r["y"]): r["c"] for r in a.collect()}
    assert vals[(0, 2)] == 1.0 and vals[(0, 1)] == 0.0 and vals[(0, 0)] == 1.0


def test_brute_force_topk_exact(spark):
    rows = [(i, [math.cos(i / 10.0), math.sin(i / 10.0)]) for i in range(20)]
    df = _vecs(spark, rows)
    out = brute_force_topk(df, df.where(F.col("vec_id") == 0), k=3).collect()
    assert [r["neighbor_id"] for r in sorted(out, key=lambda r: r["rank"])] == [1, 2, 3]


def test_lsh_ann_recall_vs_exact(spark):
    import random

    rnd = random.Random(3)
    rows = []
    for i in range(100):
        base = [rnd.gauss(0, 1) for _ in range(16)]
        rows.append((i, [float(x) for x in base]))
        rows.append((i + 100, [float(x + rnd.gauss(0, 0.01)) for x in base]))
    df = _vecs(spark, rows)
    q = df.where(F.col("vec_id") < 10)
    exact = {
        r["query_id"]: r["neighbor_id"]
        for r in brute_force_topk(df, q, k=1).collect()
    }
    approx = lsh_ann_topk(df, q, dim=16, k=1, n_planes=8)
    got = {r["query_id"]: r["neighbor_id"] for r in approx.collect()}
    # the twin vector (id+100) is the true NN; LSH should recover most of them
    hits = sum(1 for k, v in got.items() if exact.get(k) == v)
    assert hits >= 7


def test_media_metadata_magic_sniff(spark):
    rows = [
        (1, bytes.fromhex("89504e47") + b"rest"),
        (2, bytes.fromhex("ffd8ffe0") + b"jpeg"),
        (3, b"plainbytes"),
    ]
    df = spark.createDataFrame(rows, "id int, payload binary")
    out = {r["id"]: r for r in media_metadata(df).collect()}
    assert out[1]["format"] == "png" and out[2]["format"] == "jpeg"
    assert out[3]["format"] == "unknown"
    assert out[1]["n_bytes"] == 8


def test_decode_stub_raises_without_flag(spark):
    df = spark.createDataFrame([(1, b"abc")], "id int, payload binary")
    with pytest.raises(Exception, match="decode requires"):
        decode_and_featurize(df).collect()


def test_decode_fake_featurizer_shape_and_determinism(spark):
    df = spark.createDataFrame(
        [(1, bytes(range(64))), (2, None)], "id int, payload binary"
    )
    out = {r["id"]: r["features"] for r in
           decode_and_featurize(df, feature_dim=4, use_fake_decoder=True).collect()}
    assert len(out[1]) == 4 and out[2] is None
    assert out[1][0] == pytest.approx(7.5)  # mean of bytes 0..15


def test_embedding_near_dup_pairs_exact_at_threshold(spark):
    """Bucketed near-dup candidates re-checked with exact quantized cosine:
    identical vectors always collide (same signature) and score 1.0."""
    from tg_data_connector_spark.operators.similarity import (
        embedding_near_dup_pairs,
    )

    base = [0.1 * ((i * 7) % 13 - 6) for i in range(8)]
    other = [0.1 * ((i * 11) % 17 - 8) for i in range(8)]
    df = spark.createDataFrame(
        [(1, base), (2, base), (3, other)],
        "vec_id long, embedding array<float>",
    )
    out = embedding_near_dup_pairs(df, dim=8, threshold=0.99, n_planes=4)
    got = [(r["a"], r["b"], r["cos"]) for r in out.collect()]
    assert got == [(1, 2, 1.0)]


def test_ivf_ann_matches_brute_force_on_probed_cells(spark):
    """IVF with n_probe == n_cells degenerates to exact search: results must
    equal brute force."""
    from tg_data_connector_spark.operators.similarity import (
        brute_force_topk,
        ivf_ann_topk,
        quantize,
    )
    from pyspark.sql import functions as F

    rows = [
        (i, [float(((i * 13 + d * 7) % 19) - 9) / 9.0 for d in range(8)])
        for i in range(40)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = df.where(F.col("vec_id") < 3)
    ivf = ivf_ann_topk(df, q, dim=8, k=4, n_cells=4, n_probe=4, centroid_stride=11)
    qq = df.select("vec_id", quantize(F.col("embedding")).alias("embedding"))
    bf = brute_force_topk(
        qq, qq.where(F.col("vec_id") < 3), "vec_id", "embedding", k=4
    )
    a = sorted(tuple(r) for r in ivf.collect())
    b = sorted(tuple(r) for r in bf.collect())
    assert a == b
