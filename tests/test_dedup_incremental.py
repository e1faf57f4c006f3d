"""dedup_incremental: first-seen-wins across batches, re-run stability,
broadcast/shuffled parity, null-text handling, index contents."""

from pyspark.sql import functions as F

from tg_data_connector_spark.operators.dedup_text import (
    create_dedup_index,
    dedup_incremental,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_three_statuses_and_index_growth(spark, tmp_path):
    idx = create_dedup_index(spark, str(tmp_path / "i"), n_buckets=4)
    b1 = _docs(spark, [(1, "alpha"), (2, "beta"), (3, "alpha")])
    r1 = {r["doc_id"]: r for r in dedup_incremental(idx, b1, batch_lsn=1).collect()}
    assert r1[1]["status"] == "kept" and r1[2]["status"] == "kept"
    assert r1[3]["status"] == "dup_in_batch" and r1[3]["canonical_id"] == "1"
    assert idx.read().count() == 2  # alpha, beta

    b2 = _docs(spark, [(10, "beta"), (11, "gamma"), (12, "gamma")])
    r2 = {r["doc_id"]: r for r in dedup_incremental(idx, b2, batch_lsn=2).collect()}
    assert r2[10]["status"] == "dup_in_corpus" and r2[10]["canonical_id"] == "2"
    assert r2[11]["status"] == "kept"
    assert r2[12]["status"] == "dup_in_batch" and r2[12]["canonical_id"] == "11"
    assert idx.read().count() == 3


def test_rerun_is_stable_and_index_noop(spark, tmp_path):
    idx = create_dedup_index(spark, str(tmp_path / "i"), n_buckets=4)
    b = _docs(spark, [(1, "alpha"), (2, "beta")])
    dedup_incremental(idx, b, batch_lsn=1).count()
    v = idx.current_version()
    canon = {r["fp"]: r["canonical_id"] for r in idx.read().collect()}
    r = {x["doc_id"]: x for x in dedup_incremental(idx, b, batch_lsn=1).collect()}
    # absorbed batch re-classifies against its own earlier inserts
    assert r[1]["status"] == "dup_in_corpus" and r[1]["canonical_id"] == "1"
    assert r[2]["status"] == "dup_in_corpus" and r[2]["canonical_id"] == "2"
    assert {x["fp"]: x["canonical_id"] for x in idx.read().collect()} == canon
    # same keys, same values: LWW tie -> content unchanged
    assert idx.read().count() == 2
    assert idx.current_version() >= v  # a no-op merge may or may not commit


def test_broadcast_and_shuffled_paths_agree(spark, tmp_path):
    rows = [(i, f"t{i % 7}") for i in range(40)]
    idx1 = create_dedup_index(spark, str(tmp_path / "a"), n_buckets=4)
    idx2 = create_dedup_index(spark, str(tmp_path / "b"), n_buckets=4)
    corpus = _docs(spark, rows[:10])
    batch = _docs(spark, rows[10:])
    dedup_incremental(idx1, corpus, batch_lsn=1).count()
    dedup_incremental(idx2, corpus, batch_lsn=1, broadcast_probe=False).count()
    r1 = dedup_incremental(idx1, batch, batch_lsn=2)
    r2 = dedup_incremental(idx2, batch, batch_lsn=2, broadcast_probe=False)
    assert r1.exceptAll(r2).count() == 0 and r2.exceptAll(r1).count() == 0
    assert sorted(idx1.read().collect()) == sorted(idx2.read().collect())


def test_null_text_rows_kept_individually(spark, tmp_path):
    idx = create_dedup_index(spark, str(tmp_path / "i"), n_buckets=2)
    b = _docs(spark, [(1, None), (2, None), (3, "x")])
    r = {x["doc_id"]: x for x in dedup_incremental(idx, b, batch_lsn=1).collect()}
    assert r[1]["status"] == "kept" and r[1]["canonical_id"] == "1"
    assert r[2]["status"] == "kept" and r[2]["canonical_id"] == "2"
    assert r[1]["fp"] is None
    assert idx.read().count() == 1  # null fps never enter the index


def test_update_index_false_leaves_index_alone(spark, tmp_path):
    idx = create_dedup_index(spark, str(tmp_path / "i"), n_buckets=2)
    dedup_incremental(idx, _docs(spark, [(1, "a")]), batch_lsn=1).count()
    v = idx.current_version()
    out = dedup_incremental(
        idx, _docs(spark, [(2, "b")]), batch_lsn=2, update_index=False
    )
    assert out.where(F.col("status") == "kept").count() == 1
    assert idx.current_version() == v
    assert idx.read().count() == 1


# ----------------------------------------------------- near-dup (LSH) index

def _neardocs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog many times"),
        (2, "the quick brown fox jumps over the lazy dog many time"),
        (3, "completely different content about spark engines and lakes"),
        (4, "the quick brown fox jumps over the lazy dog many times"),
        (5, "yet another unrelated document with its own words entirely"),
    ]
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_neardup_incremental_matches_full_batch_lsh(spark, tmp_path):
    """Corpus-then-batch through the band index finds exactly the pairs the
    one-shot batch LSH finds (same banded_keys front half), minus pure
    corpus-corpus pairs which phase 2 must NOT re-emit."""
    from tg_data_connector_spark.operators.dedup_text import (
        create_neardup_index,
        minhash_lsh_pairs,
        neardup_incremental,
    )

    docs = _neardocs(spark)
    idx = create_neardup_index(spark, str(tmp_path / "b"), n_buckets=4)
    p1 = neardup_incremental(idx, docs.where("doc_id <= 2"), batch_lsn=1)
    pairs1 = {tuple(r) for r in p1.collect()}
    p2 = neardup_incremental(
        idx, docs.where("doc_id >= 3"), batch_lsn=2, update_index=False
    )
    pairs2 = {tuple(r) for r in p2.collect()}
    full = {
        tuple(r)
        for r in minhash_lsh_pairs(
            docs.selectExpr("cast(doc_id as string) doc_id", "text")
        ).collect()
    }
    assert pairs1 | pairs2 == full
    assert all("3" in p or "4" in p or "5" in p for p in pairs2)


def test_neardup_bucket_cap_keeps_smallest(spark, tmp_path):
    """21 identical docs, cap 4: buckets retain the 4 smallest id strings,
    within-batch pairs come from retained members only (C(4,2) per batch)."""
    from tg_data_connector_spark.operators.dedup_text import (
        create_neardup_index,
        neardup_incremental,
    )

    docs = spark.range(10, 31).selectExpr(
        "id as doc_id", "'same text for every single document here' as text"
    )
    idx = create_neardup_index(spark, str(tmp_path / "b"), n_buckets=2)
    pairs = neardup_incremental(idx, docs, bucket_cap=4, batch_lsn=1)
    got = {tuple(r) for r in pairs.collect()}
    assert got == {
        ("10", "11"), ("10", "12"), ("10", "13"),
        ("11", "12"), ("11", "13"), ("12", "13"),
    }
    stored = idx.read().collect()
    assert all(r["doc_ids"] == ["10", "11", "12", "13"] for r in stored)
    # a later batch still collides with the retained members
    batch2 = spark.createDataFrame(
        [(99, "same text for every single document here")],
        "doc_id bigint, text string",
    )
    p2 = {tuple(r) for r in neardup_incremental(
        idx, batch2, bucket_cap=4, batch_lsn=2, update_index=False
    ).collect()}
    assert p2 == {("10", "99"), ("11", "99"), ("12", "99"), ("13", "99")}


def test_neardup_absorb_union_and_recap(spark, tmp_path):
    """Absorbing a second batch unions bucket members under the cap rule."""
    from tg_data_connector_spark.operators.dedup_text import (
        create_neardup_index,
        neardup_incremental,
    )

    txt = "shared text shared text shared text shared text again"
    idx = create_neardup_index(spark, str(tmp_path / "b"), n_buckets=2)
    neardup_incremental(
        idx, spark.createDataFrame([(5, txt)], "doc_id bigint, text string"),
        bucket_cap=3, batch_lsn=1,
    ).count()
    neardup_incremental(
        idx,
        spark.createDataFrame(
            [(2, txt), (9, txt)], "doc_id bigint, text string"
        ),
        bucket_cap=3, batch_lsn=2,
    ).count()
    stored = idx.read().collect()
    assert all(r["doc_ids"] == ["2", "5", "9"] for r in stored)
