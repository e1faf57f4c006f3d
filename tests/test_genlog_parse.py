from pyspark.sql import functions as F

from tg_data_connector_spark.cdc.genlog import (
    HOT_SOURCE,
    gen_changelog,
    gen_seed_sequences,
    with_binary_payload,
)
from tg_data_connector_spark.cdc.quality import dirty_predicate, split_quarantine


def test_changelog_shape_and_distributions(spark):
    log = gen_changelog(spark, 5000, 800, n_parts=8).cache()
    # duplicated deliveries present (every 20th event re-sent)
    assert log.count() == 5000 + 5000 // 20
    # out-of-order: commit_lsn is not aligned with offset order within a part
    w = log.where(F.col("part") == 0).orderBy("offset").select("commit_lsn").collect()
    lsns = [r[0] for r in w]
    assert any(a > b for a, b in zip(lsns, lsns[1:]))
    # unique version pairs per event_id
    assert (
        log.select("commit_lsn", "seq_no", "event_id").distinct().count()
        == log.dropDuplicates(["event_id"]).count()
    )
    # hot source skew >= 50%
    hot = log.where(F.col("source") == HOT_SOURCE).count()
    assert hot / log.count() > 0.5
    # key collisions: far fewer docs than events (exercises LWW)
    assert log.select("doc_id").distinct().count() <= 800
    # ops mix
    ops = {r["op"]: r["n"] for r in log.groupBy("op").agg(F.count("*").alias("n")).collect()}
    assert set(ops) == {"I", "U", "D"} and ops["U"] > ops["I"] > ops["D"]
    # invariant: clean I/U rows satisfy n_tok = size(tokens)
    clean, dirty = split_quarantine(log)
    bad = clean.where(
        (F.col("op") != "D") & (F.size("tokens") != F.col("n_tok"))
    ).count()
    assert bad == 0 and dirty.count() > 0
    log.unpersist()


def test_changelog_deterministic(spark):
    a = gen_changelog(spark, 1000, 100).orderBy("event_id", "offset").collect()
    b = gen_changelog(spark, 1000, 100).orderBy("event_id", "offset").collect()
    assert a == b


def test_seed_sequences_invariants(spark):
    seed = gen_seed_sequences(spark, 500)
    assert seed.count() == 500
    assert seed.select("doc_id").distinct().count() == 500
    assert seed.where(F.size("tokens") != F.col("n_tok")).count() == 0


def test_binary_payload_roundtrip(spark):
    log = gen_changelog(spark, 500, 100)
    raw = with_binary_payload(log)
    from tg_data_connector_spark.cdc.parse import parse_events

    back = parse_events(raw.drop("tokens"))
    orig = log.select("event_id", "offset", "tokens")
    rt = back.select("event_id", "offset", "tokens")
    assert orig.exceptAll(rt).count() == 0
    assert rt.exceptAll(orig).count() == 0


def test_dirty_predicate_cases(spark):
    rows = [
        ("I", "a", [1, 2], 2, False),   # ok
        ("I", "a", [1, 2], 3, True),    # size mismatch
        ("U", None, [1], 1, True),      # null key on update
        ("I", "a", None, 1, True),      # insert without payload
        ("D", "a", None, None, False),  # delete ok
        ("D", None, None, None, True),  # delete without key
        ("X", "a", [1], 1, True),       # unknown op
    ]
    df = spark.createDataFrame(
        [(op, d, t, n) for op, d, t, n, _ in rows],
        "op string, doc_id string, tokens array<int>, n_tok int",
    )
    got = [r[0] for r in df.select(dirty_predicate().alias("d")).collect()]
    assert got == [exp for *_, exp in rows]


def test_fast_payload_generator_parity(spark):
    """gen_changelog_payload_fast must be row-identical to the expression path
    with_binary_payload(gen_changelog(...)).drop('tokens')."""
    from tg_data_connector_spark.cdc.genlog import gen_changelog_payload_fast

    n, d, p = 50_000, 3_000, 8
    slow = with_binary_payload(gen_changelog(spark, n, d, n_parts=p)).drop("tokens")
    fast = gen_changelog_payload_fast(spark, n, d, n_parts=p)
    assert fast.count() == slow.count()
    assert slow.exceptAll(fast).count() == 0
    assert fast.exceptAll(slow).count() == 0


def test_dup_count_non_multiple_of_20(spark):
    """Every id < n with id % 20 == 5 is re-sent — including the final one when
    n % 20 in [6, 19] (the naive n // 20 undercounts there)."""
    for n in (56, 1017, 39):
        expected_dups = len([i for i in range(n) if i % 20 == 5])
        log = gen_changelog(spark, n, 10)
        assert log.count() == n + expected_dups, n
        # the duplicated rows are exact re-deliveries
        dup_ids = (
            log.groupBy("event_id").count().where(F.col("count") > 1).collect()
        )
        assert sorted(r["event_id"] for r in dup_ids) == [
            i for i in range(n) if i % 20 == 5
        ], n


def test_fast_generator_parity_ragged_tail(spark):
    """Formula parity at an n_events % 20 in [6, 19] (the original parity test
    uses a multiple of 20 and cannot see a dup-count drift)."""
    from tg_data_connector_spark.cdc.genlog import gen_changelog_payload_fast

    n, d, p = 1017, 100, 4
    slow = with_binary_payload(gen_changelog(spark, n, d, n_parts=p)).drop("tokens")
    fast = gen_changelog_payload_fast(spark, n, d, n_parts=p)
    assert fast.count() == slow.count()
    assert slow.exceptAll(fast).count() == 0
    assert fast.exceptAll(slow).count() == 0


def test_dirty_predicate_raw_overflow_safe(spark):
    """A corrupt-but-legal n_tok near int32 max must be judged dirty, not blow
    up the job with ARITHMETIC_OVERFLOW under ANSI mode (n_tok * 4 as int)."""
    from tg_data_connector_spark.cdc.quality import dirty_predicate_raw

    df = spark.createDataFrame(
        [("I", "a", bytearray(b"\x00\x00\x00\x01"), 2**30),
         ("I", "b", bytearray(b"\x00\x00\x00\x01"), 1)],
        "op string, doc_id string, payload binary, n_tok int",
    )
    got = {
        r["doc_id"]: r["d"]
        for r in df.select("doc_id", dirty_predicate_raw().alias("d")).collect()
    }
    assert got == {"a": True, "b": False}
