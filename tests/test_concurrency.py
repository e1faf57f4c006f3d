"""Multi-writer optimistic-concurrency tests (VERDICT r3 directive #2).

Two LakeTable handles on one root race their commits; the loser must detect
the conflict and converge with NO lost update and NO duplicate batch
application. The race is driven deterministically through merge_upsert's
``pre_publish_check`` hook: writer A stages its files, then — before A's
commit — writer B runs a full merge and publishes. Reference cue: the
reference re-queues a failed task (``TaskGroupContainer.java:162-241``); here
the failed COMMIT is what re-runs.
"""

import pytest
from pyspark.sql import functions as F

from tg_data_connector_spark.lake import LakeTable, TableSchema, merge_upsert
from tg_data_connector_spark.lake.table import CommitConflict

SCHEMA = TableSchema(
    [
        ("doc_id", "string"),
        ("tokens", "array<int>"),
        ("n_tok", "int"),
        ("source", "string"),
    ]
)

EV = (
    "doc_id string, tokens array<int>, n_tok int, source string, "
    "op string, commit_lsn bigint, seq_no bigint"
)


def _tbl(spark, root, nb=4, n=40):
    t = LakeTable.create(spark, root, SCHEMA, "doc_id", nb)
    seed = spark.range(n).select(
        F.concat(F.lit("d"), F.col("id")).alias("doc_id"),
        F.array(F.col("id").cast("int")).alias("tokens"),
        F.lit(1).alias("n_tok"),
        F.lit("s").alias("source"),
    )
    t.append(seed)
    return t


def _ev(spark, doc_id, tokens, lsn, op="U"):
    return spark.createDataFrame(
        [(doc_id, tokens, len(tokens), "s", op, lsn, 0)], EV
    )


def _bucket_of(spark, doc_id, nb):
    from tg_data_connector_spark.lake.table import bucket_expr

    return (
        spark.range(1)
        .select(F.lit(doc_id).alias("k"))
        .select(bucket_expr("k", nb).alias("b"))
        .collect()[0]["b"]
    )


def _two_keys(spark, nb, same_bucket: bool):
    """Find two doc_ids from the seed domain in the same / different buckets."""
    base = _bucket_of(spark, "d1", nb)
    for i in range(2, 40):
        b = _bucket_of(spark, f"d{i}", nb)
        if (b == base) == same_bucket:
            return "d1", f"d{i}"
    raise AssertionError("no key pair found")


def test_disjoint_bucket_race_metadata_retry(spark, tmp_table_root):
    """Interloper touched OTHER buckets -> loser re-commits its staged files
    against the new parent without re-running the merge; both updates land."""
    t_a = _tbl(spark, tmp_table_root)
    t_b = LakeTable(spark, tmp_table_root)
    ka, kb = _two_keys(spark, 4, same_bucket=False)

    b_version = {}

    def interleave():
        merge_upsert(t_b, _ev(spark, kb, [202], 11), summary_update={"batch_id": "B"})
        b_version["v"] = t_b.current_version()

    snap = merge_upsert(
        t_a, _ev(spark, ka, [101], 10), summary_update={"batch_id": "A"},
        pre_publish_check=interleave,
    )
    assert snap is not None
    rows = {r["doc_id"]: r["tokens"] for r in t_a.read().collect()}
    assert rows[ka] == [101] and rows[kb] == [202]  # no lost update
    applied = t_a.snapshot().applied_batches()
    assert applied.count("A") == 1 and applied.count("B") == 1
    # linear history: A's retried snapshot sits ON TOP of B's published one
    assert t_a.snapshot().parent == b_version["v"]


def test_same_bucket_race_full_remerge(spark, tmp_table_root):
    """Interloper rewrote the SAME bucket -> metadata retry is unsound; the
    loser re-runs the merge against the new snapshot. Both keys' final state
    reflects LWW of both writers."""
    t_a = _tbl(spark, tmp_table_root)
    t_b = LakeTable(spark, tmp_table_root)
    ka, kb = _two_keys(spark, 4, same_bucket=True)
    fired = {"n": 0}

    def interleave():
        # fire only on A's FIRST attempt; the re-merge must not loop forever
        if fired["n"] == 0:
            fired["n"] += 1
            merge_upsert(
                t_b, _ev(spark, kb, [222], 21), summary_update={"batch_id": "B"}
            )

    snap = merge_upsert(
        t_a, _ev(spark, ka, [111], 20), summary_update={"batch_id": "A"},
        pre_publish_check=interleave,
    )
    assert snap is not None
    rows = {r["doc_id"]: r["tokens"] for r in t_a.read().collect()}
    assert rows[ka] == [111]
    assert rows[kb] == [222]  # B's same-bucket write survived A's re-merge
    applied = t_a.snapshot().applied_batches()
    assert applied.count("A") == 1 and applied.count("B") == 1
    assert t_a.read().count() == 40


def test_duplicate_batch_race_skips(spark, tmp_table_root):
    """Two workers race the SAME batch_id: the loser sees it in the new
    snapshot's applied list and skips — at-most-once application."""
    t_a = _tbl(spark, tmp_table_root)
    t_b = LakeTable(spark, tmp_table_root)
    ka, _ = _two_keys(spark, 4, same_bucket=False)
    fired = {"n": 0}

    def interleave():
        if fired["n"] == 0:
            fired["n"] += 1
            merge_upsert(
                t_b, _ev(spark, ka, [99], 30), summary_update={"batch_id": "X"}
            )

    snap = merge_upsert(
        t_a, _ev(spark, ka, [99], 30), summary_update={"batch_id": "X"},
        pre_publish_check=interleave,
    )
    assert snap is not None
    assert t_a.snapshot().applied_batches().count("X") == 1
    rows = {r["doc_id"]: r["tokens"] for r in t_a.read().collect()}
    assert rows[ka] == [99]
    # the loser returned the winner's snapshot rather than stacking a new one
    assert t_a.current_version() == t_b.current_version()


def test_stale_basis_commit_raises(spark, tmp_table_root):
    """commit(expected_parent=...) refuses a stale-basis publish outright —
    the guard that makes the lost update DETECTABLE instead of silent."""
    t = _tbl(spark, tmp_table_root, n=8)
    basis = t.current_version()
    t.append(_ev(spark, "zz", [1], 1).drop("op", "commit_lsn", "seq_no"))
    with pytest.raises(CommitConflict):
        t.commit([], replace_buckets=[0], expected_parent=basis)


def test_conflict_retries_exhausted(spark, tmp_table_root):
    """A writer that loses max_commit_retries+1 rounds surfaces the conflict
    instead of spinning."""
    t_a = _tbl(spark, tmp_table_root)
    t_b = LakeTable(spark, tmp_table_root)
    ka, kb = _two_keys(spark, 4, same_bucket=True)
    lsn = {"v": 100}

    def always_interleave():
        lsn["v"] += 1
        merge_upsert(t_b, _ev(spark, kb, [lsn["v"]], lsn["v"]))

    with pytest.raises(CommitConflict):
        merge_upsert(
            t_a, _ev(spark, ka, [1], 40),
            pre_publish_check=always_interleave, max_commit_retries=1,
        )
    # the losing writer left no published snapshot: kb's latest write is live
    rows = {r["doc_id"]: r["tokens"] for r in t_a.read().collect()}
    assert rows[kb] == [lsn["v"]]
