"""Structured Streaming tail: same final state as batch replay; idempotent
across checkpoint wipes (the snapshot batch-id check, not Spark's checkpoint,
carries exactly-once)."""

from pyspark.sql import functions as F

from tg_data_connector_spark.cdc import (
    ReplayConfig,
    ReplayEngine,
    gen_changelog,
    gen_seed_sequences,
)
from tg_data_connector_spark.lake import LakeTable, TableSchema
from tg_data_connector_spark.streaming import stream_replay

from oracle import oracle_final_state

SCHEMA = TableSchema(
    [
        ("doc_id", "string"),
        ("tokens", "array<int>"),
        ("n_tok", "int"),
        ("source", "string"),
    ]
)


def test_stream_tail_matches_oracle(spark, tmp_path):
    log = gen_changelog(spark, 2000, 300, n_parts=4)
    src_dir = str(tmp_path / "log")
    # several files -> several micro-batches with maxFilesPerTrigger
    log.repartition(6).write.parquet(src_dir)
    seed = gen_seed_sequences(spark, 200)
    table = LakeTable.create(spark, str(tmp_path / "tbl"), SCHEMA, "doc_id", 8)
    table.append(seed)
    eng = ReplayEngine(spark, table, ReplayConfig())
    q = stream_replay(
        spark, eng, src_dir, str(tmp_path / "ckpt"), max_files_per_trigger=2
    )
    q.awaitTermination(300)
    expected = oracle_final_state(seed, spark.read.parquet(src_dir))
    got = table.read().select("doc_id", "tokens", "n_tok", "source")
    assert got.exceptAll(expected).count() == 0
    assert expected.exceptAll(got).count() == 0

    # wipe the Spark checkpoint and re-run the whole stream: the snapshot
    # batch-id/LWW machinery must make every re-delivered micro-batch a no-op
    state = sorted(got.collect())
    q2 = stream_replay(
        spark, eng, src_dir, str(tmp_path / "ckpt2"), max_files_per_trigger=2
    )
    q2.awaitTermination(300)
    assert sorted(table.read().select("doc_id", "tokens", "n_tok", "source").collect()) == state
