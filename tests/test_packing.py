"""Sequence packing + mixture sampling: semantics and plan-shape.

Packing invariants pinned here (the gate row `seq_packing` pins engine-vs-
DuckDB equality on real data; these pin the contract on adversarial shapes):
  * the concatenation of chunks in chunk_id order equals the concatenation of
    docs in order_col order — nothing lost, nothing reordered;
  * every chunk is exactly `window` long except the stream tail;
  * a doc longer than the window spans chunks with correct slices;
  * drop_last removes only the short tail;
  * streams pack independently per part_col.
"""

from pyspark.sql import functions as F

from tg_data_connector_spark.operators.packing import pack_sequences, sample_mixture


def _rows(df):
    return [r.asDict() for r in df.orderBy("source", "chunk_id").collect()]


def test_pack_roundtrip_and_tail(spark):
    docs = spark.createDataFrame(
        [
            ("a", 1, [1, 2, 3]),
            ("a", 2, [4, 5, 6, 7]),
            ("a", 3, [8]),
            ("b", 1, [9, 9]),
        ],
        "source string, doc_id int, tokens array<int>",
    )
    got = _rows(pack_sequences(docs, window=5))
    a = [r for r in got if r["source"] == "a"]
    assert [r["tokens"] for r in a] == [[1, 2, 3, 4, 5], [6, 7, 8]]
    assert [r["chunk_id"] for r in a] == [0, 1]
    assert [r["n_docs"] for r in a] == [2, 2]  # doc 2 straddles both chunks
    b = [r for r in got if r["source"] == "b"]
    assert [r["tokens"] for r in b] == [[9, 9]] and b[0]["n_docs"] == 1


def test_pack_doc_longer_than_window(spark):
    docs = spark.createDataFrame(
        [("a", 1, list(range(12))), ("a", 2, [100, 101])],
        "source string, doc_id int, tokens array<int>",
    )
    got = _rows(pack_sequences(docs, window=5))
    assert [r["tokens"] for r in got] == [
        [0, 1, 2, 3, 4], [5, 6, 7, 8, 9], [10, 11, 100, 101],
    ]
    assert [r["n_docs"] for r in got] == [1, 1, 2]


def test_pack_exact_fill_and_drop_last(spark):
    docs = spark.createDataFrame(
        [("a", 1, [1, 2]), ("a", 2, [3, 4]), ("a", 3, [5])],
        "source string, doc_id int, tokens array<int>",
    )
    exact = _rows(pack_sequences(docs, window=5))
    assert len(exact) == 1 and exact[0]["n_tok"] == 5  # no empty tail chunk
    dropped = pack_sequences(docs, window=4, drop_last=True)
    got = _rows(dropped)
    assert [r["tokens"] for r in got] == [[1, 2, 3, 4]]  # tail [5] dropped


def test_pack_empty_docs_skipped(spark):
    docs = spark.createDataFrame(
        [("a", 1, []), ("a", 2, [7, 8, 9])],
        "source string, doc_id int, tokens array<int>",
    )
    got = _rows(pack_sequences(docs, window=2))
    assert [r["tokens"] for r in got] == [[7, 8], [9]]


def test_pack_plan_no_python(spark):
    """Expression-only: no Python eval nodes; the only wide exchange after the
    window is the (part, chunk) hash aggregate."""
    docs = spark.createDataFrame(
        [("a", 1, [1, 2, 3])], "source string, doc_id int, tokens array<int>"
    )
    plan = pack_sequences(docs, window=2)._jdf.queryExecution().executedPlan().toString()
    assert "PythonUDF" not in plan and "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


def test_mixture_sample_deterministic_and_weighted(spark):
    df = spark.range(0, 20000).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("s"), (F.col("id") % 2).cast("string")).alias("source"),
    )
    out = sample_mixture(df, {"s0": 0.5, "s1": 0.0}, default_weight=0.0)
    counts = {r["source"]: r["n"] for r in
              out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert "s1" not in counts
    assert abs(counts["s0"] - 5000) < 300  # ~50% of 10k, hash-uniform
    again = sample_mixture(df, {"s0": 0.5, "s1": 0.0}, default_weight=0.0)
    assert out.exceptAll(again).count() == 0 and again.exceptAll(out).count() == 0
