"""Benchmark decontamination (operators/decontam.py): known-answer cases for
the n-gram construction and the flag/remove operators."""

from pyspark.sql import functions as F

from tg_data_connector_spark.operators.decontam import (
    contamination_flags,
    decontaminate,
    word_ngrams,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_word_ngrams_known_answers(spark):
    df = spark.createDataFrame(
        [
            ("a b c d",),      # 3 distinct 2-grams
            ("x x x",),        # repeated gram collapses to 1 distinct
            ("solo",),         # shorter than n -> EMPTY, not a padded gram
            ("  A  b  ",),     # trim + lower + multi-space split
        ],
        "t string",
    )
    got = [r[0] for r in df.select(word_ngrams(F.col("t"), 2)).collect()]
    assert got[0] == ["a b", "b c", "c d"]
    assert got[1] == ["x x"]
    assert got[2] == []
    assert got[3] == ["a b"]


def test_contamination_flags_and_decontaminate(spark):
    corpus = _docs(
        spark,
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "a totally clean document about nothing shared"),
            (3, "quick brown fox jumps again and again today"),
            (4, "tiny"),  # < n words: never contaminated
        ],
    )
    ev = _docs(spark, [(100, "quick brown fox jumps high")])
    flags = {
        r["doc_id"]: (r["n_hits"], r["contaminated"])
        for r in contamination_flags(corpus, ev, n=4).collect()
    }
    # docs 1 and 3 contain the eval 4-gram "quick brown fox jumps"
    assert flags[1] == (1, True)
    assert flags[3] == (1, True)
    assert flags[2] == (0, False)
    assert flags[4] == (0, False)
    kept = sorted(
        r["doc_id"] for r in decontaminate(corpus, ev, n=4).collect()
    )
    assert kept == [2, 4]


def test_contamination_eval_text_col_and_counts(spark):
    corpus = _docs(spark, [(1, "p q r s t u p q r s")])
    ev = spark.createDataFrame(
        [("p q r s zz", )], "bench string"
    )
    rows = contamination_flags(
        corpus, ev, n=4, eval_text_col="bench"
    ).collect()
    # "p q r s" appears twice in doc 1 but is ONE distinct hit
    assert rows[0]["n_hits"] == 1 and rows[0]["contaminated"]
