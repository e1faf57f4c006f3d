"""Golden tests for the dx_* transformer parity (FIXTURES.md F5)."""

from pyspark.sql import functions as F

from tg_data_connector_spark.operators import (
    apply_transformer_chain,
    dx_filter,
    dx_pad,
    dx_replace,
    dx_substr,
)


def _one_col(spark, vals, typ="string"):
    return spark.createDataFrame([(v,) for v in vals], f"v {typ}")


def _apply(df, col):
    return [r["o"] for r in df.select(col.alias("o")).collect()]


def test_dx_substr(spark):
    df = _one_col(spark, ["hello", "he", None, ""])
    # start=1, len=3 -> 'ell'; clamp at end -> 'e'; null passthrough; '' -> null (start past end)
    assert _apply(df, dx_substr(F.col("v"), 1, 3)) == ["ell", "e", None, None]
    assert _apply(df, dx_substr(F.col("v"), 0, 99)) == ["hello", "he", None, None]


def test_dx_pad(spark):
    df = _one_col(spark, ["ab", "abcdef", None])
    assert _apply(df, dx_pad(F.col("v"), "l", 4, "xy")) == ["xyab", "abcd", "xyxy"]
    assert _apply(df, dx_pad(F.col("v"), "r", 4, "xy")) == ["abxy", "abcd", "xyxy"]
    # truncate keeps the head for BOTH directions (PadTransformer.java:54-56)
    assert _apply(df, dx_pad(F.col("v"), "l", 3, "z")) == ["zab", "abc", "zzz"]


def test_dx_replace(spark):
    df = _one_col(spark, ["abcdef", "ab", None])
    # replace [2, 2+2) with 'XY'
    assert _apply(df, dx_replace(F.col("v"), 2, 2, "XY")) == ["abXYef", "abXY", None]
    # tail-replace past end clamps (ReplaceTransformer.java:52-57)
    assert _apply(df, dx_replace(F.col("v"), 4, 99, "Z")) == ["abcdZ", "abZ", None]


def test_dx_filter_drop_on_match_polarity(spark):
    df = _one_col(spark, [1, 5, 10, None], "int")
    # drop where v > 4 -> keep 1 and NULL (nulls never dropped by >/<)
    kept = _apply(dx_filter(df, "v", ">", "4"), F.col("v"))
    assert sorted(x for x in kept if x is not None) == [1] and None in kept
    kept = _apply(dx_filter(df, "v", "<", "4"), F.col("v"))
    assert sorted(x for x in kept if x is not None) == [5, 10] and None in kept


def test_dx_filter_null_literal_semantics(spark):
    df = _one_col(spark, ["a", None, "b"])
    # '= null' drops SQL NULLs
    assert _apply(dx_filter(df, "v", "=", "null"), F.col("v")) == ["a", "b"]
    # '!= null' drops non-nulls
    assert _apply(dx_filter(df, "v", "!=", "null"), F.col("v")) == [None]
    # equality on a value drops only matching rows
    assert _apply(dx_filter(df, "v", "=", "a"), F.col("v")) == [None, "b"]


def test_dx_filter_like_full_match(spark):
    df = _one_col(spark, ["abc", "abcd", "xabc", None])
    # Java String.matches is a FULL match: 'abc.*' matches abc & abcd, not xabc
    kept = _apply(dx_filter(df, "v", "like", "abc.*"), F.col("v"))
    assert kept == ["xabc", None]
    kept = _apply(dx_filter(df, "v", "not like", "abc.*"), F.col("v"))
    assert kept == ["abc", "abcd", None]


def test_transformer_chain(spark):
    df = spark.createDataFrame([("hello world", 3), ("xy", 9)], "s string, n int")
    out = apply_transformer_chain(
        df,
        [
            {"name": "dx_substr", "column": "s", "paras": [0, 5]},
            {"name": "dx_pad", "column": "s", "paras": ["r", 7, "!"]},
            {"name": "dx_filter", "column": "n", "paras": [">", "5"]},
        ],
    )
    rows = out.collect()
    assert len(rows) == 1 and rows[0]["s"] == "hello!!"


def test_dx_filter_timestamp_column(spark):
    """Date columns must compare temporally (reference FilterTransformer
    long-millis dispatch), never lexicographically as strings."""
    from pyspark.sql import functions as F

    from tg_data_connector_spark.operators.transformers import dx_filter

    df = spark.createDataFrame(
        [("2024-01-02 00:00:00",), ("2024-10-01 00:00:00",), (None,)],
        "ts string",
    ).select(F.col("ts").cast("timestamp").alias("ts"))
    # drop rows AFTER 2024-06-01; null never dropped by >
    out = dx_filter(df, "ts", ">", "2024-06-01 00:00:00")
    got = sorted(str(r["ts"]) for r in out.collect())
    assert got == ["2024-01-02 00:00:00", "None"]
    # epoch-millis constant form
    epoch_ms = str(int(1717200000) * 1000)  # 2024-06-01T00:00:00Z
    out2 = dx_filter(df, "ts", ">", epoch_ms)
    assert out2.count() == 2


def test_transformer_registry_custom(spark):
    from pyspark.sql import functions as F

    from tg_data_connector_spark.operators.transformers import (
        apply_transformer_chain,
        register_transformer,
        unregister_transformer,
    )

    def upper_col(df, step):
        c = step["column"]
        return df.withColumn(c, F.upper(F.col(c)))

    register_transformer("my_upper", upper_col)
    try:
        df = spark.createDataFrame([("ab",), ("cd",)], "s string")
        out = apply_transformer_chain(df, [{"name": "my_upper", "column": "s"}])
        assert sorted(r["s"] for r in out.collect()) == ["AB", "CD"]
    finally:
        unregister_transformer("my_upper")
    # natives cannot be shadowed
    import pytest

    with pytest.raises(ValueError, match="shadow"):
        register_transformer("dx_substr", upper_col)
