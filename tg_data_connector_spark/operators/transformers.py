"""The reference's transformer algebra, re-expressed as Catalyst column ops.

DataX runs a sequential per-record transformer chain inside the reader thread
(``core/.../exchanger/TransformerExchanger.java:53-127``); each native
transformer mutates one positional column of one record at a time. Here each is
a pure Column expression — whole-stage-codegen'd, vectorized, pushdown-friendly
— and the "chain" is ordinary expression composition in one ``select``.

Semantics preserved exactly (golden-tested in tests/test_transformers.py):

  dx_substr  (``SubstrTransformer.java:15-65``)  — substring from 0-based
      startIndex, length clamped to end-of-string; NULL passes through; a
      startIndex beyond the string is an error in the reference -> here the
      row is routed to the dirty side by the caller (expression yields null).
  dx_pad     (``PadTransformer.java:15-91``)     — lpad/rpad to length with a
      repeated pad string; if the value is already longer it is TRUNCATED to
      length (``:54-56``); NULL is treated as "" (``:46-49``).
  dx_replace (``ReplaceTransformer.java:15-66``) — splice: keep [0, startIndex),
      insert replaceString, keep [startIndex+length, end); clamps at end.
  dx_filter  (``FilterTransformer.java:14-311``) — drops the record WHEN the
      predicate matches (``:200-202`` return null = filtered). Null semantics:
      ``>``/``<`` never drop nulls (``:72-77,132-137``); ``= "null"`` drops SQL
      NULL and ``!= "null"`` drops non-null (``:203-212,253-262``); `like` is a
      Java regex ``String.matches`` -> full-match rlike.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dx_substr(col: Column, start_index: int, length: int) -> Column:
    """0-based substring with end clamp; null -> null. Out-of-range start yields
    null (the reference throws per-record -> dirty record; callers that want the
    reference's strictness filter nulls to quarantine)."""
    return F.when(col.isNull(), F.lit(None)).when(
        F.length(col) > start_index, F.substring(col, start_index + 1, length)
    )


def dx_pad(col: Column, pad_type: str, length: int, pad_string: str) -> Column:
    """lpad/rpad with truncate-to-length when longer; null treated as ''."""
    if pad_type not in ("l", "r"):
        raise ValueError("pad_type must be 'l' or 'r'")
    base = F.coalesce(col, F.lit(""))
    fn = F.lpad if pad_type == "l" else F.rpad
    # Spark's lpad/rpad already truncate to `len` when the input is longer, but
    # the reference truncates keeping the HEAD for both directions (:54-56)
    return F.when(F.length(base) >= length, F.substring(base, 1, length)).otherwise(
        fn(base, length, pad_string)
    )


def dx_replace(col: Column, start_index: int, length: int, replace: str) -> Column:
    """Splice-replace [start, start+length) with `replace`; 0-based; clamps."""
    head = F.substring(col, 1, start_index)
    return F.when(col.isNull(), F.lit(None)).otherwise(
        F.concat(
            head,
            F.lit(replace),
            F.when(
                F.length(col) > start_index + length,
                col.substr(F.lit(start_index + length + 1), F.length(col)),
            ).otherwise(F.lit("")),
        )
    )


def _typed_lit(value: str, like_col_type: str):
    like_col_type = like_col_type.split("(")[0]  # decimal(10,2) -> decimal
    if like_col_type in ("double", "float", "decimal"):
        return F.lit(float(value))
    if like_col_type in ("bigint", "int", "long", "smallint"):
        return F.lit(int(value))
    if like_col_type in ("timestamp", "date", "timestamp_ntz"):
        # reference dispatch: Date columns compare as epoch millis
        # (``FilterTransformer.java:45-68``); the constant goes through the
        # string->Date cast chain (``ColumnCast.java:87-117``). Here: an
        # all-digits constant is epoch MILLIS, anything else parses with the
        # default datetime format — producing a temporal comparison, never the
        # lexicographic string compare a bare lit would fall into.
        if value.isdigit():
            ts = (F.lit(int(value)) / F.lit(1000.0)).cast("timestamp")
        else:
            ts = F.to_timestamp(F.lit(value))
        return ts.cast(like_col_type)
    return F.lit(value)


def dx_filter(df: DataFrame, col_name: str, op: str, value: str) -> DataFrame:
    """Drop rows WHERE the comparison matches (reference polarity:
    ``FilterTransformer.java:200-202``). Nulls: never dropped by >/<; the string
    literal "null" means SQL NULL for =/!= (``:203-212``)."""
    c = F.col(col_name)
    if op in (">", "<", ">=", "<="):
        v = _typed_lit(value, dict(df.dtypes)[col_name])
        cmp = {">": c > v, "<": c < v, ">=": c >= v, "<=": c <= v}[op]
        drop = cmp & c.isNotNull()
    elif op == "=":
        drop = c.isNull() if value == "null" else (c == _typed_lit(value, dict(df.dtypes)[col_name]))
    elif op == "!=":
        drop = c.isNotNull() if value == "null" else (c != _typed_lit(value, dict(df.dtypes)[col_name]))
    elif op == "like":
        # Java String.matches = full-string regex
        drop = c.isNotNull() & c.rlike(f"^(?:{value})$")
    elif op == "not like":
        drop = c.isNotNull() & ~c.rlike(f"^(?:{value})$")
    else:
        raise ValueError(f"unsupported dx_filter op: {op}")
    return df.where(~F.coalesce(drop, F.lit(False)))


# ---------------------------------------------------------------- registry
# The reference's extension point: user transformers loaded dynamically from
# local_storage/transformer/ jars (``TransformerRegistry.java:41-104``; SPI
# ``transformer/src/main/java/.../ComplexTransformer.java:1-30``). Here a
# registered transformer is a Python callable shipped with the job
# (spark-submit --py-files) that receives the WHOLE DataFrame + its config
# step and returns a DataFrame — so custom transforms stay vectorized
# (Column expressions or pandas_udf), never per-row.
_REGISTRY: dict = {}


def register_transformer(name: str, fn) -> None:
    """Register a custom transformer: fn(df, step: dict) -> DataFrame.
    Native dx_* names cannot be shadowed (same rule as the reference, which
    registers natives first and refuses duplicate names,
    ``TransformerRegistry.java:28-39``)."""
    if name in _NATIVES:
        raise ValueError(f"cannot shadow native transformer {name!r}")
    _REGISTRY[name] = fn


def unregister_transformer(name: str) -> None:
    _REGISTRY.pop(name, None)


def is_known_transformer(name: str) -> bool:
    return name in _NATIVES or name in _REGISTRY


_NATIVES = ("dx_substr", "dx_pad", "dx_replace", "dx_filter")


def apply_transformer_chain(df: DataFrame, chain: list[dict]) -> DataFrame:
    """Config-driven chain, the job.json `transformer` analog
    (``core/.../util/TransformerUtil.java:22-106``). Each step:
    {"name": "dx_substr"|"dx_pad"|"dx_replace", "column": c, "paras": [...]}
    or {"name": "dx_filter", "column": c, "paras": [op, value]} or any name
    previously passed to ``register_transformer``."""
    for step in chain:
        name, coln, paras = step["name"], step.get("column"), step.get("paras", [])
        if name == "dx_substr":
            df = df.withColumn(coln, dx_substr(F.col(coln), int(paras[0]), int(paras[1])))
        elif name == "dx_pad":
            df = df.withColumn(coln, dx_pad(F.col(coln), paras[0], int(paras[1]), paras[2]))
        elif name == "dx_replace":
            df = df.withColumn(
                coln, dx_replace(F.col(coln), int(paras[0]), int(paras[1]), paras[2])
            )
        elif name == "dx_filter":
            df = dx_filter(df, coln, paras[0], paras[1])
        elif name in _REGISTRY:
            df = _REGISTRY[name](df, step)
        else:
            raise ValueError(f"unknown transformer {name!r}")
    return df
