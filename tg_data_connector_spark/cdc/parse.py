"""Vectorized change-event parsing (Arrow pandas_udf — never per-row Python).

Replaces the reference's per-record transformer chain executed inside the reader
thread (``core/.../exchanger/TransformerExchanger.java:53-127``) and its
``dx_groovy`` escape hatch (``GroovyTransformer.java:17-91``) — which evaluate
one Java object tree per row — with a single Arrow-batched kernel: the payload
column arrives as a zero-copy Arrow buffer, numpy decodes the whole batch at
once, and the decoded token arrays return as one Arrow ListArray.

At 100 TB this is the only Python in the hot path; everything around it
(filter, dedup, join, write) stays in whole-stage-codegen'd JVM operators.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, IntegerType


@pandas_udf(ArrayType(IntegerType()))
def decode_tokens(payload: pd.Series) -> pd.Series:
    """Decode big-endian int32 binary payloads into token arrays, one Arrow batch
    at a time. NaN-safe: null payloads stay null (delete events carry none)."""
    out = []
    for buf in payload:
        if buf is None:
            out.append(None)
        else:
            out.append(np.frombuffer(buf, dtype=">i4").astype(np.int32))
    return pd.Series(out)


def parse_events(raw: DataFrame) -> DataFrame:
    """Raw changelog (payload: binary) -> typed changelog (tokens: array<int>).

    Everything except the byte decode is JVM-side; n_tok is validated downstream
    by the quarantine split, not silently fixed (reference dirty-record policy,
    ``StdoutPluginCollector`` call sites e.g. ``CommonRdbmsReader.java:344``).
    """
    return raw.withColumn("tokens", decode_tokens(F.col("payload"))).drop("payload")
