"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio decode libraries are not installable in this environment, so the
DECODE step is stubbed (deterministic fake behind a flag, NotImplementedError
otherwise) — but everything Spark-side is real and tested: binary columns,
schema, Arrow batch shape through mapInPandas, partition sizing, and the
metadata extraction that needs no codec (magic-byte sniffing, sizes).

At scale: binary payloads ride the same parquet row groups; mapInPandas
processes whole Arrow batches (tune spark.sql.execution.arrow.maxRecordsPerBatch
down for large blobs so a batch fits executor memory).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MAGIC = {
    "89504e47": "png",
    "ffd8ff": "jpeg",
    "47494638": "gif",
    "52494646": "riff",  # wav/avi container
    "664c6143": "flac",
}


def sniff_format(payload: Column) -> Column:
    """Container format from magic bytes — expression-only, no decode."""
    hx = F.lower(F.hex(F.substring(payload, 1, 4)))
    expr = F.lit("unknown")
    for magic, name in reversed(MAGIC.items()):
        expr = F.when(hx.startswith(magic), F.lit(name)).otherwise(expr)
    return expr


def media_metadata(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    p = F.col(payload_col)
    return df.select(
        "*",
        F.length(p).alias("n_bytes"),
        sniff_format(p).alias("format"),
        F.lower(F.hex(F.substring(p, 1, 8))).alias("header_hex"),
    )


def decode_and_featurize(
    df: DataFrame,
    payload_col: str = "payload",
    feature_dim: int = 8,
    use_fake_decoder: bool = False,
):
    """Decode payloads and emit fixed-size feature vectors via mapInPandas.

    The real decoder would use PIL/librosa here — NOT AVAILABLE in this
    container. ``use_fake_decoder=True`` substitutes a deterministic
    byte-statistics featurizer so the full Spark plumbing (schema, Arrow
    batching, vectorized numpy math) is exercised end-to-end in tests.
    The stub is vectorized over the WHOLE Arrow batch (flat byte buffer +
    offsets, prefix-sum chunk means — no per-blob Python). Null payloads map
    to null features; empty payloads to all-zero features.
    """
    import numpy as np

    out_schema = ", ".join(
        [f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields]
        + [f"features array<float>"]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pyarrow as pa

        for pdf in it:
            if not use_fake_decoder:
                raise NotImplementedError(
                    "media decode requires PIL/librosa (not installed); "
                    "pass use_fake_decoder=True for the deterministic stub"
                )
            # Whole-batch vectorized featurize: the Arrow binary column is one
            # contiguous byte buffer + an offsets array, so the per-blob chunk
            # means (np.array_split semantics: len//d chunks, first len%d get
            # +1) come from prefix-sum differences over the flat buffer — no
            # per-blob Python, no per-blob allocation.
            arr = pa.array(pdf[payload_col], type=pa.large_binary())
            n = len(arr)
            if n == 0:
                pdf = pdf.copy()
                pdf["features"] = []
                yield pdf
                continue
            offsets = np.frombuffer(arr.buffers()[1], dtype=np.int64)[
                arr.offset : arr.offset + n + 1
            ]
            data = (
                np.frombuffer(arr.buffers()[2], dtype=np.uint8)
                if arr.buffers()[2] is not None
                else np.zeros(0, dtype=np.uint8)
            )
            null_mask = arr.is_null().to_numpy(zero_copy_only=False)
            lens = np.diff(offsets)
            d = feature_dim
            q, r = lens // d, lens % d
            i = np.arange(d, dtype=np.int64)
            starts = (
                offsets[:-1, None] + i[None, :] * q[:, None]
                + np.minimum(i[None, :], r[:, None])
            ).ravel()
            ends = np.append(starts[1:], offsets[-1])
            csum = np.concatenate(([0], np.cumsum(data, dtype=np.int64)))
            sums = csum[ends] - csum[starts]
            counts = ends - starts
            means = np.where(counts > 0, sums / np.maximum(counts, 1), 0.0)
            feats = list(means.reshape(n, d).astype(np.float32))
            for j in np.nonzero(null_mask)[0]:
                feats[j] = None
            pdf = pdf.copy()
            pdf["features"] = feats
            yield pdf

    return df.mapInPandas(batches, out_schema)
