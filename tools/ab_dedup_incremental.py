#!/usr/bin/env python
"""Scaling-shape measurement: incremental batch dedup vs full re-dedup.

The claim behind operators/dedup_text.dedup_incremental is asymptotic:
per-batch FULL recompute (dedup_exact over corpus+batch) costs O(corpus)
per batch forever, while the incremental classify costs O(batch + one thin
index scan). So this sweeps CORPUS SIZE at fixed batch size and measures
both plans per size — the naive line should grow with the corpus, the
incremental line should stay ~flat.

Per size: build the index once (absorb cost reported — that's the
steady-state ingest write), then alternate naive/incremental classify
samples WITHOUT mutating the index (update_index=False), so samples are
i.i.d. apart from OS cache warming, which the interleave spreads evenly.

Usage: python tools/ab_dedup_incremental.py [batch_docs] [samples] [sizes...]
"""
from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from tg_data_connector_spark.operators.dedup_text import (
    create_dedup_index,
    dedup_exact,
    dedup_incremental,
)
from tg_data_connector_spark.session import get_spark


def synth_docs(spark, n, offset=0, dup_every=20):
    """Deterministic docs; every dup_every-th doc repeats an earlier text."""
    i = F.col("id")
    base = F.when((i % dup_every == 0) & (i > 0), (i - dup_every)).otherwise(i)
    text = F.concat(
        F.lit("doc text body "), base.cast("string"), F.lit(" "),
        F.repeat(F.concat(F.lit("w"), (base % 97).cast("string"), F.lit(" ")), 40),
    )
    return spark.range(offset, offset + n).select(
        i.alias("doc_id"), text.alias("text")
    )


def main():
    batch_n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    samples = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    sizes = [int(x) for x in sys.argv[3:]] or [1_000_000, 4_000_000, 8_000_000]
    spark = get_spark("ab_dedup_incremental")

    for corpus_n in sizes:
        root = tempfile.mkdtemp(prefix="ab_dedup_")
        corpus_p, batch_p = f"{root}/corpus", f"{root}/batch"
        synth_docs(spark, corpus_n).write.parquet(corpus_p)
        # batch overlaps the corpus: every 10th batch doc reuses corpus text
        synth_docs(spark, batch_n, offset=corpus_n).withColumn(
            "text",
            F.when(
                F.col("doc_id") % 10 == 0,
                F.concat(F.lit("doc text body "),
                         (F.col("doc_id") % corpus_n).cast("string"), F.lit(" "),
                         F.repeat(F.concat(F.lit("w"),
                                  ((F.col("doc_id") % corpus_n) % 97).cast("string"),
                                  F.lit(" ")), 40)),
            ).otherwise(F.col("text")),
        ).write.parquet(batch_p)
        corpus = spark.read.parquet(corpus_p)
        batch = spark.read.parquet(batch_p)

        index = create_dedup_index(spark, f"{root}/idx", n_buckets=32)
        t0 = time.time()
        dedup_incremental(index, corpus, batch_lsn=1).count()
        build = time.time() - t0

        naive, inc = [], []
        for _ in range(samples):
            t0 = time.time()
            dedup_exact(corpus.unionByName(batch)).count()
            naive.append(round(time.time() - t0, 2))
            t0 = time.time()
            dedup_incremental(
                index, batch, batch_lsn=2, update_index=False
            ).where(F.col("status") == "kept").count()
            inc.append(round(time.time() - t0, 2))
        print(json.dumps({
            "corpus": corpus_n, "batch": batch_n,
            "index_build_sec": round(build, 2),
            "naive_full_sec": naive, "incremental_sec": inc,
            "naive_best": min(naive), "incremental_best": min(inc),
        }), flush=True)


if __name__ == "__main__":
    main()
