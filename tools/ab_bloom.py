#!/usr/bin/env python
"""Interleaved A/B: parquet bloom filters on the key column vs point-lookup
latency, on the layout where blooms can actually pay — an UNSORTED table
whose buckets hold many commit files with fully OVERLAPPING key ranges
(random keys per commit), so the manifest min/max stats prune nothing and
every lookup otherwise decodes the key's whole file stack.

Build two identical tables (bloom on / off, same data, same commit
sequence), prime the page cache with one untimed lookup on each, then run
strictly interleaved timed lookup samples in one window. Reports medians +
raw samples + on-disk size delta; the `bloom_key` default in
LakeTable.create is set from this table (BENCH.md round 4).

Usage: python tools/ab_bloom.py [n_commits] [rows_per_commit] [samples]
"""
from __future__ import annotations

import glob
import json
import os
import statistics
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_BUCKETS = 16
KEY_SPACE = 2_000_000


def build(spark, root, bloom: bool, n_commits: int, rows: int):
    from pyspark.sql import functions as F

    from tg_data_connector_spark.lake.table import LakeTable, TableSchema

    schema = TableSchema(
        [("doc_id", "string"), ("tokens", "array<int>"),
         ("n_tok", "int"), ("source", "string")]
    )
    t = LakeTable.create(
        spark, root, schema, key="doc_id", n_buckets=N_BUCKETS,
        bloom_key=bloom, bloom_ndv=max(rows // N_BUCKETS, 64) if bloom else None,
    )
    t0 = time.time()
    for c in range(n_commits):
        i = F.col("id")
        # deterministic pseudo-random keys, ranges fully overlap across commits
        key = F.pmod(i * F.lit(2654435761) + F.lit(c * 997), F.lit(KEY_SPACE))
        df = spark.range(0, rows, 1, N_BUCKETS).select(
            F.concat(F.lit("doc-"), F.lpad(key.cast("string"), 7, "0")
                     ).alias("doc_id"),
            F.transform(F.sequence(F.lit(0), F.pmod(i, F.lit(8)).cast("int")),
                        lambda k: F.pmod(i + k, F.lit(50000)).cast("int")
                        ).alias("tokens"),
            (F.pmod(i, F.lit(8)) + 1).cast("int").alias("n_tok"),
            F.lit("web").alias("source"),
        )
        t.append(df, lsn_col=F.lit(c + 1), seq_col=F.lit(0))
    build_s = time.time() - t0
    nbytes = sum(
        os.path.getsize(p)
        for p in glob.glob(os.path.join(root, "data", "**", "*.parquet"),
                           recursive=True)
    )
    return t, build_s, nbytes


def probe_keys(round_no: int, n: int = 16) -> list[str]:
    return [
        f"doc-{((j * 48271 + round_no * 8191) % KEY_SPACE):07d}"
        for j in range(n)
    ]


def main():
    n_commits = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    rows = int(sys.argv[2]) if len(sys.argv) > 2 else 200_000
    samples = int(sys.argv[3]) if len(sys.argv) > 3 else 7

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    base = tempfile.mkdtemp(prefix="ab_bloom_")
    tables, meta = {}, {}
    for name, flag in (("bloom", True), ("plain", False)):
        t, build_s, nbytes = build(
            spark, os.path.join(base, name), flag, n_commits, rows
        )
        tables[name] = t
        meta[name] = {"build_s": round(build_s, 1), "bytes": nbytes}
        print(f"# built {name}: {build_s:.1f}s {nbytes/1e6:.1f}MB", flush=True)

    for t in tables.values():  # prime page cache, untimed
        t.lookup(probe_keys(-1)).collect()

    times: dict[str, list[float]] = {"bloom": [], "plain": []}
    for s in range(samples):
        keys = probe_keys(s)
        order = ("bloom", "plain") if s % 2 == 0 else ("plain", "bloom")
        for name in order:
            t0 = time.time()
            n = len(tables[name].lookup(keys).collect())
            dt = time.time() - t0
            times[name].append(dt)
            print(f"# sample {s} {name}: {dt:.3f}s ({n} rows)", flush=True)

    out = {
        "metric": "ab_bloom_lookup",
        "n_commits": n_commits,
        "rows_per_commit": rows,
        "medians": {k: round(statistics.median(v), 3) for k, v in times.items()},
        "best": {k: round(min(v), 3) for k, v in times.items()},
        "raw": {k: [round(x, 3) for x in v] for k, v in times.items()},
        "build": meta,
    }
    print("RESULT " + json.dumps(out), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
