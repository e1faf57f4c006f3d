#!/usr/bin/env python
"""Microbenchmark the replay stats-prepass shapes (round-4 profiling found the
grouping-sets prepass burning ~60x the round-2 prepass's CPU — event-log
stage 14: 1819 task-sec vs 30 in comparable windows).

Variants over the same staged changelog, each a fresh aggregation job:
  r2        groupBy(w, part) + max/count/collect_set/max/max   (no key est)
  hllpp     r2 + approx_count_distinct per (w, part)            (overcounts)
  gsets     groupingSets((w,part),(w)) + approx_count_distinct  (CURRENT)
  sketch2   groupBy(w, part) + hll_sketch_agg, persist tiny result, second
            job unions sketches per window                      (exact union)

Usage: python tools/bench_prepass.py [staging] [lanes] [reps]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    staging = sys.argv[1] if len(sys.argv) > 1 else \
        "/tmp/tg_bench_cache_g4_30000000_3000000"
    lanes = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    from pyspark.sql import functions as F

    from tg_data_connector_spark.lake.table import bucket_expr
    from tg_data_connector_spark.session import get_spark

    spark = get_spark(
        app_name="bench_prepass", master=f"local[{lanes}]",
        shuffle_partitions=max(lanes, 16),
        extra_conf={"spark.sql.adaptive.enabled": "false"},
    )
    log = spark.read.parquet(f"{staging}/changelog")
    log.count()  # warm FS cache
    per_part = 10**12  # one window: the bench shape
    win = F.floor((F.col("offset") - F.lit(0)) / F.lit(per_part)).cast("int")
    base_aggs = [
        F.max("offset").alias("hwm"),
        F.count("*").alias("n"),
        F.collect_set(bucket_expr("doc_id", 32)).alias("bks"),
        F.max("commit_lsn").alias("vl"),
        F.max("seq_no").alias("vs"),
    ]

    def v_r2():
        log.groupBy(win.alias("w"), F.col("part")).agg(*base_aggs).collect()

    def v_hllpp():
        log.groupBy(win.alias("w"), F.col("part")).agg(
            *base_aggs, F.approx_count_distinct("doc_id").alias("k")
        ).collect()

    def v_gsets():
        log.groupingSets([["w", "part"], ["w"]], win.alias("w"), F.col("part")).agg(
            *base_aggs, F.approx_count_distinct("doc_id").alias("k")
        ).collect()

    def v_sketch2():
        base = log.groupBy(win.alias("w"), F.col("part")).agg(
            *base_aggs, F.hll_sketch_agg("doc_id").alias("hsk")
        ).persist()
        rows = base.drop("hsk").collect()
        totals = base.groupBy("w").agg(
            F.hll_sketch_estimate(F.hll_union_agg("hsk")).alias("k")
        ).collect()
        base.unpersist()
        assert rows and totals

    def v_sampled():
        # round-5 shipped shape: sketch ingests only the 1/32 hash-slice
        key = F.when(
            F.pmod(F.xxhash64("doc_id"), F.lit(32)) == 0, F.col("doc_id")
        )
        base = log.groupBy(win.alias("w"), F.col("part")).agg(
            *base_aggs, F.hll_sketch_agg(key).alias("hsk")
        ).persist()
        rows = base.drop("hsk").collect()
        totals = base.groupBy("w").agg(
            (F.hll_sketch_estimate(F.hll_union_agg("hsk")) * F.lit(32))
            .alias("k")
        ).collect()
        base.unpersist()
        assert rows and totals

    variants = [("r2", v_r2), ("hllpp", v_hllpp), ("gsets", v_gsets),
                ("sketch2", v_sketch2), ("sampled", v_sampled)]
    for name, fn in variants:  # one warmup round outside the clock
        fn()
    times = {name: [] for name, _ in variants}
    for _ in range(reps):
        for name, fn in variants:  # interleaved: windows hit all variants
            t0 = time.time()
            fn()
            times[name].append(round(time.time() - t0, 2))
    for name, ts in times.items():
        print(f"{name:8s} best={min(ts):6.2f}s  samples={ts}")
    spark.stop()


if __name__ == "__main__":
    main()
