#!/usr/bin/env python
"""A/B: copy-on-write vs merge-on-read MERGE under a MULTI-BATCH replay.

The headline bench (bench.py) replays in ONE batch, where COW's single
full-table rewrite is already optimal. Real CDC ingest commits continuously —
this tool replays the same staged changelog in N batches under both write
paths and reports wall seconds + per-phase breakdown:

  * cow      — every batch reads + full-outer-joins + rewrites every touched
               bucket (O(table) per batch at CDC key distributions);
  * mor      — every batch appends delta files (O(batch)), one compaction at
               the end folds them (the amortized write cost of ingest);
  * mor+read — mor, plus one resolved full-table read against the FULL
               uncompacted delta stack (N_BATCHES deltas per bucket) before
               compaction — the read-amplification worst case.

Variants run interleaved (cow, mor, cow, mor, ...) so host-noise windows hit
both. Usage:

  python tools/bench_mor.py [n_events] [n_batches] [lanes] [samples] [n_docs]

The COW-vs-MOR trade is governed by the TABLE/BATCH size ratio: COW rewrites
the whole (touched) table every batch, MOR writes only the batch. At ratio
~1 (default n_docs = n_events/10, heavy key reuse) COW's rewrite is cheap and
the fixed per-batch costs dominate; pass n_docs ~ n_events to measure the
ingest-into-a-large-table shape (ratio ~ n_batches) where the asymptotics
show.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (stage_replay_input, SEQ_FIELDS)

N_EVENTS = int(sys.argv[1]) if len(sys.argv) > 1 else 8_000_000
N_BATCHES = int(sys.argv[2]) if len(sys.argv) > 2 else 8
LANES = int(sys.argv[3]) if len(sys.argv) > 3 else 4
SAMPLES = int(sys.argv[4]) if len(sys.argv) > 4 else 2
N_DOCS = int(sys.argv[5]) if len(sys.argv) > 5 else max(20_000, N_EVENTS // 10)


def run(staging: str, mode: str) -> dict:
    from tg_data_connector_spark.cdc import ReplayConfig, ReplayEngine
    from tg_data_connector_spark.lake import LakeTable, TableSchema
    from tg_data_connector_spark.lake.maintain import compact
    from tg_data_connector_spark.session import get_spark

    spark = get_spark(
        app_name=f"bench_mor_{mode}",
        master=f"local[{LANES}]",
        shuffle_partitions=max(LANES, 16),
        extra_conf={"spark.sql.adaptive.enabled": "false"},
    )
    log = spark.read.parquet(f"{staging}/changelog")
    seed = spark.read.parquet(f"{staging}/seed")
    n_events = log.count()
    with open(f"{staging}/bounds.json") as f:
        bounds = tuple(json.load(f))
    # warm the Python worker pool outside the clock (same as bench.py)
    from pyspark.sql import functions as F

    from tg_data_connector_spark.cdc.parse import decode_tokens, parse_events

    warm = log.limit(64 * LANES).repartition(LANES)
    parse_events(warm).count()
    warm.select(decode_tokens(F.col("payload")).alias("t")).count()

    root = tempfile.mkdtemp(prefix=f"bench_mor_{mode}_")
    table = LakeTable.create(
        spark, f"{root}/seq", TableSchema(bench.SEQ_FIELDS), key="doc_id",
        n_buckets=32,
    )
    table.append(seed)
    cfg = ReplayConfig(
        events_per_batch=max(1, n_events // N_BATCHES),
        parse_payload=True,
        merge_mode="mor" if mode.startswith("mor") else "cow",
    )
    eng = ReplayEngine(spark, table, cfg)
    t0 = time.time()
    reports = eng.replay(log, run_id="ab", bounds=bounds)
    per_batch_read = 0.0
    if mode == "mor+read":
        tr = time.time()
        table.read().count()  # resolved read against the full delta stack
        per_batch_read = time.time() - tr
    t_compact = 0.0
    if mode.startswith("mor"):
        tc = time.time()
        compact(table)
        t_compact = time.time() - tc
    dt = time.time() - t0
    rows = table.read().count()
    spark.stop()
    shutil.rmtree(root, ignore_errors=True)
    return {
        "mode": mode,
        "seconds": round(dt, 2),
        "batches": len(reports),
        "final_rows": rows,
        "compact_s": round(t_compact, 2),
        "resolved_read_s": round(per_batch_read, 2),
        "batch_seconds": [round(r.seconds, 2) for r in reports],
    }


def main() -> None:
    staging = f"/tmp/tg_bench_cache_g4_{N_EVENTS}_{N_DOCS}"
    if not os.path.exists(f"{staging}/bounds.json"):
        bench.TOP_LANES = LANES
        bench.stage_replay_input(staging, N_EVENTS, N_DOCS)
    results = []
    for k in range(SAMPLES):
        for mode in ("cow", "mor", "mor+read"):
            r = run(staging, mode)
            r["sample"] = k
            results.append(r)
            print(json.dumps(r), flush=True)
    best = {}
    for r in results:
        cur = best.get(r["mode"])
        if cur is None or r["seconds"] < cur["seconds"]:
            best[r["mode"]] = r
    print(json.dumps({"best": best, "events": N_EVENTS, "batches": N_BATCHES,
                      "lanes": LANES}))


if __name__ == "__main__":
    main()
