"""A/B: replay throughput of the three resolution engines on one staged log.

The LWW path prunes losers with a narrow winner aggregate BEFORE the payload
shuffle; partial/aggregate cannot prune (losing events still carry column
values) and instead pay one full-batch hash(key) exchange + a sorted window
pass. This measures that price at the bench's 4-lane shape so the docs carry
a number instead of an adjective.

Interleaved samples (lww, partial, aggregate, lww, ...), fresh table per run,
identical on-disk decoded changelog. Prints one JSON line.

Usage: python tools/ab_resolution.py [n_events] [n_docs] [samples]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LANES = int(os.environ.get("SPARK_GRAFT_AB_LANES", "4"))


def main():
    n_events = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
    n_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 500_000
    samples = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    from pyspark.sql import functions as F

    from tg_data_connector_spark.cdc import (
        ReplayConfig,
        ReplayEngine,
        gen_changelog,
        gen_seed_sequences,
    )
    from tg_data_connector_spark.lake import LakeTable, TableSchema
    from tg_data_connector_spark.session import get_spark

    spark = get_spark(app_name="ab_resolution", master=f"local[{LANES}]",
                      shuffle_partitions=LANES * 8)
    staging = tempfile.mkdtemp(prefix="ab_res_")
    n_parts = 8
    gen_changelog(spark, n_events, n_docs, n_parts=n_parts).write.parquet(
        f"{staging}/log"
    )
    gen_seed_sequences(spark, n_docs).write.parquet(f"{staging}/seed")
    log = spark.read.parquet(f"{staging}/log")
    seed = spark.read.parquet(f"{staging}/seed")
    events = log.count()
    schema = TableSchema(
        [
            ("doc_id", "string"),
            ("tokens", "array<int>"),
            ("n_tok", "int"),
            ("source", "string"),
        ]
    )

    def cfg_for(variant: str) -> ReplayConfig:
        if variant == "lww":
            return ReplayConfig(events_per_batch=2_000_000)
        if variant == "partial":
            return ReplayConfig(
                events_per_batch=2_000_000, resolution="partial"
            )
        return ReplayConfig(
            events_per_batch=2_000_000,
            resolution="aggregate",
            # n_tok stays consistent on a full-image log only under "max"
            # (every event's value is its own image); the point is the
            # aggregate code path, not the arithmetic
            agg_spec={"n_tok": "max"},
        )

    variants = ["lww", "partial", "aggregate"]
    times: dict[str, list[float]] = {v: [] for v in variants}
    for s in range(samples):
        for v in variants:
            root = f"{staging}/t_{v}_{s}"
            t = LakeTable.create(
                spark, root, schema, key="doc_id", n_buckets=LANES * 8
            )
            t.append(seed, lsn_col=F.lit(-1), seq_col=F.lit(0))
            eng = ReplayEngine(spark, t, cfg_for(v))
            t0 = time.time()
            eng.replay(log, run_id=f"ab_{v}_{s}")
            dt = round(time.time() - t0, 2)
            times[v].append(dt)
            print(f"# {v} sample {s}: {dt}s", file=sys.stderr)
            shutil.rmtree(root, ignore_errors=True)

    out = {
        "metric": "resolution_replay_ab",
        "lanes": LANES,
        "events": events,
        "samples": times,
        "best_eps": {
            v: round(events / min(ts), 1) for v, ts in times.items()
        },
        "rel_vs_lww": {
            v: round(min(times["lww"]) / min(ts), 3)
            for v, ts in times.items()
        },
    }
    print(json.dumps(out))
    shutil.rmtree(staging, ignore_errors=True)


if __name__ == "__main__":
    main()
