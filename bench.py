#!/usr/bin/env python
"""Benchmark: CDC replay throughput (the BASELINE.json metric: change-events/sec
MERGE-applied) + headline gate queries + two-parallelism scaling evidence.

Prints ONE JSON line:
  {"metric": "...", "value": <total suite sec>, "unit": "sec",
   "queries": {...per-query sec...}, "sf": ...,
   "replay": {"events": N, "seconds": s, "events_per_sec": r},
   "scaling": {"cores_n": 8, "cores_4n": 32, "eps_n": ..., "eps_4n": ...,
               "efficiency": ...}}

Modes:
  bench.py                       full suite (default)
  bench.py --replay-only DIR N   subprocess worker: replay staged log at
                                 SPARK_GRAFT_CPUS cores, print {"seconds":...}
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

SEQ_FIELDS = [
    ("doc_id", "string"),
    ("tokens", "array<int>"),
    ("n_tok", "int"),
    ("source", "string"),
]


def _sf_from_dir(d: str) -> float:
    base = os.path.basename(d.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return 0.1


def stage_replay_input(staging: str, n_events: int, n_docs: int) -> None:
    """Generate the deterministic changelog + seed once, to parquet — both
    scaling runs then replay the identical on-disk input."""
    from tg_data_connector_spark.cdc import gen_changelog, gen_seed_sequences
    from tg_data_connector_spark.cdc.genlog import with_binary_payload
    from tg_data_connector_spark.session import get_spark

    spark = get_spark(app_name="bench_stage", master=f"local[{CPUS}]")
    # events ship as raw binary payloads (realistic binlog shape): the replay
    # then exercises the vectorized Arrow decode path, not just the shuffle
    log = with_binary_payload(gen_changelog(spark, n_events, n_docs, n_parts=16))
    log.drop("tokens").write.mode("overwrite").parquet(f"{staging}/changelog")
    gen_seed_sequences(spark, n_docs).write.mode("overwrite").parquet(
        f"{staging}/seed"
    )
    spark.stop()


def run_replay(staging: str, cores: int, batches: int = 2) -> dict:
    """Worker: seed a fresh table, replay the staged changelog, report seconds.
    Run in a clean JVM per parallelism level."""
    from tg_data_connector_spark.cdc import ReplayConfig, ReplayEngine
    from tg_data_connector_spark.lake import LakeTable, TableSchema
    from tg_data_connector_spark.session import get_spark

    spark = get_spark(
        app_name=f"bench_replay_{cores}",
        master=f"local[{cores}]",
        shuffle_partitions=max(cores, 16),
    )
    log = spark.read.parquet(f"{staging}/changelog")
    seed = spark.read.parquet(f"{staging}/seed")
    n_events = log.count()  # warms FS cache & JIT before timing
    root = tempfile.mkdtemp(prefix=f"bench_tbl_{cores}_")
    # bucket count is FIXED across parallelism levels: the scaling comparison
    # must run the identical logical workload
    table = LakeTable.create(
        spark, f"{root}/seq", TableSchema(SEQ_FIELDS), key="doc_id", n_buckets=32
    )
    table.append(seed)
    eng = ReplayEngine(
        spark,
        table,
        ReplayConfig(
            events_per_batch=max(1, n_events // batches),
            salted_dedup=True,
            parse_payload=True,
        ),
    )
    t0 = time.time()
    reports = eng.replay(log, run_id="bench")
    dt = time.time() - t0
    rows = table.read().count()
    spark.stop()
    shutil.rmtree(root, ignore_errors=True)
    return {
        "seconds": dt,
        "events": n_events,
        "final_rows": rows,
        "phases": [r.phases for r in reports],
        "batch_seconds": [round(r.seconds, 2) for r in reports],
    }


def run_queries(sf_dir: str) -> dict:
    from tg_data_connector_spark.gate import QUERIES
    from tg_data_connector_spark.session import get_spark

    spark = get_spark(app_name="bench_queries", master=f"local[{CPUS}]")
    headline = [
        "cdc_merge_final_state",
        "cdc_lww_dedup",
        "q1_pricing_summary",
        "q3_segment_revenue",
        "dedup_exact",
        "dedup_minhash_lsh",
        "dedup_ngram_jaccard",
        "ann_cosine_topk",
        "text_quality",
        "token_counts",
    ]
    times = {}
    for name in headline:
        fn = QUERIES[name][0]
        t0 = time.time()
        df = fn(spark, sf_dir)
        n = df.count()
        times[name] = round(time.time() - t0, 3)
    spark.stop()
    return times


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--replay-only":
        staging, cores = sys.argv[2], int(sys.argv[3])
        print("RESULT " + json.dumps(run_replay(staging, cores)))
        return

    sf = _sf_from_dir(SF_DIR)
    # replay size scales with sf: 50M events/sf-unit (sf0.1 -> 5M events) —
    # sized so per-task compute dominates scheduling overhead and the
    # N-vs-4N-core comparison measures the engine, not job latency
    n_events = max(200_000, int(50_000_000 * sf))
    n_docs = max(20_000, n_events // 10)
    t_suite0 = time.time()

    staging = tempfile.mkdtemp(prefix="bench_staging_")
    stage_replay_input(staging, n_events, n_docs)

    def worker(cores: int) -> dict:
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--replay-only", staging,
             str(cores)],
            capture_output=True, text=True, timeout=3600,
        )
        for line in out.stdout.splitlines():
            if line.startswith("RESULT "):
                return json.loads(line[len("RESULT "):])
        raise RuntimeError(f"replay worker failed: {out.stderr[-2000:]}")

    n_cores = max(2, CPUS // 4)
    res_n = worker(n_cores)
    res_4n = worker(CPUS)
    eps_n = res_n["events"] / res_n["seconds"]
    eps_4n = res_4n["events"] / res_4n["seconds"]
    efficiency = (eps_4n / eps_n) / (CPUS / n_cores)

    qtimes = run_queries(SF_DIR)
    shutil.rmtree(staging, ignore_errors=True)

    total = round(time.time() - t_suite0, 3)
    print(
        json.dumps(
            {
                "metric": "cdc_replay_and_query_suite",
                "value": total,
                "unit": "sec",
                "sf": sf,
                "queries": qtimes,
                "replay": {
                    "events": res_4n["events"],
                    "seconds": round(res_4n["seconds"], 3),
                    "events_per_sec": round(eps_4n, 1),
                    "final_rows": res_4n["final_rows"],
                    "phases": res_4n.get("phases"),
                },
                "scaling": {
                    "cores_n": n_cores,
                    "cores_4n": CPUS,
                    "eps_n": round(eps_n, 1),
                    "eps_4n": round(eps_4n, 1),
                    "efficiency": round(efficiency, 3),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
