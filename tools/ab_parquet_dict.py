#!/usr/bin/env python
"""Interleaved A/B of parquet dictionary encoding on the bench replay shape.

The replay write phase dominates wall clock (BENCH.md phases), and the
tokens column is near-uniform random ints — a worst case for dictionary
encoding: the writer builds per-column dictionaries, overflows the page
limit, and falls back to plain anyway, paying the build for nothing.
Measure it instead of assuming: FIXED samples per variant, strictly
interleaved in one window (host-throttle bursts hit both variants equally),
each a fresh JVM via `bench.py --replay-only` with SPARK_GRAFT_PARQUET_DICT
forcing the writer option. Reports per-variant minima + raw samples.

Usage: python tools/ab_parquet_dict.py [staging_dir] [lanes] [samples_per_variant]
Writes one JSON line to stdout and appends to /tmp/ab_parquet_dict.log.
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
VARIANTS = ("true", "false")


def sample(staging: str, lanes: int, dict_on: str, timeout: int = 900):
    env = dict(os.environ, SPARK_GRAFT_PARQUET_DICT=dict_on)
    t0 = time.time()
    try:
        out = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py"), "--replay-only",
             staging, str(lanes)],
            capture_output=True, text=True, timeout=timeout, env=env,
        )
    except subprocess.TimeoutExpired:
        return {"dict": dict_on, "seconds": None, "timeout": timeout}
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            r = json.loads(line[len("RESULT "):])
            r["dict"] = dict_on
            r["wall"] = round(time.time() - t0, 1)
            return r
    raise RuntimeError(f"worker failed: {out.stderr[-2000:]}")


def main():
    staging = sys.argv[1] if len(sys.argv) > 1 else \
        "/tmp/tg_bench_cache_g4_30000000_3000000"
    lanes = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    runs = []
    for k in range(n):
        for v in VARIANTS:
            r = sample(staging, lanes, v)
            runs.append(r)
            with open("/tmp/ab_parquet_dict.log", "a") as f:
                f.write(json.dumps(r) + "\n")
            print(f"# dict={v} sample {k}: {r.get('seconds')}s", flush=True)

    def best(v):
        xs = [r["seconds"] for r in runs if r["dict"] == v and r["seconds"]]
        return min(xs) if xs else None

    res = {
        "lanes": lanes,
        "staging": staging,
        "best_sec": {v: best(v) for v in VARIANTS},
        "samples": [
            {"dict": r["dict"], "seconds": round(r["seconds"], 2)
             if r["seconds"] else None} for r in runs
        ],
    }
    print(json.dumps(res))
    with open("/tmp/ab_parquet_dict.log", "a") as f:
        f.write("SUMMARY " + json.dumps(res) + "\n")


if __name__ == "__main__":
    main()
