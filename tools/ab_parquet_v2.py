#!/usr/bin/env python
"""Interleaved A/B of the parquet writer FORMAT VERSION on the bench replay
shape: v1 (PLAIN / dictionary pages, the parquet-mr default) vs v2
(DELTA_BINARY_PACKED for ints, RLE improvements) — token-array data files
are almost entirely int32 streams, so v2's delta packing is the obvious
candidate. The replay's write phase dominates its wall clock (BENCH.md
phase lines), so encode CPU is what this measures; bytes written are
reported per variant from the worker's table directory size.

Protocol mirrors tools/ab_codec.py — a FIXED number of samples per variant,
strictly interleaved in one window so host-throttle bursts hit every
variant equally; each sample is a fresh JVM via `bench.py --replay-only`
with SPARK_GRAFT_PARQUET_WRITER forcing the version. Reports per-variant
minima + raw samples; never stops early on an outcome.

Usage: python tools/ab_parquet_v2.py [staging_dir] [lanes] [samples]
Writes one JSON line to stdout and appends to /tmp/ab_parquet_v2.log.
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
VARIANTS = ("v1", "v2")


def sample(staging: str, lanes: int, ver: str, timeout: int = 900):
    env = dict(os.environ, SPARK_GRAFT_PARQUET_WRITER=ver)
    t0 = time.time()
    try:
        out = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py"), "--replay-only",
             staging, str(lanes)],
            capture_output=True, text=True, timeout=timeout, env=env,
        )
    except subprocess.TimeoutExpired:
        return {"writer": ver, "seconds": None, "timeout": timeout}
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            r = json.loads(line[len("RESULT "):])
            r["writer"] = ver
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
        for ver in VARIANTS:
            r = sample(staging, lanes, ver)
            runs.append(r)
            with open("/tmp/ab_parquet_v2.log", "a") as f:
                f.write(json.dumps(r) + "\n")
            print(f"# {ver} sample {k}: {r.get('seconds')}s", flush=True)

    def best(v):
        xs = [r["seconds"] for r in runs if r["writer"] == v and r["seconds"]]
        return min(xs) if xs else None

    res = {
        "lanes": lanes,
        "staging": staging,
        "best_sec": {v: best(v) for v in VARIANTS},
        "samples": [
            {"writer": r["writer"], "seconds": round(r["seconds"], 2)
             if r["seconds"] else None} for r in runs
        ],
    }
    print(json.dumps(res))
    with open("/tmp/ab_parquet_v2.log", "a") as f:
        f.write("SUMMARY " + json.dumps(res) + "\n")


if __name__ == "__main__":
    main()
