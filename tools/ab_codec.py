#!/usr/bin/env python
"""Interleaved A/B of the table parquet codec on the bench replay shape.

The replay's write phase dominates its wall clock (BENCH.md phase lines), so
the data-file codec is the biggest single write-path knob: encode CPU vs
bytes written. Protocol mirrors tools/ab_winner_join.py — a FIXED number of
samples per variant, strictly interleaved in one window so host-throttle
bursts hit every variant equally; each sample is a fresh JVM via
`bench.py --replay-only` with SPARK_GRAFT_TABLE_CODEC forcing the codec.
Reports per-variant minima + raw samples; never stops early on an outcome.

Usage: python tools/ab_codec.py [staging_dir] [lanes] [samples_per_variant]
Writes one JSON line to stdout and appends to /tmp/ab_codec.log.
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
VARIANTS = ("snappy", "lz4", "zstd")


def sample(staging: str, lanes: int, codec: str, timeout: int = 900):
    env = dict(os.environ, SPARK_GRAFT_TABLE_CODEC=codec)
    t0 = time.time()
    try:
        out = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py"), "--replay-only",
             staging, str(lanes)],
            capture_output=True, text=True, timeout=timeout, env=env,
        )
    except subprocess.TimeoutExpired:
        return {"codec": codec, "seconds": None, "timeout": timeout}
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            r = json.loads(line[len("RESULT "):])
            r["codec"] = codec
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
        for codec in VARIANTS:
            r = sample(staging, lanes, codec)
            runs.append(r)
            with open("/tmp/ab_codec.log", "a") as f:
                f.write(json.dumps(r) + "\n")
            print(f"# {codec} sample {k}: {r.get('seconds')}s", flush=True)

    def best(v):
        xs = [r["seconds"] for r in runs if r["codec"] == v and r["seconds"]]
        return min(xs) if xs else None

    res = {
        "lanes": lanes,
        "staging": staging,
        "best_sec": {v: best(v) for v in VARIANTS},
        "samples": [
            {"codec": r["codec"], "seconds": round(r["seconds"], 2)
             if r["seconds"] else None} for r in runs
        ],
    }
    print(json.dumps(res))
    with open("/tmp/ab_codec.log", "a") as f:
        f.write("SUMMARY " + json.dumps(res) + "\n")


if __name__ == "__main__":
    main()
