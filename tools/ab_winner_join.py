#!/usr/bin/env python
"""Interleaved A/B of the winner-join strategy (broadcast vs shuffled-hash)
on the bench input shape, to SET ReplayConfig.broadcast_winners_max_keys from
data rather than assertion (VERDICT round-3 directive #1).

Protocol: a FIXED number of samples per variant (default 3), strictly
interleaved b,s,b,s,... in one window so host-throttle bursts hit both
variants equally; each sample is a fresh JVM via `bench.py --replay-only`.
Reports per-variant minima (the clean-sample estimator this host requires —
see BASELINE.md) plus all raw samples. Never stops early on an outcome.

Usage: python tools/ab_winner_join.py [staging_dir] [lanes] [samples_per_variant]
Writes one JSON line to stdout and appends to /tmp/ab_winner_join.log.
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def sample(staging: str, lanes: int, variant: str, timeout: int = 900):
    env = dict(os.environ, SPARK_GRAFT_FORCE_WINNER_JOIN=variant)
    t0 = time.time()
    try:
        out = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py"), "--replay-only",
             staging, str(lanes)],
            capture_output=True, text=True, timeout=timeout, env=env,
        )
    except subprocess.TimeoutExpired:
        return {"variant": variant, "seconds": None, "timeout": timeout}
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            r = json.loads(line[len("RESULT "):])
            r["variant"] = variant
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
        for variant in ("broadcast", "shuffle"):
            r = sample(staging, lanes, variant)
            runs.append(r)
            with open("/tmp/ab_winner_join.log", "a") as f:
                f.write(json.dumps(r) + "\n")
            print(f"# {variant} sample {k}: {r.get('seconds')}s "
                  f"(join={r.get('winner_join')})", flush=True)

    def best(v):
        xs = [r["seconds"] for r in runs if r["variant"] == v and r["seconds"]]
        return min(xs) if xs else None

    res = {
        "lanes": lanes,
        "staging": staging,
        "best_broadcast_sec": best("broadcast"),
        "best_shuffle_sec": best("shuffle"),
        "samples": [
            {"variant": r["variant"], "seconds": round(r["seconds"], 2)
             if r["seconds"] else None, "join": r.get("winner_join")}
            for r in runs
        ],
    }
    print(json.dumps(res))
    with open("/tmp/ab_winner_join.log", "a") as f:
        f.write("SUMMARY " + json.dumps(res) + "\n")


if __name__ == "__main__":
    main()
