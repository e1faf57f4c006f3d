#!/usr/bin/env python
"""Clean-window hunter for the PRIMARY (1 vs 4 lane) scaling pair.

Same probe-gated design as wide_hunter.py (the only reliable degradation
probe on this host is a real short replay): when a 4-lane probe on the
small staged input runs under the threshold, the window is spent on an
interleaved [4, 1, 4, 1] sample block on the full bench input — the
interleave means a mid-block degradation hits BOTH levels rather than
biasing the ratio. Every sample is logged to /tmp/narrow_hunter.log
(JSONL); the efficiency claim is computed from best-per-level WITHIN one
clean block only.

Usage: python tools/narrow_hunter.py [max_hours] [probe_threshold_sec] [blocks]
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LOG = "/tmp/narrow_hunter.log"
BIG = os.environ.get("HUNTER_BIG", "/tmp/tg_bench_cache_g4_30000000_3000000")
SMALL = os.environ.get("HUNTER_SMALL", "/tmp/tg_bench_cache_g4_3000000_300000")


def sample(staging: str, lanes: int, tag: str, timeout: int):
    bench_py = os.path.join(REPO, "bench.py")
    t0 = time.time()
    try:
        out = subprocess.run(
            [sys.executable, bench_py, "--replay-only", staging, str(lanes)],
            capture_output=True, text=True, timeout=timeout, cwd=REPO,
        )
        secs = None
        for line in out.stdout.splitlines():
            if line.startswith("RESULT "):
                secs = json.loads(line[len("RESULT "):])["seconds"]
        rec = {"tag": tag, "lanes": lanes, "seconds": secs}
    except subprocess.TimeoutExpired:
        rec = {"tag": tag, "lanes": lanes, "seconds": None, "timeout": timeout}
    rec["at"] = time.strftime("%H:%M:%S", time.localtime(t0))
    rec["wall"] = round(time.time() - t0, 1)
    with open(LOG, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)
    return rec


def main():
    max_hours = float(sys.argv[1]) if len(sys.argv) > 1 else 2.5
    thresh = float(sys.argv[2]) if len(sys.argv) > 2 else 30.0
    max_blocks = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    deadline = time.time() + max_hours * 3600
    blocks = 0
    while time.time() < deadline and blocks < max_blocks:
        probe = sample(SMALL, 4, "probe", timeout=180)
        if probe["seconds"] is not None and probe["seconds"] < thresh:
            # fixed interleaved block, outcome-independent
            b = [
                sample(BIG, 4, f"blk{blocks}", timeout=600),
                sample(BIG, 1, f"blk{blocks}", timeout=600),
                sample(BIG, 4, f"blk{blocks}", timeout=600),
                sample(BIG, 1, f"blk{blocks}", timeout=600),
            ]
            n4 = [r["seconds"] for r in b if r["lanes"] == 4 and r["seconds"]]
            n1 = [r["seconds"] for r in b if r["lanes"] == 1 and r["seconds"]]
            if n4 and n1:
                eff = (min(n1) / min(n4)) / 4
                rec = {"tag": f"blk{blocks}-eff", "eff": round(eff, 3),
                       "best_1": min(n1), "best_4": min(n4)}
                with open(LOG, "a") as f:
                    f.write(json.dumps(rec) + "\n")
                print(json.dumps(rec), flush=True)
            blocks += 1
        else:
            time.sleep(240)
    print("done", flush=True)


if __name__ == "__main__":
    main()
