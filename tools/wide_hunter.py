#!/usr/bin/env python
"""Clean-window hunter for the wide scaling pair (VERDICT r3 directive #3).

The sandbox host degrades stochastically for HOURS at a time and simple
CPU/disk canaries cannot detect it (BASELINE.md round-3 diagnostics) — the
only reliable probe is a real short replay. So this hunter:

  1. PROBES with a small staged input (3M events, ~10-15 s at 4 lanes when
     clean) — cheap enough to repeat every few minutes;
  2. when the probe runs clean (< threshold), immediately fires the expensive
     trio on the big input IN THAT WINDOW: 16-lane sample, 4-lane anchor,
     and the ROUND-2 CODE at 16 lanes (git worktree control — identical
     slowness across code versions pins degradation on the host);
  3. logs every sample to /tmp/wide_hunter.log (JSONL) and keeps hunting
     until the round budget is spent. Fixed plan, no outcome-conditioned
     stopping within a window's trio.

Usage: python tools/wide_hunter.py [max_hours] [probe_threshold_sec]
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LOG = "/tmp/wide_hunter.log"
BIG = os.environ.get("HUNTER_BIG", "/tmp/tg_bench_cache_g4_31500000_3150000")
SMALL = os.environ.get("HUNTER_SMALL", "/tmp/tg_bench_cache_g4_3000000_300000")
R2 = os.environ.get("HUNTER_R2", "/tmp/r2code")


def sample(bench_py: str, staging: str, lanes: int, tag: str, timeout: int):
    t0 = time.time()
    try:
        out = subprocess.run(
            [sys.executable, bench_py, "--replay-only", staging, str(lanes)],
            capture_output=True, text=True, timeout=timeout,
            cwd=os.path.dirname(bench_py),
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
    max_hours = float(sys.argv[1]) if len(sys.argv) > 1 else 3.0
    thresh = float(sys.argv[2]) if len(sys.argv) > 2 else 30.0
    cur = os.path.join(REPO, "bench.py")
    deadline = time.time() + max_hours * 3600
    trios = 0
    while time.time() < deadline and trios < 3:
        probe = sample(cur, SMALL, 4, "probe", timeout=180)
        if probe["seconds"] is not None and probe["seconds"] < thresh:
            # clean window: spend it on the scarce samples first
            sample(cur, BIG, 16, "r4", timeout=780)
            sample(cur, BIG, 4, "r4", timeout=780)
            if os.path.exists(os.path.join(R2, "bench.py")):
                sample(os.path.join(R2, "bench.py"), BIG, 16, "r2control",
                       timeout=780)
            trios += 1
        else:
            time.sleep(240)  # bad window: cheap wait, probe again
    print("done", flush=True)


if __name__ == "__main__":
    main()
