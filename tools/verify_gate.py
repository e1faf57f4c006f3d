"""Local stand-in for the driver's correctness gate: run every queries() entry
on Spark and its oracle_sql() on DuckDB at the given sf, compare row count,
schema (column names), and an order-insensitive value hash.

Usage: python tools/verify_gate.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

import __spark_entry__ as entrymod
from tg_data_connector_spark.session import get_spark

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders", "lineitem",
    "events", "documents", "embeddings",
]


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                v = f"{v:.9g}"
            vals.append(str(v))
        out.append("\x01".join(vals))
    out.sort()
    return hashlib.md5("\n".join(out).encode()).hexdigest()


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark(app_name="verify_gate")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    failed = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as ex:
            print(f"FAIL {name}: spark error: {ex}")
            failed.append(name)
            continue
        if name not in oracles:
            print(f"ok(rows-only) {name}: {len(srows)} rows "
                  f"[{time.time()-t0:.1f}s]")
            continue
        try:
            res = con.execute(oracles[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as ex:
            print(f"FAIL {name}: duckdb error: {ex}")
            failed.append(name)
            continue
        problems = []
        if sorted(scols) != sorted(dcols):
            problems.append(f"schema {sorted(scols)} vs {sorted(dcols)}")
        if len(srows) != len(drows):
            problems.append(f"rows {len(srows)} vs {len(drows)}")
        if not problems:
            hs = canon(srows, scols)
            hd = canon(drows, dcols)
            if hs != hd:
                problems.append("value-hash mismatch")
                sset = set(canon([r], scols) for r in srows)
                dset = set(canon([r], dcols) for r in drows)
                onlyspark = [r for r in srows if canon([r], scols) not in dset][:3]
                onlyduck = [r for r in drows if canon([r], dcols) not in sset][:3]
                problems.append(f"spark-only sample: {onlyspark}")
                problems.append(f"duck-only sample: {onlyduck}")
        if problems:
            print(f"FAIL {name}: " + "; ".join(str(p) for p in problems))
            failed.append(name)
        else:
            print(f"ok {name}: {len(srows)} rows match [{time.time()-t0:.1f}s]")
    print(f"\n{len(failed)} failures" + (f": {failed}" if failed else ""))
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
