#!/usr/bin/env python
"""Build the ``--py-files`` artifact for cluster submission (the north rule's
``spark-submit --py-files`` deployment shape).

Zips the ``tg_data_connector_spark`` package (sources only, no tests, no
caches) into a single archive that executors unpack onto their PYTHONPATH:

    python tools/make_pyfiles.py                 # -> dist/tg_data_connector_spark.zip
    spark-submit --py-files dist/tg_data_connector_spark.zip run_replay.py ...

The zip is deterministic (fixed timestamps, sorted member order) so repeated
builds of the same tree are byte-identical — a re-submit ships the same
artifact hash and cluster-side caches stay warm.
"""
from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "tg_data_connector_spark"


def build(out_path: str | None = None) -> str:
    out_dir = os.path.join(REPO, "dist")
    os.makedirs(out_dir, exist_ok=True)
    out = out_path or os.path.join(out_dir, f"{PKG}.zip")
    members = []
    for root, dirs, files in os.walk(os.path.join(REPO, PKG)):
        dirs[:] = sorted(d for d in dirs if d != "__pycache__")
        for f in sorted(files):
            if f.endswith(".py"):
                full = os.path.join(root, f)
                members.append((os.path.relpath(full, REPO), full))
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
        for arcname, full in sorted(members):
            with open(full, "rb") as fh:
                data = fh.read()
            info = zipfile.ZipInfo(arcname, date_time=(1980, 1, 1, 0, 0, 0))
            info.external_attr = 0o644 << 16
            zf.writestr(info, data)
    return out


if __name__ == "__main__":
    path = build(sys.argv[1] if len(sys.argv) > 1 else None)
    print(path)
