"""Metadata inspection tables — Iceberg's ``table.files`` / ``table.snapshots``
surface, built from the manifest layer alone (NO data files are opened).

At 100 TB these are the ops queries that must stay cheap: "how many files per
bucket", "how many live rows did the last commit land", "which snapshot holds
batch X" — all answerable from the sharded manifests (O(buckets) small JSON
reads, driver-side) and then handed to Spark as a DataFrame so the usual
filter/agg machinery applies. The reference has no analog (it writes into an
external DB); Iceberg exposes the same via metadata tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .table import LakeTable, Snapshot

_FILES_DDL = (
    "path string, bucket int, kind string, schema_id int, rows bigint, "
    "kmin string, kmax string"
)

_SNAPSHOTS_DDL = (
    "version int, parent int, schema_id int, n_files int, n_delta_files int, "
    "total_rows bigint, n_buckets_touched int, applied_batches array<string>"
)


def files_df(table: LakeTable, snapshot: Snapshot | None = None) -> DataFrame:
    """One row per data file in the snapshot's manifests: path, bucket,
    merge-on-read kind (``base``/``delta``), write-time schema id, manifest
    row count, and the per-file key min/max used for data skipping."""
    snap = snapshot or table.snapshot()
    rows = [
        (
            f["path"],
            int(f["bucket"]),
            f.get("kind", "base"),
            int(f["schema_id"]),
            int(f["rows"]) if f.get("rows") is not None else None,
            f.get("kmin"),
            f.get("kmax"),
        )
        for f in snap.files
    ]
    return table.spark.createDataFrame(rows, _FILES_DDL)


def snapshots_df(table: LakeTable) -> DataFrame:
    """One row per RETAINED snapshot (expired versions are gone by design):
    lineage pointer, schema id, file/row counts, and the applied batch ids
    that carry the exactly-once bookkeeping."""
    rows = []
    for v in sorted(table.history()):
        s = table.snapshot(v)
        rows.append(
            (
                int(s.version),
                int(s.parent) if s.parent is not None else None,
                int(s.schema_id),
                len(s.files),
                sum(1 for f in s.files if f.get("kind") == "delta"),
                sum(int(f["rows"]) for f in s.files if f.get("rows") is not None),
                len({f["bucket"] for f in s.files}),
                s.applied_batches(),
            )
        )
    return table.spark.createDataFrame(rows, _SNAPSHOTS_DDL)


def tags_df(table: LakeTable) -> DataFrame:
    rows = sorted(table.tags().items())
    return table.spark.createDataFrame(rows, "name string, version int")


def refs_df(table: LakeTable) -> DataFrame:
    """All refs: main + branches (writable) + tags (immutable)."""
    rows = [("main", "branch", table.checkout("main").current_version())]
    rows += [(n, "branch", v) for n, v in sorted(table.branches().items())]
    rows += [(n, "tag", v) for n, v in sorted(table.tags().items())]
    return table.spark.createDataFrame(
        rows, "name string, kind string, version int"
    )


def partition_stats(table: LakeTable, snapshot: Snapshot | None = None) -> DataFrame:
    """Per-bucket rollup of the files table — the skew dashboard: row and
    file counts per bucket straight from manifest stats."""
    return (
        files_df(table, snapshot)
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n_files"),
            F.sum("rows").alias("rows"),
            F.sum(F.when(F.col("kind") == "delta", 1).otherwise(0)).alias(
                "n_delta_files"
            ),
        )
    )
