"""Structured Streaming SOURCE over the lake change-data-feed: tail a table's
committed changes as a stream — ``spark.readStream.format("lake_cdf")`` — via
the PySpark 4 Python Data Source API (SPARK-44076).

This closes the consumer side of the CDC loop natively: batch consumers use
``LakeTable.changes()`` / ``lake.sync.sync_table``; a continuous downstream
(another table, a cache, a search index) tails the SAME contract as a stream.
Delta/Iceberg expose the identical surface (``readStream.format("delta")``,
Iceberg's ``stream-from-timestamp``); the reference connector has no consumer
side at all — its sink is terminal (SURVEY §2.5 W1, ``StreamWriter`` plugins).

Architecture (why a Python data source is the right construct here):

  * OFFSETS are snapshot versions — already totally ordered, already durable,
    already atomic (the ``_current`` pointer swap). ``latestOffset`` is one
    pointer read; no listing, no scan.
  * PLANNING runs in Spark's dedicated Python runner process on the driver —
    there is NO SparkSession there, so the reader walks snapshot/manifest
    JSON through the same metadata layout ``LakeTable`` owns (handle built
    with ``spark=None``; metadata ops never touch Spark).
  * PARTITIONS mirror ``LakeTable.changes()`` exactly, one per (commit,
    bucket): merge-on-read delta commits stream VERBATIM (their files ARE the
    change set, O(changes)); copy-on-write commits ship the bucket's parent
    file list too, and the executor anti-joins (key, _lsn, _seq) in Arrow —
    bucket-local and exact, because both sides hash to the same bucket.
    Compaction/rebucket commits are physical rewrites and are skipped.
  * READ is pyarrow-only on executors (no JVM round trips): read the parquet
    file(s), align write-time schema -> stream schema (rename-resolve /
    cast-widen / null-fill, the ``_read_file_entries`` rules re-expressed on
    Arrow), filter carried-over rows, emit RecordBatches.

The stream's schema is pinned at stream start (Spark streaming queries cannot
change schema mid-query — same restriction as Delta/Iceberg streaming reads).
Columns renamed AFTER the pinned schema raise a clear restart-the-stream
error rather than mis-mapping. Exactly-once: offsets are checkpointed by
Spark; version files are immutable, so replanning a micro-batch after a crash
yields byte-identical partitions.
"""

from __future__ import annotations

import os
import re
from typing import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)

_LINEAGE = [("_lsn", "bigint"), ("_seq", "bigint"), ("_deleted", "boolean")]
_SCHEME_RE = re.compile(r"^[a-zA-Z][a-zA-Z0-9+.\-]*:")


def _arrow_type(ddl: str):
    """Spark-DDL -> arrow for this table format's type vocabulary. Local
    parser on purpose: executors and the stream-planning process have no
    SparkSession, so ``_parse_datatype_string`` (py4j) is unavailable."""
    import pyarrow as pa

    t = ddl.strip().lower()
    m = re.match(r"array\s*<(.+)>$", t)
    if m:
        return pa.list_(_arrow_type(m.group(1)))
    m = re.match(r"decimal\s*\(\s*(\d+)\s*,\s*(\d+)\s*\)$", t)
    if m:
        return pa.decimal128(int(m.group(1)), int(m.group(2)))
    prim = {
        "string": pa.string(),
        "int": pa.int32(),
        "integer": pa.int32(),
        "bigint": pa.int64(),
        "long": pa.int64(),
        "smallint": pa.int16(),
        "tinyint": pa.int8(),
        "boolean": pa.bool_(),
        "double": pa.float64(),
        "float": pa.float32(),
        "binary": pa.binary(),
        "date": pa.date32(),
        "timestamp": pa.timestamp("us"),
    }
    if t in prim:
        return prim[t]
    raise ValueError(f"lake_cdf: unsupported column type {ddl!r}")


class _ArrowMetaFS:
    """Minimal read-only TableFS over pyarrow.fs for URI-rooted tables, used
    where the JVM-backed HadoopTableFS cannot exist (the stream-planning
    python process and executors). Metadata reads only."""

    def read_text(self, path: str) -> str:
        import pyarrow.fs as pafs

        fs, p = pafs.FileSystem.from_uri(path)
        with fs.open_input_stream(p) as f:
            return f.read().decode("utf-8")


def _meta_table(root: str):
    """A metadata-only LakeTable handle (spark=None): snapshot/version/meta
    reads go through the FS seam and never touch Spark."""
    from ..lake.table import LakeTable

    fs = _ArrowMetaFS() if _SCHEME_RE.match(root) else None
    return LakeTable(None, root, fs=fs)


def _read_parquet(path: str, columns: list[str]):
    import pyarrow.parquet as pq

    if _SCHEME_RE.match(path):
        import pyarrow.fs as pafs

        fs, p = pafs.FileSystem.from_uri(path)
        return pq.read_table(p, columns=columns, filesystem=fs)
    return pq.read_table(path, columns=columns)


class LakeCDFPartition(InputPartition):
    def __init__(self, value: dict):
        self.value = value


class LakeCDFStreamReader(DataSourceStreamReader):
    def __init__(self, options: dict):
        self.root = options.get("path") or options.get("root")
        if not self.root:
            raise ValueError("lake_cdf requires option 'path' (table root)")
        self._table = None
        t = self._tbl()
        snap = t.snapshot()
        sv = options.get("startingVersion", options.get("startingversion"))
        # default: tail only NEW commits (a CDC consumer's normal mode)
        self._start = int(sv) if sv is not None else snap.version
        self._target_sid = snap.schema_id
        self._fields = list(snap.schema().fields)
        self._key = t.meta()["key"]

    # the reader is pickled to executors for read(); the table handle is
    # driver-process state (metadata cache) and is rebuilt on demand
    def __getstate__(self):
        d = dict(self.__dict__)
        d["_table"] = None
        return d

    def _tbl(self):
        if self._table is None:
            self._table = _meta_table(self.root)
        return self._table

    def initialOffset(self) -> dict:
        return {"version": self._start}

    def latestOffset(self) -> dict:
        return {"version": self._tbl().current_version()}

    def _colmap(self, file_entry: dict, schemas: dict) -> list[list]:
        """Per-file alignment plan [(target, source|None, target_type)];
        computed at PLAN time so executors do zero metadata I/O."""
        from ..lake.table import TableSchema, _resolve_source_name

        wfields = dict(
            TableSchema.from_json(schemas[str(file_entry["schema_id"])]).fields
        )
        out = []
        for name, typ in self._fields:
            src = _resolve_source_name(
                name, self._target_sid, file_entry["schema_id"], schemas
            )
            if src in wfields:
                out.append([name, src, typ])
            elif int(file_entry["schema_id"]) <= int(self._target_sid):
                out.append([name, None, typ])  # added after this file: null-fill
            else:
                raise RuntimeError(
                    f"lake_cdf: column {name!r} was renamed or dropped after "
                    "this stream started (stream schema is pinned at start); "
                    "restart the stream to pick up the new schema"
                )
        return out

    def partitions(self, start: dict, end: dict) -> Sequence[InputPartition]:
        t = self._tbl()
        chain = []
        v = end["version"]
        while v is not None and v > start["version"]:
            s = t.snapshot(v)
            chain.append(s)
            v = s.parent
        if v != start["version"]:
            raise ValueError(
                f"version {start['version']} is not an ancestor of "
                f"{end['version']} (rolled back under a running stream?)"
            )
        chain.reverse()
        parts: list[InputPartition] = []
        for s in chain:
            if s.summary.get("compaction"):
                continue  # physical rewrite, no logical change
            parent_entries: dict[str, dict] = {}
            if s.parent is not None:
                parent_entries = {
                    f["path"]: f for f in t.snapshot(s.parent).files
                }
            new = [f for f in s.files if f["path"] not in parent_entries]
            if not new:
                continue
            diff = not all(f.get("kind") == "delta" for f in new)
            by_bucket: dict[int, list[dict]] = {}
            for f in new:
                by_bucket.setdefault(f["bucket"], []).append(f)
            for b, fl in sorted(by_bucket.items()):
                parents = []
                if diff and parent_entries:
                    for pf in parent_entries.values():
                        if pf["bucket"] != b:
                            continue
                        parents.append(
                            {
                                "path": os.path.join(self.root, pf["path"]),
                                "key": (
                                    self._colmap(pf, s.schemas)[
                                        [n for n, _ in self._fields].index(
                                            self._key
                                        )
                                    ][1]
                                ),
                            }
                        )
                parts.append(
                    LakeCDFPartition(
                        {
                            "version": s.version,
                            "key": self._key,
                            "fields": self._fields,
                            "new": [
                                {
                                    "path": os.path.join(self.root, f["path"]),
                                    "cols": self._colmap(f, s.schemas),
                                }
                                for f in fl
                            ],
                            "parent": parents,
                        }
                    )
                )
        return parts

    def read(self, partition: LakeCDFPartition) -> Iterator:
        import pyarrow as pa
        import pyarrow.compute as pc

        val = partition.value

        def align(spec: dict):
            need = sorted(
                {s for _, s, _ in spec["cols"] if s} | {n for n, _ in _LINEAGE}
            )
            raw = _read_parquet(spec["path"], need)
            n = raw.num_rows
            arrays, names = [], []
            for tgt, src, typ in list(spec["cols"]) + [
                (c, c, t) for c, t in _LINEAGE
            ]:
                at = _arrow_type(typ)
                if src is not None:
                    arrays.append(pc.cast(raw[src].combine_chunks(), at))
                else:
                    arrays.append(pa.nulls(n, at))
                names.append(tgt)
            return pa.table(arrays, names=names)

        out = pa.concat_tables([align(s) for s in val["new"]])

        def composite(tbl, key_name):
            return pc.binary_join_element_wise(
                pc.cast(tbl[key_name].combine_chunks(), pa.string()),
                pc.cast(tbl["_lsn"].combine_chunks(), pa.string()),
                pc.cast(tbl["_seq"].combine_chunks(), pa.string()),
                "\x00",
            )

        if val["parent"] and out.num_rows:
            # keys stay Arrow end-to-end: concat the parent composite-key
            # arrays and let is_in hash them (it dedups internally) — no
            # per-key Python set materialization on the batch path.
            seen_arrs: list = []
            for pspec in val["parent"]:
                praw = _read_parquet(
                    pspec["path"], [pspec["key"], "_lsn", "_seq"]
                )
                if pspec["key"] != val["key"]:
                    # select() fixes column order (read_table returns file
                    # order, not request order) before the positional rename
                    praw = praw.select(
                        [pspec["key"], "_lsn", "_seq"]
                    ).rename_columns([val["key"], "_lsn", "_seq"])
                arr = composite(praw, val["key"])
                if isinstance(arr, pa.ChunkedArray):
                    arr = arr.combine_chunks()
                seen_arrs.append(arr)
            value_set = (
                pa.concat_arrays(seen_arrs) if seen_arrs else None
            )
            if value_set is not None and len(value_set):
                mask = pc.invert(
                    pc.is_in(
                        composite(out, val["key"]), value_set=value_set
                    )
                )
                out = out.filter(mask)
        if not out.num_rows:
            return iter(())
        out = out.append_column(
            "_commit_version",
            pa.chunked_array(
                [pa.array([val["version"]] * out.num_rows, pa.int32())]
            ),
        )
        return iter(out.to_batches())

    def commit(self, end: dict) -> None:
        pass  # offsets are Spark-checkpointed; version files are immutable

    def stop(self) -> None:
        pass


class LakeChangeFeedDataSource(DataSource):
    """``spark.dataSource.register(LakeChangeFeedDataSource)`` then
    ``spark.readStream.format("lake_cdf").option("path", root).load()``.

    Options: ``path`` (table root, required), ``startingVersion`` (stream
    changes committed AFTER this version; default = the current version at
    stream start, i.e. only new commits)."""

    @classmethod
    def name(cls) -> str:
        return "lake_cdf"

    def schema(self) -> str:
        root = self.options.get("path") or self.options.get("root")
        if not root:
            raise ValueError("lake_cdf requires option 'path' (table root)")
        fields = list(_meta_table(root).snapshot().schema().fields)
        fields += _LINEAGE + [("_commit_version", "int")]
        return ", ".join(f"{n} {t}" for n, t in fields)

    def streamReader(self, schema) -> LakeCDFStreamReader:
        return LakeCDFStreamReader(dict(self.options))


def read_change_stream(spark, root: str, starting_version: int | None = None):
    """Register the source (idempotent) and open the change stream."""
    try:
        spark.dataSource.register(LakeChangeFeedDataSource)
    except Exception:
        pass  # already registered
    r = spark.readStream.format("lake_cdf").option("path", root)
    if starting_version is not None:
        r = r.option("startingVersion", str(starting_version))
    return r.load()
