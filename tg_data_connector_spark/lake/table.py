"""Snapshot-versioned, key-bucketed lake table (Iceberg-style, from scratch).

No Iceberg runtime jars ship in this environment, so the table format itself is
implemented here: immutable parquet data files grouped by a stable key bucket,
JSON snapshot manifests, and an atomically swapped version pointer. The design
copies Iceberg's *semantics* (snapshot isolation, copy-on-write MERGE, summary
properties on the snapshot, transactional schema evolution) — none of its code.

Reference parity notes:
  * The reference's only transactional unit is a JDBC batch commit with rollback
    (``tigergraphwriter/.../TigerGraphWriter.java:231-265``). Here the unit is a
    snapshot commit; retry-safety-requires-idempotence
    (``TigerGraphWriter.java:277-281`` supportFailOver only for replace-mode)
    becomes: a batch is applied at most once, enforced by the ``batch_id`` +
    per-partition high-watermarks stored in the snapshot summary.
  * The reference's split-by-PK parallel scan (``SingleTableSplitUtil.java:33-124``)
    becomes bucket pruning: a MERGE touches only the buckets its keys hash into.

Commit protocol (two-phase):
  phase 1 (stage)   — write new parquet files under ``data/c-<uuid>/b=<k>/`` and a
                      candidate manifest ``_versions/v<N>.json`` (O_EXCL, so two
                      racing writers cannot claim the same version);
  phase 2 (publish) — ``os.replace`` of the ``_current`` pointer file (atomic on
                      POSIX). A crash between the phases leaves orphan files that
                      no snapshot references; readers never see them.
"""

from __future__ import annotations

import json
import os
import uuid
import warnings
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

BUCKET_COL = "_b"
# Identifier of the key->bucket function used by THIS code (murmur3 via F.hash,
# pmod into n_buckets). Persisted in table meta at create time and validated at
# open: a table laid out under a different hash (e.g. the earlier xxhash64
# layout) would be silently corrupted by bucket pruning / replace_buckets /
# the b= directory mapping, so it is refused instead.
BUCKET_HASH_ID = "murmur3_pmod"
# Above this bucket count the per-bucket observe() metric list stops being
# codegen-friendly; row counts then come from a DISTRIBUTED footer-read job.
_OBSERVE_BUCKET_LIMIT = 512


def _footer_info(arg: tuple[str, str]) -> tuple[int, object, object]:
    """Executor-side parquet footer read: row count plus the key column's
    min/max folded across row groups (None/None when any row group lacks
    written statistics — pruning then conservatively keeps the file)."""
    import pyarrow.parquet as pq

    path, key = arg
    md = pq.ParquetFile(path).metadata
    rows = int(md.num_rows)
    kmin = kmax = None
    idx = None
    if key and md.num_row_groups:
        rg0 = md.row_group(0)
        for i in range(rg0.num_columns):
            if rg0.column(i).path_in_schema == key:
                idx = i
                break
    if idx is not None:
        for g in range(md.num_row_groups):
            st = md.row_group(g).column(idx).statistics
            if st is None or not st.has_min_max:
                kmin = kmax = None
                break
            mn, mx = st.min, st.max
            if isinstance(mn, bytes):
                try:
                    mn, mx = mn.decode("utf-8"), mx.decode("utf-8")
                except UnicodeDecodeError:
                    kmin = kmax = None
                    break
            kmin = mn if kmin is None or mn < kmin else kmin
            kmax = mx if kmax is None or mx > kmax else kmax
    return rows, kmin, kmax


def _footer_col_stats(arg: tuple[str, tuple]) -> dict:
    """Executor-side parquet footer read: {col: [min, max]} folded across row
    groups for each requested column. A column missing from the file, lacking
    statistics in ANY row group, or of a non-JSON-stable type (anything but
    str/int/float) is omitted — pruning then conservatively keeps the file."""
    import pyarrow.parquet as pq

    path, cols = arg
    md = pq.ParquetFile(path).metadata
    out: dict = {}
    if not md.num_row_groups:
        return out
    rg0 = md.row_group(0)
    idx = {}
    for i in range(rg0.num_columns):
        name = rg0.column(i).path_in_schema
        if name in cols:
            idx[name] = i
    for name, i in idx.items():
        mn = mx = None
        for g in range(md.num_row_groups):
            st = md.row_group(g).column(i).statistics
            if st is None or not st.has_min_max:
                mn = mx = None
                break
            lo, hi = st.min, st.max
            if isinstance(lo, bytes):
                try:
                    lo, hi = lo.decode("utf-8"), hi.decode("utf-8")
                except UnicodeDecodeError:
                    mn = mx = None
                    break
            if not isinstance(lo, (str, int, float)) or isinstance(lo, bool):
                mn = mx = None
                break
            mn = lo if mn is None or lo < mn else mn
            mx = hi if mx is None or hi > mx else mx
        if mn is not None and mx is not None:
            out[name] = [mn, mx]
    return out


_PRUNE_OPS = ("=", "!=", "<", "<=", ">", ">=", "in")


def _range_excludes(mn, mx, op: str, val) -> bool:
    """True only when [mn, mx] PROVABLY excludes every row satisfying
    ``col <op> val`` — the file can then be skipped. Any doubt -> False."""
    try:
        if op == "=":
            return val < mn or val > mx
        if op == "in":
            return all(v < mn or v > mx for v in val)
        if op == "!=":
            return mn == mx == val
        if op == "<":
            return mn >= val
        if op == "<=":
            return mn > val
        if op == ">":
            return mx <= val
        if op == ">=":
            return mx < val
    except TypeError:  # filter value doesn't order against stored stats
        return False
    return False


def _file_excluded(entry: dict, filters: list) -> bool:
    """Conjunctive column-stats pruning over an entry's recorded per-file
    ranges (``cstats`` from stats_cols; the key's kmin/kmax also usable).
    Missing stats for a referenced column keep the file."""
    cs = entry.get("cstats") or {}
    for col, op, val in filters:
        rng = cs.get(col)
        if rng is not None and _range_excludes(rng[0], rng[1], op, val):
            return True
    return False


def _filters_to_column(filters: list):
    """The same conjuncts as row-level Spark predicates."""
    from pyspark.sql import functions as _F

    out = None
    for col, op, val in filters:
        c = _F.col(col)
        if op == "=":
            cond = c == _F.lit(val)
        elif op == "!=":
            cond = c != _F.lit(val)
        elif op == "<":
            cond = c < _F.lit(val)
        elif op == "<=":
            cond = c <= _F.lit(val)
        elif op == ">":
            cond = c > _F.lit(val)
        elif op == ">=":
            cond = c >= _F.lit(val)
        else:  # "in" — validated upstream
            cond = c.isin(list(val))
        out = cond if out is None else out & cond
    return out


def _file_may_contain(entry: dict, keys: list) -> bool:
    """Manifest-level data skipping: False only when the file's recorded key
    range provably excludes every probe key. Files without stats (older
    layout, stats-ineligible key type, truncated parquet statistics) are
    always kept — pruning is an optimization, never a correctness gate."""
    mn, mx = entry.get("kmin"), entry.get("kmax")
    if mn is None or mx is None:
        return True
    try:
        return any(mn <= k <= mx for k in keys)
    except TypeError:  # probe key type doesn't order against stored stats
        return True
LSN_COL = "_lsn"
SEQ_COL = "_seq"
DELETED_COL = "_deleted"
# Lineage travels with every stored row: the LWW version pair that produced it,
# plus a tombstone flag. Tombstones are how a DELETE outlives its batch — a late
# out-of-order UPDATE with an older (commit_lsn, seq_no) must NOT resurrect the
# row, so the delete's version is retained and loses/wins LWW like any write.
LINEAGE_COLS = (LSN_COL, SEQ_COL, DELETED_COL)


def _resolve_source_name(
    name: str, target_sid: int, file_sid: int, schemas: dict
) -> str:
    """The target column ``name``'s name AS WRITTEN under schema ``file_sid``:
    walk the per-version rename records (TableSchema ``from`` markers)
    backwards from ``target_sid``. Chained renames compose (a->b at v5,
    b->c at v8: a v4 file resolves c -> b -> a)."""
    cur = name
    for k in range(int(target_sid), int(file_sid), -1):
        sch = schemas.get(str(k))
        if not sch:
            continue
        for f in sch:
            if f["name"] == cur and "from" in f:
                cur = f["from"]
                break
    return cur


def historical_names(name: str, target_sid: int, schemas: dict) -> list[str]:
    """Every name the column ``name`` has carried, newest first: the full
    rename chain walked back from ``target_sid`` to schema 1. Used by the
    replay engine to accept change events from an upstream that lags a
    rename (the reference's column-mapping config semantics:
    ``SnowflakeReader`` `column` mapping, SURVEY §2.3)."""
    out = [name]
    cur = name
    for k in range(int(target_sid), 1, -1):
        sch = schemas.get(str(k))
        if not sch:
            continue
        for f in sch:
            if f["name"] == cur and "from" in f:
                cur = f["from"]
                out.append(cur)
                break
    return out


def resolve_lww(df: DataFrame, key: str) -> DataFrame:
    """Merge-on-read resolution: collapse base + delta rows to each key's
    newest (_lsn, _seq) version — one hash(key) exchange + an in-partition
    sort (``row_number`` window), the same shape Delta/Hudi MOR readers use.

    Deliberately NOT the two-phase winner join (``cdc/dedup.winner_filter``):
    that shape self-joins the scan, and composing the result under set
    operations (``exceptAll`` rewrites into a union + group-by-all + replicate
    plan) trips a Catalyst INTERNAL_ERROR_ATTRIBUTE_NOT_FOUND in Spark 4.1 —
    reproduced and pinned by ``test_mor.py::test_resolved_read_composes_with_
    set_operations``. The window variant is self-join-free and costs the one
    exchange the read pays anyway; the per-partition sort is bounded by
    compaction (delta depth <= mor_compact_after).

    Ties (same key, same version in base AND a delta) are duplicate
    deliveries of an identical payload by the idempotence contract;
    row_number picks one arbitrarily."""
    from pyspark.sql import Window

    w = Window.partitionBy(key).orderBy(
        F.col(LSN_COL).desc(), F.col(SEQ_COL).desc()
    )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )


RV_LSN, RV_SEQ = "_rv_lsn", "_rv_seq"
RV_COLS = [(RV_LSN, "bigint"), (RV_SEQ, "bigint")]


def resolve_columnwise(
    base: DataFrame | None,
    delta: DataFrame,
    key: str,
    payload_cols: list[str],
    agg_spec: dict | None = None,
) -> DataFrame:
    """Merge-on-read resolution for PARTIAL/AGGREGATE tables (the table's
    declared merge engine, ``_meta.json resolution``): base + delta rows are
    re-expressed as a change-event stream and folded by the SAME collapse
    kernel the write path uses (``cdc.dedup.aggregate_collapse``), so read
    resolution and batch collapse can never disagree.

      * a base row is a full image at its version  -> op I (tombstone -> D);
      * a delta row is a partial update            -> op U (tombstone -> D),
        UNLESS its reset version (``_rv_lsn/_rv_seq``, the batch's internal
        latest D-or-I) EQUALS its own version — then the batch was restarted
        by that very event and the row is a full image -> op I;
      * a delta row whose reset version is strictly OLDER than its own
        version additionally emits a pseudo-DELETE event at the reset
        version: it re-creates the batch-internal delete the collapse
        consumed, killing base/older-delta setters at or before it.

    Exactness: versions are unique per key across the log, deltas carry only
    versions newer than the base they were appended over (LSN-ordered batch
    windows), so the fold sees a faithful reconstruction of the suffix of
    the event stream that produced the deltas.
    """
    from ..cdc.dedup import aggregate_collapse

    def to_ev(df: DataFrame, op_col) -> DataFrame:
        return df.select(
            F.col(key),
            *[F.col(c) for c in payload_cols],
            op_col.alias("op"),
            F.col(LSN_COL).alias("commit_lsn"),
            F.col(SEQ_COL).alias("seq_no"),
        )

    v = F.struct(F.col(LSN_COL).alias("l"), F.col(SEQ_COL).alias("s"))
    rv = F.struct(F.col(RV_LSN).alias("l"), F.col(RV_SEQ).alias("s"))
    restart = F.col(RV_LSN).isNotNull() & (rv == v)
    parts = [
        to_ev(
            delta,
            F.when(F.col(DELETED_COL), "D")
            .when(restart, "I")
            .otherwise(F.lit("U")),
        ),
        delta.where(
            F.col(RV_LSN).isNotNull() & ~F.col(DELETED_COL) & (rv < v)
        ).select(
            F.col(key),
            *[
                F.lit(None).cast(delta.schema[c].dataType).alias(c)
                for c in payload_cols
            ],
            F.lit("D").alias("op"),
            F.col(RV_LSN).alias("commit_lsn"),
            F.col(RV_SEQ).alias("seq_no"),
        ),
    ]
    if base is not None:
        parts.append(
            to_ev(
                base, F.when(F.col(DELETED_COL), "D").otherwise(F.lit("I"))
            )
        )
    ev = parts[0]
    for p in parts[1:]:
        ev = ev.unionByName(p)
    collapsed = aggregate_collapse(
        ev, key, agg_spec=agg_spec, payload_cols=payload_cols
    )
    return collapsed.select(
        F.col(key),
        *[F.col(c) for c in payload_cols],
        F.col("commit_lsn").alias(LSN_COL),
        F.col("seq_no").alias(SEQ_COL),
        (F.col("op") == "D").alias(DELETED_COL),
    )


def bucket_expr(key_col: str, n_buckets: int):
    """Stable key -> bucket mapping, deliberately IDENTICAL to Spark's own
    shuffle placement: ``pmod(murmur3_hash(key), n)`` is exactly what
    ``HashPartitioning`` computes, so a DataFrame after
    ``repartition(n_buckets, key)`` has partition i == bucket i. The MERGE
    pipeline exploits that equality end-to-end — the dedup shuffle, the
    shuffled-hash join, and the per-bucket file write all share ONE physical
    partitioning, and the write stage needs no second shuffle (the equivalent
    of Iceberg's storage-partitioned join / bucket transform alignment)."""
    return F.pmod(F.hash(F.col(key_col)), F.lit(n_buckets)).cast("int")


@dataclass
class TableSchema:
    """Named, typed schema (the reference has none — records are positional,
    ``common/.../element/Record.java:7-23``; adding names/types is the Spark-side
    upgrade required by the input_hint)."""

    fields: list[tuple[str, str]]  # (name, spark ddl type)
    # new_name -> old_name for renames introduced AT THIS schema version
    # (evolve.py rename_column). Read alignment walks these back through the
    # schema chain so files written under any older schema resolve the
    # renamed column by its then-current name — Iceberg tracks the same
    # lineage with field ids; a per-version rename log is the name-based
    # equivalent and survives chained renames (a->b at v5, b->c at v8).
    renames: dict = field(default_factory=dict)

    def ddl(self) -> str:
        return ", ".join(f"{n} {t}" for n, t in self.fields)

    def names(self) -> list[str]:
        return [n for n, _ in self.fields]

    def to_json(self) -> list[dict]:
        return [
            {"name": n, "type": t,
             **({"from": self.renames[n]} if n in self.renames else {})}
            for n, t in self.fields
        ]

    @staticmethod
    def from_json(obj: list[dict]) -> "TableSchema":
        return TableSchema(
            [(f["name"], f["type"]) for f in obj],
            renames={f["name"]: f["from"] for f in obj if "from" in f},
        )


@dataclass
class Snapshot:
    version: int
    parent: int | None
    schema_id: int
    schemas: dict[str, list[dict]]  # schema_id -> fields json
    files: list[dict]  # {path, bucket, schema_id, rows} — materialized on load
    summary: dict = field(default_factory=dict)
    # bucket -> relative path of the immutable manifest shard listing that
    # bucket's files (Iceberg's manifest-list idea): the version file carries
    # only these O(n_buckets) refs, so a commit touching b buckets writes b
    # shard files + one version file — independent of TOTAL table file count.
    manifests: dict[str, str] = field(default_factory=dict)

    def schema(self) -> TableSchema:
        return TableSchema.from_json(self.schemas[str(self.schema_id)])

    def watermarks(self) -> dict[str, int]:
        return dict(self.summary.get("watermarks", {}))

    def applied_batches(self) -> list[str]:
        return list(self.summary.get("applied", []))

    def to_json(self) -> dict:
        return {
            "version": self.version,
            "parent": self.parent,
            "schema_id": self.schema_id,
            "schemas": self.schemas,
            "manifests": self.manifests,
            "summary": self.summary,
        }


class CommitConflict(RuntimeError):
    """Another writer published a snapshot since this one was loaded."""


class LakeTable:
    """Handle to one table rooted at a local/DFS-visible directory.

    Metadata layout is SHARDED (Iceberg's manifest-list idea): each version
    file carries only {bucket -> manifest-shard path}; the immutable shard
    under ``_manifests/`` lists that one bucket's data files. A commit
    touching b buckets writes b shards + one version file — commit cost is
    independent of total table file count. Untouched buckets' shard refs are
    copied by reference (no I/O). Snapshots are cached per version (version
    files and shards are immutable, so the cache needs no invalidation).
    """

    def __init__(self, spark: SparkSession, root: str, fs=None, ref: str = "main"):
        from .fs import LocalTableFS

        self.spark = spark
        self.root = root
        self.fs = fs or LocalTableFS()
        # which pointer this handle follows: "main" = _current, anything else
        # = _refs/<name> (a BRANCH — Iceberg writable ref). Version numbers
        # are global across refs (_next_version probes the shared _versions/
        # dir), so branch lineages never collide; a branch is just a second
        # atomically-swapped pointer over the same snapshot protocol.
        self.ref = ref
        self._snap_cache: dict[int, Snapshot] = {}

    # ---------- paths ----------
    def _vdir(self) -> str:
        return os.path.join(self.root, "_versions")

    def _vpath(self, v: int) -> str:
        return os.path.join(self._vdir(), f"v{v:08d}.json")

    def _mdir(self) -> str:
        return os.path.join(self.root, "_manifests")

    def _current_path(self) -> str:
        if self.ref == "main":
            return os.path.join(self.root, "_current")
        return os.path.join(self._refdir(), f"{self.ref}.txt")

    def _refdir(self) -> str:
        return os.path.join(self.root, "_refs")

    # ---------- create / load ----------
    @staticmethod
    def create(
        spark: SparkSession,
        root: str,
        schema: TableSchema,
        key: str,
        n_buckets: int = 16,
        fs=None,
        sort_on_write: bool = False,
        codec: str | None = "zstd",
        bloom_key: bool = False,
        bloom_ndv: int | None = None,
        stats_cols: "list[str] | None" = None,
        cluster_cols: "list[str] | None" = None,
        cluster_method: "str | None" = None,
        resolution: str = "lww",
        agg_spec: "dict | None" = None,
    ) -> "LakeTable":
        """``codec``: parquet compression for this table's data files
        (recorded in _meta.json so every writer of the table agrees;
        None = the session's codec). Default zstd, SET FROM DATA: the
        replay's write phase is I/O-bound, and the interleaved bench A/B
        (tools/ab_codec.py, BENCH.md round 4) measured zstd 1.5x faster
        end-to-end than snappy (best-of-3: 52.0 s vs 79.7 s per 31.5M-event
        batch at 4 lanes) and ~3x faster than parquet-lz4 — the same ratio
        argument holds harder on a real DFS cluster where the written bytes
        also cross the network and replicate.

        ``bloom_key``: write a parquet BLOOM FILTER on the key column of
        every data file (Iceberg's write.parquet.bloom-filter-enabled
        analog). Pays on UNSORTED tables with point-lookup traffic: the
        manifest's min/max stats cannot prune inside a hash bucket (a
        bucket's key range spans the key space), but the pushed IN-filter
        probes the bloom and skips whole row groups. Redundant when
        ``sort_on_write`` already gives tight row-group ranges. Off by
        default, SET FROM DATA: tools/ab_bloom.py / BENCH.md round 4.
        ``bloom_ndv``: expected distinct keys PER FILE (sizes the bitset;
        parquet's default 1M costs ~1.2 MB per file — set it to about
        rows/n_buckets).

        ``stats_cols``: NON-key columns to record per-file min/max for in
        the manifest (Iceberg column-stats skipping beyond the key):
        ``read(filters=...)`` drops files whose recorded range provably
        excludes a conjunct before the scan plans. Worth it for columns the
        write pattern CLUSTERS (a time-ish attribute under append batches, a
        source column under per-source loads); a column uncorrelated with
        file placement yields full-range stats that never prune. Collected
        by one distributed parquet-footer job per commit.

        ``cluster_cols``: the table's DECLARED cluster order (Iceberg
        SortOrder analog) — ``maintain.compact`` defaults to range-splitting
        each bucket's rewrite on these columns, which is how a column whose
        arrival order is uncorrelated with its value still earns pruning-
        effective ``stats_cols`` ranges. Declaring both is the normal
        pairing: stats_cols says WHAT the manifest tracks, cluster_cols says
        what maintenance makes tight.

        ``cluster_method``: ``"range"`` (default, lexicographic — best when
        filters constrain the leading cluster column) or ``"zorder"``
        (Morton bit-interleave across ALL cluster columns, Delta OPTIMIZE
        ZORDER BY — best when queries filter the clustered columns
        independently; see ``lake/zorder.py``)."""
        if cluster_method not in (None, "range", "zorder"):
            raise ValueError(f"unknown cluster_method: {cluster_method!r}")
        # ``resolution``: the table's declared MERGE ENGINE (Paimon stores
        # the same choice in table options) — "lww" (default), "partial"
        # (NULL column in an update = unchanged), or "aggregate" (per-column
        # combiners via ``agg_spec``). A TABLE property, not a writer
        # option, because merge-on-read DELTA FILES defer resolution to
        # every reader: the reader must know how to fold them.
        if resolution not in ("lww", "partial", "aggregate"):
            raise ValueError(f"unknown resolution: {resolution!r}")
        if resolution == "aggregate" and not agg_spec:
            raise ValueError("resolution='aggregate' requires agg_spec")
        if agg_spec:
            # a 'sum' accumulator folds in bigint; the resolved scan casts
            # the total back to the DECLARED type, and under ANSI mode an
            # overflowing cast raises at READ/COMPACTION time — long after
            # the writes that caused it. Steer users to a wide type at
            # create time instead of at that much worse moment.
            declared = dict(schema.fields)
            narrow = [
                c for c, fn in agg_spec.items()
                if fn == "sum"
                and declared.get(c, "bigint").lower()
                in ("tinyint", "byte", "smallint", "short", "int", "integer")
            ]
            if narrow:
                warnings.warn(
                    f"agg_spec 'sum' over narrow column(s) {narrow}: the "
                    "running total folds in bigint and is cast back to the "
                    "declared type on read — an overflow raises under ANSI "
                    "mode at read/compaction time. Declare these columns "
                    "bigint.",
                    stacklevel=2,
                )
        t = LakeTable(spark, root, fs=fs)
        t.fs.makedirs(os.path.join(root, "_versions"))
        t.fs.makedirs(os.path.join(root, "_manifests"))
        t.fs.makedirs(os.path.join(root, "data"))
        snap = Snapshot(
            version=0,
            parent=None,
            schema_id=1,
            schemas={"1": schema.to_json()},
            files=[],
            summary={"key": key, "buckets": n_buckets, "watermarks": {}, "applied": []},
        )
        # meta that never changes lives in a sidecar
        with t.fs.write_text_atomic(os.path.join(root, "_meta.json")) as f:
            json.dump(
                {
                    "key": key,
                    "buckets": n_buckets,
                    "bucket_hash": BUCKET_HASH_ID,
                    "sort_on_write": bool(sort_on_write),
                    **({"codec": codec} if codec else {}),
                    **({"bloom_key": True} if bloom_key else {}),
                    **({"bloom_ndv": int(bloom_ndv)} if bloom_ndv else {}),
                    **({"stats_cols": list(stats_cols)} if stats_cols else {}),
                    **(
                        {"cluster_cols": list(cluster_cols)}
                        if cluster_cols
                        else {}
                    ),
                    **(
                        {"cluster_method": cluster_method}
                        if cluster_method
                        else {}
                    ),
                    **(
                        {"resolution": resolution}
                        if resolution != "lww"
                        else {}
                    ),
                    **({"agg_spec": dict(agg_spec)} if agg_spec else {}),
                },
                f,
            )
        t._write_manifest(snap)
        t._publish(snap.version, expected_parent=None)
        return t

    @staticmethod
    def exists(root: str, fs=None) -> bool:
        if fs is not None:
            return fs.exists(os.path.join(root, "_current"))
        return os.path.exists(os.path.join(root, "_current"))

    def meta(self) -> dict:
        m = getattr(self, "_meta_cache", None)
        if m is None:
            m = json.loads(self.fs.read_text(os.path.join(self.root, "_meta.json")))
            got = m.get("bucket_hash")
            if got != BUCKET_HASH_ID:
                raise RuntimeError(
                    f"table at {self.root} was laid out with bucket hash "
                    f"{got!r}; this engine uses {BUCKET_HASH_ID!r} — refusing "
                    "to merge (bucket pruning and the b= directory layout "
                    "would silently disagree with the on-disk files). "
                    "Rewrite the table to migrate."
                )
            self._meta_cache = m
        return m

    def bucket_count(self, snap: "Snapshot | None" = None) -> int:
        """The table's CURRENT bucket count — snapshot-scoped, not fixed at
        create time. ``summary["buckets"]`` (carried forward by every commit,
        rewritten atomically by ``maintain.rebucket``) is authoritative; the
        ``_meta.json`` sidecar value is only the create-time fallback for
        tables predating bucket evolution. Pass the snapshot a caller already
        holds to avoid a re-read of ``_current``."""
        s = snap if snap is not None else self.snapshot()
        b = s.summary.get("buckets")
        return int(b) if b is not None else int(self.meta()["buckets"])

    def rollback(self, to_version: int) -> "Snapshot":
        """Point the table back at an ANCESTOR snapshot (Iceberg's
        rollback_to_snapshot): one atomic pointer swap, no data I/O. The
        abandoned descendants' version files and data files remain on disk —
        still valid time-travel targets — until ``expire_snapshots`` /
        ``gc_orphans`` age them out. The next commit after a rollback probes
        past the abandoned version numbers (``_next_version``), so the new
        lineage never collides with the dead branch."""
        cur = self.current_version()
        if to_version == cur:
            return self.snapshot()
        v: int | None = cur
        while v is not None and v != to_version:
            v = self.snapshot(v).parent
        if v != to_version:
            raise ValueError(
                f"version {to_version} is not an ancestor of current {cur}"
            )
        self._publish(to_version, expected_parent=cur)
        return self.snapshot(to_version)

    # ---------- write-audit-publish (staged snapshots) ----------
    def _is_published(self, version: int) -> bool:
        """True iff ``version`` is reachable from the current pointer via
        parent links (i.e. visible history, not a staged/dead-branch file)."""
        v: int | None = self.current_version()
        while v is not None:
            if v == version:
                return True
            if v < version:
                return False  # parents only decrease — stop early
            v = self.snapshot(v).parent
        return False

    def publish_staged(self, version: int) -> Snapshot:
        """Fast-forward the current pointer to a STAGED snapshot (Iceberg's
        write-audit-publish): ``commit(..., publish=False)`` leaves the
        snapshot's version file, manifest shards, and data files fully staged
        but invisible to readers; auditors inspect it with
        ``read(snapshot=version)``; this call makes it current in one atomic
        pointer swap — no data I/O, the audit read and the published read are
        byte-identical by construction.

        Fast-forward ONLY: the staged snapshot's parent must still be the
        current version. If another writer published meanwhile, this raises
        ``CommitConflict`` and the caller must re-stage — the staged snapshot
        embeds copy-on-write basis rows from its parent, so cherry-picking it
        onto a different head could silently drop the interloper's updates
        (the same expected-parent rule ``merge_upsert`` enforces)."""
        snap = self.snapshot(version)
        self._publish(version, expected_parent=snap.parent)
        return snap

    def drop_staged(self, version: int) -> None:
        """Audit-reject a staged snapshot: delete its version file so its
        data files and manifest shards become unreferenced orphans for
        ``gc_orphans``. Refuses to drop a PUBLISHED version (reachable from
        the current pointer) — rejecting visible history is ``rollback``'s
        job, with its ancestor checks."""
        if self._is_published(version):
            raise ValueError(
                f"version {version} is published; use rollback(), not drop_staged()"
            )
        self.fs.remove(self._vpath(version))
        self._snap_cache.pop(version, None)

    def current_version(self) -> int:
        return int(self.fs.read_text(self._current_path()).strip())

    def snapshot(
        self, version: int | None = None, tag: str | None = None
    ) -> Snapshot:
        if tag is not None:
            if version is not None:
                raise ValueError("pass version OR tag, not both")
            version = self.tags()[tag]
        v = self.current_version() if version is None else version
        hit = self._snap_cache.get(v)
        if hit is not None:
            return hit
        d = json.loads(self.fs.read_text(self._vpath(v)))
        manifests = d.get("manifests")
        if manifests is None:
            files = d["files"]  # legacy inline layout (pre-sharding version file)
            manifests = {}
        else:
            files = []
            for b in sorted(manifests, key=int):
                files.extend(
                    json.loads(
                        self.fs.read_text(os.path.join(self.root, manifests[b]))
                    )
                )
        snap = Snapshot(
            version=d["version"],
            parent=d["parent"],
            schema_id=d["schema_id"],
            schemas=d["schemas"],
            files=files,
            summary=d["summary"],
            manifests=manifests,
        )
        self._snap_cache[v] = snap  # version files are immutable
        return snap

    def history(self) -> list[int]:
        vs = []
        for fn in self.fs.listdir(self._vdir()):
            if fn.startswith("v") and fn.endswith(".json"):
                vs.append(int(fn[1:-5]))
        return vs

    # ---------- tags (Iceberg named refs: immutable snapshot pins) ----------

    def _tagdir(self) -> str:
        return os.path.join(self.root, "_tags")

    def tag(self, name: str, version: int | None = None) -> int:
        """Pin a snapshot under a name (Iceberg ``create_tag``). Tags are
        IMMUTABLE: re-tagging an existing name is an error unless it points
        at the same version (idempotent re-run). ``expire_snapshots`` keeps
        tagged versions regardless of retention count. Created with the
        same compare-and-create primitive as version files, so two racing
        taggers cannot silently overwrite each other."""
        v = self.current_version() if version is None else int(version)
        if not self.fs.exists(self._vpath(v)):
            raise ValueError(f"version {v} does not exist")
        self.fs.makedirs(self._tagdir())
        path = os.path.join(self._tagdir(), f"{name}.json")
        try:
            self.fs.write_text_excl(path, json.dumps({"version": v}))
        except Exception:
            if not self.fs.exists(path):
                raise
            have = json.loads(self.fs.read_text(path))["version"]
            if have != v:
                raise ValueError(
                    f"tag {name!r} already pins version {have}, not {v} — "
                    "tags are immutable; drop_tag first"
                ) from None
        return v

    def tags(self) -> dict[str, int]:
        if not self.fs.exists(self._tagdir()):
            return {}
        out = {}
        for fn in self.fs.listdir(self._tagdir()):
            if fn.endswith(".json"):
                out[fn[:-5]] = json.loads(
                    self.fs.read_text(os.path.join(self._tagdir(), fn))
                )["version"]
        return out

    def drop_tag(self, name: str) -> None:
        self.fs.remove(os.path.join(self._tagdir(), f"{name}.json"))

    # ---------- branches (Iceberg writable refs) ----------

    def create_branch(self, name: str, at_version: int | None = None) -> "LakeTable":
        """Fork a writable ref at ``at_version`` (default: this ref's head)
        and return a handle checked out on it. Commits through the branch
        handle advance ONLY the branch pointer — readers of main (or any
        other ref) are untouched. Compare-and-create, so two racing
        ``create_branch`` calls cannot both win the name."""
        if name == "main":
            raise ValueError("'main' is the table's primary ref")
        v = self.current_version() if at_version is None else int(at_version)
        if not self.fs.exists(self._vpath(v)):
            raise ValueError(f"version {v} does not exist")
        self.fs.makedirs(self._refdir())
        self.fs.write_text_excl(
            os.path.join(self._refdir(), f"{name}.txt"), str(v)
        )
        return self.checkout(name)

    def checkout(self, name: str = "main") -> "LakeTable":
        """A handle following ref ``name`` over the same table root. Snapshot
        objects are immutable and version-keyed, so the cache is shared."""
        t = LakeTable(self.spark, self.root, fs=self.fs, ref=name)
        if name != "main" and not t.fs.exists(t._current_path()):
            raise ValueError(f"branch {name!r} does not exist")
        t._snap_cache = self._snap_cache
        return t

    def branches(self) -> dict[str, int]:
        if not self.fs.exists(self._refdir()):
            return {}
        return {
            fn[:-4]: int(
                self.fs.read_text(os.path.join(self._refdir(), fn)).strip()
            )
            for fn in self.fs.listdir(self._refdir())
            if fn.endswith(".txt")
        }

    def drop_branch(self, name: str) -> None:
        """Delete the ref pointer; the branch's commits stay on disk (valid
        time-travel targets) until expiry/GC ages them out — same afterlife
        as a rolled-back lineage."""
        if name == "main":
            raise ValueError("cannot drop the primary ref")
        self.fs.remove(os.path.join(self._refdir(), f"{name}.txt"))

    def fast_forward(self, version: int) -> Snapshot:
        """Advance THIS ref to ``version``, which must be a DESCENDANT of the
        ref's head (the head lies on ``version``'s parent chain) — the merge
        half of the branch workflow: replay into a staging branch, validate,
        then fast-forward main onto the branch head. Never a cherry-pick:
        a non-descendant target raises, because its copy-on-write files
        embed a different basis (the ``publish_staged`` rule, extended to
        multi-commit lineages). Racing publishers lose with
        ``CommitConflict`` on the atomic swap."""
        cur = self.current_version()
        if version == cur:
            return self.snapshot(cur)
        v: int | None = version
        while v is not None and v != cur:
            v = self.snapshot(v).parent
        if v != cur:
            raise ValueError(
                f"version {version} is not a descendant of {self.ref} "
                f"head {cur}"
            )
        self._publish(version, expected_parent=cur)
        return self.snapshot(version)

    # ---------- read ----------
    def read(
        self,
        snapshot: Snapshot | None = None,
        buckets: list[int] | None = None,
        with_lineage: bool = False,
        keys: list | None = None,
        filters: list | None = None,
    ) -> DataFrame:
        """Read the table at a snapshot, optionally pruned to a bucket subset.

        Bucket pruning is this format's partition pruning: a MERGE batch reads
        only the files whose bucket appears in the batch — at 100 TB that is the
        difference between scanning the table and scanning ~|batch|/|table| of it.

        ``keys``: probe values for manifest-level DATA SKIPPING — files whose
        recorded key min/max excludes every probe are dropped before the scan
        even plans (Iceberg column-stats pruning). Safe under merge-on-read:
        LWW resolution groups by key, so files that cannot contain a probe key
        contribute nothing to that key's resolution. NOTE: this prunes files
        only — the caller still applies the row-level key predicate.

        ``filters``: conjunctive ``(col, op, value)`` predicates (op in
        ``=  !=  <  <=  >  >=  in``) — pyarrow's simple-filter shape. Two
        effects, one declaration: files whose recorded ``stats_cols`` range
        provably excludes a conjunct are dropped BEFORE the scan plans
        (manifest pruning), and the same predicates are applied row-level
        (pushed into the parquet scan by Catalyst, so surviving files decode
        only matching row groups). NON-KEY file pruning is disabled when the
        candidate set holds merge-on-read delta files: a key's winning
        version can sit in a delta file whose attribute range fails the
        filter while an older losing version passes it in the base — pruning
        the delta file first would resurrect the loser. (Key-range pruning
        via ``keys`` has no such hazard: any file that can contain a probed
        key is kept, so LWW sees every version.) Compact first to restore
        skipping.

        Files written under older schemas are read with their write-time schema
        and cast/null-filled up to the current schema (transactional widen /
        add-column, see ``evolve.py``).
        """
        snap = snapshot or self.snapshot()
        cur = snap.schema()
        files = snap.files
        if buckets is not None:
            bset = set(buckets)
            files = [f for f in files if f["bucket"] in bset]
        if keys:
            files = [f for f in files if _file_may_contain(f, keys)]
        if filters:
            bad = [f for f in filters if f[1] not in _PRUNE_OPS]
            if bad:
                raise ValueError(f"unsupported filter op(s): {bad}")
            if not any(f.get("kind") == "delta" for f in files):
                files = [f for f in files if not _file_excluded(f, filters)]
        self._last_scan_file_count = len(files)  # test/ops introspection
        has_delta = any(f.get("kind") == "delta" for f in files)
        resolution = self.meta().get("resolution", "lww")
        if has_delta and resolution != "lww":
            # columnwise merge engine: delta rows are PARTIAL images — split
            # the scan so base rows enter the fold as full images and delta
            # rows (with their reset-version pair) as partial events
            base_files = [f for f in files if f.get("kind") != "delta"]
            delta_files = [f for f in files if f.get("kind") == "delta"]
            b = self._read_file_entries(
                base_files, snap.schemas, cur, target_sid=snap.schema_id
            )
            d = self._read_file_entries(
                delta_files,
                snap.schemas,
                cur,
                target_sid=snap.schema_id,
                extra_cols=RV_COLS,
            )
            out = resolve_columnwise(
                b,
                d,
                self.meta()["key"],
                payload_cols=[
                    c for c in cur.names() if c != self.meta()["key"]
                ],
                agg_spec=self.meta().get("agg_spec"),
            )
            # a SUM over an int column folds to bigint — realign every
            # payload column to its declared type so downstream writers
            # (compaction!) emit files matching the schema's physical types.
            # Declare accumulator columns wide enough (bigint) to hold their
            # totals; ANSI mode surfaces an overflowing cast as an error.
            out = out.select(
                *[F.col(n).cast(t).alias(n) for n, t in cur.fields],
                *[F.col(c) for c in (LSN_COL, SEQ_COL, DELETED_COL)],
            )
            if not with_lineage:
                out = out.where(~F.col(DELETED_COL)).drop(*LINEAGE_COLS)
            if filters:
                out = out.where(_filters_to_column(filters))
            return out
        out = self._read_file_entries(
            files, snap.schemas, cur, target_sid=snap.schema_id
        )
        if out is None:
            lineage = [
                (LSN_COL, "bigint"), (SEQ_COL, "bigint"), (DELETED_COL, "boolean")
            ]
            return self.spark.createDataFrame(
                [],
                TableSchema(
                    cur.fields + lineage if with_lineage else cur.fields
                ).ddl(),
            )
        if any(f.get("kind") == "delta" for f in files):
            # merge-on-read: delta files (lake/merge.delta_append) carry
            # newer versions / tombstones for keys that may also exist in the
            # base — resolve LWW at scan time. Base-only snapshots skip this
            # (no extra exchange on the common read path); compaction
            # (lake/maintain.compact) folds deltas back into the base.
            out = resolve_lww(out, self.meta()["key"])
        if not with_lineage:
            # _deleted is written non-null by every writer; a bare NOT predicate
            # (rather than coalesce) stays pushdown-eligible at the parquet scan
            out = out.where(~F.col(DELETED_COL)).drop(*LINEAGE_COLS)
        if filters:
            # row-level truth AFTER LWW resolution (file pruning above is
            # only ever a superset); plain comparisons push to the scan
            out = out.where(_filters_to_column(filters))
        return out

    def lookup(
        self, keys: list[str], snapshot: Snapshot | None = None
    ) -> DataFrame:
        """Point-read a set of keys: O(|keys|) buckets touched, never the
        table. Buckets are computed DRIVER-SIDE (``lake/lookup.bucket_of``,
        the pure-Python mirror of ``bucket_expr``/``F.hash``) so no Spark job
        runs before the pruned scan; the IN-list predicate is pushed into the
        parquet scan, so a ``sort_on_write`` table decodes only the row
        groups whose key range straddles a probe key. At 100 TB a k-key
        lookup reads ~k bucket files' footers + the straddling row groups —
        the same asymptotics as Iceberg bucket-partitioned point reads.

        Non-string keys fall back to one tiny Spark job over the literal key
        list (bucket_expr itself), keeping bucket placement authoritative."""
        snap = snapshot or self.snapshot()
        keycol = self.meta()["key"]
        nb = self.bucket_count(snap)
        keys = list(dict.fromkeys(keys))  # dedup, keep order
        if not keys:
            return self.read(snapshot=snap, buckets=[])
        ktype = dict(snap.schema().fields).get(keycol, "string")
        if ktype == "string":
            from .lookup import bucket_of

            buckets = sorted({bucket_of(k, nb) for k in keys})
        else:
            rows = (
                self.spark.createDataFrame([(k,) for k in keys], f"k {ktype}")
                .select(bucket_expr("k", nb).alias("b"))
                .distinct()
                .collect()
            )
            buckets = sorted(r["b"] for r in rows)
        return self.read(snapshot=snap, buckets=buckets, keys=keys).where(
            F.col(keycol).isin(keys)
        )

    def _read_file_entries(
        self,
        files: list[dict],
        schemas: dict,
        target: TableSchema,
        target_sid: int | None = None,
        extra_cols: "list[tuple[str, str]] | None" = None,
    ) -> DataFrame | None:
        """Read a list of manifest file entries, each with its write-time
        schema (no inference), aligned (cast / null-fill / rename-resolve)
        up to ``target``, lineage columns included. None for an empty list.
        No tombstone filter and no delta resolution — callers layer those.

        ``target_sid``: the schema id ``target`` corresponds to — needed to
        walk rename records back to each file's write-time name (omitted =
        no rename resolution, the pre-rename behavior).

        ``extra_cols``: additional (name, type) columns to surface (the
        columnwise delta files' reset-version pair); files without them
        yield NULLs (explicit read schema, no inference)."""
        if not files:
            return None
        lineage = [(LSN_COL, "bigint"), (SEQ_COL, "bigint"), (DELETED_COL, "boolean")]
        lineage = lineage + list(extra_cols or [])
        by_sid: dict[int, list[str]] = {}
        for f in files:
            by_sid.setdefault(f["schema_id"], []).append(
                os.path.join(self.root, f["path"])
            )
        parts = []
        for sid, paths in by_sid.items():
            wschema = TableSchema.from_json(schemas[str(sid)])
            read_schema = TableSchema(wschema.fields + lineage)
            df = self.spark.read.schema(read_schema.ddl()).parquet(*paths)
            cols = []
            have = dict(wschema.fields)
            for name, typ in target.fields:
                src = (
                    _resolve_source_name(name, target_sid, sid, schemas)
                    if target_sid is not None
                    else name
                )
                if src in have:
                    cols.append(F.col(src).cast(typ).alias(name))
                else:
                    cols.append(F.lit(None).cast(typ).alias(name))
            for name, typ in lineage:
                cols.append(F.col(name).cast(typ).alias(name))
            parts.append(df.select(cols))
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    def changes(
        self, from_version: int, to_version: int | None = None
    ) -> DataFrame:
        """Change-data-feed read (Iceberg changelog / Delta CDF analog): the
        row-level changes committed AFTER ``from_version`` up to and
        including ``to_version`` (default: current). The engine can therefore
        EMIT a changelog downstream, not just ingest one — the consumer side
        of the same CDC contract (``_deleted=true`` rows are deletes,
        everything else upserts; LWW MERGE downstream makes the
        insert-vs-update distinction immaterial, so it is not computed).

        Output: table columns + lineage (``_lsn``/``_seq``/``_deleted``) +
        ``_commit_version``, one row per (commit, key) the commit changed.

        Cost model: merge-on-read delta commits are read VERBATIM (their new
        files ARE the change set — O(changes), the CDC-scale path); COW merge
        commits are DIFFED against their parent (anti-join of rewritten
        buckets on (key, version) — O(touched buckets) per commit, exact);
        compaction commits are skipped (no logical change, flagged in the
        snapshot summary).
        """
        to_v = self.current_version() if to_version is None else to_version
        chain: list[Snapshot] = []
        v: int | None = to_v
        while v is not None and v > from_version:
            s = self.snapshot(v)
            chain.append(s)
            v = s.parent
        if v != from_version:
            raise ValueError(
                f"version {from_version} is not an ancestor of {to_v}"
            )
        chain.reverse()
        to_snap = self.snapshot(to_v)
        if chain and self.meta().get("resolution", "lww") != "lww":
            if all(s.summary.get("compaction") for s in chain):
                # every commit in the window is a compaction — no logical
                # change by definition (the lww path below skips them one by
                # one); short-circuit instead of paying two full resolved
                # scans + exceptAll for a provably empty diff
                return (
                    self.read(snapshot=to_snap, with_lineage=True)
                    .limit(0)
                    .withColumn("_commit_version", F.lit(to_v))
                )
            # COLUMNWISE merge engines: delta rows are PARTIAL images — a
            # downstream LWW consumer replaying them verbatim would turn
            # "NULL = unchanged" into "NULL = overwrite". Emit the NET
            # resolved diff between the two snapshots instead (full images,
            # one pseudo-commit at ``to_v``) — the analog of Paimon's
            # full-compaction changelog for its non-deduplicate engines.
            # Cost: two resolved scans, O(table) — the price of complete
            # images when the log itself only carries cells; intermediate
            # per-commit states are collapsed away by construction.
            cur_df = self.read(snapshot=to_snap, with_lineage=True)
            prev_df = self.read(
                snapshot=self.snapshot(from_version), with_lineage=True
            )
            # align the older snapshot's frame to the target schema (schema
            # may have evolved in between): null-fill added columns, cast
            # widened ones. The diff emits CUR rows only, so misalignment
            # can only inflate the change set, never corrupt an image.
            have = set(prev_df.columns)
            prev_df = prev_df.select(
                *[
                    (F.col(c) if c in have else F.lit(None))
                    .cast(dict(cur_df.dtypes)[c])
                    .alias(c)
                    for c in cur_df.columns
                ]
            )
            return cur_df.exceptAll(prev_df).withColumn(
                "_commit_version", F.lit(to_v)
            )
        target = to_snap.schema()
        key = self.meta()["key"]
        outs = []
        for s in chain:
            if s.summary.get("compaction"):
                continue  # physical rewrite, no logical change
            parent_paths = (
                {f["path"] for f in self.snapshot(s.parent).files}
                if s.parent is not None
                else set()
            )
            new_files = [f for f in s.files if f["path"] not in parent_paths]
            if not new_files:
                continue
            # to_snap.schemas: the accumulated superset, so rename records
            # registered AFTER this intermediate commit still resolve
            df = self._read_file_entries(
                new_files, to_snap.schemas, target, target_sid=to_snap.schema_id
            )
            if not all(f.get("kind") == "delta" for f in new_files):
                # COW rewrite (or bulk append): keep only rows whose (key,
                # version) is NOT in the parent's view of the same buckets —
                # the rows this commit logically changed
                bks = sorted({f["bucket"] for f in new_files})
                if s.parent is not None and parent_paths:
                    prev = self.read(
                        snapshot=self.snapshot(s.parent),
                        buckets=bks,
                        with_lineage=True,
                    ).select(key, LSN_COL, SEQ_COL)
                    df = df.join(prev, [key, LSN_COL, SEQ_COL], "left_anti")
            outs.append(df.withColumn("_commit_version", F.lit(s.version)))
        if not outs:
            lineage = [
                (LSN_COL, "bigint"), (SEQ_COL, "bigint"), (DELETED_COL, "boolean"),
                ("_commit_version", "int"),
            ]
            return self.spark.createDataFrame(
                [], TableSchema(target.fields + lineage).ddl()
            )
        out = outs[0]
        for p in outs[1:]:
            out = out.unionByName(p)
        return out

    # ---------- write / commit ----------
    def _write_manifest(self, snap: Snapshot) -> None:
        # create-if-absent (O_EXCL-style): two racing writers cannot both
        # claim this snapshot version
        self.fs.write_text_excl(self._vpath(snap.version), json.dumps(snap.to_json()))

    def _publish(self, version: int, expected_parent: int | None) -> None:
        cur = self._current_path()
        if expected_parent is not None:
            now = int(self.fs.read_text(cur).strip())
            if now != expected_parent:
                raise CommitConflict(
                    f"current={now}, expected parent={expected_parent}"
                )
        with self.fs.write_text_atomic(cur) as f:  # phase-2: the atomic publish
            f.write(str(version))

    def _next_version(self, parent: int) -> int:
        v = parent + 1
        while self.fs.exists(self._vpath(v)):
            v += 1  # orphaned staged manifest from a crashed writer — skip over
        return v

    def write_data_files(
        self,
        df: DataFrame,
        schema_id: int,
        crash_after_stage: bool = False,
        bucket_aligned: bool = False,
        kind: str | None = None,
        n_buckets: int | None = None,
        key_stats: bool | None = None,
        sort_cols: list[str] | None = None,
    ) -> list[dict]:
        """Stage parquet files for rows already carrying BUCKET_COL. Returns file
        entries; nothing is visible until a snapshot referencing them commits.

        ``bucket_aligned=True``: the caller already established the file
        layout it wants — either hash-partitioned by the table key into
        exactly ``n_buckets`` partitions (bucket_expr == HashPartitioning,
        so partition i holds bucket i only and ``partitionBy`` writes one
        file per task), or range-partitioned on (bucket, cluster...) by a
        clustered compaction (several narrow-range files per bucket). Either
        way no further shuffle happens here. False -> an explicit hash
        repartition establishes the one-file-per-bucket layout.

        ``sort_cols``: within-task sort columns (after the bucket column);
        used by clustered compaction so each emitted file's row groups carry
        tight min/max on the cluster columns.
        """
        from pyspark.sql import Observation

        commit_dir = f"data/c-{uuid.uuid4().hex}"
        out_path = os.path.join(self.root, commit_dir)
        # callers pass n_buckets explicitly when they computed BUCKET_COL
        # against a specific snapshot (merge basis / rebucket target) so the
        # file layout can never disagree with the bucket ids in the rows
        nb = self.bucket_count() if n_buckets is None else n_buckets
        key = self.meta()["key"]
        if not bucket_aligned:
            df = df.repartition(nb, F.col(key))
        # per-bucket row counts ride the write action itself as observe()
        # metrics — the old driver-side loop of parquet-footer reads was an
        # O(files) serial bottleneck AND a hard local-FS dependency; nb
        # conditional sums stay inside the write's whole-stage codegen.
        obs = None
        # per-file key min/max (Iceberg's column-stats data skipping): ride
        # the SAME observe() — two more conditional aggregates per bucket, no
        # extra job. Only for key types whose Python ordering matches SQL
        # ordering (string/integral); stats on other types would prune wrong.
        # ``key_stats=None`` -> auto: collect for key-clustered layouts
        # (sort_on_write) and MoR delta files (file stacks where skipping
        # pays), NOT for COW merge rewrites — a hash bucket's key range spans
        # ~the whole key space, so those stats never prune, while the extra
        # 2nb conditional aggregates cost measured ~0.25 s/M rows in the
        # replay's write stage (observe A/B, BENCH.md round 4).
        from pyspark.sql.types import (
            ByteType, IntegerType, LongType, ShortType, StringType,
        )

        if key_stats is None:
            key_stats = bool(self.meta().get("sort_on_write")) or kind == "delta"
        stats_ok = key_stats and isinstance(
            df.schema[key].dataType,
            (StringType, IntegerType, LongType, ShortType, ByteType),
        )
        collect_stats = stats_ok and 3 * nb <= _OBSERVE_BUCKET_LIMIT
        if nb <= _OBSERVE_BUCKET_LIMIT:
            obs = Observation()
            aggs = [
                F.sum((F.col(BUCKET_COL) == b).cast("bigint")).alias(f"b{b}")
                for b in range(nb)
            ]
            if collect_stats:
                for b in range(nb):
                    cond = F.when(F.col(BUCKET_COL) == b, F.col(key))
                    aggs.append(F.min(cond).alias(f"mn{b}"))
                    aggs.append(F.max(cond).alias(f"mx{b}"))
            df = df.observe(obs, *aggs)
        out_df = df.withColumnRenamed(BUCKET_COL, "b")
        # within-task sort order: the partitionBy write must order each task
        # by its partition column anyway, so extending that sort costs only
        # extra comparator terms — and makes every row group's min/max on the
        # sorted columns tight, so pushed predicates decode only straddling
        # row groups (Iceberg's write.sort-order data-skipping effect).
        # ``sort_cols`` (clustered compaction) come first, then the key when
        # the table is key-sorted (lookup()'s pushed IN-filter benefits).
        order = list(sort_cols or [])
        if self.meta().get("sort_on_write"):
            order.append(key)
        if order:
            out_df = out_df.sortWithinPartitions("b", *order)
        writer = out_df.write.partitionBy("b").mode("overwrite")
        codec = self.meta().get("codec")
        if codec:
            writer = writer.option("compression", codec)
        # A/B hook (tools/ab_parquet_dict.py): parquet dictionary encoding
        # on/off for this write — the token arrays are near-uniform ints, so
        # the dictionary build can be pure overhead; set from measurement
        dict_knob = os.environ.get("SPARK_GRAFT_PARQUET_DICT", "")
        if dict_knob in ("true", "false"):
            writer = writer.option("parquet.enable.dictionary", dict_knob)
        if self.meta().get("bloom_key"):
            writer = writer.option(f"parquet.bloom.filter.enabled#{key}", "true")
            ndv = self.meta().get("bloom_ndv")
            if ndv:
                writer = writer.option(
                    f"parquet.bloom.filter.expected.ndv#{key}", str(int(ndv))
                )
        writer.parquet(out_path)
        bucket_rows = {}
        bucket_stats: dict[int, tuple] = {}
        if obs is not None:
            got = obs.get
            bucket_rows = {b: int(got[f"b{b}"] or 0) for b in range(nb)}
            if collect_stats:
                for b in range(nb):
                    mn, mx = got[f"mn{b}"], got[f"mx{b}"]
                    if mn is not None and mx is not None:
                        if not isinstance(mn, str):
                            mn, mx = int(mn), int(mx)  # JSON-stable
                        bucket_stats[b] = (mn, mx)
        entries = []
        footer_fallback = []
        for bdir in self.fs.listdir(out_path):
            if not bdir.startswith("b="):
                continue
            b = int(bdir.split("=", 1)[1])
            files = [
                fn
                for fn in self.fs.listdir(os.path.join(out_path, bdir))
                if fn.endswith(".parquet")
            ]
            for fn in files:
                e = {
                    "path": f"{commit_dir}/{bdir}/{fn}",
                    "bucket": b,
                    "schema_id": schema_id,
                }
                if kind is not None:
                    # "delta" marks merge-on-read change files: readers
                    # LWW-resolve them against the base (read/resolve_lww)
                    e["kind"] = kind
                if obs is not None and len(files) == 1:
                    e["rows"] = bucket_rows[b]
                    if b in bucket_stats:
                        e["kmin"], e["kmax"] = bucket_stats[b]
                else:
                    footer_fallback.append(e)  # rare: multi-file bucket / big nb
                entries.append(e)
        if footer_fallback:
            # distributed footer read: executors open the footers in parallel —
            # never an O(files) loop on the driver. Footers also yield the
            # key min/max (parquet row-group statistics), so these entries
            # get PER-FILE stats — tighter than the observe path's per-bucket
            # bounds when a bucket spans several files.
            stats_key = key if stats_ok else ""
            args = [
                (os.path.join(self.root, e["path"]), stats_key)
                for e in footer_fallback
            ]
            infos = (
                self.spark.sparkContext.parallelize(args, max(1, len(args) // 64))
                .map(_footer_info)
                .collect()
            )
            for e, (n, kmin, kmax) in zip(footer_fallback, infos):
                e["rows"] = n
                if kmin is not None and kmax is not None:
                    e["kmin"], e["kmax"] = kmin, kmax
        stats_cols = [
            c for c in self.meta().get("stats_cols", ()) if c in df.columns
        ]
        if stats_cols and entries:
            # generalized column stats (read(filters=...) pruning): one
            # distributed footer job per commit — executors fold row-group
            # min/max per declared column; never an O(files) driver loop
            cols = tuple(stats_cols)
            args = [(os.path.join(self.root, e["path"]), cols) for e in entries]
            stats = (
                self.spark.sparkContext.parallelize(args, max(1, len(args) // 64))
                .map(_footer_col_stats)
                .collect()
            )
            for e, cs in zip(entries, stats):
                if cs:
                    e["cstats"] = cs
        if crash_after_stage:  # test hook: simulate dying between the two phases
            raise RuntimeError("simulated crash after stage, before publish")
        return entries

    def commit(
        self,
        new_files: list[dict],
        replace_buckets: list[int] | None,
        summary_update: dict | None = None,
        schema_update: TableSchema | None = None,
        crash_before_publish: bool = False,
        expected_parent: int | None = None,
        publish: bool = True,
    ) -> Snapshot:
        """Build and publish the next snapshot.

        ``publish=False`` stages the snapshot WITHOUT moving the current
        pointer (write-audit-publish): readers keep seeing the old state,
        auditors read the staged version via ``read(snapshot=...)``, and the
        caller later calls ``publish_staged`` (fast-forward swap) or
        ``drop_staged`` (reject; files orphan).

        ``replace_buckets``: buckets whose previous files are superseded (MERGE
        copy-on-write); None means pure append. ``summary_update`` merges into the
        snapshot summary — watermarks replace wholesale per key, ``applied``
        batch-ids append (bounded). ``schema_update`` registers a new schema id
        in the same atomic commit (transactional evolution).

        ``expected_parent``: the snapshot version the new files were COMPUTED
        from. A copy-on-write MERGE must pass it: its rewritten buckets embed
        the basis snapshot's rows, so committing onto a different parent would
        silently drop a concurrent writer's update to those buckets (the
        classic lost update — commit() reloading the freshest parent makes it
        invisible, not safe). On mismatch this raises ``CommitConflict``
        BEFORE staging; the caller decides whether a metadata-only retry is
        sound (disjoint buckets) or the merge must re-run (merge_upsert does
        exactly that). None = order-insensitive commit (pure append, seed
        load) where any parent is a valid basis."""
        parent = self.snapshot()
        if expected_parent is not None and parent.version != expected_parent:
            raise CommitConflict(
                f"current={parent.version}, basis={expected_parent}"
            )
        drop = set(replace_buckets) if replace_buckets is not None else set()
        keep = [f for f in parent.files if f["bucket"] not in drop]

        # ---- sharded manifest bookkeeping: write O(touched buckets) shards --
        new_by_bucket: dict[int, list[dict]] = {}
        for f in new_files:
            new_by_bucket.setdefault(int(f["bucket"]), []).append(f)
        if parent.manifests or not parent.files:
            manifests = dict(parent.manifests)
            touched = set(new_by_bucket) | {
                b for b in drop if str(b) in manifests
            }
            parent_of = None
        else:
            # legacy parent (inline file list): one-time migration — reshard
            # every bucket this commit
            parent_of: dict[int, list[dict]] = {}
            for f in parent.files:
                parent_of.setdefault(int(f["bucket"]), []).append(f)
            manifests = {}
            touched = set(new_by_bucket) | set(parent_of)
        shard_writes = 0
        for b in sorted(touched):
            if parent_of is not None:
                prev = [] if b in drop else parent_of.get(b, [])
            elif b in drop:
                prev = []
            else:
                ref = manifests.get(str(b))
                prev = (
                    json.loads(
                        self.fs.read_text(os.path.join(self.root, ref))
                    )
                    if ref is not None
                    else []
                )
            entries = prev + new_by_bucket.get(b, [])
            if not entries:
                manifests.pop(str(b), None)
                continue
            relpath = f"_manifests/m-{uuid.uuid4().hex[:12]}-b{b:05d}.json"
            self.fs.write_text_excl(
                os.path.join(self.root, relpath), json.dumps(entries)
            )
            manifests[str(b)] = relpath
            shard_writes += 1
        self._last_commit_shard_writes = shard_writes  # test/ops introspection

        schemas = dict(parent.schemas)
        schema_id = parent.schema_id
        if schema_update is not None:
            schema_id = max(int(k) for k in schemas) + 1
            schemas[str(schema_id)] = schema_update.to_json()
        summary = json.loads(json.dumps(parent.summary))
        # per-COMMIT annotations never inherit: a summary is copied forward
        # wholesale, so without this strip every commit after a compaction
        # would still read as `compaction: true` — and the change-data-feed
        # (changes()) would silently skip every subsequent merge. Table-STATE
        # keys (buckets, watermarks, applied) do carry forward.
        for ephemeral in ("compaction", "purged_tombstones", "rebucket"):
            summary.pop(ephemeral, None)
        if summary_update:
            # work on a copy: a CommitConflict retry re-passes the caller's
            # dict, which the pops below would otherwise have emptied
            summary_update = dict(summary_update)
            wm = summary_update.pop("watermarks", None)
            if wm:
                # MONOTONE merge: high-watermarks never regress. A commit
                # retried against a newer parent (multi-writer race) re-merges
                # its summary against the interloper's — a plain overwrite
                # would let the loser's lower hwm roll back the winner's.
                wms = summary.setdefault("watermarks", {})
                for k, v in wm.items():
                    k, v = str(k), int(v)
                    if k not in wms or v > int(wms[k]):
                        wms[k] = v
            bid = summary_update.pop("batch_id", None)
            if bid:
                applied = summary.setdefault("applied", [])
                applied.append(bid)
                del applied[:-256]  # bounded history
                summary["batch_id"] = bid
            summary.update(summary_update)
        snap = Snapshot(
            version=self._next_version(parent.version),
            parent=parent.version,
            schema_id=schema_id,
            schemas=schemas,
            files=keep + new_files,
            summary=summary,
            manifests=manifests,
        )
        # version-claim loop: _next_version raced another writer to the same
        # number -> the O_EXCL create arbitrates; the loser re-probes upward.
        # (Whether the WINNER's snapshot then invalidates ours is decided at
        # publish time via the expected-parent check, not here.)
        while True:
            try:
                self._write_manifest(snap)
                break
            except FileExistsError:
                snap.version = self._next_version(snap.version)
        self._snap_cache[snap.version] = snap
        if crash_before_publish:
            raise RuntimeError("simulated crash between stage and publish")
        if publish:
            self._publish(snap.version, expected_parent=parent.version)
        return snap

    # ---------- convenience ----------
    def append(self, df: DataFrame, lsn_col=None, seq_col=None) -> Snapshot:
        """Bulk load rows (initial seed). Adds bucket + lineage columns."""
        meta = self.meta()
        snap = self.snapshot()
        key, nb = meta["key"], self.bucket_count(snap)
        out = df
        if LSN_COL not in out.columns:
            out = out.withColumn(
                LSN_COL, (lsn_col if lsn_col is not None else F.lit(0)).cast("bigint")
            )
        if SEQ_COL not in out.columns:
            out = out.withColumn(
                SEQ_COL, (seq_col if seq_col is not None else F.lit(0)).cast("bigint")
            )
        if DELETED_COL not in out.columns:
            out = out.withColumn(DELETED_COL, F.lit(False))
        out = out.withColumn(BUCKET_COL, bucket_expr(key, nb))
        # appends stack files per bucket, so key stats (min/max) are worth
        # their cost here: time/key-correlated loads then prune old files
        files = self.write_data_files(
            out, snap.schema_id, n_buckets=nb, key_stats=True
        )
        return self.commit(files, replace_buckets=None)
