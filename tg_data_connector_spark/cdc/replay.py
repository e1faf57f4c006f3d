"""Change-log replay driver: the engine's main loop.

Plays the role of the reference's JobContainer/TaskGroupContainer pipeline
(``JobContainer.java:95-186`` init -> split -> schedule -> post;
``TaskGroupContainer.java:92-298`` per-task reader->channel->writer threads) —
but where the reference hand-schedules threads around a bounded queue, here each
batch is ONE declarative DataFrame plan (parse -> quarantine -> dedup -> merge)
and Spark's scheduler owns parallelism. The reference's byte/record throttling
(``Channel.statPush`` ``Channel.java:176-239``) maps to ``events_per_batch``.

Exactly-once protocol (the part the reference lacks — its failover is allowed
only when the writer is idempotent, ``TigerGraphWriter.java:277-281``; here
idempotence is constructed):
  1. the snapshot summary carries per-part high-watermarks {part -> max offset
     applied} and the applied batch-id list;
  2. a batch's events are pre-filtered to ``offset > watermark[part]`` — replayed
     input after a crash contributes nothing;
  3. a batch whose batch_id is already in the summary is skipped entirely;
  4. MERGE itself is LWW-idempotent: re-applying the same deduped batch is a
     no-op on row values;
  5. commit is a single atomic pointer swap — a crash between staging files and
     publishing leaves the old snapshot current, and the re-run re-stages.
Any one of 2/3/4 alone gives exactly-once; they are layered defensively.

Schema-change events (`op='S'`) split a batch: events are applied in
(commit_lsn, seq_no) sub-batches around each schema change so no data event is
merged under the wrong schema (SURVEY §7 hard-part (b)).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..lake.evolve import apply_schema_change
from ..lake.merge import merge_upsert
from ..lake.table import LakeTable
from .dedup import lww_dedup, lww_dedup_arrow, lww_dedup_salted, winner_filter
from .parse import parse_events
from .quality import ErrorLimit

CORE_COLS = ["doc_id", "tokens", "n_tok", "source"]


@dataclass
class ReplayConfig:
    events_per_batch: int = 1_000_000
    # LWW dedup physical strategy:
    #   "winner" (default) — JVM-side two-phase: a narrow hash-aggregate finds
    #       each key's max (lsn, seq) version (decimal-packed so it stays in
    #       codegen'd HashAggregate), broadcast-joins back to prune losers
    #       BEFORE any shuffle, then one winners-only repartition + in-place
    #       dropDuplicates. The payload-wide shuffle shrinks ~|events|/|keys|x
    #       and Python sees ONLY the decode of winners (measured: the old
    #       full-batch Arrow kernel put 16 Python workers next to 16 JVM lanes
    #       — 2x host oversubscription that collapsed 16-lane scaling).
    #   "arrow"  — hash(doc_id) repartition of the FULL batch + vectorized
    #       Arrow kernel (avoids the SortAggregate fallback that var-width
    #       payloads force on max_by; use when winners ~ events so the winner
    #       prefilter would not pay for itself)
    #   "maxby"  — single groupBy().agg(max_by(...)) declarative aggregate
    #   "salted" — two-phase (key, salt) partial then key final; only for
    #       non-algebraic kernels where map-side partials can't absorb a hot
    #       key (see dedup.py module docstring)
    dedup_strategy: str = "winner"
    # Row-resolution semantics:
    #   "lww" (default) — whole-row last-writer-wins: the winning event's
    #       image replaces the row (the flagship north-rule contract).
    #   "partial" — PARTIAL-UPDATE streams (Mongo $set patches, Cassandra
    #       cell updates, Paimon's partial-update merge engine): a NULL
    #       column in a U after-image means "unchanged". Batch collapse runs
    #       ``cdc.dedup.partial_collapse`` (per-column latest-setter within
    #       the batch, D/I resets honored) and the COW MERGE coalesces per
    #       column against the target (lake/merge partial_update=True). The
    #       dirty contract relaxes accordingly (quality.dirty_predicate
    #       partial=True: U may omit the tokens/n_tok pair, only TOGETHER).
    #       Requires merge_mode="cow" (MoR's whole-row delta resolution
    #       cannot express per-column survival) and decoded events
    #       (parse_payload=False); dedup_strategy is ignored.
    #   "aggregate" — per-column AGGREGATE combiners (Paimon's aggregation
    #       merge engine): agg_spec maps payload columns to "sum" / "max" /
    #       "min" / "last" (default "last" = partial semantics). DELETE
    #       resets the accumulator; INSERT restarts it at its own image.
    #       Same cow/decoded requirements as "partial". Sum columns fold
    #       each event once across crash-replays (watermarks) and same-batch
    #       duplicates ((key, version) collapse); re-emissions at NEW offsets
    #       in later batches need upstream normalization (see
    #       lake/merge.merge_upsert docstring — Paimon's aggregation-engine
    #       caveat). last/max/min are value-idempotent throughout.
    resolution: str = "lww"
    # resolution="aggregate": payload column -> combiner name (see above).
    agg_spec: "dict | None" = None
    # Byte-based batch sizing — the reference's most-documented throttle is
    # bytes/s per channel (``Channel.java:176-239``, ``core.json``
    # ``speed.byte``). Batch replay has no wall-clock rate to shape, so the
    # byte knob maps to batch VOLUME: when set, events_per_batch is derived as
    # bytes_per_batch / mean event payload size (measured on a bounded sample
    # at replay start). events_per_batch then acts as a floor of 1.
    bytes_per_batch: int | None = None
    # winner strategy: broadcast the per-key winner versions (fastest wall
    # clock — losers are pruned map-side before ANY shuffle, at the cost of a
    # driver-side broadcast build that is FIXED time regardless of cluster
    # width) vs shuffle-join them (every byte of work parallelizes — the
    # better choice when winners-per-batch outgrow broadcast, and the purer
    # scaling shape). None (default) = AUTO: the stats prepass already scans
    # each batch, so it carries an approx_count_distinct(key) for free and the
    # engine flips to the shuffled-hash variant when the estimated winner set
    # exceeds ``broadcast_winners_max_keys``. True/False force one path.
    broadcast_winners: bool | None = None
    # auto-switch threshold: key-count at which a driver-built broadcast of
    # (key, packed-version) rows stops paying for itself (build + per-executor
    # transfer vs shuffling the FULL pre-dedup batch). SET FROM DATA (BENCH.md
    # round-4 A/B tables: interleaved forced-variant samples at the bench's
    # 2.7M-key batch shape, BOTH lane widths): at 4 lanes the variants tie
    # within host noise (best-of 80.3 s broadcast vs 81.1 s shuffle); at 16
    # lanes broadcast wins ~2.8x (clean samples 30.2/33.0 s vs shuffle's best
    # 86.0 s, adjacent in the same windows) — the all-shuffle variant moves
    # ~1.3 GB through shuffle storage per batch where broadcast moves ~80 MB
    # once, and wide concurrent shuffle I/O is exactly what contended hosts
    # punish. So broadcast stays the default THROUGH the measured 2.7M-key
    # regime (threshold 4M); beyond it the linear growth of the driver build
    # must eventually lose to the flat shuffle cost, and batches that large
    # are better served by lowering events_per_batch anyway.
    broadcast_winners_max_keys: int = 4_000_000
    # Physical MERGE strategy:
    #   "cow" (default) — copy-on-write: read + full-outer-join + rewrite every
    #       bucket the batch touches (lake/merge.merge_upsert). Best read-side
    #       plan (base files only, tombstone filter pushes to the scan), but
    #       with hash-distributed keys a CDC batch touches ~every bucket, so
    #       each commit rewrites O(table).
    #   "mor" — merge-on-read: the deduped batch appends as DELTA files
    #       (lake/merge.delta_append, O(batch) per commit, base never read);
    #       reads LWW-resolve base+delta (lake/table.resolve_lww) and
    #       compaction folds deltas down. The write-heavy half of the
    #       ingest-vs-scan trade — right when batches are frequent relative
    #       to reads (exactly the 10^10-event tail-ingest shape).
    merge_mode: str = "cow"
    # MOR auto-compaction: after a batch commit, if any bucket holds MORE than
    # this many delta files, run maintain.compact (folds every delta into the
    # base, one snapshot). None = compaction is the operator's job (scheduled
    # maintenance). Bounds read amplification at <= mor_compact_after deltas
    # per bucket between maintenance runs.
    mor_compact_after: int | None = None
    salted_dedup: bool = False  # back-compat alias for dedup_strategy="salted"
    salt_buckets: int = 16
    # Write-audit-publish (lake WAP surface): when set, every batch commits
    # STAGED (publish=False) and the hook runs with (table, staged_snapshot)
    # — read it via table.read(snapshot=staged) — returning True to publish
    # (atomic fast-forward) or False to reject. Rejection drops the staged
    # snapshot (files orphan for gc_orphans) and raises AuditRejected with
    # the watermark UNADVANCED, so a fixed-up re-run retries the exact same
    # batch: at-most-once application is preserved through the veto.
    wap_audit: "object | None" = None  # Callable[[LakeTable, Snapshot], bool]
    error_limit: ErrorLimit = field(default_factory=lambda: ErrorLimit(percentage=0.05))
    quarantine_dir: str | None = None
    parse_payload: bool = False  # input carries binary payload -> vectorized parse
    # Declarative data-quality EXPECTATIONS (the Delta Live Tables
    # CONSTRAINT ... EXPECT surface): named boolean SQL predicates evaluated
    # per EVENT, before LWW dedup, so dropping a violator commutes with
    # replay (the event never existed — no batch-boundary dependence).
    # Violation = predicate FALSE OR NULL (DLT rule; guard nullable columns
    # explicitly — e.g. delete events carry NULL n_tok, so a token bound
    # must read "op = 'D' OR n_tok <= k"). Contract-dirty rows and schema
    # events are exempt (they have their own paths). Cost: ONE narrow
    # column-pruned aggregate job per batch, only when expectations are set.
    expectations: "list[Expectation]" = field(default_factory=list)


@dataclass
class Expectation:
    """One named rule. action: "warn" (count only), "drop" (violators
    quarantine under <quarantine_dir>/_expectations and never reach the
    merge), "fail" (any violator aborts the batch pre-stage, watermark
    unadvanced — the re-run retries the same batch, AuditRejected-style)."""

    name: str
    predicate: str  # SQL boolean expression over event columns; True = pass
    action: str = "warn"

    def __post_init__(self):
        if self.action not in ("warn", "drop", "fail"):
            raise ValueError(f"unknown expectation action: {self.action!r}")


class ExpectationFailed(RuntimeError):
    """A fail-action expectation had violations; the batch was not applied."""


class AuditRejected(RuntimeError):
    """A ReplayConfig.wap_audit hook vetoed a staged batch. The staged
    snapshot was dropped and the watermark did not advance — re-running the
    replay (after fixing the input or the audit) retries the same batch."""


@dataclass
class BatchReport:
    batch_id: str
    events: int
    dirty: int
    deduped_keys: int
    seconds: float
    skipped: bool = False
    schema_changes: int = 0
    phases: dict = field(default_factory=dict)
    # per-expectation violation counts for this batch (name -> rows)
    expectations: dict = field(default_factory=dict)


class ReplayEngine:
    def __init__(self, spark: SparkSession, table: LakeTable, config: ReplayConfig):
        self.spark = spark
        self.table = table
        self.cfg = config
        if config.resolution not in ("lww", "partial", "aggregate"):
            raise ValueError(f"unknown resolution: {config.resolution!r}")
        self._partial = config.resolution in ("partial", "aggregate")
        self._agg_spec = (
            dict(config.agg_spec or {})
            if config.resolution == "aggregate"
            else {}
        )
        # with tokens or n_tok under an aggregate combiner, n_tok is an
        # independent accumulator — drop the tokens/n_tok pair contract
        self._pair_check = not any(
            self._agg_spec.get(c, "last") != "last"
            for c in ("tokens", "n_tok")
        )
        if config.resolution == "aggregate" and not self._agg_spec:
            raise ValueError(
                "resolution='aggregate' requires a non-empty agg_spec "
                "({column: 'sum'|'max'|'min'|'last'})"
            )
        if self._agg_spec:
            cols = {f[0] for f in table.snapshot().schema().fields}
            bad = set(self._agg_spec) - cols
            if bad:
                raise ValueError(
                    f"agg_spec names unknown columns: {sorted(bad)}"
                )
        meta_res = table.meta().get("resolution", "lww")
        if meta_res != "lww" and config.resolution != meta_res:
            # the table DECLARED a columnwise merge engine (its MoR deltas
            # are partial images every reader folds accordingly): a writer
            # with different semantics would corrupt it
            raise ValueError(
                f"table declares resolution={meta_res!r}; "
                f"config has {config.resolution!r}"
            )
        if self._partial and config.merge_mode != "cow":
            # MoR defers resolution to READERS, so the engine choice must be
            # a TABLE property (like Paimon's merge-engine option), not just
            # this writer's config — otherwise plain readers would fold
            # partial delta images with whole-row LWW
            if meta_res != config.resolution:
                raise ValueError(
                    "merge_mode='mor' with columnwise resolution requires "
                    "the table to declare it: LakeTable.create(..., "
                    f"resolution={config.resolution!r}"
                    + (", agg_spec=...)" if self._agg_spec else ")")
                )
            if (
                config.resolution == "aggregate"
                and dict(table.meta().get("agg_spec") or {}) != self._agg_spec
            ):
                raise ValueError(
                    "config agg_spec differs from the table's declared "
                    "agg_spec"
                )
        if self._partial and config.parse_payload:
            raise ValueError(
                "resolution='partial' requires decoded events "
                "(parse_payload=False): per-column set/unset is judged on "
                "the decoded after-image"
            )
        from .metrics import LineageLog

        self.lineage = LineageLog(table.root)
        # keys-per-event ratio learned EXACTLY from each applied batch
        # (deduped_keys / events — free, it is the winner count the merge
        # already reports). While set, the prepass skips the HLL sketch
        # entirely and estimates the winner set as ratio * batch_events;
        # a >2x drift between a cached prediction and the batch's actual
        # winner count drops the cache so the next prepass re-measures.
        self._key_ratio: float | None = None
        self._est_from_cache = False

    # ---------- watermark filtering ----------
    def _unapplied(self, changelog: DataFrame) -> DataFrame:
        """Filter to events beyond each part's high-watermark.

        The watermark map is tiny (one row per source partition), so it is
        inlined as a literal map-lookup EXPRESSION rather than joined: a
        broadcast hash join measured ~2x the whole scan's cost here (extra
        probe + codegen boundary per row), while `element_at(map<lit>, part)`
        stays inside the scan's whole-stage-codegen. At a realistic part count
        (even thousands) the literal map is still bytes-sized in the plan."""
        wm = self.table.snapshot().watermarks()
        if not wm:
            return changelog
        m = F.create_map(
            *[x for k, v in wm.items() for x in (F.lit(int(k)), F.lit(int(v)))]
        )
        hwm = F.element_at(m, F.col("part"))
        return changelog.where(hwm.isNull() | (F.col("offset") > hwm))

    def _offset_bounds(self, changelog: DataFrame) -> tuple[int, int]:
        row = changelog.agg(
            F.min("offset").alias("lo"), F.max("offset").alias("hi")
        ).collect()[0]
        return (row["lo"], row["hi"]) if row["lo"] is not None else (0, -1)

    # ---------- batch stats ----------
    def _batch_stats(self, batch: DataFrame, with_sketch: bool = True) -> list:
        """Single-pass per-part stats for one batch: high-watermark, event
        count, version bounds, and the set of target buckets touched (feeds
        the merge so it never runs a separate probe job over the dedup plan).

        Deliberately PAYLOAD-FREE: dirty counting needs octet_length(payload),
        which would force this scan to read the whole payload column; dirty
        counts instead ride the merge job itself as observe() metrics (see
        apply_batch) and the error limit is asserted post-write, pre-publish —
        the reference's own end-of-transfer checkLimit semantics. The bucket
        set here includes dirty rows' buckets: a superset is safe (extra
        buckets are read and rewritten unchanged)."""
        from ..lake.table import bucket_expr

        # One groupBy(part) scan carrying a mergeable DataSketches HLL per
        # part, then a TINY second job unions the sketches into the
        # batch-global distinct-key count that feeds the broadcast-vs-shuffle
        # winner-join auto-switch. Summing per-part distincts would OVERCOUNT
        # keys spanning parts (~16x on a 16-part log); the previous fix —
        # GROUPING SETS ((part), ()) — got exactness by EXPANDING every input
        # row 2x through the aggregate pipeline, which measured 1.9x the
        # whole prepass cost (tools/bench_prepass.py: 6.2 s vs 4.4 s for this
        # shape vs 3.3 s with no estimate at all). The persist holds only the
        # per-part agg rows (bounded: one per source partition).
        aggs = [
            F.max("offset").alias("hwm"),
            F.count("*").alias("n"),
            F.collect_set(
                bucket_expr("doc_id", self.table.bucket_count())
            ).alias("bks"),
            F.max("commit_lsn").alias("vl"),
            F.max("seq_no").alias("vs"),
        ]
        if not with_sketch:
            # a cached key ratio replaces the sketch (apply_batch derives
            # the estimate from events * ratio) — one collect, no persist
            return list(batch.groupBy("part").agg(*aggs).collect())
        base = batch.groupBy("part").agg(
            *aggs,
            F.hll_sketch_agg("doc_id").alias("_hsk"),
        ).persist()
        try:
            rows = base.drop("_hsk").collect()
            if not rows:
                return []
            tot = base.agg(
                F.hll_sketch_estimate(F.hll_union_agg("_hsk")).alias("k")
            ).collect()
        finally:
            base.unpersist()
        return list(rows) + [
            {"part": None, "k": tot[0]["k"] if tot else None}
        ]

    # ---------- one batch ----------
    def apply_batch(
        self,
        batch: DataFrame,
        batch_id: str,
        crash_before_publish: bool = False,
        crash_after_stage: bool = False,
        run_id: str = "adhoc",
        stats: list | None = None,
        observe_metrics: bool = True,
    ) -> BatchReport:
        t0 = time.time()
        snap = self.table.snapshot()
        if batch_id in snap.applied_batches():
            return BatchReport(batch_id, 0, 0, 0, time.time() - t0, skipped=True)

        # The batch stays in its RAW form (binary payload) until after LWW
        # dedup: stats + quarantine judge the payload by byte length (pure JVM),
        # and only the one winning event per key is ever decoded in Python —
        # see parse.py. The batch is deliberately NOT persisted: its consumers
        # (stats, dedup, optional quarantine) each re-run a pushdown-pruned
        # columnar scan, which measures far cheaper than materializing millions
        # of per-row cache objects (cache population burned ~40x the scan cost
        # at 2.75M events/batch — BENCH notes in BASELINE.md).
        t_stats = time.time()
        if stats is None:
            stats = self._batch_stats(
                batch, with_sketch=self._key_ratio is None
            )
        # the grouping-sets total row (part IS NULL) carries the batch-global
        # distinct-key estimate; everything positional below uses the real
        # per-part rows
        totals = [r for r in stats if r["part"] is None]
        stats = [r for r in stats if r["part"] is not None]
        watermarks = {int(r["part"]): int(r["hwm"]) for r in stats}
        events_n = sum(r["n"] for r in stats)
        affected_buckets = sorted({b for r in stats for b in r["bks"] if b is not None})
        # exact version bounds for the batch: unlock the bigint version-pack
        # fast path in winner_filter (vs the decimal fallback)
        vls = [r["vl"] for r in stats if r["vl"] is not None]
        vss = [r["vs"] for r in stats if r["vs"] is not None]
        self._version_bounds = (
            (int(max(vls)), int(max(vss))) if vls and vss else (None, None)
        )
        # winner-set estimate for the broadcast auto-switch: the batch-global
        # HLL count when the stats carry the total row; summing per-part
        # distincts is only a (grossly over-counting) fallback for stats
        # supplied by a pre-grouping-sets caller
        self._est_from_cache = False
        try:
            if totals:
                self._est_keys = int(totals[0]["k"])
                self._est_from_cache = bool(
                    isinstance(totals[0], dict) and totals[0].get("cached")
                )
            elif self._key_ratio is not None:
                # prepass ran sketch-free on the cached ratio
                self._est_keys = int(self._key_ratio * events_n)
                self._est_from_cache = True
            else:
                self._est_keys = sum(int(r["k"]) for r in stats)
        except (ValueError, KeyError, TypeError):
            self._est_keys = None  # stats from a pre-k caller
        self._phase_timings = {"stats": round(time.time() - t_stats, 3)}

        self._winners_exact = 0
        self._winners_exact_ok = True
        report, dirty_by_part = self._apply_batch_inner(
            batch, batch_id, t0, events_n, watermarks,
            affected_buckets, crash_before_publish, crash_after_stage,
            observe_metrics,
        )
        report.phases = dict(self._phase_timings)
        # learn the EXACT keys-per-event ratio from the applied batch (the
        # observe() winner count above — free); a cached prediction that
        # drifted >2x in either direction means the stream's dup structure
        # shifted — drop the cache so the next prepass measures again
        # instead of compounding the error
        if (
            events_n > 0
            and self._winners_exact_ok
            and self._winners_exact > 0
        ):
            pred = self._est_keys
            if (
                self._est_from_cache
                and pred
                and not (0.5 <= pred / self._winners_exact <= 2.0)
            ):
                self._key_ratio = None
            else:
                self._key_ratio = self._winners_exact / events_n
        per_part = {
            int(r["part"]): {
                "hwm": r["hwm"],
                "events": r["n"],
                "dirty": dirty_by_part.get(int(r["part"]), 0),
            }
            for r in stats
        }
        self.lineage.record_batch(
            run_id, batch_id, per_part, self.table.current_version(),
            report.seconds,
        )
        return report

    def _apply_expectations(
        self, batch: DataFrame, dirty_pred, batch_id: str
    ) -> tuple[DataFrame, dict]:
        """Evaluate ReplayConfig.expectations on one batch. Returns the
        (possibly drop-filtered) batch plus per-rule violation counts.

        Scope: data events only — schema events and contract-dirty rows are
        exempt (each has its own path). Violation = predicate FALSE or NULL.
        Counting is ONE narrow aggregate job; Catalyst prunes the scan to the
        columns the predicates reference. fail-action rules abort BEFORE any
        staging/quarantine side effect, so the retry replays a pristine batch.
        """
        import functools

        exps = self.cfg.expectations
        exempt = F.col("op").eqNullSafe(F.lit("S")) | dirty_pred
        viols = [
            ~exempt & ~F.coalesce(F.expr(e.predicate), F.lit(False))
            for e in exps
        ]
        row = batch.agg(
            *[F.sum(v.cast("long")).alias(f"e{i}") for i, v in enumerate(viols)]
        ).collect()[0]
        counts = {e.name: int(row[f"e{i}"] or 0) for i, e in enumerate(exps)}
        for e in exps:
            if e.action == "fail" and counts[e.name] > 0:
                raise ExpectationFailed(
                    f"expectation {e.name!r}: {counts[e.name]} violating "
                    f"events in batch {batch_id}; batch not applied"
                )
        droppable = [
            (e, v) for e, v in zip(exps, viols) if e.action == "drop"
        ]
        if droppable and any(counts[e.name] for e, _ in droppable):
            drop_pred = functools.reduce(lambda a, b: a | b, (v for _, v in droppable))
            if self.cfg.quarantine_dir:
                # underscore-prefixed subdir: invisible to a parquet read of
                # quarantine_dir itself (hidden-path convention), explicit
                # reads of .../_expectations see the rule-tagged rows
                rules = F.array_compact(
                    F.array(*[F.when(v, F.lit(e.name)) for e, v in droppable])
                )
                batch.where(drop_pred).withColumn("_rules", rules).withColumn(
                    "_batch_id", F.lit(batch_id)
                ).write.mode("append").parquet(
                    self.cfg.quarantine_dir + "/_expectations"
                )
            batch = batch.where(~drop_pred)
        return batch, counts

    def _apply_batch_inner(
        self,
        batch: DataFrame,
        batch_id: str,
        t0: float,
        events_n: int,
        watermarks: dict,
        affected_buckets: list[int],
        crash_before_publish: bool,
        crash_after_stage: bool,
        observe_metrics: bool = True,
    ) -> tuple[BatchReport, dict]:
        from .quality import contract_predicate

        pred = contract_predicate(batch, partial=self._partial, pair_check=self._pair_check)
        exp_counts: dict[str, int] = {}
        if self.cfg.expectations:
            # before the dirty-quarantine write: a fail-action abort must not
            # have appended this batch's dirty rows yet (the retry would
            # duplicate them in the quarantine dir)
            batch, exp_counts = self._apply_expectations(batch, pred, batch_id)
        clean = batch.where(~pred)
        if self.cfg.quarantine_dir:
            batch.where(pred).withColumn(
                "_batch_id", F.lit(batch_id)
            ).write.mode("append").parquet(self.cfg.quarantine_dir)

        # schema-change events order sub-batches; they are few -> driver-side list
        schema_events = []
        if "schema_change" in clean.columns:
            schema_events = (
                clean.where(F.col("op") == "S")
                .select("commit_lsn", "seq_no", "schema_change")
                .collect()
            )
            schema_events.sort(key=lambda r: (r["commit_lsn"], r["seq_no"]))
            batch = batch.where(F.col("op") != "S")
            pred = contract_predicate(batch, partial=self._partial, pair_check=self._pair_check)

        deduped_total = 0
        dirty_n = 0
        dirty_by_part: dict[int, int] = {}
        parts = sorted(watermarks)
        bounds = [(r["commit_lsn"], r["seq_no"]) for r in schema_events]
        for k in range(len(bounds) + 1):
            sub = batch
            if k > 0:
                # INCLUSIVE lower / exclusive upper: a data event that shares a
                # schema event's exact (commit_lsn, seq_no) — contract-unusual
                # but possible from a coarse-versioned source — falls in the
                # window AFTER that schema change and is applied exactly once.
                # (Strict bounds on both sides would silently drop it.)
                lsn, seq = bounds[k - 1]
                sub = sub.where(
                    F.struct(F.col("commit_lsn"), F.col("seq_no"))
                    >= F.struct(F.lit(lsn).cast("bigint"), F.lit(seq).cast("bigint"))
                )
            if k < len(bounds):
                lsn, seq = bounds[k]
                sub = sub.where(
                    F.struct(F.col("commit_lsn"), F.col("seq_no"))
                    < F.struct(F.lit(lsn).cast("bigint"), F.lit(seq).cast("bigint"))
                )
            applied, dstats = self._merge_sub_batch(
                sub,
                dirty_pred=contract_predicate(sub, partial=self._partial, pair_check=self._pair_check),
                parts=parts,
                events_n=events_n,
                prior_dirty=dirty_n,
                observe_metrics=observe_metrics,
                batch_id=f"{batch_id}/{k}" if bounds else batch_id,
                watermarks=watermarks if k == len(bounds) else None,
                final=(k == len(bounds)),
                affected_buckets=affected_buckets,
                crash_before_publish=crash_before_publish,
                crash_after_stage=crash_after_stage,
            )
            deduped_total += applied
            dirty_n += dstats.pop("_total", 0)
            for p, v in dstats.items():
                dirty_by_part[p] = dirty_by_part.get(p, 0) + v
            if k < len(bounds):
                apply_schema_change(self.table, schema_events[k]["schema_change"])

        # all-dirty / empty-merge edge: no write job ran, so the observe
        # metrics never fired — assert the limit with a dedicated narrow count
        if deduped_total == 0 and events_n > 0 and dirty_n == 0:
            dirty_n = batch.where(pred).count()
            self.cfg.error_limit.check(dirty_n, max(events_n, 1))

        return (
            BatchReport(
                batch_id,
                events_n,
                dirty_n,
                deduped_total,
                time.time() - t0,
                schema_changes=len(bounds),
                expectations=exp_counts,
            ),
            dirty_by_part,
        )

    def _merge_sub_batch(
        self,
        sub: DataFrame,
        dirty_pred,
        parts: list[int],
        events_n: int,
        prior_dirty: int,
        observe_metrics: bool,
        batch_id: str,
        watermarks: dict | None,
        final: bool,
        affected_buckets: list[int] | None,
        crash_before_publish: bool,
        crash_after_stage: bool,
    ) -> tuple[int, dict]:
        """Returns (applied 0/1, dirty stats {part -> n, "_total": n}).

        ``sub`` arrives UNFILTERED (dirty rows included): the quarantine split
        happens here so the dirty counts can ride the merge job itself as
        observe() metrics on the kept-scan — the one pass that reads the
        payload anyway — instead of a dedicated full-payload scan per batch.
        The error limit is asserted post-write/pre-publish via the merge's
        hook: on violation the staged files orphan and the table is untouched.
        """
        from pyspark.sql import Observation

        snap = self.table.snapshot()
        schema = snap.schema()
        cols = schema.names()
        # rename-lag map: old column name -> current name, from the table's
        # per-version rename log. An upstream that still emits the pre-rename
        # field keeps applying cleanly — the reference's column-mapping
        # config semantics (SnowflakeReader `column`, SURVEY §2.3).
        from ..lake.table import historical_names

        alias_of: dict[str, str] = {}
        for c in cols:
            for a in historical_names(c, snap.schema_id, snap.schemas)[1:]:
                alias_of.setdefault(a, c)
        raw_mode = "tokens" not in sub.columns and "payload" in sub.columns

        obs = None
        static_dirty: dict = {}
        if observe_metrics:
            aggs = [F.sum(dirty_pred.cast("long")).alias("nd")]
            track_parts = (
                parts if len(parts) <= 64 and "part" in sub.columns else []
            )
            aggs += [
                F.sum((dirty_pred & (F.col("part") == p)).cast("long")).alias(
                    f"nd_{p}"
                )
                for p in track_parts
            ]
            obs = Observation()
            # the observe node goes on the KEPT branch only; the winners-
            # aggregate branch gets an observe-free twin of the same filter,
            # so the metric node executes exactly once per write job (no
            # double counting)
            clean_kept = sub.observe(obs, *aggs).where(~dirty_pred)
            clean_agg = sub.where(~dirty_pred)
        else:
            # foreachBatch micro-batches: Observation's listener handshake
            # deadlocks inside the streaming clone session (verified), so the
            # dirty counts take a dedicated narrow action up front instead
            if "part" in sub.columns:
                rows = (
                    sub.where(dirty_pred)
                    .groupBy("part")
                    .agg(F.count("*").alias("nd"))
                    .collect()
                )
                static_dirty = {
                    f"nd_{int(r['part'])}": int(r["nd"]) for r in rows
                }
                static_dirty["nd"] = sum(int(r["nd"]) for r in rows)
            else:
                static_dirty = {"nd": sub.where(dirty_pred).count()}
            self.cfg.error_limit.check(
                prior_dirty + static_dirty["nd"], max(events_n, 1)
            )
            clean_kept = clean_agg = sub.where(~dirty_pred)

        # Dedup FIRST, on the narrowest projection that can still reconstruct
        # the row: key + version + op + whichever payload-bearing columns exist.
        # The shuffle then carries one binary cell per event instead of a
        # materialized token array, and the Python decode below runs on the
        # ~|keys| winners, not the |events| input.
        want = set(cols) | set(alias_of) | {"extra", "payload"}
        carry = [c for c in sub.columns if c in want and c != "doc_id"]

        def project(frame):
            return frame.select(
                "doc_id",
                F.col("op"),
                F.col("commit_lsn").cast("bigint").alias("commit_lsn"),
                F.col("seq_no").cast("bigint").alias("seq_no"),
                *carry,
            )

        src = project(clean_kept)
        src_agg = project(clean_agg)
        strategy = "salted" if self.cfg.salted_dedup else self.cfg.dedup_strategy
        nb = self.table.bucket_count()
        if self._partial:
            # partial-update streams: NO winner prune — losing events still
            # carry column values the collapse must see. One hash(key)
            # exchange into the table's bucket layout (reused by the MERGE
            # join and the bucket-aligned write), one sorted window pass.
            from .dedup import aggregate_collapse

            if raw_mode or "extra" in src.columns:
                raise ValueError(
                    "resolution='partial' supports directly-decoded event "
                    "columns only (no binary payload / semi-structured "
                    "'extra' map)"
                )
            if self.cfg.merge_mode == "mor":
                # RAW-EVENT deltas. The batch collapse embeds older setters'
                # values at the winner's version, which is only sound when
                # batch version-ranges never interleave (the batch driver's
                # LSN-ordered offset windows guarantee that; a streaming
                # tail's FILE-split micro-batches do NOT). MoR needs no
                # write-time collapse for correctness — the read fold IS the
                # collapse over the whole reconstructed stream
                # (lake/table.resolve_columnwise) — so each event appends as
                # its own delta row, I events marked as restarts at their
                # own version, and resolution is exact under ANY delivery
                # order. One hash(key) exchange; the exact-duplicate drop
                # extends the partition key, so it aggregates in place.
                deduped = (
                    src.repartition(nb, F.col("doc_id"))
                    .dropDuplicates(["doc_id", "commit_lsn", "seq_no"])
                    .withColumn(
                        "_rv_lsn",
                        F.when(
                            F.col("op") == "I", F.col("commit_lsn")
                        ).cast("bigint"),
                    )
                    .withColumn(
                        "_rv_seq",
                        F.when(F.col("op") == "I", F.col("seq_no")).cast(
                            "bigint"
                        ),
                    )
                )
            else:
                deduped = aggregate_collapse(
                    src,
                    "doc_id",
                    agg_spec=self._agg_spec or None,
                    payload_cols=[
                        c
                        for c in src.columns
                        if c not in ("doc_id", "op", "commit_lsn", "seq_no")
                    ],
                    num_partitions=nb,
                )
        elif strategy == "salted":
            deduped = lww_dedup_salted(src, "doc_id", self.cfg.salt_buckets)
        elif strategy == "maxby":
            deduped = lww_dedup(src, "doc_id")
        elif strategy == "winner":
            # JVM-side winner prune (no Python, no payload-wide shuffle), then
            # one winners-only repartition to the table bucket count. Decode
            # runs BEFORE that exchange, map-side: ArrowEvalPython erases the
            # partitioning a node reports (verified via explain — placing it
            # after the repartition re-inserts an ENSURE_REQUIREMENTS exchange
            # ahead of the MERGE join), while placed here it rides the same
            # stage as the scan+filter and Python still sees only winners.
            # The dropDuplicates collapses exact duplicate deliveries of a
            # winning event (identical payloads by contract); its grouping key
            # matches the repartition, so the aggregate runs IN PLACE and the
            # HashPartitioning(doc_id, nb) survives through it and the final
            # projections: the MERGE join and the bucket-aligned write add NO
            # further exchange — ONE winners-sized shuffle end-to-end.
            lm, sm = getattr(self, "_version_bounds", (None, None))
            use_broadcast = self.cfg.broadcast_winners
            if use_broadcast is None:
                # AUTO: broadcast only while the estimated winner set is small
                # enough that the driver-side build beats an extra shuffled-
                # hash stage; unknown estimate -> broadcast (small-batch path)
                est = getattr(self, "_est_keys", None)
                use_broadcast = (
                    est is None or est <= self.cfg.broadcast_winners_max_keys
                )
            self._last_winner_join = "broadcast" if use_broadcast else "shuffle"

            def decode_proj(frame):
                from .parse import decode_tokens

                pos = frame.columns.index("payload")
                return frame.select(
                    *[
                        decode_tokens(F.col("payload")).alias("tokens")
                        if i == pos
                        else F.col(c)
                        for i, c in enumerate(frame.columns)
                    ]
                )

            if use_broadcast:
                kept = winner_filter(
                    src, "doc_id", lsn_max=lm, seq_max=sm, winners_from=src_agg
                )
                if raw_mode:
                    kept = decode_proj(kept)
                    raw_mode = False
                deduped = kept.repartition(nb, F.col("doc_id")).dropDuplicates(
                    ["doc_id"]
                )
            else:
                # all-shuffle variant: one hash(key) exchange of the full
                # batch (the explicit north-rule shuffle), winners joined
                # shuffled-hash in place, dedup agg in place, decode after —
                # no driver-side fixed cost anywhere in the pipeline
                parted = src.repartition(nb, F.col("doc_id"))
                kept = winner_filter(
                    parted, "doc_id", broadcast_winners=False,
                    lsn_max=lm, seq_max=sm, winners_from=src_agg,
                )
                deduped = kept.dropDuplicates(["doc_id"])
                if raw_mode:
                    deduped = decode_proj(deduped)
                    raw_mode = False
        else:
            # partition count = table bucket count: this one shuffle feeds the
            # kernel, the MERGE join, AND the per-bucket file write (see
            # lake/table.py bucket_expr)
            deduped = lww_dedup_arrow(src, "doc_id", num_partitions=nb)
        if raw_mode:
            deduped = parse_events(deduped)
        # project up to the live table schema: evolved columns arrive either
        # directly, via the semi-structured after-image map, or null-filled
        out_cols = []
        rev_aliases: dict[str, list[str]] = {}
        for old, new in alias_of.items():
            rev_aliases.setdefault(new, []).append(old)
        for c in cols:
            candidates = [c, *rev_aliases.get(c, [])]  # current name first
            hit = next((n for n in candidates if n in deduped.columns), None)
            typ = dict(schema.fields)[c]
            if hit is not None:
                out_cols.append(F.col(hit).cast(typ).alias(c))
            elif "extra" in deduped.columns:
                # the after-image map may also use a pre-rename field name
                out_cols.append(
                    F.coalesce(
                        *[
                            F.try_element_at(F.col("extra"), F.lit(n)).try_cast(typ)
                            for n in candidates
                        ]
                    ).alias(c)
                )
            else:
                out_cols.append(F.lit(None).cast(typ).alias(c))
        deduped = deduped.select(
            *out_cols,
            "op",
            "commit_lsn",
            "seq_no",
            *(["_rv_lsn", "_rv_seq"] if self._partial else []),
        )
        wobs = None
        if observe_metrics:
            # exact winner count riding the SAME write job (observe node on
            # the collapsed changeset — no extra action). Feeds the key-ratio
            # cache that lets later prepasses skip the HLL sketch. Skipped in
            # streaming mode with the dirty observation (same deadlock).
            from pyspark.sql import Observation

            wobs = Observation()
            deduped = deduped.observe(
                wobs, F.count(F.lit(1)).alias("nw")
            )
        metrics = {"events": events_n}
        summary = {"batch_id": batch_id, "metrics": metrics} if final else {
            "batch_id": batch_id
        }
        if final and watermarks is not None:
            summary["watermarks"] = watermarks
        holder: dict = {}

        def pre_publish():
            # runs after the write job, before the snapshot publishes: the
            # observe metrics are final here
            if wobs is not None:
                # persist the batch's exact winner count in the snapshot
                # metrics: a FRESH engine resuming this table restores the
                # keys-per-event ratio from it and skips the sketch on its
                # very first prepass (replay() cache seeding)
                try:
                    metrics["winners"] = int(dict(wobs.get).get("nw") or 0)
                except Exception:
                    pass
            if obs is None:
                holder.update(static_dirty)
                metrics["dirty"] = static_dirty.get("nd", 0)
                return  # limit already asserted up front in this mode
            try:
                got = dict(obs.get)
            except Exception:
                # the observe node never materialized: when EVERY row of the
                # batch is dirty (e.g. a no-fix quarantine requeue) the
                # kept-branch subtree collapses to an empty relation and the
                # write job runs without it — Observation.get then fails
                # JVM-side. Fall back to one narrow dirty count (the batch is
                # fully dirty in exactly the case this triggers, so the scan
                # is the quarantine path's own cost, not a second data pass).
                got = {}
            if got.get("nd") is None:
                if "part" in sub.columns:
                    rows = (
                        sub.where(dirty_pred)
                        .groupBy("part")
                        .agg(F.count("*").alias("nd"))
                        .collect()
                    )
                    got = {f"nd_{int(r['part'])}": int(r["nd"]) for r in rows}
                    got["nd"] = sum(int(r["nd"]) for r in rows)
                else:
                    got = {"nd": sub.where(dirty_pred).count()}
            holder.update(got)
            nd = int(got.get("nd") or 0)
            metrics["dirty"] = nd
            self.cfg.error_limit.check(prior_dirty + nd, max(events_n, 1))

        wap = self.cfg.wap_audit is not None
        v_before = self.table.current_version()
        if self.cfg.merge_mode == "mor":
            from ..lake.merge import delta_append

            snap = delta_append(
                self.table,
                deduped,
                summary_update=summary,
                affected_buckets=affected_buckets,
                bucket_aligned=True,
                crash_before_publish=crash_before_publish and final,
                crash_after_stage=crash_after_stage and final,
                timings=getattr(self, "_phase_timings", None),
                pre_publish_check=pre_publish,
                publish=not wap,
            )
        else:
            snap = merge_upsert(
                self.table,
                deduped,
                summary_update=summary,
                affected_buckets=affected_buckets,
                crash_before_publish=crash_before_publish and final,
                crash_after_stage=crash_after_stage and final,
                timings=getattr(self, "_phase_timings", None),
                pre_publish_check=pre_publish,
                publish=not wap,
                partial_update=self._partial,
                agg_spec=self._agg_spec or None,
            )
        # write-audit-publish gate. A merge that found the batch already
        # applied returns the CURRENT snapshot (version == pointer) — nothing
        # staged, nothing to audit.
        if (
            snap is not None
            and wap
            and snap.version != self.table.current_version()
        ):
            if self.cfg.wap_audit(self.table, snap):
                self.table.publish_staged(snap.version)
            else:
                self.table.drop_staged(snap.version)
                raise AuditRejected(f"batch {batch_id} vetoed by wap_audit")
        if (
            self.cfg.merge_mode == "mor"
            and snap is not None
            and final
            and self.cfg.mor_compact_after
        ):
            from ..lake.maintain import compact, delta_depths

            # INCREMENTAL: fold only the buckets whose delta depth
            # crossed the threshold — O(selected buckets), not O(table);
            # the snapshot's file list is in memory, so the pick is free.
            # Runs AFTER the WAP gate: compaction rewrites only PUBLISHED
            # state (a vetoed batch must not get folded into the base).
            over = [
                b
                for b, d in delta_depths(snap).items()
                if d > self.cfg.mor_compact_after
            ]
            if over:
                t_c = time.time()
                compact(self.table, buckets=sorted(over))
                self._phase_timings["compact"] = round(time.time() - t_c, 3)
        if snap is None and final and watermarks is not None:
            # nothing to merge but the watermark still advances (all-dirty or
            # empty range): commit a data-less snapshot carrying it
            self.table.commit([], replace_buckets=None, summary_update=summary)
        if not holder and obs is None:
            holder.update(static_dirty)  # merge never ran (empty/all-dirty)
        dstats: dict = {}
        if holder:
            dstats["_total"] = int(holder.get("nd") or 0)
            for key, v in holder.items():
                if key.startswith("nd_"):
                    dstats[int(key[3:])] = int(v or 0)
        if snap is None:
            return (0, dstats)
        winners = 1  # applied, exact count unavailable
        if wobs is not None and snap.version != v_before:
            # the write job ran (version moved / staged) -> the observation
            # fired; never read it otherwise (get would block forever on an
            # already-applied short-circuit that skipped the action)
            try:
                winners = max(int(dict(wobs.get).get("nw") or 0), 1)
                self._winners_exact = (
                    getattr(self, "_winners_exact", 0) + winners
                )
            except Exception:
                self._winners_exact_ok = False
        elif self.cfg.merge_mode == "mor" and snap.version != v_before:
            # streaming path (Observation disabled): a MoR commit's OWN
            # delta files carry exact row counts in the manifest — the same
            # winner count, free. Keeps the ratio cache learning (and the
            # sketch skipped) under foreachBatch micro-batches too.
            try:
                prev = {
                    f["path"] for f in self.table.snapshot(v_before).files
                }
                nw = sum(
                    int(f.get("rows") or 0)
                    for f in snap.files
                    if f["path"] not in prev
                )
                if nw > 0:
                    winners = nw
                    self._winners_exact = (
                        getattr(self, "_winners_exact", 0) + nw
                    )
                else:
                    self._winners_exact_ok = False
            except Exception:
                self._winners_exact_ok = False
        else:
            self._winners_exact_ok = False
        return (winners, dstats)

    # ---------- full replay ----------
    def replay(
        self,
        changelog: DataFrame,
        run_id: str = "run",
        max_batches: int | None = None,
        crash_before_publish_at: int | None = None,
        crash_after_stage_at: int | None = None,
        bounds: tuple[int, int, int] | None = None,
    ) -> list[BatchReport]:
        """Apply the whole (remaining) changelog in offset-window batches.
        Resumable: re-invoking after a crash continues from the snapshot's
        watermarks. Batch ids are deterministic -> replays are idempotent.

        ``bounds``: optional (n_parts, lo_offset, hi_offset). A real change-log
        tail knows its offset range from the source (binlog/WAL positions)
        without scanning; callers that do (generators, staged benchmarks) pass
        it to skip the planning scan. None -> derived with one aggregate scan.
        """
        if self._key_ratio is None:
            # resume seeding: the last replay commit recorded its exact
            # winner/event counts in the snapshot metrics — a fresh engine
            # (crash/resume, next scheduled run) restores the ratio and
            # skips the sketch from its very first prepass
            m = (self.table.snapshot().summary or {}).get("metrics") or {}
            try:
                if int(m.get("winners") or 0) > 0 and int(m.get("events") or 0) > 0:
                    self._key_ratio = int(m["winners"]) / int(m["events"])
            except (TypeError, ValueError):
                pass
        remaining = self._unapplied(changelog)
        if bounds is not None:
            n_parts, lo, hi = bounds
            if hi < lo:
                return []
        else:
            # one planning scan: partition count + offset bounds together
            row = remaining.agg(
                F.max("part").alias("p"),
                F.min("offset").alias("lo"),
                F.max("offset").alias("hi"),
            ).collect()[0]
            if row["lo"] is None:
                return []
            n_parts, lo, hi = int(row["p"]) + 1, int(row["lo"]), int(row["hi"])
        reports: list[BatchReport] = []
        events_per_batch = self.cfg.events_per_batch
        if self.cfg.bytes_per_batch is not None:
            sample = remaining.limit(10_000)
            size_col = (
                F.octet_length(F.col("payload"))
                if "payload" in remaining.columns
                else F.size(F.col("tokens")) * 4
            )
            avg = (
                sample.agg(F.avg(F.coalesce(size_col, F.lit(0))).alias("a"))
                .collect()[0]["a"]
            )
            if avg and avg > 0:
                events_per_batch = max(1, int(self.cfg.bytes_per_batch / avg))
        per_part = max(1, events_per_batch // n_parts)

        # prepass: the per-batch stats for EVERY offset window in one job —
        # one NARROW scan of the remaining log instead of one scan per batch.
        # Payload-free by design (see _batch_stats): reading the payload
        # column here just to pre-count dirty records measured ~25 CPU-s per
        # 16.8M events; dirty counts ride the merge jobs as observe metrics.
        from ..lake.table import bucket_expr

        t_pre = time.time()
        win = F.floor((F.col("offset") - F.lit(lo)) / F.lit(per_part)).cast("int")
        # Per-(window, part) rows for watermarks/lineage carry a mergeable
        # DataSketches HLL each; a second TINY job (input: the persisted agg
        # rows, one per window x part) unions them into the per-window global
        # key estimate for the winner-join auto-switch. A per-part SUM
        # over-counts keys spanning parts (~16x); the previous exact fix,
        # GROUPING SETS ((w,part),(w)), expanded every input row 2x through
        # the aggregate pipeline and measured 1.9x this shape's cost
        # (tools/bench_prepass.py; it was ~14% of clean replay wall).
        aggs = [
            F.max("offset").alias("hwm"),
            F.count("*").alias("n"),
            F.collect_set(
                bucket_expr("doc_id", self.table.bucket_count())
            ).alias("bks"),
            F.max("commit_lsn").alias("vl"),
            F.max("seq_no").alias("vs"),
        ]
        use_cached = self._key_ratio is not None
        if use_cached:
            # the engine already measured this stream's keys-per-event ratio
            # exactly (observe() winner counts): sketch-free prepass, single
            # collect; the per-window estimate is ratio * window_events below
            pre = list(
                remaining.groupBy(win.alias("w"), F.col("part"))
                .agg(*aggs)
                .collect()
            )
            totals = []
        else:
            # full mergeable sketch per (window, part) + tiny union job.
            # A 1/32 hash-slice SAMPLED sketch was A/B'd here and is a wash
            # (tools/bench_prepass.py round 5: sampled 3.08 s vs full 2.96 s
            # vs no-estimate 2.28 s at 4 lanes / 31.5M events — the gating
            # xxhash64+branch costs per row what the skipped sketch updates
            # save), so the simple full sketch ships. The cached-ratio
            # branch above is the real saving: this path only runs until
            # the first batch lands.
            base = (
                remaining.groupBy(win.alias("w"), F.col("part"))
                .agg(
                    *aggs,
                    F.hll_sketch_agg("doc_id").alias("_hsk"),
                )
                .persist()
            )
            try:
                pre = base.drop("_hsk").collect()
                totals = base.groupBy("w").agg(
                    F.hll_sketch_estimate(F.hll_union_agg("_hsk")).alias("k")
                ).collect()
            finally:
                base.unpersist()
        stats_by_window: dict[int, list] = {}
        for r in pre:
            stats_by_window.setdefault(int(r["w"]), []).append(r)
        for r in totals:
            stats_by_window.setdefault(int(r["w"]), []).append(
                {"part": None, "k": r["k"]}
            )
        if use_cached:
            for rows_w in stats_by_window.values():
                ev_w = sum(int(r["n"]) for r in rows_w)
                rows_w.append(
                    {"part": None, "k": self._key_ratio * ev_w, "cached": True}
                )
        prepass_s = round(time.time() - t_pre, 3)

        b = 0
        for start in range(lo, hi + 1, per_part):
            end = min(start + per_part - 1, hi)
            batch_id = f"{run_id}:off[{start}-{end}]"
            batch = remaining.where(
                (F.col("offset") >= start) & (F.col("offset") <= end)
            )
            rep = self.apply_batch(
                batch,
                batch_id,
                crash_before_publish=(crash_before_publish_at == b),
                crash_after_stage=(crash_after_stage_at == b),
                run_id=run_id,
                stats=stats_by_window.get(b, []),
            )
            if b == 0:
                rep.phases["stats_prepass"] = prepass_s
            reports.append(rep)
            b += 1
            if max_batches is not None and b >= max_batches:
                break
        self.lineage.flush(self.spark)
        return reports


def requeue_quarantine(
    spark,
    table,
    quarantine_dir: str,
    fix=None,
    run_id: str = "requeue",
    config: ReplayConfig | None = None,
) -> BatchReport:
    """Dead-letter replay: re-ingest quarantined dirty records after an
    upstream fix (the reference's dirty records are terminal — a human reads
    the TaskPluginCollector report and re-runs the whole job; here the
    quarantine is a parquet dir and the fix is one bounded batch).

    ``fix``: optional DataFrame -> DataFrame correction (e.g. recompute a
    broken n_tok). Rows STILL violating the contract after the fix stay
    dirty and never merge. The batch deliberately bypasses the watermark
    pre-filter — quarantined offsets are below the high-watermark by
    construction — which is safe because the MERGE is version-ordered and
    idempotent: a corrected event wins only if its (commit_lsn, seq_no)
    still beats the applied row, exactly the LWW contract. The snapshot's
    watermark merge is monotone, so the old offsets never regress it; the
    applied-batch-id check makes re-running the same requeue a no-op.
    Fresh dirt quarantined after this call needs a new ``run_id``."""
    cfg = config or ReplayConfig(error_limit=ErrorLimit())
    eng = ReplayEngine(spark, table, cfg)
    batch = spark.read.parquet(quarantine_dir).drop("_batch_id")
    if fix is not None:
        batch = fix(batch)
    report = eng.apply_batch(batch, batch_id=f"requeue/{run_id}", run_id=run_id)
    eng.lineage.flush(spark)
    return report
