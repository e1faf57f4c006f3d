"""Document deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Scale design notes (the whole point of each variant):

  exact        — one groupBy on a 64-bit fingerprint: map-side partial agg, one
                 shuffle of (hash, id) pairs only — never the text.
  ngram-jaccard— candidate pairs via an explode/self-join on shared shingle
                 hashes; the join carries (shingle_hash, doc_id, set_size) only.
                 Exact Jaccard from |intersection| counted per pair. Quadratic
                 in the worst case -> bounded by a frequency cap on shingles
                 (stopword-shingles are dropped, the standard trick).
  minhash-lsh  — signatures (k hashes) banded into b bands; a pair collides if
                 any band matches: shuffle is O(docs x bands), never pairwise.
                 This is the 100 TB path.
  simhash      — 32-bit simhash via bit-vote aggregation, near-dups = equal
                 keys on rotated prefixes (here: exact simhash match per band).

All expression-only (sequence/transform/aggregate) — no Python in the path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import hash32, minhash_signature, perm_params, shingles
from .text import fingerprint64


def _spread(df: DataFrame, key: str) -> DataFrame:
    """Fan the corpus across the cluster BEFORE the expression-heavy shingle/
    hash work. Small document tables arrive as one file = one input split, so
    without this every md5/shingle pass runs on a single task (measured: 6s
    single-task stages on a 5k-doc table). REPARTITION_BY_NUM (explicit count)
    — a bare repartition(col) is size-based and AQE would coalesce the tiny
    text input straight back to one partition."""
    sc = df.sparkSession.sparkContext
    return df.repartition(sc.defaultParallelism, F.col(key))


def dedup_exact(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Keep the smallest id per exact (normalized) text fingerprint."""
    fp = df.select(F.col(id_col), fingerprint64(F.col(text_col)).alias("fp"))
    return fp.groupBy("fp").agg(F.min(id_col).alias(id_col)).select(id_col, "fp")


def shingle_hashes(df: DataFrame, id_col: str, text_col: str, k: int = 5) -> DataFrame:
    return df.select(
        F.col(id_col),
        F.transform(shingles(F.col(text_col), k), hash32).alias("sh"),
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    threshold: float = 0.8,
    max_shingle_freq: int = 200,
) -> DataFrame:
    """Exact Jaccard-similar pairs (a < b) over char k-shingles.

    Plan shape: explode -> (freq-cap filter) -> self-join on shingle hash ->
    count per pair -> filter. The freq cap bounds join fan-out: a shingle in f
    docs contributes f^2 candidate rows, so ubiquitous shingles are dropped
    from *candidate generation only* — the Jaccard denominator still uses true
    set sizes, keeping similarity exact for pairs that share any rare shingle.
    """
    sh = shingle_hashes(_spread(df, id_col), id_col, text_col, k)
    sizes = sh.select(F.col(id_col), F.size("sh").alias("n"))
    ex = sh.select(id_col, F.explode("sh").alias("h"))
    freq = ex.groupBy("h").count()
    # Broadcast the HOT-shingle blocklist (count > cap), never the keep-list:
    # the keep-list is O(distinct shingles) ~ corpus-sized and would OOM every
    # executor at scale, while the blocklist is tiny by construction (each hot
    # shingle must appear in > cap docs, so there are at most n_docs*|doc| / cap
    # of them — in practice a handful of stopword-shingles).
    hot = freq.where(F.col("count") > max_shingle_freq).select("h")
    ex = ex.join(F.broadcast(hot), "h", "left_anti")
    a = ex.select(F.col(id_col).alias("a"), "h")
    b = ex.select(F.col(id_col).alias("b"), "h")
    common = (
        a.join(b, "h")
        .where(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count("*").alias("inter"))
    )
    na = sizes.select(F.col(id_col).alias("a"), F.col("n").alias("na"))
    nb = sizes.select(F.col(id_col).alias("b"), F.col("n").alias("nb"))
    return (
        common.join(na, "a")
        .join(nb, "b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")), 6
            ),
        )
        .where(F.col("jaccard") >= threshold)
        .select("a", "b", "jaccard")
    )


def banded_keys(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    n_hashes: int = 16,
    bands: int = 4,
    seed: int = 7,
) -> DataFrame:
    """(id_col, band, key) — one row per (doc, band); a band's key is the
    md5 of its signature slice. The shared front half of batch LSH
    (``minhash_lsh_pairs``) and the incremental band index
    (``neardup_incremental``), so both collide on identical keys."""
    assert n_hashes % bands == 0
    r = n_hashes // bands
    sig = shingle_hashes(_spread(df, id_col), id_col, text_col, k).where(
        F.size("sh") > 0
    ).select(
        F.col(id_col),
        minhash_signature(F.col("sh"), n_hashes, seed).alias("sig"),
    )
    return sig.select(
        id_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.md5(
                            F.array_join(F.slice(F.col("sig"), i * r + 1, r), "_")
                        ).alias("key"),
                    )
                    for i in range(bands)
                ]
            )
        ).alias("bk"),
    ).select(id_col, "bk.band", "bk.key")


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    n_hashes: int = 16,
    bands: int = 4,
    seed: int = 7,
) -> DataFrame:
    """Candidate near-dup pairs from banded MinHash signatures (a < b, distinct).

    rows = bands per doc; a band's key is the tuple-hash of its signature slice.
    Self-join happens on (band_idx, band_key): O(collisions), not O(n^2)."""
    banded = banded_keys(df, id_col, text_col, k, n_hashes, bands, seed)
    a = banded.select(F.col(id_col).alias("a"), "band", "key")
    b = banded.select(F.col(id_col).alias("b"), "band", "key")
    return (
        a.join(b, ["band", "key"])
        .where(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )


def simhash32(col, k: int = 5):
    """32-bit SimHash over char k-shingle hash32s, expression-only: for each bit
    position, vote +1/-1 by that bit across shingles; bit set iff vote > 0.

    Single fold with a 32-wide vector accumulator (zip_with inside aggregate) —
    one pass over the shingles instead of 32, and a codegen footprint small
    enough to stay inside whole-stage codegen."""
    hs = F.transform(shingles(col, k), hash32)
    # 2^b per bit position (shiftleft/shiftright take only literal bit counts,
    # so shifts are expressed as exact power-of-two division: h and 2^b are
    # both < 2^53, double math is exact)
    pows = F.transform(
        F.sequence(F.lit(0), F.lit(31)),
        lambda b: F.pow(F.lit(2.0), b.cast("double")).cast("bigint"),
    )
    zeros = F.transform(F.sequence(F.lit(0), F.lit(31)), lambda b: F.lit(0).cast("int"))
    votes = F.aggregate(
        hs,
        zeros,
        lambda acc, h: F.zip_with(
            acc,
            pows,
            lambda a, p: a
            + F.when(F.pmod((h / p).cast("bigint"), F.lit(2)) == 1, F.lit(1)).otherwise(
                F.lit(-1)
            ),
        ),
    )
    return F.aggregate(
        F.zip_with(
            votes,
            pows,
            lambda v, p: F.when(v > 0, p).otherwise(F.lit(0).cast("bigint")),
        ),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )


def simhash_dedup(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", k: int = 5
) -> DataFrame:
    """Group docs by identical simhash32 (hamming-0 near-dup buckets); returns
    (simhash, n_docs, keep=min id) for buckets with >1 doc."""
    s = _spread(df, id_col).select(
        F.col(id_col), simhash32(F.col(text_col), k).alias("simhash")
    )
    return (
        s.groupBy("simhash")
        .agg(F.count("*").alias("n_docs"), F.min(id_col).alias("keep"))
        .where(F.col("n_docs") > 1)
    )


def simhash_near_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    bands: int = 4,
    max_hamming: int = 3,
) -> DataFrame:
    """Near-dup pairs within hamming distance <= max_hamming on simhash32, via
    band rotation: the 32-bit simhash splits into ``bands`` equal slices; by
    pigeonhole any pair within distance bands-1 shares at least one intact
    slice, so candidates are band-key collisions (O(docs x bands) shuffle,
    never all-pairs) and the exact hamming filter runs per candidate only.
    Requires max_hamming <= bands - 1 for exact recall; returns (a, b, hamming).
    """
    assert 32 % bands == 0 and max_hamming <= bands - 1
    width = 32 // bands
    s = _spread(df, id_col).select(
        F.col(id_col), simhash32(F.col(text_col), k).alias("simhash")
    )
    banded = s.select(
        id_col,
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        # arithmetic slice (sim // 2^(w*i)) % 2^w: identical
                        # formula runs in the external SQL oracle
                        F.pmod(
                            (F.col("simhash") / F.lit(2 ** (width * i))).cast(
                                "bigint"
                            ),
                            F.lit(2**width),
                        ).alias("key"),
                    )
                    for i in range(bands)
                ]
            )
        ).alias("bk"),
    ).select(id_col, "simhash", "bk.band", "bk.key")
    a = banded.select(F.col(id_col).alias("a"), F.col("simhash").alias("sa"),
                      "band", "key")
    b = banded.select(F.col(id_col).alias("b"), F.col("simhash").alias("sb"),
                      "band", "key")
    return (
        a.join(b, ["band", "key"])
        .where(F.col("a") < F.col("b"))
        .select(
            "a",
            "b",
            F.bit_count(F.col("sa").bitwiseXOR(F.col("sb"))).cast("int").alias(
                "hamming"
            ),
        )
        .distinct()
        .where(F.col("hamming") <= max_hamming)
    )


def connected_components(
    pairs: DataFrame, a: str = "a", b: str = "b", max_iter: int = 25
) -> DataFrame:
    """Connected components over an undirected near-dup edge list ->
    ``(id, comp)`` where ``comp`` is the smallest id reachable — the step a
    dedup pipeline runs AFTER LSH/banding to turn pairwise collisions into
    keep/drop decisions (one canonical doc per duplicate cluster).

    Min-label propagation: each round joins labels to neighbors and takes
    the per-node min — O(cluster diameter) rounds, and banded near-dup
    clusters are quasi-cliques (diameter 2-3), so it converges in a few
    rounds even at corpus scale; ``max_iter`` bounds adversarial chains.
    Each round is one shuffled join + one min-aggregate on (id) — no
    all-pairs work, nothing driver-side except the convergence counter —
    and the result is localCheckpoint'ed to cut the lineage chain
    (an iterative DataFrame algorithm otherwise re-executes every prior
    round per action; on a cluster use spark.sparkContext.setCheckpointDir
    + .checkpoint() for executor-loss resilience instead)."""
    edges = (
        pairs.select(F.col(a).alias("s"), F.col(b).alias("d"))
        .union(pairs.select(F.col(b).alias("s"), F.col(a).alias("d")))
        .distinct()
    )
    labels = (
        edges.select(F.col("s").alias("id"))
        .distinct()
        .select("id", F.col("id").alias("comp"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        nbr = edges.join(
            labels.withColumnRenamed("id", "s"), "s"
        ).select(F.col("d").alias("id"), "comp")
        new = (
            labels.union(nbr)
            .groupBy("id")
            .agg(F.min("comp").alias("comp"))
            .localCheckpoint(eager=True)
        )
        changed = (
            new.join(labels.withColumnRenamed("comp", "comp_old"), "id")
            .where(F.col("comp") != F.col("comp_old"))
            .count()
        )
        labels = new
        if changed == 0:
            break
    return labels


def dedup_canonical(
    docs: DataFrame, pairs: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Assign every doc its cluster canonical (the smallest reachable id;
    singletons are their own canonical) -> ``(id_col, canonical)``. The
    keep-set is ``canonical == id``; the drop-set joins back to the corpus
    by id — both O(docs) after the component step."""
    cc = connected_components(pairs)
    return (
        docs.select(id_col)
        .join(cc.withColumnRenamed("id", id_col), id_col, "left")
        .select(
            id_col, F.coalesce("comp", F.col(id_col)).alias("canonical")
        )
    )


# ----------------------------------------------------- incremental dedup
# Continuous-ingest exact dedup: classify each NEW batch against an
# already-ingested corpus FINGERPRINT INDEX (a LakeTable keyed by the
# fingerprint) instead of re-deduplicating the whole corpus per batch —
# the only shape that works when the corpus is 100 TB and batches are GB.

DEDUP_INDEX_FIELDS = [("fp", "string"), ("canonical_id", "string")]


def create_dedup_index(spark, root: str, n_buckets: int = 64, fs=None):
    """Create the corpus fingerprint index: one row per distinct fingerprint,
    ``canonical_id`` = the first-seen document. Hash-bucketed on fp (the
    lake's normal key layout) with key-sorted files + per-file key stats, so
    index maintenance inherits bucket pruning and the probe read skips
    row groups outside a batch's fp range."""
    from ..lake.table import LakeTable, TableSchema

    return LakeTable.create(
        spark, root, TableSchema(DEDUP_INDEX_FIELDS), key="fp",
        n_buckets=n_buckets, fs=fs, sort_on_write=True,
    )


def dedup_incremental(
    index,
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    batch_lsn: int = 1,
    update_index: bool = True,
    broadcast_probe: bool = True,
) -> DataFrame:
    """Classify one ingest batch against the corpus index and (optionally)
    absorb its fresh fingerprints. Returns one row per input document:
    ``(id_col, fp, status, canonical_id)`` with status ``kept`` (first
    occurrence ever), ``dup_in_batch`` (an earlier doc in THIS batch owns the
    fingerprint), or ``dup_in_corpus`` (the index owns it; canonical_id is
    the corpus canonical).

    Plan shape at 100 TB (corpus-sized index, GB-sized batch):
      * within-batch resolution is one (fp, id) shuffle of the BATCH only —
        the text never moves;
      * the corpus probe joins the index against the batch's distinct
        fingerprints. With ``broadcast_probe`` (default — right for
        micro-batches) the batch side broadcasts and the INDEX STREAMS
        MAP-SIDE, one pass, never shuffled and never collected; set False
        for corpus-sized backfill batches to get a key-shuffled join
        instead. Either way cost is O(index scan + batch), and the index
        scan carries (fp, canonical_id) only — two thin columns;
      * the index update merges ONLY the fresh fingerprints through the
        normal bucket-pruned MERGE path: O(batch) new rows, touched buckets
        only.

    First-seen-wins is stable under re-runs: a re-run of an absorbed batch
    finds every fingerprint already in the index (its own earlier insert),
    classifies the rows ``dup_in_corpus`` against the SAME canonicals, and
    the merge is a no-op (same key, same value, LWW tie on batch_lsn).
    NULL text yields a NULL fingerprint; such rows are never duplicates of
    anything (SQL join semantics) and classify ``kept`` individually.

    Reference cue: the reference's writers offer writeMode=nonConflict /
    ON DUPLICATE KEY (``WriterUtil.java:111-168``) — per-row dup handling
    delegated to the target DB. This operator is that capability
    re-expressed for a lake target, where the engine itself owns the index.
    """
    from ..lake.merge import merge_upsert
    from pyspark.sql import Window

    fp_rows = docs.select(
        F.col(id_col).alias("_id"),
        fingerprint64(F.col(text_col)).cast("string").alias("fp"),
    )
    w = Window.partitionBy("fp")
    batch = fp_rows.withColumn(
        "_first",
        F.when(F.col("fp").isNull(), F.col("_id")).otherwise(
            F.min("_id").over(w)
        ),
    )
    cand = (
        batch.where(F.col("fp").isNotNull())
        .groupBy("fp")
        .agg(F.min("_id").cast("string").alias("canonical_id"))
    )
    existing = index.read().select(
        "fp", F.col("canonical_id").alias("_corpus_canon")
    )
    if broadcast_probe:
        # an outer join can't preserve the broadcast build side, so the
        # one index pass is an INNER probe (index streams map-side against
        # the broadcast fp set); the outer semantics come back via
        # small-x-small joins on the hit set
        hits = existing.join(F.broadcast(cand.select("fp")), "fp", "inner")
        probe = cand.join(F.broadcast(hits), "fp", "left")
    else:
        probe = cand.join(existing, "fp", "left")
    # materialize once (O(batch-distinct fps)): fresh-set extraction and
    # classification both read it, and without this each would re-run the
    # index scan underneath
    probe = probe.localCheckpoint(eager=True)
    if update_index:
        fresh = probe.where(F.col("_corpus_canon").isNull()).select(
            "fp",
            "canonical_id",
            F.lit("I").alias("op"),
            F.lit(batch_lsn).cast("bigint").alias("commit_lsn"),
            F.lit(0).cast("bigint").alias("seq_no"),
        )
        merge_upsert(index, fresh)
    corpus_map = probe.where(F.col("_corpus_canon").isNotNull()).select(
        "fp", "_corpus_canon"
    )
    if broadcast_probe:
        corpus_map = F.broadcast(corpus_map)
    out = batch.join(corpus_map, "fp", "left")
    status = (
        F.when(F.col("_corpus_canon").isNotNull(), F.lit("dup_in_corpus"))
        .when(F.col("_id") != F.col("_first"), F.lit("dup_in_batch"))
        .otherwise(F.lit("kept"))
    )
    return out.select(
        F.col("_id").alias(id_col),
        "fp",
        status.alias("status"),
        F.coalesce(
            F.col("_corpus_canon"), F.col("_first").cast("string")
        ).alias("canonical_id"),
    )


# ------------------------------------------- incremental near-dup (LSH)
# The fuzzy complement of dedup_incremental: a lake-backed BAND INDEX maps
# each LSH band key to the (capped, smallest-first) doc ids seen in that
# bucket, so a new batch finds its near-dup CANDIDATES against the whole
# corpus with one thin index probe — never re-signaturing the corpus.

NEARDUP_INDEX_FIELDS = [("band_key", "string"), ("doc_ids", "array<string>")]


def create_neardup_index(spark, root: str, n_buckets: int = 64, fs=None):
    """Create the corpus LSH band index: one row per band bucket
    (``band_key`` = "<band>:<md5-of-signature-slice>"), value = the bucket's
    member doc ids, deterministically capped (smallest ids win)."""
    from ..lake.table import LakeTable, TableSchema

    return LakeTable.create(
        spark, root, TableSchema(NEARDUP_INDEX_FIELDS), key="band_key",
        n_buckets=n_buckets, fs=fs,
    )


def neardup_incremental(
    index,
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    n_hashes: int = 16,
    bands: int = 4,
    seed: int = 7,
    bucket_cap: int = 64,
    batch_lsn: int = 1,
    update_index: bool = True,
    broadcast_probe: bool = True,
) -> DataFrame:
    """Near-dup CANDIDATE pairs for one ingest batch against the corpus band
    index (plus within-batch collisions). Returns distinct ``(a, b)`` with
    ``a < b`` (string doc ids); at least one side is from this batch.
    Verification (exact Jaccard / embedding similarity) is downstream, as
    with ``minhash_lsh_pairs`` — LSH's contract is the candidate set.

    Plan shape at 100 TB: the batch's bands are O(batch x bands) rows; the
    corpus probe streams the index map-side against the broadcast band-key
    set (``broadcast_probe=False`` for backfills); the index update merges
    ONLY the touched band buckets (union + re-cap computed from the SAME
    probe rows, so absorb adds no second index pass).

    ``bucket_cap`` bounds hot buckets (boilerplate bands collect unbounded
    members otherwise — the standard LSH-bucket cap): each bucket keeps the
    ``bucket_cap`` SMALLEST doc ids, a deterministic rule the SQL oracle
    reproduces exactly. A capped bucket still yields candidates against its
    retained members; pairs among evicted ids are the recall cost, bounded
    and auditable (saturated buckets are queryable from the index itself).
    """
    from ..lake.merge import merge_upsert

    bk = banded_keys(docs, id_col, text_col, k, n_hashes, bands, seed).select(
        F.col(id_col).cast("string").alias("_id"),
        F.concat_ws(":", F.col("band").cast("string"), F.col("key")).alias(
            "band_key"
        ),
    )
    batch_buckets = bk.groupBy("band_key").agg(
        F.slice(F.array_sort(F.collect_set("_id")), 1, bucket_cap).alias(
            "new_ids"
        )
    )
    existing = index.read().select(
        "band_key", F.col("doc_ids").alias("_corpus_ids")
    )
    if broadcast_probe:
        hits = existing.join(
            F.broadcast(batch_buckets.select("band_key")), "band_key", "inner"
        )
        probe = batch_buckets.join(F.broadcast(hits), "band_key", "left")
    else:
        probe = batch_buckets.join(existing, "band_key", "left")
    probe = probe.localCheckpoint(eager=True)
    if update_index:
        merged = probe.select(
            "band_key",
            F.slice(
                F.array_sort(
                    F.array_distinct(
                        F.concat(
                            F.coalesce(
                                F.col("_corpus_ids"),
                                F.array().cast("array<string>"),
                            ),
                            F.col("new_ids"),
                        )
                    )
                ),
                1,
                bucket_cap,
            ).alias("doc_ids"),
            F.lit("U").alias("op"),
            F.lit(batch_lsn).cast("bigint").alias("commit_lsn"),
            F.lit(0).cast("bigint").alias("seq_no"),
        )
        merge_upsert(index, merged)
    within = probe.select(
        F.explode("new_ids").alias("a"), F.col("new_ids")
    ).select("a", F.explode("new_ids").alias("b")).where(F.col("a") < F.col("b"))
    vs_corpus = (
        probe.where(F.col("_corpus_ids").isNotNull())
        .select(F.explode("new_ids").alias("n"), F.col("_corpus_ids"))
        .select("n", F.explode("_corpus_ids").alias("c"))
        .where(F.col("n") != F.col("c"))
        .select(
            F.least("n", "c").alias("a"), F.greatest("n", "c").alias("b")
        )
    )
    return within.unionByName(vs_corpus).distinct()
