"""Dirty-record quarantine + error-limit policy.

Mirrors the reference's dirty-record machinery:
  * any per-record failure is collected, not fatal (``TaskPluginCollector`` SPI;
    call sites ``CommonRdbmsReader.java:344``,
    ``UnstructuredStorageReaderUtil.java:476-488``, ``CommonRdbmsWriter.java:386``);
  * the job fails only when dirty counts exceed ``errorLimit.record`` (absolute)
    or ``errorLimit.percentage`` — and the absolute record limit has priority
    (``core/.../util/ErrorRecordChecker.java:25-81``, checked from
    ``JobContainer.checkLimit`` ``JobContainer.java:965-969``).

Spark-first expression: ONE predicate column computed once, then two pushed-down
filters — Catalyst dedups the common subplan and both scans prune columns; no
row-at-a-time collector, no accumulators in the data path. Counts come from the
quarantine side's own aggregation (exact, deterministic under task retry —
unlike Spark accumulators, which can double-count).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


class ErrorLimitExceeded(RuntimeError):
    pass


@dataclass
class ErrorLimit:
    """errorLimit config: record (absolute) overrides percentage
    (``ErrorRecordChecker.java:39-45``: record limit checked first)."""

    record: int | None = None
    percentage: float | None = None

    def check(self, dirty: int, total: int) -> None:
        if self.record is not None and dirty > self.record:
            raise ErrorLimitExceeded(
                f"dirty records {dirty} > errorLimit.record {self.record}"
            )
        if self.percentage is not None and total > 0 and dirty / total > self.percentage:
            raise ErrorLimitExceeded(
                f"dirty fraction {dirty / total:.4f} > errorLimit.percentage "
                f"{self.percentage}"
            )


def dirty_predicate(partial: bool = False, pair_check: bool = True) -> Column:
    """An event is dirty when it violates the changelog contract:
    I/U must carry a doc_id and a token array whose size equals n_tok;
    D must carry a doc_id. (FIXTURES.md F2 malformed cases.)

    ``partial=True`` relaxes the contract for PARTIAL-UPDATE streams
    (ReplayConfig.resolution="partial"): an UPDATE may omit columns — NULL
    means "unchanged" — but derived pairs must be omitted TOGETHER: a U
    carrying tokens without n_tok (or vice versa) is dirty, and when both are
    present the size must still match. INSERTs remain full images under the
    strict I/U rule.

    ``pair_check=False`` (resolution="aggregate" with tokens or n_tok under
    an aggregate combiner — n_tok is then an independent accumulator, not
    the token count): the tokens/n_tok consistency rule is dropped entirely;
    only the key/op contract remains."""
    iu = F.col("op").isin("I", "U")
    if not pair_check:
        bad_op = F.col("op").isNull() | ~F.col("op").isin("I", "U", "D", "S")
        return (
            (iu | (F.col("op") == "D")) & F.col("doc_id").isNull()
        ) | bad_op
    strict = (
        F.col("tokens").isNull()
        | (F.size(F.col("tokens")) != F.col("n_tok"))
    )
    if partial:
        # U: tokens/n_tok must be both absent or both present-and-consistent
        upd_pair_ok = (
            (F.col("tokens").isNull() & F.col("n_tok").isNull())
            | (F.size(F.col("tokens")) == F.col("n_tok"))
        )
        body_bad = F.when(F.col("op") == "I", strict).otherwise(
            ~F.coalesce(upd_pair_ok, F.lit(False))
        )
    else:
        body_bad = strict
    bad_iu = iu & (F.col("doc_id").isNull() | body_bad)
    bad_d = (F.col("op") == "D") & F.col("doc_id").isNull()
    # NULL-safe: a NULL op (e.g. an unparseable topic envelope) must be
    # DIRTY — a bare ~isin() evaluates to NULL there, which both the
    # quarantine filter and the clean filter drop, silently losing the row
    bad_op = F.col("op").isNull() | ~F.col("op").isin("I", "U", "D", "S")
    return bad_iu | bad_d | bad_op


def dirty_predicate_raw(payload_col: str = "payload") -> Column:
    """Same contract evaluated on the *undecoded* binary payload: the token
    count of a packed int32 payload is its byte length / 4, so validation is a
    pure JVM expression — no event has to cross into Python to be judged dirty.
    (The decode itself runs only on events that survive quarantine AND dedup.)"""
    iu = F.col("op").isin("I", "U")
    # n_tok is cast to bigint BEFORE the *4: a corrupt-but-legal int32 n_tok
    # (e.g. 2^30) must be judged dirty, not raise ARITHMETIC_OVERFLOW under
    # ANSI mode and kill the replay — overflow here is exactly the class of
    # record the quarantine policy exists to absorb.
    bad_iu = iu & (
        F.col("doc_id").isNull()
        | F.col(payload_col).isNull()
        | (
            F.octet_length(F.col(payload_col)).cast("bigint")
            != F.col("n_tok").cast("bigint") * F.lit(4)
        )
    )
    bad_d = (F.col("op") == "D") & F.col("doc_id").isNull()
    # NULL-safe: a NULL op (e.g. an unparseable topic envelope) must be
    # DIRTY — a bare ~isin() evaluates to NULL there, which both the
    # quarantine filter and the clean filter drop, silently losing the row
    bad_op = F.col("op").isNull() | ~F.col("op").isin("I", "U", "D", "S")
    return bad_iu | bad_d | bad_op


def contract_predicate(
    df: DataFrame, partial: bool = False, pair_check: bool = True
) -> Column:
    """Pick the dirty predicate matching the frame's shape: raw (binary
    payload) or decoded (tokens array)."""
    if "tokens" not in df.columns and "payload" in df.columns:
        return dirty_predicate_raw()
    return dirty_predicate(partial=partial, pair_check=pair_check)


def split_quarantine(
    df: DataFrame, pred: Column | None = None
) -> tuple[DataFrame, DataFrame]:
    """(clean, dirty). Both sides are lazy single-pass filters over the same
    scan; callers count the dirty side once per batch for the errorLimit check."""
    p = pred if pred is not None else contract_predicate(df)
    return df.where(~p), df.where(p)
