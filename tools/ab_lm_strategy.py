#!/usr/bin/env python
"""Interleaved A/B setting every strategy auto-rule in operators/tokens.py
from same-window data. Three ops, each across table sizes, variants strictly
interleaved in one JVM:

  unigram_logprob   expr (dense literal-array LUT + F.get, O(1) codegen)
                    vs arrow (broadcast numpy LUT + cumsum-diff kernel);
                    expr_map (literal create_map, O(vocab) GetMapValue scan
                    per token) anchored at small vocabs only — its linear
                    blow-up is already pinned (0.9 s @128 -> 24.3 s @8192).
  remap_vocab       same three variants; timed action is a noop-format write
                    (the op rebuilds the token arrays, so a full materialize
                    is the honest cost).
  bigram_logprob    expr (dense unigram + literal-map bigram probe) vs arrow
                    (dense unigram LUT + sorted packed-key searchsorted),
                    sweeping the BIGRAM table size at fixed unigram vocab.

Usage: python tools/ab_lm_strategy.py [n_docs] [samples_per_variant]
"""
from __future__ import annotations

import json
import os
import statistics
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

UNI_VOCABS = [128, 2048, 8192, 16384, 32768, 65536]
REMAP_VOCABS = [128, 8192, 65536]
BI_SIZES = [128, 512, 2048, 8192]
BI_UNI_VOCAB = 2048


def _timed(make_action, variants, samples):
    """One untimed warm pass per variant, then strict interleave."""
    for s in variants:
        make_action(s)()
    res: dict[str, list[float]] = {s: [] for s in variants}
    for _ in range(samples):
        for s in variants:
            act = make_action(s)
            t0 = time.time()
            act()
            res[s].append(round(time.time() - t0, 3))
    return {
        s: {"median": round(statistics.median(r), 3), "raw": r}
        for s, r in res.items()
    }


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 400_000
    samples = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    from pyspark.sql import functions as F

    from tg_data_connector_spark.operators.tokens import (
        bigram_logprob,
        remap_vocab,
        unigram_logprob,
    )
    from tg_data_connector_spark.session import get_spark

    spark = get_spark(app_name="ab_lm_strategy", master="local[8]")
    root = tempfile.mkdtemp(prefix="ab_lm_") + "/docs"
    i = F.col("id")
    max_v = max(UNI_VOCABS)
    spark.range(0, n_docs, 1, 8).select(
        i.cast("string").alias("doc_id"),
        F.transform(
            F.sequence(F.lit(0), (F.pmod(i, F.lit(48)) + F.lit(16)).cast("int")),
            lambda k: F.pmod(i * F.lit(31) + k * F.lit(7), F.lit(max_v)).cast(
                "int"
            ),
        ).alias("tokens"),
    ).write.mode("overwrite").parquet(root)
    docs = spark.read.parquet(root)

    out: dict[str, dict] = {"unigram": {}, "remap": {}, "bigram": {}}

    for v in UNI_VOCABS:
        counts = {t: (t % 97) + 1 for t in range(v)}
        # expr_map's O(vocab)/token scan is pinned by the small anchors —
        # extrapolated (not run) above 512 to keep the window tight for the
        # two real contenders.
        variants = ("expr", "expr_map", "arrow") if v <= 512 else (
            "expr", "arrow")
        plans = {
            s: unigram_logprob(docs, counts, strategy=s) for s in variants
        }
        out["unigram"][str(v)] = _timed(
            lambda s: lambda: plans[s].agg(F.sum("nll")).collect(),
            variants, samples,
        )
        print(f"unigram V={v}: " + ", ".join(
            f"{s} med {out['unigram'][str(v)][s]['median']}s"
            for s in variants), flush=True)

    for v in REMAP_VOCABS:
        mapping = {t: (t + 1) % v for t in range(v)}
        variants = ("expr", "expr_map", "arrow") if v <= 512 else (
            "expr", "arrow")
        plans = {s: remap_vocab(docs, mapping, strategy=s) for s in variants}
        out["remap"][str(v)] = _timed(
            lambda s: lambda: plans[s].write.format("noop").mode(
                "overwrite").save(),
            variants, samples,
        )
        print(f"remap V={v}: " + ", ".join(
            f"{s} med {out['remap'][str(v)][s]['median']}s"
            for s in variants), flush=True)

    uni = {t: (t % 97) + 1 for t in range(BI_UNI_VOCAB)}
    for b in BI_SIZES:
        bi = {((k * 13) % BI_UNI_VOCAB, (k * 29) % BI_UNI_VOCAB): k % 23 + 1
              for k in range(b * 2)}
        bi = dict(list(bi.items())[:b])
        plans = {
            s: bigram_logprob(docs, bi, uni, strategy=s)
            for s in ("expr", "arrow")
        }
        out["bigram"][str(b)] = _timed(
            lambda s: lambda: plans[s].agg(F.sum("nll")).collect(),
            ("expr", "arrow"), samples,
        )
        print(f"bigram B={b}: " + ", ".join(
            f"{s} med {out['bigram'][str(b)][s]['median']}s"
            for s in ("expr", "arrow")), flush=True)

    print(json.dumps({"n_docs": n_docs, "results": out}))


if __name__ == "__main__":
    main()
