"""Benchmark decontamination: flag training documents that share any word
n-gram with an evaluation/benchmark set.

The published pipeline step (GPT-3 appendix C / PaLM / Llama: 8-13-gram
overlap against every eval benchmark) that must run over the WHOLE corpus
before training. The reference stops at row delivery, so its users would
hand-roll this; here it is a first-class operator.

Scale shape (the only one that survives 100 TB):
  * the EVAL side is small by construction (benchmarks are ~10^4-10^6
    n-grams) -> distinct it and BROADCAST; the corpus is never broadcast;
  * the CORPUS side explodes its distinct per-doc n-grams map-side and
    broadcast-hash-joins against the eval set — rows that survive the join
    are only the contaminated (doc, ngram) hits, typically a vanishing
    fraction, so the groupBy(doc) shuffle carries hits, not the corpus;
  * the final per-doc flag frame carries (id, n_hits) only — join it back
    to the full corpus with a broadcast when hit counts allow (they do:
    contaminated docs are the exception), or LEFT ANTI to drop them.

Everything is whole-stage-codegen expressions (split/sequence/transform/
array_join) — no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["word_ngrams", "contamination_flags", "decontaminate"]


def word_ngrams(col: Column, n: int) -> Column:
    """Distinct word n-grams of a string as an array<string>: lowercase,
    whitespace-split, space-joined windows of n consecutive words. Documents
    shorter than n words yield an EMPTY array (never a padded shorter gram —
    that would cross-match every short doc)."""
    words = F.split(F.trim(F.lower(col)), r"\s+")
    cnt = F.size(words) - F.lit(n - 1)
    return F.when(
        cnt >= 1,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), cnt),
                lambda i: F.array_join(F.slice(words, i, n), " "),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))


def contamination_flags(
    docs: DataFrame,
    eval_docs: DataFrame,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    eval_text_col: str | None = None,
) -> DataFrame:
    """Per-document contamination verdicts: (id_col, n_hits, contaminated).

    ``n_hits`` counts the DISTINCT eval n-grams a document contains (the
    decision statistic the published filters threshold on); ``contaminated``
    is n_hits > 0. Every corpus row appears exactly once, hit or not.
    """
    ev = (
        eval_docs.select(
            F.explode(
                word_ngrams(F.col(eval_text_col or text_col), n)
            ).alias("ngram")
        )
        .distinct()
    )
    doc_ng = docs.select(
        F.col(id_col),
        F.explode(word_ngrams(F.col(text_col), n)).alias("ngram"),
    )
    hits = (
        doc_ng.join(F.broadcast(ev), "ngram")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_hits"))  # per-doc ngrams are pre-distinct
    )
    return (
        docs.select(id_col)
        .join(hits, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("n_hits"), F.lit(0)).cast("int").alias("n_hits"),
            (F.coalesce(F.col("n_hits"), F.lit(0)) > 0).alias("contaminated"),
        )
    )


def decontaminate(
    docs: DataFrame,
    eval_docs: DataFrame,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    eval_text_col: str | None = None,
) -> DataFrame:
    """The corpus with contaminated documents REMOVED (the pipeline action).
    Hit ids are a tiny set by construction, so the anti-join broadcasts."""
    hit_ids = contamination_flags(
        docs, eval_docs, n, id_col, text_col, eval_text_col
    ).where("contaminated").select(id_col)
    return docs.join(F.broadcast(hit_ids), id_col, "left_anti")
