"""Text-analysis operators for large-scale training-data pipelines.

All pure Column expressions (codegen'd, no UDF): at 100 TB of documents these
run inside the parquet scan stage with zero extra shuffles.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import hash32

# small embedded stopword lists: enough for an n-gram/stopword-ratio language
# heuristic without external models (none are installable in this environment)
STOPWORDS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "it", "you", "that"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "ein", "ich", "zu", "mit"],
    "fr": ["le", "la", "et", "les", "des", "est", "un", "une", "dans", "que"],
    "es": ["el", "la", "de", "que", "y", "los", "es", "un", "una", "por"],
}


def tokenize_ws(col: Column) -> Column:
    """Whitespace tokenization; empty string -> empty array (split('') yields
    [''], which is not a token)."""
    trimmed = F.trim(col)
    return F.when(F.length(trimmed) == 0, F.array().cast("array<string>")).otherwise(
        F.split(trimmed, r"\s+")
    )


def token_count(col: Column) -> Column:
    return F.size(tokenize_ws(col))


def bpe_ish_token_count(col: Column) -> Column:
    """Sub-word-ish token estimate: count regex word pieces + digits + punct runs
    (a BPE stand-in: no vocab download available; the regex is the public
    GPT-2-style pre-tokenizer shape)."""
    pieces = F.regexp_extract_all(
        col, F.lit(r"[A-Za-z]{1,4}|[0-9]|[^A-Za-z0-9\s]"), 0
    )
    return F.size(pieces)


def stopword_hits(col: Column, lang: str) -> Column:
    words = tokenize_ws(F.lower(col))
    sw = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    return F.size(F.filter(words, lambda w: F.array_contains(sw, w)))


def lang_id(col: Column) -> Column:
    """Pick the language whose stopword list hits most; 'und' when nothing hits.
    Ties break by fixed language order (deterministic)."""
    langs = list(STOPWORDS)
    hits = [stopword_hits(col, lg) for lg in langs]
    best = F.greatest(*hits)
    expr = F.lit("und")
    for lg, h in reversed(list(zip(langs, hits))):
        expr = F.when((best > 0) & (h == best), F.lit(lg)).otherwise(expr)
    return expr


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length/punct/stopword quality features + a composite score in [0,1] —
    the usual pre-training heuristics (C4/Gopher-style rules, public)."""
    c = F.col(text_col)
    n_chars = F.length(c)
    words = tokenize_ws(c)
    n_words = F.size(words)
    mean_wlen = F.when(n_words > 0, n_chars / n_words).otherwise(F.lit(0.0))
    n_punct = F.length(c) - F.length(F.regexp_replace(c, r"[^\w\s]", ""))
    punct_ratio = F.when(n_chars > 0, n_punct / n_chars).otherwise(F.lit(0.0))
    n_digit = F.length(c) - F.length(F.regexp_replace(c, r"[0-9]", ""))
    digit_ratio = F.when(n_chars > 0, n_digit / n_chars).otherwise(F.lit(0.0))
    sw_ratio = F.when(
        n_words > 0, stopword_hits(c, "en") / n_words
    ).otherwise(F.lit(0.0))
    score = (
        F.when((n_words >= 5) & (n_words <= 100000), F.lit(0.4)).otherwise(F.lit(0.0))
        + F.when(punct_ratio < 0.2, F.lit(0.2)).otherwise(F.lit(0.0))
        + F.when(digit_ratio < 0.3, F.lit(0.2)).otherwise(F.lit(0.0))
        + F.when(sw_ratio > 0.01, F.lit(0.2)).otherwise(F.lit(0.0))
    )
    return df.select(
        "*",
        n_words.alias("n_words"),
        F.round(mean_wlen, 4).alias("mean_word_len"),
        F.round(punct_ratio, 4).alias("punct_ratio"),
        F.round(digit_ratio, 4).alias("digit_ratio"),
        F.round(sw_ratio, 4).alias("stopword_ratio"),
        F.round(score, 2).alias("quality_score"),
    )


def fingerprint64(col: Column) -> Column:
    """Document fingerprint: md5-based 64-bit value of the whitespace-normalized,
    lowercased text — the canonical exact-dup key."""
    norm = F.regexp_replace(F.lower(F.trim(col)), r"\s+", " ")
    return F.conv(F.substring(F.md5(norm), 1, 15), 16, 10).cast("bigint")


def rolling_fingerprint(col: Column, window: int = 16, keep: int = 4) -> Column:
    """Winnowing-style fingerprint: hash32 of every `window`-char gram, keep the
    `keep` smallest (sorted) — robust to small edits, still expression-only."""
    n = F.greatest(F.length(col) - F.lit(window - 1), F.lit(1))
    grams = F.transform(F.sequence(F.lit(1), n), lambda i: F.substring(col, i, window))
    hashes = F.transform(grams, hash32)
    return F.slice(F.array_sort(hashes), 1, keep)


def gopher_filters(df: DataFrame, text_col: str = "text") -> DataFrame:
    """The published Gopher document-quality rule set (Rae et al. 2021,
    table A1 — public), as pure-expression boolean columns + a composite
    ``gopher_keep``. Thresholds are the paper's:

      * 50 <= word count <= 100_000
      * 3 <= mean word length <= 10
      * symbol-to-word ratio <= 0.1  (symbols: ``#`` and ``...``)
      * < 90% of lines start with a bullet ("-", "*", "•")
      * < 30% of lines end with an ellipsis
      * >= 80% of words contain at least one alphabetic character
      * >= 2 hits from a small English stop-word list

    Everything stays in whole-stage codegen (split / filter / aggregate
    expressions — no UDF), so at 100 TB these rules ride the same scan as
    any other projection."""
    c = F.col(text_col)
    words = tokenize_ws(c)
    n_words = F.size(words)
    total_wlen = F.aggregate(
        words, F.lit(0), lambda acc, w: acc + F.length(w)
    )
    mean_wlen = F.when(n_words > 0, total_wlen / n_words).otherwise(F.lit(0.0))
    n_hash = F.size(F.filter(words, lambda w: w.contains("#")))
    n_ellip_w = F.size(F.filter(words, lambda w: w.contains("...")))
    sym_ratio = F.when(
        n_words > 0, (n_hash + n_ellip_w) / n_words
    ).otherwise(F.lit(0.0))
    lines = F.filter(F.split(c, "\n"), lambda l: F.length(F.trim(l)) > 0)
    n_lines = F.size(lines)
    bullet_frac = F.when(
        n_lines > 0,
        F.size(
            F.filter(
                lines,
                lambda l: F.trim(l).startswith("-")
                | F.trim(l).startswith("*")
                | F.trim(l).startswith("•"),
            )
        )
        / n_lines,
    ).otherwise(F.lit(0.0))
    ellipsis_frac = F.when(
        n_lines > 0,
        F.size(F.filter(lines, lambda l: F.rtrim(l).endswith("..."))) / n_lines,
    ).otherwise(F.lit(0.0))
    alpha_frac = F.when(
        n_words > 0,
        F.size(F.filter(words, lambda w: w.rlike("[A-Za-z]"))) / n_words,
    ).otherwise(F.lit(0.0))
    sw_hits = stopword_hits(c, "en")
    rules = {
        "r_word_count": (n_words >= 50) & (n_words <= 100_000),
        "r_mean_word_len": (mean_wlen >= 3) & (mean_wlen <= 10),
        "r_symbol_ratio": sym_ratio <= 0.1,
        "r_bullet_lines": bullet_frac < 0.9,
        "r_ellipsis_lines": ellipsis_frac < 0.3,
        "r_alpha_words": alpha_frac >= 0.8,
        "r_stopwords": sw_hits >= 2,
    }
    keep = None
    for expr in rules.values():
        keep = expr if keep is None else (keep & expr)
    return df.select(
        "*",
        *[e.alias(n) for n, e in rules.items()],
        keep.alias("gopher_keep"),
    )


def repetition_filters(df: DataFrame, text_col: str = "text") -> DataFrame:
    """MassiveText/RefinedWeb repetition rules (Rae et al. 2021 table A1,
    "repetitious text"): documents dominated by repeated lines or a single
    n-gram are boilerplate/spam. Adds per-doc fractions + a composite
    ``rep_keep`` with the paper's thresholds:

      * dup_line_frac       <= 0.30  (fraction of non-empty lines that are
                                      repeats of an earlier line)
      * dup_line_char_frac  <= 0.20  (fraction of line characters inside
                                      those repeats)
      * top_2gram_char_frac <= 0.20  (fraction of word characters covered by
                                      the most frequent word 2-gram; ties
                                      break to the lexicographically smallest
                                      gram so the statistic is deterministic)

    Line stats are pure array expressions (distinct-vs-all, in-scan, no
    shuffle). The top-2-gram needs a per-(doc, gram) count — one explode +
    one partial-aggregated groupBy, shuffling (doc_id, gram_hash-sized) rows;
    at 100 TB that is the same shape as the shingle pass in dedup_text and
    scales the same way."""
    c = F.col(text_col)
    lines = F.filter(
        # NOT `F.transform(..., F.trim)`: F.trim takes an optional second
        # parameter, so transform() would call it as (element, index) and
        # trim index digits instead of whitespace
        F.transform(F.split(c, "\n"), lambda l: F.trim(l)),
        lambda l: F.length(l) > 0,
    )
    n_lines = F.size(lines)
    dlines = F.array_distinct(lines)
    line_chars = F.aggregate(lines, F.lit(0), lambda a, l: a + F.length(l))
    dline_chars = F.aggregate(dlines, F.lit(0), lambda a, l: a + F.length(l))
    dup_line_frac = F.when(
        n_lines > 0, 1.0 - F.size(dlines) / n_lines
    ).otherwise(F.lit(0.0))
    dup_line_char_frac = F.when(
        line_chars > 0, 1.0 - dline_chars / line_chars
    ).otherwise(F.lit(0.0))

    words = tokenize_ws(c)
    word_chars = F.aggregate(words, F.lit(0), lambda a, w: a + F.length(w))
    base = df.select("*", dup_line_frac.alias("dup_line_frac"),
                     dup_line_char_frac.alias("dup_line_char_frac"),
                     word_chars.alias("_word_chars"))

    id_cols = [f for f in df.columns if f != text_col]
    grams = (
        df.select(*id_cols, tokenize_ws(c).alias("_w"))
        .where(F.size("_w") >= 2)
        .select(
            *id_cols,
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.size("_w") - 2),
                    lambda i: F.concat_ws(
                        " ", F.element_at(F.col("_w"), i + 1),
                        F.element_at(F.col("_w"), i + 2),
                    ),
                )
            ).alias("_gram"),
        )
    )
    counts = grams.groupBy(*id_cols, "_gram").agg(F.count(F.lit(1)).alias("_n"))
    from pyspark.sql import Window

    w = Window.partitionBy(*id_cols).orderBy(F.desc("_n"), F.asc("_gram"))
    top = (
        counts.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") == 1)
        .select(
            *id_cols,
            (F.col("_n") * (F.length("_gram") - 1)).alias("_top2_chars"),
        )
    )
    out = base.join(top, id_cols, "left").select(
        "*",
        F.when(
            (F.col("_word_chars") > 0) & F.col("_top2_chars").isNotNull(),
            F.col("_top2_chars") / F.col("_word_chars"),
        )
        .otherwise(F.lit(0.0))
        .alias("top_2gram_char_frac"),
    )
    keep = (
        (F.col("dup_line_frac") <= 0.30)
        & (F.col("dup_line_char_frac") <= 0.20)
        & (F.col("top_2gram_char_frac") <= 0.20)
    )
    return out.select(
        *df.columns, "dup_line_frac", "dup_line_char_frac",
        "top_2gram_char_frac", keep.alias("rep_keep"),
    )


PII_EMAIL = r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}"
PII_IPV4 = r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b"
PII_PHONE = r"\+[0-9]{1,3}[ \-][0-9]{2,4}([ \-][0-9]{2,4}){1,3}"


def pii_scrub(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Training-data PII redaction (the standard pre-release scrub): replace
    emails, IPv4 addresses and international-format phone numbers with typed
    placeholder tokens, and count each per document (the counts feed audit
    metrics / routing, e.g. quarantine docs above a PII threshold).

    Regexes are RE2-safe (no lookaround) so the exact same pattern runs in
    Spark (Java regex) and the DuckDB oracle (RE2). Pure regexp_replace
    expressions — in-scan at 100 TB, no shuffle, no UDF."""
    c = F.col(text_col)
    email, ipv4, phone = PII_EMAIL, PII_IPV4, PII_PHONE

    def count(pat: str) -> Column:
        # regexp_count, not size(split())-1: engines disagree on whether a
        # trailing match leaves a trailing empty split element
        return F.regexp_count(c, F.lit(pat)).cast("int")

    scrubbed = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(c, email, "<EMAIL>"), ipv4, "<IP>"
        ),
        phone,
        "<PHONE>",
    )
    return df.select(
        "*",
        count(email).alias("n_emails"),
        count(ipv4).alias("n_ips"),
        count(phone).alias("n_phones"),
        scrubbed.alias("text_scrubbed"),
    )
