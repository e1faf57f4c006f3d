from pyspark.sql import functions as F

from tg_data_connector_spark.functions.hashing import hash32, minhash_signature, shingles
from tg_data_connector_spark.operators.dedup_text import (
    dedup_exact,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash32,
)
from tg_data_connector_spark.operators.text import (
    fingerprint64,
    lang_id,
    quality_features,
    token_count,
)


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
    )


def test_hash32_range_and_determinism(spark):
    df = spark.createDataFrame([("abc",), ("abc",), ("xyz",)], "v string")
    vals = [r[0] for r in df.select(hash32(F.col("v")).alias("h")).collect()]
    assert vals[0] == vals[1] != vals[2]
    assert all(0 <= v < 2**32 for v in vals)


def test_shingles(spark):
    df = spark.createDataFrame([("abcdef",), ("ab",)], "v string")
    out = [r[0] for r in df.select(shingles(F.col("v"), 3).alias("s")).collect()]
    assert out[0] == ["abc", "bcd", "cde", "def"]
    assert out[1] == ["ab"]  # shorter than k: one truncated shingle


def test_minhash_similar_docs_share_signature_entries(spark):
    a = "the quick brown fox jumps over the lazy dog again and again"
    b = "the quick brown fox jumps over the lazy dog again and again!"
    c = "completely different content with nothing shared at all here"
    df = _docs(spark, [a, b, c])
    sig = df.select(
        "doc_id",
        minhash_signature(F.transform(shingles(F.col("text"), 5), hash32), 16).alias(
            "sig"
        ),
    ).collect()
    sigs = {r["doc_id"]: r["sig"] for r in sig}
    overlap_ab = sum(x == y for x, y in zip(sigs[0], sigs[1]))
    overlap_ac = sum(x == y for x, y in zip(sigs[0], sigs[2]))
    assert overlap_ab > 10 and overlap_ac <= 2


def test_dedup_exact_normalizes_whitespace_and_case(spark):
    df = _docs(spark, ["Hello  World", "hello world", "other doc"])
    out = dedup_exact(df)
    assert out.count() == 2
    assert out.agg(F.min("doc_id")).collect()[0][0] == 0


def test_ngram_jaccard_finds_near_dups(spark):
    base = "the quick brown fox jumps over the lazy dog " * 3
    df = _docs(spark, [base, base + "tail", "unrelated text entirely different"])
    pairs = ngram_jaccard_pairs(df, threshold=0.5).collect()
    assert [(r["a"], r["b"]) for r in pairs] == [(0, 1)]
    assert pairs[0]["jaccard"] > 0.8


def test_minhash_lsh_recall_on_near_dups(spark):
    base = "the quick brown fox jumps over the lazy dog " * 3
    df = _docs(spark, [base, base + "x", "unrelated text entirely different stuff"])
    pairs = {(r["a"], r["b"]) for r in minhash_lsh_pairs(df).collect()}
    assert (0, 1) in pairs and (0, 2) not in pairs


def test_simhash_near_for_near_dups(spark):
    base = "the quick brown fox jumps over the lazy dog " * 3
    df = _docs(spark, [base, base, "unrelated text entirely different stuff"])
    out = {r["doc_id"]: r["h"] for r in
           df.select("doc_id", simhash32(F.col("text")).alias("h")).collect()}
    assert out[0] == out[1] != out[2]
    assert 0 <= out[0] < 2**32


def test_token_count_and_quality(spark):
    df = _docs(spark, ["the cat sat on the mat", "", "x"])
    counts = [r[0] for r in df.select(token_count(F.col("text")).alias("n")).collect()]
    assert counts == [6, 0, 1]
    q = {r["doc_id"]: r for r in quality_features(df).collect()}
    assert q[0]["quality_score"] > q[1]["quality_score"]
    assert q[0]["stopword_ratio"] > 0.3  # 'the' twice, 'on' once / 6


def test_lang_id(spark):
    df = _docs(
        spark,
        [
            "the cat and the dog sat in a house that is big",
            "der Hund und die Katze sind nicht ein Problem",
            "le chat et la souris sont dans les maisons",
            "zzz qqq www",
        ],
    )
    out = [r[0] for r in df.select(lang_id(F.col("text")).alias("lg")).collect()]
    assert out == ["en", "de", "fr", "und"]


def test_fingerprint64_stable(spark):
    df = _docs(spark, ["Some   Text", "some text", "different"])
    out = [r[0] for r in df.select(fingerprint64(F.col("text")).alias("f")).collect()]
    assert out[0] == out[1] != out[2]


def test_ngram_jaccard_broadcasts_blocklist_not_keeplist(spark):
    """The only broadcast in the ngram-jaccard plan must be the tiny
    hot-shingle blocklist via LEFT ANTI join — broadcasting the corpus-sized
    keep-list OOMs executors at scale (round-1 verdict)."""
    from tg_data_connector_spark.operators.dedup_text import ngram_jaccard_pairs

    df = spark.createDataFrame(
        [(i, f"common prefix text number {i}") for i in range(30)],
        "doc_id long, text string",
    )
    plan = ngram_jaccard_pairs(df, "doc_id", "text")._jdf.queryExecution().executedPlan().toString()
    assert "LeftAnti, BuildRight" in plan or (
        "BroadcastHashJoin" in plan and "LeftAnti" in plan
    ), plan[:2000]


def test_connected_components_and_canonical(spark):
    """Min-label propagation: chains (worst-case diameter), cliques, pair,
    self-loop, singleton corpus docs; canonical assignment covers them all."""
    from pyspark.sql import functions as F

    from tg_data_connector_spark.operators.dedup_text import (
        connected_components,
        dedup_canonical,
    )

    pairs = spark.createDataFrame(
        [(2, 1), (2, 3), (3, 4), (4, 5),      # chain: diameter 4
         (10, 11), (11, 12), (10, 12),        # clique
         (20, 21),                            # pair
         (30, 30)],                           # self-loop: own component
        "a int, b int",
    )
    cc = {r["id"]: r["comp"] for r in connected_components(pairs).collect()}
    assert all(cc[i] == 1 for i in (1, 2, 3, 4, 5))
    assert all(cc[i] == 10 for i in (10, 11, 12))
    assert cc[20] == cc[21] == 20 and cc[30] == 30
    docs = spark.range(32).select(F.col("id").cast("int").alias("doc_id"))
    can = {r["doc_id"]: r["canonical"] for r in dedup_canonical(docs, pairs).collect()}
    assert can[5] == 1 and can[12] == 10 and can[21] == 20
    assert can[7] == 7 and can[31] == 31  # singletons keep themselves
    assert len(can) == 32
    # keep-set size: 32 docs - (4 + 2 + 1 dropped) = 25
    assert sum(1 for k, v in can.items() if k == v) == 25


def test_gopher_filters_rules(spark):
    """Hand-built docs pinning each Gopher rule's trigger."""
    from tg_data_connector_spark.operators.text import gopher_filters

    # 60 words, mean word length ~3.8, plenty of stop words
    good = ("the quick brown fox jumps over the lazy dog today " * 6).strip()
    rows = [
        ("good", good),
        ("short", "the and of"),                              # < 50 words
        ("symbols", " ".join(["#tag"] * 60)),                  # sym ratio 1.0
        ("bullets", "\n".join(["- item the and"] * 10)),       # 90%+ bullet lines
        ("numeric", " ".join(["123"] * 60)),                   # no alpha words
    ]
    got = {
        r["doc_id"]: r
        for r in gopher_filters(
            spark.createDataFrame(rows, "doc_id string, text string"), "text"
        ).collect()
    }
    assert got["good"]["gopher_keep"]
    assert not got["short"]["r_word_count"]
    assert not got["symbols"]["r_symbol_ratio"]
    assert not got["bullets"]["r_bullet_lines"]
    assert not got["numeric"]["r_alpha_words"]
    assert not got["numeric"]["r_stopwords"]
    assert all(not got[k]["gopher_keep"] for k in
               ("short", "symbols", "bullets", "numeric"))


def test_repetition_filters_known_doc(spark):
    from tg_data_connector_spark.operators.text import repetition_filters

    docs = spark.createDataFrame(
        [
            # 4 lines, "dup dup" repeated: heavy repetition -> rejected
            (1, "dup dup\ndup dup\ndup dup\nother line"),
            # clean prose, no repeated lines or dominant 2-gram
            (2, "a quick brown fox jumps over the lazy old dog"),
            (3, ""),  # empty -> all fracs 0, kept
        ],
        "doc_id int, text string",
    )
    rows = {r["doc_id"]: r for r in repetition_filters(docs).collect()}
    r1 = rows[1]
    assert abs(r1["dup_line_frac"] - 0.5) < 1e-9  # 4 lines, 2 distinct
    # line chars: 3*7+10=31, distinct 7+10=17 -> 1-17/31
    assert abs(r1["dup_line_char_frac"] - (1 - 17 / 31)) < 1e-9
    # top 2-gram "dup dup" occurs 3x (within lines; text keeps \n so grams
    # split on whitespace incl newline): verify dominance and rejection
    assert r1["top_2gram_char_frac"] > 0.2 and not r1["rep_keep"]
    assert rows[2]["rep_keep"] and rows[2]["dup_line_frac"] == 0.0
    assert rows[3]["rep_keep"] and rows[3]["top_2gram_char_frac"] == 0.0


def test_pii_scrub_counts_and_redaction(spark):
    from tg_data_connector_spark.operators.text import pii_scrub

    docs = spark.createDataFrame(
        [
            (1, "mail a.b+c@ex.org and d@sub.ex.co.uk ip 192.168.0.1 "
                "tel +44 20-7946-0958 end"),
            (2, "no pii here"),
        ],
        "doc_id int, text string",
    )
    rows = {r["doc_id"]: r for r in pii_scrub(docs).collect()}
    r1 = rows[1]
    assert (r1["n_emails"], r1["n_ips"], r1["n_phones"]) == (2, 1, 1)
    assert "<EMAIL>" in r1["text_scrubbed"] and "<IP>" in r1["text_scrubbed"]
    assert "<PHONE>" in r1["text_scrubbed"]
    assert "a.b+c@ex.org" not in r1["text_scrubbed"]
    assert "192.168.0.1" not in r1["text_scrubbed"]
    r2 = rows[2]
    assert (r2["n_emails"], r2["n_ips"], r2["n_phones"]) == (0, 0, 0)
    assert r2["text_scrubbed"] == "no pii here"
