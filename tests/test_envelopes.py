"""Debezium / Maxwell envelope adapters: literal-JSON parse pins (independent
of the encoder), lossless round trip, quarantine of unparseable values, and a
full replay fed straight from a Debezium topic frame."""

from pyspark.sql import functions as F

from tg_data_connector_spark.cdc import (
    ReplayConfig,
    ReplayEngine,
    gen_changelog,
    gen_seed_sequences,
)
from tg_data_connector_spark.cdc.envelopes import (
    from_debezium,
    from_maxwell,
    to_debezium,
)
from tg_data_connector_spark.lake import LakeTable, TableSchema

from oracle import oracle_final_state

ROW_DDL = "doc_id string, tokens array<int>, n_tok int, source string"
TOPIC = "value string, partition int, offset bigint"


def test_debezium_literal_envelopes(spark):
    """Hand-written envelopes in the real Debezium shape — op mapping,
    delete-key-from-before, lsn/sequence version extraction."""
    rows = [
        ('{"before": null, "after": {"doc_id": "d1", "tokens": [1,2], '
         '"n_tok": 2, "source": "s"}, "source": {"lsn": 700, "sequence": '
         '"3"}, "op": "c", "ts_ms": 111}', 0, 10),
        ('{"before": {"doc_id": "d1", "tokens": [1,2], "n_tok": 2, '
         '"source": "s"}, "after": null, "source": {"lsn": 701, "sequence": '
         'null}, "op": "d", "ts_ms": 112}', 0, 11),
        ('{"before": null, "after": {"doc_id": "d2", "tokens": [5], '
         '"n_tok": 1, "source": "s"}, "op": "r", "ts_ms": 113}', 1, 0),
        ('{"before": {"doc_id": "d2", "tokens": [5], "n_tok": 1, "source": '
         '"s"}, "after": {"doc_id": "d2", "tokens": [6], "n_tok": 1, '
         '"source": "s"}, "source": {"lsn": 705, "sequence": "x9"}, '
         '"op": "u", "ts_ms": 114}', 1, 1),
    ]
    got = {
        (r["part"], r["offset"]): r
        for r in from_debezium(
            spark.createDataFrame(rows, TOPIC), ROW_DDL
        ).collect()
    }
    ins = got[(0, 10)]
    assert (ins["op"], ins["commit_lsn"], ins["seq_no"]) == ("I", 700, 3)
    assert ins["doc_id"] == "d1" and ins["tokens"] == [1, 2]
    dele = got[(0, 11)]
    assert dele["op"] == "D" and dele["doc_id"] == "d1"  # image from `before`
    assert dele["tokens"] == [1, 2] and dele["seq_no"] == 0
    snap = got[(1, 0)]
    assert snap["op"] == "I" and snap["commit_lsn"] == 113  # lsn <- ts_ms
    upd = got[(1, 1)]
    assert upd["op"] == "U" and upd["tokens"] == [6]
    assert upd["seq_no"] == 0  # non-numeric sequence -> default


def test_maxwell_literal_envelopes(spark):
    rows = [
        ('{"type": "insert", "data": {"doc_id": "d1", "tokens": [1], '
         '"n_tok": 1, "source": "s"}, "ts": 50, "xid": 900, "xoffset": 2}',
         0, 0),
        ('{"type": "delete", "data": {"doc_id": "d1", "tokens": null, '
         '"n_tok": null, "source": null}, "ts": 51, "xid": 901, '
         '"xoffset": 0}', 0, 1),
        ('{"type": "update", "data": {"doc_id": "d3", "tokens": [7,8], '
         '"n_tok": 2, "source": "s"}, "old": {"tokens": [9]}, "ts": 52}',
         1, 0),
    ]
    got = {
        (r["part"], r["offset"]): r
        for r in from_maxwell(
            spark.createDataFrame(rows, TOPIC), ROW_DDL
        ).collect()
    }
    assert (got[(0, 0)]["op"], got[(0, 0)]["commit_lsn"],
            got[(0, 0)]["seq_no"]) == ("I", 900, 2)
    assert got[(0, 1)]["op"] == "D" and got[(0, 1)]["doc_id"] == "d1"
    upd = got[(1, 0)]
    assert upd["op"] == "U" and upd["commit_lsn"] == 52  # xid absent -> ts
    assert upd["tokens"] == [7, 8]


def test_unparseable_value_lands_in_quarantine_shape(spark):
    """A corrupt topic value must come out with a NULL key + NULL op — the
    shape the engine's dirty-record quarantine (E1) catches — never raise."""
    rows = [("this is not json", 0, 0), ('{"op": "z"}', 0, 1)]
    got = from_debezium(spark.createDataFrame(rows, TOPIC), ROW_DDL).collect()
    assert all(r["doc_id"] is None for r in got)
    assert all(r["op"] is None for r in got)
    from tg_data_connector_spark.cdc.quality import dirty_predicate

    dirty = (
        from_debezium(spark.createDataFrame(rows, TOPIC), ROW_DDL)
        .where(dirty_predicate())
        .count()
    )
    assert dirty == 2


def test_debezium_round_trip_lossless(spark):
    """encode -> decode recovers every engine-relevant column exactly,
    including dirty rows (n_tok mismatch) and deletes."""
    log = gen_changelog(spark, 2000, 300, n_parts=4)
    cols = ["op", "commit_lsn", "seq_no", "doc_id", "tokens", "n_tok",
            "source", "part", "offset"]
    topic = to_debezium(log, ["doc_id", "tokens", "n_tok", "source"])
    back = from_debezium(topic, ROW_DDL, seq_expr=None)
    orig = log.select(cols)
    # seq_no rides source.sequence; everything else must match row-for-row
    mism = orig.exceptAll(back.select(cols)).count() + back.select(
        cols
    ).exceptAll(orig).count()
    assert mism == 0


def test_replay_from_debezium_topic(spark, tmp_path):
    """Full engine run fed from the topic frame: equals the window oracle."""
    schema = TableSchema(
        [("doc_id", "string"), ("tokens", "array<int>"), ("n_tok", "int"),
         ("source", "string")]
    )
    t = LakeTable.create(spark, str(tmp_path / "t"), schema, "doc_id", 8)
    seed = gen_seed_sequences(spark, 300)
    t.append(seed)
    log = gen_changelog(spark, 4000, 600, n_parts=4)
    topic = to_debezium(log, ["doc_id", "tokens", "n_tok", "source"])
    eng = ReplayEngine(spark, t, ReplayConfig(events_per_batch=1000))
    eng.replay(from_debezium(topic, ROW_DDL), run_id="dbz")
    e = t.read().select("doc_id", "tokens", "n_tok", "source")
    o = oracle_final_state(seed, log).select("doc_id", "tokens", "n_tok", "source")
    assert e.exceptAll(o).count() + o.exceptAll(e).count() == 0


def test_canal_literal_envelopes(spark):
    """Hand-written Canal FlatMessage envelopes: multi-row data array with
    positional seq, all-string cells cast to typed columns, DDL envelope
    routed to quarantine (null op), unparseable cell -> null -> dirty."""
    from tg_data_connector_spark.cdc.envelopes import from_canal

    rows = [
        ('{"data": [{"doc_id": "d1", "tokens": "[1,2]", "n_tok": "2", '
         '"source": "s"}, {"doc_id": "d2", "tokens": "[5]", "n_tok": "1", '
         '"source": "s"}], "type": "INSERT", "isDdl": false, "id": 700, '
         '"es": 1}', 0, 10),
        ('{"data": [{"doc_id": "d1", "tokens": null, "n_tok": null, '
         '"source": null}], "type": "DELETE", "isDdl": false, "id": 701, '
         '"es": 2}', 0, 11),
        ('{"data": null, "type": "ALTER", "isDdl": true, "sql": '
         '"ALTER TABLE t ADD c INT", "id": 702, "es": 3}', 0, 12),
        ('{"data": [{"doc_id": "d3", "tokens": "oops", "n_tok": "x", '
         '"source": "s"}], "type": "UPDATE", "isDdl": false, "id": 703, '
         '"es": 4}', 1, 0),
    ]
    got = from_canal(spark.createDataFrame(rows, TOPIC), ROW_DDL).collect()
    by_key = {(r["commit_lsn"], r["seq_no"]): r for r in got}
    a, b = by_key[(700, 0)], by_key[(700, 1)]
    assert (a["op"], a["doc_id"], a["tokens"], a["n_tok"]) == ("I", "d1", [1, 2], 2)
    assert (b["op"], b["doc_id"], b["tokens"]) == ("I", "d2", [5])
    d = by_key[(701, 0)]
    assert (d["op"], d["doc_id"], d["tokens"]) == ("D", "d1", None)
    ddl = by_key[(702, 0)]
    assert ddl["op"] is None and ddl["doc_id"] is None  # -> dirty quarantine
    bad = by_key[(703, 0)]
    assert bad["op"] == "U" and bad["tokens"] is None and bad["n_tok"] is None


def test_canal_roundtrip_replay_matches_oracle(spark, tmp_path):
    """Engine events -> Canal JSON -> engine events -> full replay: final
    state equals the oracle (string-typed codec is lossless end-to-end)."""
    from tg_data_connector_spark.cdc.envelopes import from_canal, to_canal

    log = gen_changelog(spark, 2000, 300, n_parts=4)
    seed = gen_seed_sequences(spark, 200)
    table = LakeTable.create(
        spark, str(tmp_path / "tbl"), TableSchema(
            [("doc_id", "string"), ("tokens", "array<int>"),
             ("n_tok", "int"), ("source", "string")]
        ), "doc_id", 8,
    )
    table.append(seed)
    decoded = from_canal(
        to_canal(log, ["doc_id", "tokens", "n_tok", "source"]), ROW_DDL
    )
    ReplayEngine(spark, table, ReplayConfig()).replay(decoded, run_id="c1")
    expected = oracle_final_state(seed, log)
    got = table.read().select("doc_id", "tokens", "n_tok", "source")
    assert got.exceptAll(expected).count() == 0
    assert expected.exceptAll(got).count() == 0


def test_canal_and_debezium_roundtrip_adversarial_strings(spark):
    """Codec torture row set: JSON metacharacters, unicode, newlines, empty
    strings, nulls, and extreme ints must survive encode->decode BYTE-EXACT
    through both the Canal (all-string cells) and Debezium (typed image)
    envelopes."""
    from tg_data_connector_spark.cdc.envelopes import (
        from_canal,
        from_debezium,
        to_canal,
        to_debezium,
    )

    rows = [
        ("I", 1, 0, 'd"quote"', [0], 1, 'back\\slash'),
        ("U", 2, 3, "d,comma{}", [2147483647, -2147483648], 2, "line\nbreak"),
        ("U", 3, 1, "dünicode中", [], 0, " sep"),
        ("D", 4, 2, "dtab\there", None, None, None),
        ("I", 5, 0, "", [1, 2, 3], 3, ""),
        ("I", 9223372036854775807, 6, "dmax", [7], 1, "s"),
    ]
    ddl = (
        "op string, commit_lsn bigint, seq_no bigint, doc_id string, "
        "tokens array<int>, n_tok int, source string"
    )
    ev = spark.createDataFrame(rows, ddl).select(
        "*", F.lit(0).alias("part"), F.monotonically_increasing_id().alias("offset")
    )
    cols = ["op", "commit_lsn", "doc_id", "tokens", "n_tok", "source"]

    via_canal = from_canal(to_canal(ev, ["doc_id", "tokens", "n_tok", "source"]), ROW_DDL)
    assert ev.select(cols).exceptAll(via_canal.select(cols)).count() == 0
    assert via_canal.select(cols).exceptAll(ev.select(cols)).count() == 0

    via_dbz = from_debezium(to_debezium(ev, ["doc_id", "tokens", "n_tok", "source"]), ROW_DDL)
    # Debezium also preserves seq_no exactly (rides source.sequence)
    cols_dbz = cols + ["seq_no"]
    assert ev.select(cols_dbz).exceptAll(via_dbz.select(cols_dbz)).count() == 0
    assert via_dbz.select(cols_dbz).exceptAll(ev.select(cols_dbz)).count() == 0
