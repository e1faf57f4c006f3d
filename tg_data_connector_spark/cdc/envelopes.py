"""CDC envelope adapters: Debezium / Maxwell JSON -> the engine's event shape.

A real binlog/WAL tail rarely arrives as clean typed columns — it arrives as a
Kafka topic of JSON change envelopes in one of a few public formats. These
adapters map the two most common ones onto the replay engine's event schema
(op, commit_lsn, seq_no, <row columns>, part, offset) with pure JVM-side
expressions (``from_json`` + column ops — no Python in the path), so a topic
can feed ``ReplayEngine.replay`` directly.

The reference's closest analog is its column-mapping reader config (each
source row is positionally mapped to typed columns, SURVEY §1.3/§2.1); here
the "mapping" is the envelope contract itself.

Shapes handled (public formats):

* **Debezium** (``io.debezium``): ``{"before": {...}|null, "after":
  {...}|null, "source": {"lsn": ..., "sequence": ...}, "op": "c|u|d|r",
  "ts_ms": ...}``. op ``c``/``r`` (create / snapshot-read) -> I, ``u`` -> U,
  ``d`` -> D. The row image comes from ``after`` (``before`` — the last known
  row — for deletes). Version defaults: ``commit_lsn = source.lsn`` (falls back to
  ``ts_ms``), ``seq_no = 0`` — override with ``lsn_expr``/``seq_expr`` for
  connectors that populate ``source.sequence`` or per-tx indexes.
* **Maxwell** (Zendesk Maxwell daemon): ``{"type": "insert|update|delete",
  "data": {...}, "old": {...}, "ts": ..., "xid": ..., "xoffset": ...}``.
  Version defaults: ``commit_lsn = xid`` (falls back to ``ts``),
  ``seq_no = xoffset`` (the statement index within the transaction — exactly
  the engine's (commit_lsn, seq_no) contract).

Both take the Kafka frame shape (a string/binary value column plus the
topic's ``partition``/``offset`` columns) and return the engine's event
frame; rows whose value fails to parse come back with a NULL key and are
caught by the engine's dirty-record quarantine (E1) rather than dropped
silently.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

def _op_case(raw: Column, pairs: dict[str, str]) -> Column:
    out = F.lit(None).cast("string")
    expr = None
    for k, v in pairs.items():
        cond = raw == F.lit(k)
        expr = F.when(cond, F.lit(v)) if expr is None else expr.when(cond, F.lit(v))
    return expr.otherwise(out) if expr is not None else out


def from_debezium(
    df: DataFrame,
    row_ddl: str,
    value_col: str = "value",
    part_col: str = "partition",
    offset_col: str = "offset",
    lsn_expr: Column | None = None,
    seq_expr: Column | None = None,
) -> DataFrame:
    """Parse a Debezium-envelope topic into the engine's event frame.

    ``row_ddl``: the row schema inside ``before``/``after``, e.g.
    ``"doc_id string, tokens array<int>, n_tok int, source string"`` (the
    input_hint sequence-table shape). The first field is taken as the key
    column: deletes carry it from ``before`` when ``after`` is null.
    """
    env_ddl = (
        f"before struct<{row_ddl}>, after struct<{row_ddl}>, "
        "source struct<lsn bigint, sequence string, ts_ms bigint>, "
        "op string, ts_ms bigint"
    )
    e = F.from_json(F.col(value_col).cast("string"), env_ddl)
    names = [f.split()[0] for f in _split_ddl(row_ddl)]
    key = names[0]
    op = _op_case(e["op"], {"c": "I", "r": "I", "u": "U", "d": "D"})
    lsn = (
        lsn_expr
        if lsn_expr is not None
        else F.coalesce(e["source"]["lsn"], e["ts_ms"]).cast("bigint")
    )
    # Debezium's source.sequence carries connector-specific ordering info (a
    # string); when it parses as an integer it is the natural per-lsn index,
    # else the seq defaults to 0 (one event per lsn)
    seq = (
        seq_expr
        if seq_expr is not None
        else F.coalesce(
            e["source"]["sequence"].try_cast("bigint"), F.lit(0)
        ).cast("bigint")
    )
    # row image: ``after`` for create/read/update, ``before`` for delete
    # (Debezium deletes carry the last known row as the before-image). A
    # plain coalesce(after, before) per column would be wrong for updates
    # that legitimately set a column to NULL.
    img = F.when(e["op"] == F.lit("d"), e["before"]).otherwise(e["after"])
    cols = [
        op.alias("op"),
        lsn.alias("commit_lsn"),
        seq.alias("seq_no"),
        *[img[c].alias(c) for c in names],
        F.col(part_col).cast("int").alias("part"),
        F.col(offset_col).cast("bigint").alias("offset"),
    ]
    return df.select(cols)


def from_maxwell(
    df: DataFrame,
    row_ddl: str,
    value_col: str = "value",
    part_col: str = "partition",
    offset_col: str = "offset",
    lsn_expr: Column | None = None,
    seq_expr: Column | None = None,
) -> DataFrame:
    """Parse a Maxwell-envelope topic into the engine's event frame. Same
    contract as ``from_debezium``; Maxwell's ``(xid, xoffset)`` maps directly
    onto the engine's ``(commit_lsn, seq_no)`` version pair."""
    env_ddl = (
        f"type string, data struct<{row_ddl}>, old struct<{row_ddl}>, "
        "ts bigint, xid bigint, xoffset bigint"
    )
    e = F.from_json(F.col(value_col).cast("string"), env_ddl)
    names = [f.split()[0] for f in _split_ddl(row_ddl)]
    key = names[0]
    op = _op_case(
        e["type"],
        {"insert": "I", "bootstrap-insert": "I", "update": "U", "delete": "D"},
    )
    lsn = (
        lsn_expr
        if lsn_expr is not None
        else F.coalesce(e["xid"], e["ts"]).cast("bigint")
    )
    seq = (
        seq_expr
        if seq_expr is not None
        else F.coalesce(e["xoffset"], F.lit(0)).cast("bigint")
    )
    cols = [
        op.alias("op"),
        lsn.alias("commit_lsn"),
        seq.alias("seq_no"),
        e["data"][key].alias(key),
        *[e["data"][c].alias(c) for c in names[1:]],
        F.col(part_col).cast("int").alias("part"),
        F.col(offset_col).cast("bigint").alias("offset"),
    ]
    return df.select(cols)


def from_canal(
    df: DataFrame,
    row_ddl: str,
    value_col: str = "value",
    part_col: str = "partition",
    offset_col: str = "offset",
    lsn_expr: Column | None = None,
    seq_expr: Column | None = None,
) -> DataFrame:
    """Parse an Alibaba Canal FlatMessage topic into the engine's event frame.

    Canal's JSON shape (public format, ``canal.protocol FlatMessage``):
    ``{"data": [{...}, ...], "old": [...], "type": "INSERT|UPDATE|DELETE",
    "isDdl": bool, "sql": "...", "database": ..., "table": ...,
    "id": <batch id>, "es": <binlog ms>, "ts": <ack ms>}`` — with TWO quirks
    the other adapters don't have: ``data`` is an ARRAY (one envelope can
    carry a whole statement's rows, ordered), and every cell value is a
    STRING (Canal serializes all column values as text).

    Mapping: ``commit_lsn = id`` (falls back to ``es``); ``seq_no`` = the
    row's position within the envelope (Canal's intra-batch order IS the
    statement order — the same contract as Maxwell's ``xoffset``); cells are
    cast to ``row_ddl`` types (``from_json`` for nested types, ``try_cast``
    for primitives — a cell that doesn't parse becomes NULL and quarantines).
    DDL envelopes (``isDdl=true``) yield one row with a NULL op: raw ALTER
    SQL cannot be auto-applied, so it routes to the dirty quarantine where
    an operator sees it, rather than being silently dropped."""
    env_ddl = (
        "data array<map<string,string>>, type string, isDdl boolean, "
        "id bigint, es bigint, ts bigint, sql string"
    )
    fields = [
        (f.split(None, 1)[0], f.split(None, 1)[1])
        for f in _split_ddl(row_ddl)
    ]
    e = F.from_json(F.col(value_col).cast("string"), env_ddl)
    x = df.select(
        e.alias("_e"),
        F.col(part_col).cast("int").alias("part"),
        F.col(offset_col).cast("bigint").alias("offset"),
    ).select(
        "*", F.posexplode_outer(F.col("_e")["data"]).alias("_pos", "_row")
    )
    env = F.col("_e")
    op = F.when(
        F.coalesce(env["isDdl"], F.lit(False)), F.lit(None).cast("string")
    ).otherwise(
        _op_case(env["type"], {"INSERT": "I", "UPDATE": "U", "DELETE": "D"})
    )
    lsn = (
        lsn_expr
        if lsn_expr is not None
        else F.coalesce(env["id"], env["es"]).cast("bigint")
    )
    seq = (
        seq_expr
        if seq_expr is not None
        else F.coalesce(F.col("_pos"), F.lit(0)).cast("bigint")
    )

    def cell(name: str, typ: str) -> Column:
        v = F.try_element_at(F.col("_row"), F.lit(name))
        return (F.from_json(v, typ) if "<" in typ else v.try_cast(typ)).alias(
            name
        )

    return x.select(
        op.alias("op"),
        lsn.alias("commit_lsn"),
        seq.alias("seq_no"),
        *[cell(n, t) for n, t in fields],
        F.col("part"),
        F.col("offset"),
    )


def to_canal(df: DataFrame, row_cols: list[str]) -> DataFrame:
    """Inverse adapter (testing + sink symmetry): encode the engine's event
    frame as Canal FlatMessage JSON. Events sharing a ``commit_lsn`` ride ONE
    envelope with ``data`` ordered by ``seq_no`` (Canal's row order carries
    the intra-transaction sequence), and every cell value is stringified the
    way Canal does (nested types as JSON text)."""
    import pyspark.sql.types as T

    def as_text(c: str) -> Column:
        typ = df.schema[c].dataType
        if isinstance(typ, (T.ArrayType, T.MapType, T.StructType)):
            return F.to_json(F.col(c))
        return F.col(c).cast("string")

    row_map = F.create_map(
        *[x for c in row_cols for x in (F.lit(c), as_text(c))]
    )
    typed = df.select(
        F.col("op"),
        F.col("commit_lsn"),
        F.col("seq_no"),
        row_map.alias("_row"),
        F.col("part").cast("int").alias("part"),
        F.col("offset").cast("bigint").alias("offset"),
    )
    grouped = (
        typed.groupBy("commit_lsn", "op")
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("seq_no"), F.col("_row"))),
                # explicit comparator: default struct ordering can't compare
                # the map-typed _row field
                lambda a, b: F.when(a["seq_no"] < b["seq_no"], -1)
                .when(a["seq_no"] > b["seq_no"], 1)
                .otherwise(0),
            ).alias("_rows"),
            F.min("part").alias("part"),
            F.min("offset").alias("offset"),
        )
    )
    env = F.struct(
        F.transform(F.col("_rows"), lambda r: r["_row"]).alias("data"),
        F.when(F.col("op") == "D", F.lit("DELETE"))
        .when(F.col("op") == "U", F.lit("UPDATE"))
        .otherwise(F.lit("INSERT"))
        .alias("type"),
        F.lit(False).alias("isDdl"),
        F.col("commit_lsn").alias("id"),
        F.lit(None).cast("bigint").alias("es"),
        F.lit(None).cast("bigint").alias("ts"),
        F.lit(None).cast("string").alias("sql"),
    )
    return grouped.select(
        F.to_json(env).alias("value"),
        F.col("part").alias("partition"),
        F.col("offset"),
    )


def to_debezium(
    df: DataFrame,
    row_cols: list[str],
    key: str | None = None,
) -> DataFrame:
    """Inverse adapter (testing + sink symmetry): encode the engine's event
    frame as Debezium-envelope JSON strings with the topic frame shape
    (value/partition/offset). Deletes carry the key in ``before`` and a null
    ``after`` — the exact shape ``from_debezium`` decodes."""
    key = key or row_cols[0]
    is_del = F.col("op") == "D"
    row = F.struct(*[F.col(c) for c in row_cols])
    after = F.when(~is_del, row)
    before = F.when(is_del, row)  # delete carries the full before-image
    env = F.struct(
        before.alias("before"),
        after.alias("after"),
        F.struct(
            F.col("commit_lsn").alias("lsn"),
            # seq_no rides source.sequence (the field real connectors use for
            # intra-lsn ordering) so the round trip is lossless
            F.col("seq_no").cast("string").alias("sequence"),
            F.lit(None).cast("bigint").alias("ts_ms"),
        ).alias("source"),
        F.when(is_del, F.lit("d"))
        .when(F.col("op") == "U", F.lit("u"))
        .otherwise(F.lit("c"))
        .alias("op"),
        F.lit(None).cast("bigint").alias("ts_ms"),
    )
    return df.select(
        F.to_json(env).alias("value"),
        F.col("part").cast("int").alias("partition"),
        F.col("offset").cast("bigint").alias("offset"),
    )


def _split_ddl(ddl: str) -> list[str]:
    """Split a DDL field list on TOP-LEVEL commas (commas inside
    ``array<...>`` / ``struct<...>`` / ``map<...>`` don't count)."""
    out, depth, cur = [], 0, []
    for ch in ddl:
        if ch == "<":
            depth += 1
        elif ch == ">":
            depth -= 1
        if ch == "," and depth == 0:
            out.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
    if cur:
        tail = "".join(cur).strip()
        if tail:
            out.append(tail)
    return out
