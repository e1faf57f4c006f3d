"""Live JDBC tests against an embedded Derby database.

pyspark ships the Derby driver for its Hive-metastore default, so the REAL
``spark.read.jdbc`` / ``df.write.jdbc`` path — not a parquet stand-in — is
exercisable in-process: the split planner's generated predicates all execute
on a live SQL engine here (the reference runs the same shapes against MySQL,
``SingleTableSplitUtil.java:33-149``).
"""

import tempfile

import pytest
from pyspark.sql import functions as F

from tg_data_connector_spark.sources.jdbc import (
    hinted_select,
    read_jdbc_split,
)

PROPS = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}


def _new_db(spark, stmts):
    db = tempfile.mkdtemp(prefix="derby_live_") + "/db"
    url = f"jdbc:derby:{db};create=true"
    conn = spark._jvm.java.sql.DriverManager.getConnection(url)
    try:
        st = conn.createStatement()
        for s in stmts:
            st.execute(s)
    finally:
        conn.close()
    return url


@pytest.fixture(scope="module")
def numeric_db(spark):
    # split column k is nullable and NOT the PK: exercises the NULL slice
    rows = [
        f"INSERT INTO people VALUES ({i}, "
        f"{'NULL' if i % 10 == 0 else i * 3}, 'n{i:03d}')"
        for i in range(97)
    ]
    return _new_db(
        spark,
        ["CREATE TABLE people (id INT PRIMARY KEY, k INT, name VARCHAR(64))"]
        + rows,
    )


def test_numeric_split_round_trips_all_rows(spark, numeric_db):
    df = read_jdbc_split(spark, numeric_db, "people", "k", 4, properties=PROPS)
    # 4 range slices + NULL slice, disjoint cover: no row lost or duplicated
    assert df.rdd.getNumPartitions() == 5
    assert df.count() == 97
    assert df.select(F.countDistinct("ID")).collect()[0][0] == 97
    nulls = df.where(F.col("K").isNull()).count()
    assert nulls == 10


def test_numeric_split_partitions_disjoint(spark, numeric_db):
    df = read_jdbc_split(spark, numeric_db, "people", "k", 4, properties=PROPS)
    per_part = df.rdd.mapPartitions(lambda it: [sum(1 for _ in it)]).collect()
    assert sum(per_part) == 97  # disjoint: partition counts sum to the total


def test_projection_predicate_and_hint_push_into_live_query(spark, numeric_db):
    df = read_jdbc_split(
        spark,
        numeric_db,
        "people",
        "k",
        3,
        properties=PROPS,
        columns=["id", "k", "name"],
        where="id >= 5",
        hint="peo.*#DISTINCT",  # a hint expression Derby actually executes
    )
    assert sorted(c.upper() for c in df.columns) == ["ID", "K", "NAME"]
    assert df.count() == 97 - 5  # ids 0..4 dropped by the pushed predicate
    # NULL-k rows with id>=5 still arrive, via the NULL slice (id=0 filtered)
    assert df.where(F.col("K").isNull()).count() == 9


def test_non_matching_hint_pattern_leaves_query_valid(spark, numeric_db):
    q = hinted_select("people", ["id"], hint="orders_only#DISTINCT")
    assert q == "SELECT id FROM people"
    df = spark.read.jdbc(numeric_db, f"({q}) s", properties=PROPS)
    assert df.count() == 97


@pytest.fixture(scope="module")
def string_db(spark):
    rows = [
        f"INSERT INTO docs VALUES ('doc-{i:04d}', {i})" for i in range(61)
    ]
    return _new_db(
        spark,
        ["CREATE TABLE docs (did VARCHAR(32) PRIMARY KEY, v INT)"] + rows,
    )


def test_string_radix_split_round_trips_all_rows(spark, string_db):
    df = read_jdbc_split(spark, string_db, "docs", "did", 4, properties=PROPS)
    assert df.count() == 61
    assert df.select(F.countDistinct("DID")).collect()[0][0] == 61


def test_write_jdbc_then_split_read_back(spark, string_db):
    # write.jdbc QUOTES column names in its generated DDL, so lowercase
    # DataFrame columns become case-sensitive lowercase Derby identifiers that
    # unquoted split predicates (folded to upper) cannot see — stage with
    # uppercase names, the form every unquoted downstream query resolves
    src = spark.range(0, 200).select(
        F.col("id").cast("long").alias("PK"),
        (F.col("id") % 7).cast("int").alias("GRP"),
        F.format_string("row-%04d", F.col("id")).alias("LABEL"),
    )
    src.write.jdbc(string_db, "copy_t", mode="overwrite", properties=PROPS)
    back = read_jdbc_split(spark, string_db, "copy_t", "PK", 6, properties=PROPS)
    assert back.count() == 200
    got = {
        (r["PK"], r["GRP"], r["LABEL"])
        for r in back.collect()
    }
    want = {(i, i % 7, f"row-{i:04d}") for i in range(200)}
    assert got == want


def test_quoted_identifier_pk_passes_through_split(spark, string_db):
    # case-sensitive (quoted-DDL) columns work when the caller passes the
    # quoted identifier — predicates and the MIN/MAX bounds query embed the
    # pk name verbatim
    src = spark.range(0, 50).select(
        F.col("id").cast("long").alias("pk"),
        F.format_string("v-%02d", F.col("id")).alias("val"),
    )
    src.write.jdbc(string_db, "quoted_t", mode="overwrite", properties=PROPS)
    back = read_jdbc_split(
        spark, string_db, "quoted_t", '"pk"', 4, properties=PROPS
    )
    assert back.count() == 50
    assert back.select(F.countDistinct("pk")).collect()[0][0] == 50


# ----------------------------------------------------------- jdbc WRITER
def _read_tgt(spark, url, table="TGT"):
    df = spark.read.jdbc(url, table, properties=PROPS)
    return sorted(tuple(r) for r in df.collect())


def _src(spark, tmp_path, rows, name):
    p = str(tmp_path / name)
    spark.createDataFrame(rows, "K int, NAME string, V double").write.parquet(p)
    return p


def test_jdbc_writer_insert_creates_and_appends(spark, tmp_path):
    from tg_data_connector_spark.job import run_job

    url = _new_db(spark, [])
    cfg = {
        "reader": {"type": "parquet",
                   "path": _src(spark, tmp_path, [(1, "a", 1.0)], "s1")},
        "writer": {"type": "jdbc", "url": url, "table": "TGT",
                   "writeMode": "insert",
                   "createTableColumnTypes": "NAME VARCHAR(16)"},
    }
    r = run_job(spark, cfg)
    assert r.records_written == 1
    cfg["reader"]["path"] = _src(spark, tmp_path, [(2, "b", 2.0)], "s2")
    run_job(spark, cfg)  # append into the existing table
    assert _read_tgt(spark, url) == [(1, "a", 1.0), (2, "b", 2.0)]


def test_jdbc_writer_update_merges_and_drops_stage(spark, tmp_path):
    from tg_data_connector_spark.job import run_job

    url = _new_db(spark, [])
    base = {"type": "jdbc", "url": url, "table": "TGT",
            "createTableColumnTypes": "NAME VARCHAR(16)"}
    run_job(spark, {
        "reader": {"type": "parquet", "path": _src(
            spark, tmp_path, [(1, "a", 1.0), (2, "b", 2.0)], "b")},
        "writer": dict(base, writeMode="insert"),
    })
    # replace is the same full-row upsert (MERGE); exercise both modes
    for mode, rows, exp in (
        ("update", [(2, "B", 22.0), (3, "c", 3.0)],
         [(1, "a", 1.0), (2, "B", 22.0), (3, "c", 3.0)]),
        ("replace", [(1, "A", 11.0)],
         [(1, "A", 11.0), (2, "B", 22.0), (3, "c", 3.0)]),
    ):
        run_job(spark, {
            "reader": {"type": "parquet", "path": _src(
                spark, tmp_path, rows, f"m_{mode}")},
            "writer": dict(base, writeMode=mode, writeKeys=["K"]),
        })
        assert _read_tgt(spark, url) == exp
    # the staging table is dropped after the MERGE
    with pytest.raises(Exception, match="TGT_DX_STAGE"):
        spark.read.jdbc(url, "TGT_DX_STAGE", properties=PROPS).collect()


def test_jdbc_writer_target_side_pre_post_sql(spark, tmp_path):
    from tg_data_connector_spark.job import run_job

    url = _new_db(spark, [])
    run_job(spark, {
        "reader": {"type": "parquet",
                   "path": _src(spark, tmp_path, [(1, "a", 1.0)], "pp")},
        "writer": {
            "type": "jdbc", "url": url, "table": "TGT", "writeMode": "insert",
            # preSql creates the target ON THE TARGET CONNECTION (quoted
            # identifiers so they match write.jdbc's quoted DDL case)
            "preSql": ['CREATE TABLE @table '
                       '("K" INT, "NAME" VARCHAR(16), "V" DOUBLE)'],
            "postSql": ["INSERT INTO @table VALUES (9, 'post', 9.0)"],
        },
    })
    assert _read_tgt(spark, url) == [(1, "a", 1.0), (9, "post", 9.0)]


def test_jdbc_writer_validation(spark, tmp_path):
    from tg_data_connector_spark.job import JobValidationError, pre_check, run_job

    url = _new_db(spark, [])
    src = _src(spark, tmp_path, [(1, "a", 1.0)], "v")
    with pytest.raises(JobValidationError, match="writeKeys"):
        run_job(spark, {
            "reader": {"type": "parquet", "path": src},
            "writer": {"type": "jdbc", "url": url, "table": "TGT",
                       "writeMode": "update"},
        })
    problems = pre_check(spark, {
        "reader": {"type": "parquet", "path": src},
        "writer": {"type": "jdbc", "driver": PROPS["driver"],
                   "url": "jdbc:derby:/nonexistent/db", "table": "T",
                   "writeMode": "update"},
    })
    assert any("writeKeys" in p for p in problems)
    assert any("jdbc connect" in p for p in problems)
    assert not any("\n" in p for p in problems)  # no stack traces
