import os

from tg_data_connector_spark.sources import (
    ColumnEntry,
    expand_sharded_tables,
    quantile_split_predicates,
    range_split_predicates,
    read_typed_csv,
)


def test_expand_sharded_tables():
    assert expand_sharded_tables("db.tab[0-3]") == [
        "db.tab0",
        "db.tab1",
        "db.tab2",
        "db.tab3",
    ]
    assert expand_sharded_tables("t[08-11]_x") == ["t08_x", "t09_x", "t10_x", "t11_x"]
    assert expand_sharded_tables("plain.table") == ["plain.table"]


def test_range_split_predicates_cover_domain(spark):
    preds = range_split_predicates(0, 100, 4, "id")
    assert len(preds) == 5 and preds[-1] == "id IS NULL"
    # every value in [0,100] satisfies exactly one predicate
    df = spark.range(0, 101).withColumnRenamed("id", "id")
    total = sum(df.where(p).count() for p in preds[:-1])
    assert total == 101


def test_quantile_split_predicates_cover_domain(spark):
    df = spark.range(0, 1000).selectExpr("id * id as id")  # skewed domain
    preds = quantile_split_predicates(df, "id", 4)
    data_preds = [p for p in preds if "NULL" not in p]
    total = sum(df.where(p).count() for p in data_preds)
    assert total == 1000
    # equi-depth: each slice within 2x of ideal
    counts = [df.where(p).count() for p in data_preds]
    assert max(counts) <= 2 * (1000 // len(counts))


def test_read_typed_csv(spark, tmp_path):
    p = tmp_path / "in.csv"
    p.write_text("1,alice,true,3.5\n2,bob,false,oops\n3,carol,TRUE,9\n")
    entries = [
        ColumnEntry(type="long", index=0, name="id"),
        ColumnEntry(type="string", index=1, name="name"),
        ColumnEntry(type="boolean", index=2, name="flag"),
        ColumnEntry(type="double", index=3, name="score"),
        ColumnEntry(type="string", value="const!", name="tag"),
    ]
    clean, dirty = read_typed_csv(spark, str(p), entries)
    c = {r["id"]: r for r in clean.collect()}
    assert set(c) == {1, 3}
    assert c[1]["flag"] is True and c[1]["score"] == 3.5 and c[1]["tag"] == "const!"
    assert c[3]["flag"] is True  # 'TRUE' ignoring case
    assert dirty.count() == 1  # 'oops' failed the double cast -> quarantined


def test_read_csv_no_spec_all_strings(spark, tmp_path):
    p = tmp_path / "s.csv"
    p.write_text("1,x\n2,y\n")
    df, dirty = read_typed_csv(spark, str(p), None)
    assert [f.dataType.simpleString() for f in df.schema.fields] == ["string", "string"]
    assert df.count() == 2 and dirty.count() == 0


def test_read_typed_csv_null_format(spark, tmp_path):
    p = tmp_path / "n.csv"
    p.write_text("1,\\N\n2,val\n")
    entries = [
        ColumnEntry(type="long", index=0, name="id"),
        ColumnEntry(type="string", index=1, name="v"),
    ]
    clean, _ = read_typed_csv(spark, str(p), entries, null_format="\\N")
    vals = {r["id"]: r["v"] for r in clean.collect()}
    assert vals[1] is None and vals[2] == "val"
